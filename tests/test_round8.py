"""Round-8 pins: the persisted Count-Min day store (the ADDITIVE member
of the store matrix) — no-events-rescan plan shape, idempotent-append
replay law, compaction identity, and the exact SUM-merge law (store
range read == one-shot sketch, bit for bit)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from big_data_table_spark.functions import sketches as SK
from big_data_table_spark.sources.readers import load_events

LO, HI = "2024-01-08", "2024-01-21"


def _probe(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "v long")


def _est_rows(spark, path, probe, **kw):
    return sorted(
        (r["v"], r["est_cnt"])
        for r in SK.cms_rollup_range_estimates(
            spark, path, LO, HI, probe, **kw
        ).collect()
    )


def test_cms_rollup_range_plan_reads_only_counter_files(spark, sf_dir):
    """The CMS store's range plan must scan the counter parquet
    (partition-pruned on day) and must NOT scan the events table — the
    no-rescan contract every persisted store pins (HLL r6, theta r7),
    applied to the additive store: a range top-k costs days·chunks·d·w
    counter rows, never an events pass."""
    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "cms_rollup")
    SK.cms_rollup_build(ev, path)
    est = SK.cms_rollup_range_estimates(
        spark, path, LO, HI, _probe(spark, [1, 2, 3]), checkpoint=False
    )  # checkpoint=False keeps the pruned file scan visible in-plan
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "cms_rollup" in plan
    assert "events" not in plan
    assert est.count() == 3  # every probed key gets an estimate row

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_cms_absent_key_reads_exactly_zero(spark, sf_dir):
    """The absent-key contract, pinned hard: build a store from ONE key
    (≤ d touched cells of the d·w=4096), find a probe key whose 4 cells
    are PROVABLY disjoint from the stored set (computed with the same
    double-hash chain), and assert it gets a row with est_cnt == 0 —
    the regression this kills is an inner-join read that either drops
    the key (all cells absent) or inflates the MIN over the surviving
    subset (some cells absent)."""
    ev = load_events(spark, sf_dir)
    one_user = ev.orderBy("user_id").limit(1).collect()[0]["user_id"]
    path = os.path.join(tempfile.mkdtemp(), "cms_onekey")
    SK.cms_rollup_build(ev.filter(F.col("user_id") == one_user), path)

    def cells_of(keys):
        hh = SK._double_hashed_values(_probe(spark, keys), "v")
        rcol = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("rw")
        pos = ((F.col("h1") + F.col("rw") * (F.col("h2") * 2 + 1)) % 1024).alias(
            "cl"
        )
        return {
            (r["v"], r["rw"], r["cl"])
            for r in hh.select("v", "h1", "h2", rcol).select("v", "rw", pos).collect()
        }

    stored = {(rw, cl) for _, rw, cl in cells_of([int(one_user)])}
    candidates = [10**12 + k for k in range(20)]
    by_key: dict[int, set] = {}
    for v, rw, cl in cells_of(candidates):
        by_key.setdefault(v, set()).add((rw, cl))
    disjoint = next(v for v, cs in by_key.items() if not cs & stored)

    lo = min(d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("day="))
    hi = max(d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("day="))
    rows = SK.cms_rollup_range_estimates(
        spark, path, lo, hi, _probe(spark, [disjoint, int(one_user)])
    ).collect()
    est = {r["v"]: r["est_cnt"] for r in rows}
    assert est[disjoint] == 0  # provably untouched cells read as zero
    assert est[int(one_user)] >= 1  # the stored key keeps its counts
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_cms_append_replay_is_idempotent_and_compaction_exact(spark, sf_dir):
    """The additive-class lifecycle laws in one store:

    1. REPLAY: re-running an append leaves every range estimate
       bit-identical (the per-(day, chunk) dynamic overwrite absorbs
       at-least-once delivery — counters are replaced, never doubled).
    2. COMPACTION: re-SUMming a day's chunks to one file changes no
       estimate (integer addition is exact) and leaves exactly one
       data file for the day.
    3. SUM-MERGE LAW: the chunked, replayed, compacted store answers
       the range query bit-identically to a store built in ONE pass —
       the merge law that makes day/chunk splits free."""
    ev = load_events(spark, sf_dir)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    root = tempfile.mkdtemp()
    chunked, oneshot = (
        os.path.join(root, "chunked"),
        os.path.join(root, "oneshot"),
    )

    top = [
        r["v"]
        for r in ev.filter(day.between(LO, HI))
        .groupBy(F.col("user_id").cast("long").alias("v"))
        .count()
        .orderBy(F.col("count").desc(), "v")
        .limit(10)
        .collect()
    ]
    probe = _probe(spark, top)

    SK.cms_rollup_build(ev.filter(day != HI), chunked)
    last = ev.filter(day == HI)
    SK.cms_rollup_append_chunk(last.filter(F.col("user_id") % 2 == 0), chunked, HI, 1)
    SK.cms_rollup_append_chunk(last.filter(F.col("user_id") % 2 == 1), chunked, HI, 2)
    base = _est_rows(spark, chunked, probe)

    # 1. replay the second chunk's append: bit-identical estimates
    SK.cms_rollup_append_chunk(last.filter(F.col("user_id") % 2 == 1), chunked, HI, 2)
    assert _est_rows(spark, chunked, probe) == base

    # 2. compaction: one data file for the day, estimates unchanged
    n_files = SK.cms_rollup_compact(spark, chunked, HI)
    assert n_files == 1
    day_files = [
        f
        for r, _, fs in os.walk(os.path.join(chunked, f"day={HI}"))
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(day_files) == 1
    assert _est_rows(spark, chunked, probe) == base

    # 3. compact_all converges: the first pass rewrites every remaining
    #    multi-file day, the second is a no-op (file identity preserved),
    #    and estimates never move
    rewritten = SK.cms_rollup_compact_all(spark, chunked)
    assert HI not in rewritten  # already compacted above
    assert SK.cms_rollup_compact_all(spark, chunked) == {}
    assert _est_rows(spark, chunked, probe) == base

    # 4. merge law: == the one-shot store
    SK.cms_rollup_build(ev, oneshot)
    assert _est_rows(spark, oneshot, probe) == base

    shutil.rmtree(root, ignore_errors=True)


def test_cms_grouped_store_expire_keeps_range_identical(spark, sf_dir):
    """Retention on the grouped CMS store: rollup_expire drops exactly
    the pre-cutoff day partitions, and the retained range's per-group
    estimates are bit-identical before and after (pruning never touched
    the dropped days)."""
    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "cms_grp")
    SK.cms_rollup_grouped_build(ev, path)
    probe = (
        ev.select(
            F.col("event_type").alias("g"),
            F.col("user_id").cast("long").alias("v"),
        )
        .distinct()
        .limit(12)
        .localCheckpoint(eager=True)
    )

    def rows():
        return sorted(
            (r["g"], r["v"], r["est_cnt"])
            for r in SK.cms_rollup_grouped_range_estimates(
                spark, path, LO, HI, probe
            ).collect()
        )

    before = rows()
    days = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("day=")
    )
    dropped = SK.rollup_expire(path, LO)
    assert dropped == [d for d in days if d < LO]
    assert rows() == before
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_stream_cms_store_really_multi_batch(spark, sf_dir):
    """The streaming CMS-store entry's proof is only meaningful if the
    stream REALLY delivered multiple micro-batches: after running it,
    the store left on disk must hold chunk partitions 0, 1 AND 2 under
    the days in range (one per user_id%3 batch group), and a replayed
    batch must not have added a fourth.  Guards against a silent
    collapse to one giant batch (maxFilesPerTrigger regression), which
    would leave the oracle hash green but the batching claim false."""
    import glob

    from big_data_table_spark.catalog import CATALOG

    df = CATALOG["stream_cms_rollup_store"].fn(spark, sf_dir)
    # ≤20 probe rows (top-20 capped by distinct users in range at sf0.001)
    assert 5 <= df.count() <= 20
    store = glob.glob(
        os.path.join(
            tempfile.gettempdir(),
            f"bdt_stream_cmsroll_{spark.sparkContext.applicationId}",
            "store",
        )
    )
    assert store, "store dir missing"
    days = [d for d in os.listdir(store[0]) if d.startswith("day=")]
    assert len(days) >= 14
    chunk_sets = {
        tuple(
            sorted(
                c
                for c in os.listdir(os.path.join(store[0], d))
                if c.startswith("chunk=")
            )
        )
        for d in days
    }
    assert ("chunk=0", "chunk=1", "chunk=2") in chunk_sets, chunk_sets
    for cs in chunk_sets:
        assert len(cs) <= 3, cs  # replay added no fourth chunk
