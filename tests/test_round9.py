"""Round-9 pins.

1. The r8-verdict scale-killer fix: the two exact top-k audit spines
   (``bloom_rolling_membership``, ``stream_cms_heavy_hitters``) now go
   through ``sketches.exact_top_keys`` — ``orderBy().limit(k)``, whose
   physical plan is TakeOrderedAndProject (per-partition partial top-k +
   a ≤ k·partitions-row driver merge), never an ``Exchange
   SinglePartition`` feeding a one-task Window sort over every distinct
   key.  Pinned both as a plan shape AND as bit-identity against the
   unpartitioned ``row_number`` spine it replaced (same tie-break).
2. The rename-aside compactor swap (``sketches._swap_dir_in``): the
   day-partition is absent only between two renames and the aside dir
   never survives the verb.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_table_spark.functions import sketches as SK
from big_data_table_spark.plans import formatted_plan
from big_data_table_spark.sources.readers import load_events


def _user_counts(spark, sf_dir):
    return (
        load_events(spark, sf_dir)
        .select(F.col("user_id").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def test_exact_top_keys_plan_is_take_ordered(spark, sf_dir):
    """No single-task global sort in the exact top-k spine: the plan is
    TakeOrderedAndProject with no SinglePartition exchange and no Window
    — mirroring test_plans.test_topk_uses_take_ordered for the shared
    audit-spine helper both fixed sites call."""
    top = SK.exact_top_keys(_user_counts(spark, sf_dir), "c", "v", 20)
    plan = formatted_plan(top)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" not in plan, plan


def test_exact_top_keys_matches_row_number_spine(spark, sf_dir):
    """Bit-identity with the replaced spine: orderBy().limit(k) under the
    (count DESC, key) tie-break selects exactly the rows the
    unpartitioned row_number spine selected, in the same order."""
    counts = _user_counts(spark, sf_dir)
    fixed = [
        (r["v"], r["c"])
        for r in SK.exact_top_keys(counts, "c", "v", 10).collect()
    ]
    legacy = [
        (r["v"], r["c"])
        for r in counts.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), F.col("v"))
            ),
        )
        .filter(F.col("rn") <= 10)
        .orderBy("rn")
        .drop("rn")
        .collect()
    ]
    assert len(fixed) == 10
    assert fixed == legacy


def test_compactor_swap_leaves_no_aside_dir(spark, sf_dir, tmp_path):
    """The rename-aside swap cleans up after itself: after a compact the
    day dir holds exactly one data file and no ``.compact.old`` /
    ``.compact.tmp`` sibling remains in the store root."""
    ev = load_events(spark, sf_dir)
    path = str(tmp_path / "hll_store")
    SK.hll_rollup_build(ev, path)
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("day=")
    )
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    SK.hll_rollup_append_day(ev.filter(day == days[0]), path, days[0])
    assert SK.hll_rollup_compact(spark, path, days[0]) == 1
    leftovers = [d for d in os.listdir(path) if ".compact." in d]
    assert leftovers == [], leftovers


# ------------------------------------------------------------------ #
# Misra-Gries / SpaceSaving day store (sixth store family) pins
# ------------------------------------------------------------------ #

def _mg_days(path):
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("day=")
    )


def _mg_rows(spark, path, lo, hi):
    return sorted(
        (r["key"], r["lower_cnt"], r["upper_cnt"])
        for r in SK.mg_rollup_range_topk(
            spark, path, lo, hi, topk=1000
        ).collect()
    )


def test_mg_range_plan_reads_only_summary_files(spark, sf_dir):
    """The MG store's no-rescan contract (HLL r6 / theta r7 / CMS r8
    applied to the summary-prune store): the range plan scans the
    partition-pruned summary parquet, never the events table."""
    import tempfile

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "mg_rollup")
    SK.mg_rollup_build(ev, path)
    days = _mg_days(path)
    est = SK.mg_rollup_range_topk(
        spark, path, days[0], days[-1], topk=5, checkpoint=False
    )
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "mg_rollup" in plan
    assert "events" not in plan
    assert est.count() == 5


def test_mg_replay_idempotent_and_compaction_bit_neutral(spark, sf_dir):
    """Two laws in one store lifecycle: (1) a REPLAYED chunk append
    writes byte-identical rows that the DISTINCT read absorbs (SET
    class); (2) compaction merges chunks WITHOUT re-pruning and the
    [lower, upper] range algebra is bit-identical before and after
    (the merge law: c sums, ube absorbs absent-sibling thresholds,
    thr sums)."""
    import tempfile

    ev = load_events(spark, sf_dir)
    day_col = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    path = os.path.join(tempfile.mkdtemp(), "mg_rollup")
    SK.mg_rollup_build(ev, path, cap=8)
    days = _mg_days(path)
    d0 = days[0]
    base = _mg_rows(spark, path, d0, days[-1])

    # replay law: re-append an existing day's events as a chunk, twice
    day_ev = ev.filter(day_col == d0)
    SK.mg_rollup_append_chunk(day_ev, path, d0, 7, cap=8)
    once = _mg_rows(spark, path, d0, days[-1])
    SK.mg_rollup_append_chunk(day_ev, path, d0, 7, cap=8)
    twice = _mg_rows(spark, path, d0, days[-1])
    assert once == twice  # duplicate identical rows are invisible
    assert once != base   # ...but the new chunk itself is real

    # merge law: compaction changes files, not answers
    SK.mg_rollup_compact(spark, path, d0)
    compacted = _mg_rows(spark, path, d0, days[-1])
    assert compacted == once


def test_mg_bounds_contain_truth_for_every_key(spark, sf_dir):
    """The store's honesty contract beyond the entry's top-20 audit:
    for EVERY key the store reports, the exact range count sits inside
    [lower_cnt, upper_cnt] — including keys pruned on some days (whose
    upper bound grows by those days' thresholds)."""
    import tempfile

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "mg_bounds")
    SK.mg_rollup_build(ev, path, cap=4)  # tiny cap forces real pruning
    days = _mg_days(path)
    store = {
        r["key"]: (r["lower_cnt"], r["upper_cnt"])
        for r in SK.mg_rollup_range_topk(
            spark, path, days[0], days[-1], topk=100000
        ).collect()
    }
    exact = {
        r["v"]: r["c"]
        for r in ev.select(F.col("user_id").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    assert store, "store reported no keys"
    pruned_somewhere = 0
    for k, (lb, ub) in store.items():
        assert lb <= exact[k] <= ub, (k, lb, exact[k], ub)
        if exact[k] > lb:
            pruned_somewhere += 1
    assert pruned_somewhere > 0  # cap=4 really pruned (bounds not trivial)


def test_stream_mg_store_really_multi_batch_and_replay_files(spark, sf_dir):
    """The streaming MG-store entry's claims, physically verified:
    (1) the stream really delivered three micro-batches — chunk
    partitions 0, 1 AND 2 exist under the days in range; (2) the
    replayed batch-1 append REALLY landed as extra files under
    chunk=1 (the SET class absorbs duplicates at read time — the
    evidence must exist on disk or the replay claim is vacuous);
    (3) no fourth chunk appeared."""
    import glob
    import tempfile

    from big_data_table_spark.catalog import CATALOG

    df = CATALOG["stream_mg_rollup_store"].fn(spark, sf_dir)
    assert 5 <= df.count() <= 20
    assert df.filter(~F.col("in_bounds")).count() == 0
    store = glob.glob(
        os.path.join(
            tempfile.gettempdir(),
            f"bdt_stream_mgroll_{spark.sparkContext.applicationId}",
            "store",
        )
    )
    assert store, "store dir missing"
    days = [d for d in os.listdir(store[0]) if d.startswith("day=")]
    assert len(days) >= 14
    chunk_sets = {}
    replay_evidence = 0
    for d in days:
        chunks = sorted(
            c
            for c in os.listdir(os.path.join(store[0], d))
            if c.startswith("chunk=")
        )
        chunk_sets[d] = chunks
        assert len(chunks) <= 3, (d, chunks)
        c1 = os.path.join(store[0], d, "chunk=1")
        if os.path.isdir(c1):
            n_files = len(
                [f for f in os.listdir(c1) if f.endswith(".parquet")]
            )
            if n_files >= 2:
                replay_evidence += 1
    assert any(
        cs == ["chunk=0", "chunk=1", "chunk=2"] for cs in chunk_sets.values()
    ), chunk_sets
    assert replay_evidence > 0  # the replay physically appended files


def test_compactor_aside_dir_is_invisible_to_partition_discovery(
    spark, sf_dir, tmp_path
):
    """Crash-window safety for the rename-aside swap: the aside dir is
    DOT-prefixed, so even if a crash leaves it behind, Spark's
    partition discovery skips it — a range read can never double-count
    the compacted day through a phantom 'day=...compact.old'
    partition.  Simulated by planting the leftover exactly as an
    interrupted _swap_dir_in would."""
    import shutil

    ev = load_events(spark, sf_dir)
    path = str(tmp_path / "hll_store")
    SK.hll_rollup_build(ev, path)
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("day=")
    )
    d0 = days[0]
    before = (
        spark.read.parquet(path)
        .filter(F.col("day").cast("string").between(days[0], days[-1]))
        .count()
    )
    # plant the crash leftover: a full copy of the day under the aside name
    shutil.copytree(
        os.path.join(path, f"day={d0}"),
        os.path.join(path, f".day={d0}.compact.old"),
    )
    after = (
        spark.read.parquet(path)
        .filter(F.col("day").cast("string").between(days[0], days[-1]))
        .count()
    )
    assert after == before  # the dot-dir is invisible; no double count


def test_r9_view_entries_rerun_identical_and_sf_switch_takes(spark, sf_dir):
    """Session-robustness for the r9 checkpoint+temp-view pattern: every
    entry that caches a checkpointed frame behind a temp view must (1)
    return an identical result when run TWICE in one session (the view
    is replaced, not stale), and (2) actually follow an sf_dir switch
    (register_views re-registers on change; a stale cached view would
    freeze the old fixture).  The retention curve's row count differs
    across SFs, which proves the switch physically took."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import normalize

    from big_data_table_spark.catalog import CATALOG

    view_entries = [
        "events_peak_concurrency",
        "events_transition_entropy",
        "source_lang_entropy",
        "orders_seasonality_index",
        "simhash_hamming_histogram",
        "simhash_bit_balance",
        "quality_drift_ks",
        "events_retention_curve",
        "embedding_centroid_confusion",
    ]
    for name in view_entries:
        a = normalize(CATALOG[name].fn(spark, sf_dir).toPandas())
        b = normalize(CATALOG[name].fn(spark, sf_dir).toPandas())
        assert a.equals(b), name

    n_small = CATALOG["events_retention_curve"].fn(spark, sf_dir).count()
    n_big = CATALOG["events_retention_curve"].fn(
        spark, "/root/testdata/sf0.01"
    ).count()
    assert n_small != n_big  # the switch re-registered the fixture views
    # switch back and confirm the original result returns
    again = normalize(
        CATALOG["events_retention_curve"].fn(spark, sf_dir).toPandas()
    )
    first = normalize(
        CATALOG["events_retention_curve"].fn(spark, sf_dir).toPandas()
    )
    assert again.equals(first)
