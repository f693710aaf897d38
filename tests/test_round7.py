"""Round-7 pins: exact fold64 high word above 2^53, uniform
partials shard map, subword over-long/empty-corpus degradation,
sketch-store compaction, epoch-aware resampling, persisted IVF index,
rolling theta churn."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark.functions import sketches as SK
from big_data_table_spark.functions.portable import DUCK, SPARK


# --------------------------------------------------------------------- #
# _fold64_sql: exact high word for |v| >= 2^53 (ADVICE r6, low)
# --------------------------------------------------------------------- #


def test_fold64_exact_high_word_above_2_53(spark):
    """The high word must be the TRUE floor(v / 2^32) for the full int64
    range.  The old ``FLOOR(v / 2^32)`` form rounded across the integer
    boundary for |v| >= 2^53 near multiples of 2^32 (v itself is not
    representable as a double); the ``(v - lo) / 2^32`` form is exact
    because the numerator is q*2^32 with |q| < 2^31 — representable, and
    power-of-two division is exact."""
    vals = [
        (1 << 53) + (1 << 32) - 1,  # old form: hi off by one (rounds up)
        (1 << 53) - 1,
        (1 << 62) + (1 << 32) - 1,
        -((1 << 53) + (1 << 32) - 1),
        (1 << 63) - 1,
        -(1 << 63),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = df.selectExpr(f"{SK._fold64_sql('v', SPARK)} AS f").collect()
    for v, row in zip(vals, out):
        lo = v & 0xFFFFFFFF
        hi = (v >> 32) & 0xFFFFFFFF
        expect = lo ^ ((hi * 0x9E3779B1) & 0xFFFFFFFF)
        assert row["f"] == expect, (v, row["f"], expect)


def test_fold64_above_2_53_spark_duckdb_lockstep(spark):
    """Both engines must agree on the exact fold for boundary values."""
    import duckdb

    vals = [
        (1 << 53) + (1 << 32) - 1,
        (1 << 60) + (1 << 32) - 1,
        -((1 << 53) + (1 << 32) - 1),
        (1 << 63) - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got_s = sorted(
        r["f"] for r in df.selectExpr(f"{SK._fold64_sql('v', SPARK)} AS f").collect()
    )
    con = duckdb.connect()
    con.register("tbig", pd.DataFrame({"v": pd.Series(vals, dtype="int64")}))
    got_d = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {SK._fold64_sql('v', DUCK)} AS f FROM tbig"
        ).fetchall()
    )
    con.close()
    assert got_s == got_d


# --------------------------------------------------------------------- #
# partials_diag: true 2-to-1 uniform shard map (ADVICE r6, low)
# --------------------------------------------------------------------- #


def test_partials_diag_row_count_law(spark, sf_dir):
    """The reference row-count law (tests-04:23-32): nrow == shards x
    groups.  The old ascii(hex) % 8 map starved shard 7 (1/16 of keys);
    the hex-VALUE map is exactly 2-to-1, so at sf0.001 every (shard,
    returnflag) cell is populated."""
    from big_data_table_spark.catalog import CATALOG

    out = CATALOG["partials_diag"].fn(spark, sf_dir).toPandas()
    n_groups = out["l_returnflag"].nunique()
    assert sorted(out["shard"].unique()) == list(range(8))
    assert len(out) == 8 * n_groups, (len(out), n_groups)


# --------------------------------------------------------------------- #
# subword: over-long word types degrade, empty corpus early-returns
# (VERDICT r6 #4 + ADVICE r6)
# --------------------------------------------------------------------- #


def test_subword_overlong_word_three_way(spark):
    """A 100-char word type (MAXLEN=64 grid excluded) charges
    ceil(100/6) = 17 tokens identically on the iterative walk, Spark's
    recursive-CTE execution, and DuckDB — while normal words keep their
    greedy-walk counts."""
    import duckdb

    from big_data_table_spark.functions import subword as SW

    long_word = "x" * 100
    rows = [(1, f"{long_word} hello world"), (2, "hello hello")]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "swlong"
    )
    it = (
        SW.subword_token_counts(spark, k=4, src="swlong")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sr = (
        spark.sql(SW.subword_token_count_sql(SPARK, k=4, src="swlong"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "swlong", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    od = (
        con.execute(SW.subword_token_count_sql(DUCK, k=4, src="swlong"))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(it, od, check_dtype=False)
    pd.testing.assert_frame_equal(sr, od, check_dtype=False)
    # the over-long type contributes exactly ceil(100/6) = 17
    wt = {
        r["word"]: r["ntok"]
        for r in SW.subword_word_tokens(spark, k=4, src="swlong").collect()
    }
    assert wt[long_word] == 17, wt


def test_subword_overlong_strict_raises(spark):
    from big_data_table_spark.functions import subword as SW

    spark.createDataFrame(
        [(1, "y" * 80)], "doc_id long, text string"
    ).createOrReplaceTempView("swstrict")
    with pytest.raises(ValueError, match="MAXLEN"):
        SW.subword_word_tokens(spark, k=2, src="swstrict", strict=True)
    # non-strict degrades: ceil(80/6) = 14
    out = SW.subword_word_tokens(spark, k=2, src="swstrict").collect()
    assert [(r["word"], r["ntok"]) for r in out] == [("y" * 80, 14)]


# --------------------------------------------------------------------- #
# Rolling theta churn (VERDICT r6 #5)
# --------------------------------------------------------------------- #


def test_theta_rolling_churn_3sigma_band(spark, sf_dir):
    """Every consecutive-week estimate (population, retained) must sit
    inside the KMV 3σ band (σ ≈ 1/sqrt(k-1) ≈ 12.6% at k=64), churn
    laws hold exactly on the audit columns, and the pair spine is the
    consecutive-week chain."""
    from big_data_table_spark.catalog import CATALOG

    pdf = (
        CATALOG["theta_rolling_churn"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("week_a")
        .reset_index(drop=True)
    )
    assert len(pdf) >= 1
    assert (pdf["week_b"] == pdf["week_a"] + 1).all()
    band = 3.0 / (63.0**0.5)
    for _, r in pdf.iterrows():
        for est, exact in [
            (r["est_a"], r["exact_a"]),
            (r["est_b"], r["exact_b"]),
            (r["est_retained"], r["exact_retained"]),
        ]:
            if exact:
                assert abs(est - exact) / exact <= band, dict(r)
        assert r["exact_churned"] == r["exact_a"] - r["exact_retained"]
        assert r["est_churned"] >= 0.0


# --------------------------------------------------------------------- #
# Persisted LSH dedup index: the continuous-ingestion loop
# --------------------------------------------------------------------- #


def test_lsh_index_append_then_reprobe_loop(spark, sf_dir):
    """The production loop: probe a batch against the store, APPEND the
    batch, re-probe the same batch — every document must now adjudicate
    exact_vs_corpus (its digest is in the store), proving appends are
    visible to the next increment and replay-safe (the store is read
    with set semantics)."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.catalog import register_views
    from big_data_table_spark.functions import dedup as D

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _lt_corpus AS "
        "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW _lt_batch AS "
        "SELECT doc_id, text FROM documents WHERE doc_id % 4 = 3"
    )
    path = os.path.join(tempfile.mkdtemp(), "lsh_index")
    D.lsh_index_build(spark, path, "_lt_corpus")
    first = D.lsh_index_probe(spark, path, "_lt_batch").toPandas()
    assert set(first["decision"]) <= {
        "exact_vs_corpus",
        "exact_in_batch",
        "neardup_vs_corpus",
        "keep",
    }
    assert (first["decision"] == "keep").any()  # fixture batch has fresh docs

    D.lsh_index_append(spark, path, "_lt_batch")
    second = D.lsh_index_probe(spark, path, "_lt_batch").toPandas()
    assert (second["decision"] == "exact_vs_corpus").all()

    # replay safety: append the same batch AGAIN — decisions unchanged
    D.lsh_index_append(spark, path, "_lt_batch")
    third = D.lsh_index_probe(spark, path, "_lt_batch").toPandas()
    assert (third["decision"] == "exact_vs_corpus").all()

    # compaction: duplicate rows from the replayed appends collapse to
    # one per key, probes bit-identical before/after
    digests = os.path.join(path, "digests")
    pre_rows = spark.read.parquet(digests).count()
    pre_distinct = spark.read.parquet(digests).distinct().count()
    assert pre_rows > pre_distinct  # replay actually left duplicates
    D.lsh_index_compact(spark, path)
    assert spark.read.parquet(digests).count() == pre_distinct
    fourth = D.lsh_index_probe(spark, path, "_lt_batch").toPandas()
    assert (fourth["decision"] == "exact_vs_corpus").all()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


# --------------------------------------------------------------------- #
# Persisted IVF index (VERDICT r6 #7)
# --------------------------------------------------------------------- #


def test_ann_ivf_persisted_matches_trained_no_lloyd_on_query_path(spark, sf_dir):
    """The persisted-index search must return bit-identical top-k to the
    in-query trained variant (same deterministic seed), and its plan
    must contain NO Lloyd machinery — only scans of the stored index
    (cid-partitioned inverted file under dynamic partition pruning) and
    of the query vectors."""
    from big_data_table_spark.catalog import CATALOG

    per = CATALOG["ann_ivf_persisted_topk"].fn(spark, sf_dir)
    trained = (
        CATALOG["ann_ivf_trained_topk"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    got = per.toPandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, trained)

    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "bdt_ivf_index" in plan  # reads the persisted store
    # Lloyd's update step is the only decimal-exact mean in this code
    # path — its absence pins "no re-training on the query path"
    assert "decimal" not in plan.lower()
    # the probe join prunes the cid-partitioned inverted file at runtime
    assert "dynamicpruning" in plan.lower()


def test_ann_pq_persisted_matches_trained_no_lloyd_on_query_path(spark, sf_dir):
    """Persisted-codebook ADC search == in-query trained PQ bit-for-bit,
    with no Lloyd machinery (decimal-exact centroid means) and no raw
    embedding scan in the query plan — only the codebook + codes store
    and the query subvectors."""
    from big_data_table_spark.catalog import CATALOG

    per = CATALOG["ann_pq_persisted_topk"].fn(spark, sf_dir)
    trained = (
        CATALOG["ann_pq_trained_topk"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    got = per.toPandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, trained)
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "bdt_pq_index" in plan
    assert "decimal(18,6)" not in plan  # Lloyd's update-step type


# --------------------------------------------------------------------- #
# Epoch-aware oversampling (VERDICT r6 #3)
# --------------------------------------------------------------------- #


def test_mixture_resample_epochs_no_cap_law(spark, sf_dir):
    """Oversampling laws: achieved == target EXACTLY for every source
    (no cap at source size), epochs == ceil(target/n_docs), distinct
    docs == min(n_docs, target), and the 3x-corpus budget actually
    forces oversampling (some target > n_docs)."""
    import math

    from big_data_table_spark.catalog import CATALOG

    pdf = CATALOG["mixture_resample_epochs"].fn(spark, sf_dir).toPandas()
    assert (pdf["n_sampled"] == pdf["target"]).all()
    assert (pdf["target"] > pdf["n_docs"]).any()
    for _, r in pdf.iterrows():
        assert r["n_epochs"] == math.ceil(r["target"] / r["n_docs"]), dict(r)
        assert r["n_distinct_docs"] == min(r["n_docs"], r["target"])
    assert (pdf["n_over_grid"] == 0).all()


# --------------------------------------------------------------------- #
# Sketch-store compaction (VERDICT r6 #2)
# --------------------------------------------------------------------- #


def _day_files(path):
    import os

    return {
        d.split("=", 1)[1]: sorted(
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        )
        for d in os.listdir(path)
        if d.startswith("day=")
    }


def test_hll_rollup_compact_single_file_bitident(spark, sf_dir):
    """Replayed appends leave multi-file days; compaction drops every
    day to ONE file while the range estimate stays bit-identical, and
    re-compaction is a no-op (single-file days keep file identity)."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "rollup")
    SK.hll_rollup_build(ev, path)
    days = sorted(_day_files(path))
    d0, d1 = days[0], days[1]
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    for d in (d0, d0, d1):  # d0 replayed twice — at-least-once delivery
        SK.hll_rollup_append_day(ev.filter(day == d), path, d)
    before = _day_files(path)
    assert len(before[d0]) == 3 and len(before[d1]) == 2
    pre = SK.hll_rollup_range_estimate(spark, path, d0, days[-1]).collect()[0]

    compacted = SK.hll_rollup_compact_all(spark, path)
    assert compacted == {d0: 3, d1: 2}  # only multi-file days rewritten
    after = _day_files(path)
    assert all(len(v) == 1 for v in after.values()), after
    # untouched days keep their exact files
    for d in days[2:]:
        assert after[d] == before[d], d
    post = SK.hll_rollup_range_estimate(spark, path, d0, days[-1]).collect()[0]
    assert (pre["n_days"], pre["hll_est"]) == (post["n_days"], post["hll_est"])

    # idempotent: a second maintenance run rewrites nothing
    assert SK.hll_rollup_compact_all(spark, path) == {}
    assert _day_files(path) == after
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_hll_stream_sink_compact_one_file_per_day(spark, sf_dir):
    """A per-batch streaming sketch sink (batch=<id> dirs of
    (day, bucket, reg) rows) compacts into the day-partitioned rollup
    store with exactly one file per day, and the per-day estimates
    equal a one-shot batch build's — the merge law through the
    stream-to-store promotion."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir).select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
    )
    root = tempfile.mkdtemp()
    sink = os.path.join(root, "sink")
    # two synthetic micro-batches splitting every day across both
    for bid, half in enumerate(
        (F.col("user_id") % 2 == 0, F.col("user_id") % 2 == 1)
    ):
        SK.hll_registers(ev.filter(half), ["day"], "user_id").write.parquet(
            os.path.join(sink, f"batch={bid}")
        )
    store = os.path.join(root, "store")
    SK.hll_stream_sink_compact(spark, sink, store)
    assert all(len(v) == 1 for v in _day_files(store).values())

    got = {
        r["day"]: r["hll_est"]
        for r in SK.hll_estimate(
            spark.read.parquet(store).select(
                F.col("day").cast("string").alias("day"), "bucket", "reg"
            ),
            ["day"],
        ).collect()
    }
    want = {
        r["day"]: r["hll_est"]
        for r in SK.hll_estimate(
            SK.hll_registers(ev, ["day"], "user_id"), ["day"]
        ).collect()
    }
    assert got == want
    shutil.rmtree(root, ignore_errors=True)


def test_subword_empty_corpus_early_return(spark):
    """No words after the length filter -> empty (word, ntok) frame, not
    the misleading walk-termination RuntimeError (ADVICE r6)."""
    from big_data_table_spark.functions import subword as SW

    spark.createDataFrame(
        [], "doc_id long, text string"
    ).createOrReplaceTempView("swempty")
    out = SW.subword_word_tokens(spark, k=2, src="swempty")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["word", "ntok"]


def test_tdigest_rollup_append_compact_weight_conserved(spark):
    """The quantile store's append/compact verbs: split-day appends land
    as extra files in ONLY that day's directory; compaction drops every
    multi-file day to one file; the store's total weight is EXACTLY the
    number of values delivered (additive integer-valued doubles), and
    range estimates stay inside the ±0.02 rank band before and after.
    Synthetic values so the exact quantiles are known."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.operators.tdigest import (
        tdigest_rollup_append_day,
        tdigest_rollup_build,
        tdigest_rollup_compact_all,
        tdigest_rollup_range,
    )

    n = 5000
    rows = [
        # three days, v = 0..n-1 per day (known ranks), day 3 split later
        (f"2024-02-0{d} 12:00:00", float(i))
        for d in (1, 2)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "ts string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    path = os.path.join(tempfile.mkdtemp(), "tdstore")
    tdigest_rollup_build(df, path, "ts", "value")
    before = _day_files(path)
    assert sorted(before) == ["2024-02-01", "2024-02-02"]

    d3 = spark.range(n).selectExpr("CAST(id AS DOUBLE) AS value")
    tdigest_rollup_append_day(d3.filter("value < 2500"), path, "2024-02-03")
    tdigest_rollup_append_day(d3.filter("value >= 2500"), path, "2024-02-03")
    after_append = _day_files(path)
    # prior days' files untouched; the appended day holds one file per append
    for d in before:
        assert after_append[d] == before[d], d
    assert len(after_append["2024-02-03"]) == 2

    def total_weight():
        return (
            spark.read.parquet(path)
            .selectExpr("explode(weights) AS w")
            .agg(F.sum("w").alias("t"))
            .collect()[0]["t"]
        )

    assert total_weight() == 3 * n

    compacted = tdigest_rollup_compact_all(spark, path)
    assert compacted == {"2024-02-03": 2}  # only the multi-file day rewritten
    after = _day_files(path)
    assert all(len(v) == 1 for v in after.values()), after
    for d in before:
        assert after[d] == before[d], d
    assert total_weight() == 3 * n  # compaction lost no mass

    est = {
        r["q"]: r["est"]
        for r in tdigest_rollup_range(
            spark, path, "2024-02-01", "2024-02-03"
        ).collect()
    }
    for q, e in est.items():
        rank = (e + 1) * 3 / (3 * n)  # values 0..n-1 × 3 days, uniform
        assert abs(rank - q) <= 0.02, (q, e, rank)

    # idempotent: second maintenance run rewrites nothing
    assert tdigest_rollup_compact_all(spark, path) == {}
    assert _day_files(path) == after
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_bloom_index_lifecycle_matches_inquery_filter(spark, sf_dir):
    """The persisted seen-keys index: build/append visible to the next
    probe, append REPLAY harmless (position-set semantics), compaction
    reduces to one file with bit-identical decisions, and the final
    store's probe decisions aggregate to EXACTLY what the self-contained
    bloom_membership_sql computes over the same build/probe sets — the
    persisted lifecycle reproduces the in-query filter."""
    import os
    import shutil
    import tempfile

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did = F.col("doc_id")
    path = os.path.join(tempfile.mkdtemp(), "bloomidx")

    SK.bloom_index_build(docs.filter(did % 3 == 0), path, "doc_id", m=1024, k=3)
    nf = lambda: len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert nf() == 1

    # no false negatives on the built increment
    a = SK.bloom_index_probe(spark, path, docs.filter(did % 3 == 0), "doc_id")
    assert a.filter(~F.col("possible")).count() == 0

    SK.bloom_index_append(docs.filter(did % 3 == 1), path, "doc_id")
    SK.bloom_index_append(docs.filter(did % 3 == 1), path, "doc_id")  # replay
    assert nf() == 3
    b = SK.bloom_index_probe(spark, path, docs.filter(did % 3 == 1), "doc_id")
    assert b.filter(~F.col("possible")).count() == 0  # append visible

    pre = {
        r["v"]: r["possible"]
        for r in SK.bloom_index_probe(spark, path, docs, "doc_id").collect()
    }
    assert SK.bloom_index_compact(spark, path) == 1
    assert nf() == 1
    post = {
        r["v"]: r["possible"]
        for r in SK.bloom_index_probe(spark, path, docs, "doc_id").collect()
    }
    assert pre == post  # compaction is set identity on decisions

    # the persisted store == the in-query filter, decision for decision
    docs.createOrReplaceTempView("blidx_docs")
    row = spark.sql(
        SK.bloom_membership_sql(
            "(SELECT doc_id FROM blidx_docs WHERE doc_id % 3 <> 2)",
            "blidx_docs",
            "doc_id",
            m=1024,
            k=3,
            dialect=SPARK,
        )
    ).collect()[0]
    members = {
        r["doc_id"]
        for r in docs.filter(did % 3 != 2).select("doc_id").distinct().collect()
    }
    assert row["n_probed"] == len(post)
    assert row["n_possible"] == sum(post.values())
    assert row["n_members"] == len(members)
    assert row["n_false_pos"] == sum(
        1 for v, p in post.items() if p and v not in members
    )
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_training_order_partitioning_independent(spark, sf_dir):
    """The training-order permutation is a pure function of the data:
    identical at 1 and 7 partitions, positions are exactly 0..n-1, and
    the grouped form restarts a dense permutation per group."""
    import os

    from big_data_table_spark.functions.packing import training_order

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = {
        r["doc_id"]: r["pos"]
        for r in training_order(docs.repartition(1)).collect()
    }
    b = {
        r["doc_id"]: r["pos"]
        for r in training_order(docs.repartition(7)).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(len(a)))

    per_src = {}
    for r in training_order(docs, by=["source"]).collect():
        per_src.setdefault(r["source"], []).append(r["pos"])
    for src, poss in per_src.items():
        assert sorted(poss) == list(range(len(poss))), src


def test_cms_counter_sum_merge_bitident(spark, sf_dir):
    """The additive merge law the streaming CMS writer relies on:
    per-batch counter tables SUM-merged equal the one-shot counter table
    BIT-FOR-BIT — for any batch split (user parity here; micro-batch
    boundaries in production)."""
    import os

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    one_shot = {
        (r["rw"], r["cl"]): r["cnt"]
        for r in SK.cms_counter_table(ev, "user_id").collect()
    }
    merged: dict = {}
    for half in (F.col("user_id") % 2 == 0, F.col("user_id") % 2 == 1):
        for r in SK.cms_counter_table(ev.filter(half), "user_id").collect():
            k = (r["rw"], r["cl"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == one_shot


def test_stream_tdigest_daily_weight_conserved(spark, sf_dir):
    """The streaming quantile-store writer: every day's band audit holds
    and the store's per-day weight equals the raw per-day value count —
    exactly-once delivery through real micro-batch boundaries."""
    from big_data_table_spark.sources.readers import load_events
    from big_data_table_spark.streaming.events import stream_tdigest_daily

    out = stream_tdigest_daily(spark, sf_dir).toPandas()
    assert out["ok"].all()
    want = {
        r["day"]: r["n"]
        for r in load_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = dict(zip(out["day"], out["n_values"]))
    assert got == want


def test_winnow_index_lifecycle(spark, sf_dir):
    """The fingerprint store's ingestion loop: append visible to the
    next probe (attribution flips from clean to matched), replayed
    appends absorbed, compaction reduces to one file with identical
    attributions."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.functions import text as X

    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).createOrReplaceTempView(
        "wit_docs"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW wit_corpus AS "
        "SELECT * FROM wit_docs WHERE doc_id % 3 = 0"
    )
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW wit_batch1 AS "
        "SELECT * FROM wit_docs WHERE doc_id % 3 = 1"
    )
    path = os.path.join(tempfile.mkdtemp(), "witstore")
    X.winnow_index_build(spark, path, "wit_corpus")
    nf = lambda: len([f for f in os.listdir(path) if f.endswith(".parquet")])

    # probing the corpus against its own store: every doc's best match
    # covers ALL its fingerprints (itself, or an exact-duplicate with a
    # lower id winning the tie-break — the fixture has such dups), and
    # every fingerprint hits the store
    self_probe = X.winnow_index_probe(spark, path, "wit_corpus").toPandas()
    assert (self_probe.n_common == self_probe.n_fp).all()
    assert (self_probe.n_matched == self_probe.n_fp).all()

    # append batch1 (twice — replay), re-probe batch1: now self-matches
    X.winnow_index_append(spark, path, "wit_batch1")
    X.winnow_index_append(spark, path, "wit_batch1")  # replay
    assert nf() >= 3
    b1 = X.winnow_index_probe(spark, path, "wit_batch1").toPandas()
    assert (b1.n_common == b1.n_fp).all()
    assert (b1.n_matched == b1.n_fp).all()

    pre = X.winnow_index_probe(spark, path, "wit_docs").toPandas()
    assert X.winnow_index_compact(spark, path) == 1
    assert nf() == 1
    post = X.winnow_index_probe(spark, path, "wit_docs").toPandas()
    key = ["doc_id", "n_fp", "n_matched", "best_match_id", "n_common"]
    assert (
        pre[key].sort_values("doc_id").reset_index(drop=True).equals(
            post[key].sort_values("doc_id").reset_index(drop=True)
        )
    )
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_ann_ivfpq_persisted_matches_residual_no_lloyd_on_query_path(
    spark, sf_dir
):
    """The persisted residual-IVF-PQ search == the in-query trained
    recipe bit-for-bit (same seed), with neither Lloyd chain on the
    query plan (no decimal(18,6) update-step math) and the codes scan
    dynamic-partition-pruned to the probed cells."""
    from big_data_table_spark.catalog import CATALOG

    per = CATALOG["ann_ivfpq_persisted_topk"].fn(spark, sf_dir)
    trained = (
        CATALOG["ann_ivfpq_residual_topk"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    got = per.toPandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, trained)
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "bdt_ivfpq_index" in plan
    assert "decimal(18,6)" not in plan  # Lloyd's update-step type


def test_rollup_expire_retention(spark, sf_dir):
    """The stores' fourth verb: expiry drops exactly the partitions
    older than the cutoff (no engine, no scan — directory removal), the
    retained days' files keep their identity, and a range query over the
    retained window is bit-identical before and after (its pruning never
    touched the dropped days)."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "retstore")
    SK.hll_rollup_build(ev, path)
    days = sorted(_day_files(path))
    assert len(days) >= 4
    cutoff = days[2]
    before = _day_files(path)
    pre = SK.hll_rollup_range_estimate(spark, path, cutoff, days[-1]).collect()[0]

    dropped = SK.rollup_expire(path, cutoff)
    assert dropped == days[:2]
    after = _day_files(path)
    assert sorted(after) == days[2:]
    for d in days[2:]:
        assert after[d] == before[d], d  # retained files keep identity
    post = SK.hll_rollup_range_estimate(spark, path, cutoff, days[-1]).collect()[0]
    assert (pre["n_days"], pre["hll_est"]) == (post["n_days"], post["hll_est"])

    # idempotent: a second run drops nothing
    assert SK.rollup_expire(path, cutoff) == []
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_theta_rollup_lifecycle_single_file_bitident(spark, sf_dir):
    """The theta/KMV day store's full verb cycle: replayed appends leave
    multi-file days whose read-side DISTINCT absorbs the duplicate
    sample rows (SET merge class — the range estimate is bit-identical
    before and after the replay), compaction drops every day to ONE
    de-duplicated file without changing the estimate, re-compaction is
    a no-op, and the estimator lands within the 3σ KMV band of the
    exact distinct count."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "theta_rollup")
    SK.theta_rollup_build(ev, path, k=64)
    days = sorted(_day_files(path))
    d0, d1 = days[0], days[1]
    base = SK.theta_rollup_range_estimate(spark, path, d0, days[-1], k=64).collect()[0]

    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    for d in (d0, d0, d1):  # d0 replayed twice — at-least-once delivery
        SK.theta_rollup_append_day(ev.filter(day == d), path, d, k=64)
    before = _day_files(path)
    assert len(before[d0]) == 3 and len(before[d1]) == 2
    pre = SK.theta_rollup_range_estimate(spark, path, d0, days[-1], k=64).collect()[0]
    # replayed duplicate rows are invisible to the DISTINCT read path
    assert (pre["n_days"], pre["est_distinct"]) == (
        base["n_days"],
        base["est_distinct"],
    )

    compacted = SK.theta_rollup_compact_all(spark, path)
    assert compacted == {d0: 3, d1: 2}  # only multi-file days rewritten
    after = _day_files(path)
    assert all(len(v) == 1 for v in after.values()), after
    for d in days[2:]:  # untouched days keep their exact files
        assert after[d] == before[d], d
    post = SK.theta_rollup_range_estimate(spark, path, d0, days[-1], k=64).collect()[0]
    assert (pre["n_days"], pre["est_distinct"]) == (
        post["n_days"],
        post["est_distinct"],
    )
    assert SK.theta_rollup_compact_all(spark, path) == {}  # idempotent
    assert _day_files(path) == after

    # 3σ KMV band: rel error ≤ 3/sqrt(k) against the exact distinct
    exact = (
        ev.filter(day.between(d0, days[-1]))
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()[0]["x"]
    )
    assert abs(post["est_distinct"] - exact) <= 3.0 / (64**0.5) * exact + 1
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_theta_rollup_expire_retention(spark, sf_dir):
    """`rollup_expire` (the generic fourth verb) applies to the theta
    store unchanged: old days drop by partition removal, retained-range
    estimates are bit-identical, expiry is idempotent."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "theta_rollup")
    SK.theta_rollup_build(ev, path, k=64)
    days = sorted(_day_files(path))
    cut = days[2]
    keep_lo, keep_hi = cut, days[-1]
    pre = SK.theta_rollup_range_estimate(spark, path, keep_lo, keep_hi, k=64).collect()[0]
    dropped = SK.rollup_expire(path, cut)
    assert dropped == days[:2]
    assert sorted(_day_files(path)) == days[2:]
    post = SK.theta_rollup_range_estimate(spark, path, keep_lo, keep_hi, k=64).collect()[0]
    assert (pre["n_days"], pre["est_distinct"]) == (
        post["n_days"],
        post["est_distinct"],
    )
    assert SK.rollup_expire(path, cut) == []  # idempotent
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_stream_packing_ledger_batch_boundary_independent(spark, sf_dir):
    """The streaming-packing resolution's core claim: the packing layout
    is a function of the token-ledger SET alone, so HOW the stream was
    batched cannot matter.  Stream the corpus as 2 files and as 5 files
    (different micro-batch counts and contents): the per-bin reports are
    identical row-for-row, and both equal the batch packing path over
    the same documents.  Multi-batch execution is real, not vacuous:
    the ledger sink holds one batch=<id> dir per file."""
    import os
    import tempfile

    from big_data_table_spark.functions.packing import pack_sequences, pack_summary
    from big_data_table_spark.sources.readers import load_table
    from big_data_table_spark.streaming.events import stream_packing_ledger

    def report(n_files):
        rows = stream_packing_ledger(spark, sf_dir, n_files=n_files).collect()
        ledger_dir = os.path.join(
            tempfile.gettempdir(),
            f"bdt_stream_pack_{spark.sparkContext.applicationId}_{n_files}",
            "ledger",
        )
        batches = [d for d in os.listdir(ledger_dir) if d.startswith("batch=")]
        assert len(batches) == n_files, batches  # one micro-batch per file
        return sorted((r["bin_id"], r["n_docs"], r["bin_tokens"]) for r in rows)

    a, b = report(2), report(5)
    assert a == b
    docs = load_table(spark, sf_dir, "documents")
    batch = sorted(
        (r["bin_id"], r["n_docs"], r["bin_tokens"])
        for r in pack_summary(pack_sequences(docs, budget=2048), budget=2048).collect()
    )
    assert a == batch


def test_theta_rollup_range_plan_reads_only_sample_files(spark, sf_dir):
    """The theta store's range plan must scan the sample parquet
    (partition-pruned on day) and must NOT scan the events table — the
    same no-rescan contract test_round6 pins for the HLL register
    store, applied to the KMV store (its whole point is answering
    distinct/overlap range queries from days·k sample rows alone)."""
    import os
    import shutil
    import tempfile

    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "theta_rollup")
    SK.theta_rollup_build(ev, path, k=64)
    est = SK.theta_rollup_range_estimate(
        spark, path, "2024-01-08", "2024-01-21", k=64, checkpoint=False
    )  # checkpoint=False keeps the pruned file scan visible in-plan
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "theta_rollup" in plan
    assert "events" not in plan
    row = est.collect()[0]
    assert row["n_days"] == 14
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
