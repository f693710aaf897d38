"""Round-6 pins: negative-key hash fold normalization, persisted HLL
rollup (incremental sketch table), grouped theta overlap, subword
tokenizer, print head/tail fidelity (A24), oracle-checkable diagnostics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark.functions import sketches as SK
from big_data_table_spark.functions.portable import DUCK, SPARK


# --------------------------------------------------------------------- #
# _fold64_sql: negative BIGINT keys (ADVICE r5, low)
# --------------------------------------------------------------------- #


def test_fold64_negative_keys_twos_complement(spark):
    """A negative key folds to ``lo ^ (hi * C mod 2^32)`` of its
    two's-complement words — never a negative intermediate (a negative
    fold would corrupt the downstream bucket/rho arithmetic, which
    assumes 0 <= h < 2^32)."""
    vals = [-1, -5, -(1 << 32), -(1 << 40) - 7, -(1 << 62), (-1) << 63]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = df.selectExpr(f"{SK._fold64_sql('v', SPARK)} AS f").collect()
    for v, row in zip(vals, out):
        lo = v & 0xFFFFFFFF
        hi = (v >> 32) & 0xFFFFFFFF
        expect = lo ^ ((hi * 0x9E3779B1) & 0xFFFFFFFF)
        assert row["f"] == expect, (v, row["f"], expect)
        assert 0 <= row["f"] < 1 << 32


def test_fold64_negative_keys_spark_duckdb_lockstep(spark):
    """Negative keys must hash identically in both engines and must NOT
    alias with their absolute values: 600 keys = 300 negative + their
    300 positive mirrors → the estimate must see ~600 distinct."""
    import duckdb

    vals = [v for v in range(1, 301)] + [-v for v in range(1, 301)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    spark_est = SK.hll_estimate_global(SK.hll_registers(df, [], "v")).collect()[0][
        "hll_est"
    ]
    con = duckdb.connect()
    con.register("tneg", pd.DataFrame({"v": vals}))
    duck_est = con.execute(SK.hll_estimate_sql("tneg", "", "v", dialect=DUCK)).fetchone()[
        0
    ]
    con.close()
    assert spark_est == duck_est, (spark_est, duck_est)
    assert abs(spark_est - 600) / 600 < 0.25, spark_est


# --------------------------------------------------------------------- #
# Persisted daily HLL rollup: incremental sketch table (VERDICT r5 #2)
# --------------------------------------------------------------------- #


@pytest.fixture()
def rollup_path(tmp_path):
    return str(tmp_path / "hll_rollup")


def _events(spark, sf_dir):
    from big_data_table_spark.sources.readers import Tables

    return Tables(spark, sf_dir).events


def test_hll_rollup_incremental_append_touches_no_prior_files(
    spark, sf_dir, rollup_path
):
    """Build the rollup over all days EXCEPT the last, snapshot every
    file's (path, mtime, size), append the last day, and require the
    prior snapshot unchanged — the incremental-maintenance contract:
    a new day is ≤256 new rows in a new day= directory."""
    import os

    ev = _events(spark, sf_dir)
    days = sorted(
        r["day"]
        for r in ev.select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .distinct()
        .collect()
    )
    assert len(days) >= 2
    last = days[-1]
    SK.hll_rollup_build(ev.filter(F.to_date("ts") < last), rollup_path)

    def snapshot():
        # data files only: the _SUCCESS job-commit marker (and its crc)
        # is legitimately refreshed by every append
        out = {}
        for root, _, files in os.walk(rollup_path):
            for f in files:
                if "_SUCCESS" in f:
                    continue
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
        return out

    before = snapshot()
    SK.hll_rollup_append_day(
        ev.filter(F.date_format(F.to_date("ts"), "yyyy-MM-dd") == last),
        rollup_path,
        last,
    )
    after = snapshot()
    assert set(before) <= set(after)
    for p, meta in before.items():
        assert after[p] == meta, f"prior rollup file rewritten: {p}"
    # and the appended table answers the full range like a direct sketch
    est = SK.hll_rollup_range_estimate(
        spark, rollup_path, days[0], days[-1]
    ).collect()[0]
    direct = SK.hll_estimate_global(
        SK.hll_registers(ev.select("user_id"), [], "user_id")
    ).collect()[0]["hll_est"]
    assert est["hll_est"] == direct  # merge law: bit-for-bit
    assert est["n_days"] == len(days)


def test_hll_rollup_range_plan_reads_only_sketch_files(
    spark, sf_dir, rollup_path
):
    """The range query's plan must scan the rollup parquet (partition-
    pruned on day) and must NOT scan the events table — that is the
    entire point of persisting the continuous aggregate."""
    ev = _events(spark, sf_dir)
    SK.hll_rollup_build(ev, rollup_path)
    est = SK.hll_rollup_range_estimate(
        spark, rollup_path, "2024-01-08", "2024-01-21"
    )
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "hll_rollup" in plan
    assert "events" not in plan
    # row-level result still equals the in-query rollup entry's estimate
    row = est.collect()[0]
    assert row["n_days"] == 14


# --------------------------------------------------------------------- #
# Subword tokenizer: learned vocab + greedy longest-match (VERDICT r5 #3)
# --------------------------------------------------------------------- #


def test_subword_greedy_longest_match_semantics(spark):
    """Hand-computable corpus 'aaaaa aaaaa aaaaa': with k=1 the vocab is
    {'aa'} (12 weighted occurrences beat every longer run) → each word
    tokenizes aa|aa|a = 3 tokens; with k=2 the vocab adds 'aaa' and
    greedy LONGEST-match takes aaa|aa = 2 tokens — the k=2 case fails if
    the walk matches shortest-first or ignores vocabulary priority."""
    from big_data_table_spark.functions import subword as SW

    spark.createDataFrame(
        [(1, "aaaaa aaaaa aaaaa")], "doc_id long, text string"
    ).createOrReplaceTempView("swtest")
    for k, want in [(1, 9), (2, 6)]:
        row = SW.subword_token_counts(spark, k=k, src="swtest").collect()[0]
        assert (row["n_tokens_ws"], row["n_tokens_subword"]) == (3, want), (k, row)


def test_subword_three_way_crosscheck(spark, sf_dir, duck):
    """The iterative DataFrame walk, Spark's recursive-CTE execution of
    the oracle statement, and DuckDB's execution of the same statement
    must agree row-for-row on the fixture corpus."""
    import pandas as pd

    from big_data_table_spark import catalog as C
    from big_data_table_spark.functions import subword as SW
    from big_data_table_spark.functions.portable import SPARK as SP

    C.register_views(spark, sf_dir)
    it = (
        SW.subword_token_counts(spark)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sr = (
        spark.sql(SW.subword_token_count_sql(SP))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    od = (
        duck.execute(SW.subword_token_count_sql(DUCK))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(it, od, check_dtype=False)
    pd.testing.assert_frame_equal(sr, od, check_dtype=False)


def test_subword_walk_rounds_bounded_by_word_length(spark):
    """The iterative walk must terminate within max-word-length rounds
    even when nothing matches the vocabulary (all-singles worst case:
    a word of unique chars with an alien vocab corpus)."""
    from big_data_table_spark.functions import subword as SW

    spark.createDataFrame(
        [(1, "abcdefgh zz zz zz")], "doc_id long, text string"
    ).createOrReplaceTempView("swbound")
    out = {
        r["doc_id"]: r
        for r in SW.subword_token_counts(spark, k=1, src="swbound").collect()
    }
    # vocab = {'zz'} (weighted 3) → 'abcdefgh' is 8 singles, each 'zz' is 1
    assert out[1]["n_tokens_subword"] == 8 + 3
    assert out[1]["n_tokens_ws"] == 4


# --------------------------------------------------------------------- #
# Grouped theta sketches: pairwise overlap matrix (VERDICT r5 #6)
# --------------------------------------------------------------------- #


def test_theta_overlap_by_group_error_band(spark, sf_dir):
    """Every pair's intersection estimate must sit inside the KMV 3σ
    band (σ ≈ 1/sqrt(k-1) ≈ 12.6% at k=64; measured max 10.1% on the
    sf0.01 fixture, 0% at sf0.001 where groups are below k and the
    sketch is exact).  Group-cardinality estimates obey the same band,
    and the matrix is complete: one row per unordered group pair."""
    from big_data_table_spark.functions.sketches import theta_overlap_by_group
    from big_data_table_spark.sources.readers import Tables

    ev = Tables(spark, sf_dir).events
    rows = theta_overlap_by_group(ev, "event_type", "user_id", k=64).collect()
    n_groups = ev.select("event_type").distinct().count()
    assert len(rows) == n_groups * (n_groups - 1) // 2
    band = 3.0 / (63.0 ** 0.5)  # 3σ for k=64
    for r in rows:
        assert r["ga"] < r["gb"]
        for est, exact in [
            (r["est_a"], r["exact_a"]),
            (r["est_b"], r["exact_b"]),
            (r["est_intersect"], r["exact_intersect"]),
        ]:
            denom = max(exact, 1)
            assert abs(est - exact) / denom <= band, (r, est, exact)


def test_theta_overlap_below_k_is_exact(spark):
    """Groups at or below k retain every key (theta = 2^32): estimates
    — including the intersection — must be EXACT, not just in-band."""
    from big_data_table_spark.functions.sketches import theta_overlap_by_group

    rows = [(g, v) for g in ("a", "b") for v in range(40)] + [
        ("b", v) for v in range(40, 55)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = theta_overlap_by_group(df, "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["est_a"], r["est_b"], r["est_intersect"]) == (40.0, 55.0, 40.0)
    assert (r["exact_a"], r["exact_b"], r["exact_intersect"]) == (40, 55, 40)


# --------------------------------------------------------------------- #
# A24: print head-of-first-node + tail-of-last-node (reference
# big.data.table.R:49-74) — the full output contract
# --------------------------------------------------------------------- #


def _bdt(df):
    from big_data_table_spark.core import BigDataTable

    return BigDataTable(df)


def test_print_head_first_tail_last_with_separator(spark):
    """4 partitions of spark.range hold [0..24][25..49][50..74][75..99]:
    print(topn=3) must show 0,1,2 from the FIRST partition, '---', then
    97,98,99 from the LAST — tail without a repeated column header."""
    df = spark.range(0, 100, 1, numPartitions=4)
    out = _bdt(df).print_(topn=3)
    lines = out.splitlines()
    assert lines[0] == "id"
    assert lines[1:4] == ["0", "1", "2"]
    assert lines[4] == "---"
    assert lines[5:] == ["97", "98", "99"]


def test_print_single_node_warns(spark):
    import warnings as W

    df = spark.range(0, 10, 1, numPartitions=1)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        out = _bdt(df).print_(topn=2)
    assert any("single node" in str(w.message) for w in rec)
    assert "---" in out


def test_print_empty_first_node_warns(spark):
    """Filtering away partition 0's rows leaves the first node empty —
    the reference warns and prints only the tail side of the block."""
    import warnings as W

    df = spark.range(0, 100, 1, numPartitions=4).filter(F.col("id") >= 25)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        out = _bdt(df).print_(topn=2)
    assert any("First node" in str(w.message) for w in rec)
    lines = out.splitlines()
    assert lines[0] == "---"
    assert lines[1:] == ["98", "99"]


def test_print_empty_table_messages(spark):
    df = spark.range(0, 10).filter(F.col("id") < 0)
    out = _bdt(df).print_()
    assert out == "Empty data.table (0 rows) of 1 col: id"
    wide = df.selectExpr(*[f"id AS c{i}" for i in range(8)])
    out = _bdt(wide).print_()
    assert out.startswith("Empty data.table (0 rows) of 8 cols: c0,c1,c2,c3,c4,c5")
    assert out.endswith("...")
    nul = df.drop("id")
    assert _bdt(nul).print_() == "Null data.table (0 rows and 0 cols)"


def test_fold64_identity_unchanged_for_nonnegative(spark):
    """The normalization is a no-op for nonnegative input — the fold is
    still the identity below 2^32, so every recorded driver hash from
    r3-r5 stays valid."""
    df = spark.range(1, 1001).selectExpr("id AS v")
    out = df.selectExpr(f"{SK._fold64_sql('v', SPARK)} AS f", "v").collect()
    assert all(r["f"] == r["v"] for r in out)


def test_subword_count_plan_broadcasts_wordtok(spark, sf_dir):
    """The per-doc count joins the tiny word-type token table onto the
    corpus word stream — that side must be a broadcast join (at 100 TB
    the word-type table is vocabulary-sized; a shuffle join here would
    re-shuffle the full token stream)."""
    from big_data_table_spark import catalog as C
    from big_data_table_spark.functions import subword as SW
    from big_data_table_spark.plans.explainer import broadcast_join_count

    C.register_views(spark, sf_dir)
    df = SW.subword_token_counts(spark)
    assert broadcast_join_count(df) >= 1
