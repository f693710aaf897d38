"""Physical-plan shape pins — the 100 TB honesty checks (SURVEY.md §4.3 /
the project brief): filters reach the parquet scan, projections prune the
read schema, small dims broadcast, top-k avoids a global sort, bucketed
joins avoid the exchange, and the observability layer reports row metrics.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.operators.skew import salted_agg, salted_broadcast_left
from big_data_table_spark.plans import (
    QueryLog,
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    has_pushed_filters,
)
from big_data_table_spark.sources.readers import Tables


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = CATALOG["q1_pricing_summary"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filters(df), plan
    # column pruning: the scan must NOT read the join keys we don't touch
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    # codegen coverage is only visible on a non-adaptive plan (AQE hides
    # codegen info until execution)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = CATALOG["q1_pricing_summary"].fn(spark, sf_dir)
        assert codegen_stage_count(df2) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_filter_project_reads_three_columns(spark, sf_dir):
    df = CATALOG["filter_project"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_linenumber", "l_quantity"):
        assert col in read_schema
    assert "l_extendedprice" not in read_schema
    assert has_pushed_filters(df)


def test_lookup_join_broadcasts(spark, sf_dir):
    df = CATALOG["lookup_join_nation_region"].fn(spark, sf_dir)
    assert broadcast_join_count(df) >= 1


def test_supplier_chain_double_broadcast_no_fact_shuffle(spark, sf_dir):
    df = CATALOG["supplier_chain"].fn(spark, sf_dir)
    assert broadcast_join_count(df) == 2
    # the only exchange should be the final groupBy — no join shuffles
    assert exchange_count(df) == 1


def test_topk_uses_take_ordered(spark, sf_dir):
    df = CATALOG["topk_orders"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_grouped_agg_single_exchange(spark, sf_dir):
    """partial → exchange → final: exactly one shuffle for a groupBy."""
    df = CATALOG["grouped_sum_by_year"].fn(spark, sf_dir)
    assert exchange_count(df) == 1


def test_salted_agg_matches_direct(spark, sf_dir):
    li = Tables(spark, sf_dir).lineitem
    direct = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"),
        )
        .toPandas()
    )
    salted = salted_agg(
        li,
        by="l_returnflag",
        partial={
            "n": F.count(F.lit(1)),
            "qty": F.sum(F.col("l_quantity").cast("decimal(18,6)")),
        },
        merge={"n": F.sum("n").cast("bigint"), "qty": F.sum("qty").cast("decimal(28,6)")},
        n_salts=8,
    ).toPandas()
    m = direct.merge(salted, on="l_returnflag", suffixes=("_d", "_s"))
    assert (m["n_d"] == m["n_s"]).all()
    assert (m["qty_d"].astype(float) == m["qty_s"].astype(float)).all()


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    t = Tables(spark, sf_dir)
    left = t.lineitem.select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "k"
    )
    right = t.orders.select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = left.join(right, on="k", how="inner")
    skewed = salted_broadcast_left(left, right, on="k", hot_threshold=3)
    assert plain.count() == skewed.count()
    a = plain.agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s")).collect()[0]["s"]
    b = skewed.agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s")).collect()[0]["s"]
    assert a == b


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate the join: the sort-merge join runs with
    NO shuffle exchange on either side — the pre-partitioning pattern that
    replaces the reference's load-time keyed sharding
    (big.data.table.R:194-198) at warehouse scale."""
    t = Tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (
        t.lineitem.select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .option("path", str(tmp_path / "li_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_b")
    )
    (
        t.orders.select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .option("path", str(tmp_path / "o_b"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_b")
    )
    joined = spark.table("li_b").join(
        spark.table("o_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = formatted_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == t.lineitem.count()
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE o_b")


def test_query_log_records_rows(spark, sf_dir):
    """Observability (reference bdt.eval.log / logR audit,
    big.data.table.R:156-175): per-query out_rows + timing recorded."""
    log = QueryLog()
    df = CATALOG["group_count"].fn(spark, sf_dir)
    rows = log.run("group_count", df)
    assert len(log.rows) == 1
    entry = log.rows[0]
    assert entry.name == "group_count"
    assert entry.out_rows == len(rows) > 0
    assert entry.elapsed > 0


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """Runtime evidence that AQE re-plans: a grouped aggregate launched
    with 8 shuffle partitions over tiny data coalesces them after
    execution (AQEShuffleRead coalesced in the final adaptive plan)."""
    from big_data_table_spark.sources.readers import Tables

    li = Tables(spark, sf_dir).lineitem
    df = li.groupBy("l_returnflag").count()
    df.collect()  # execute so AQE finalizes
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan.lower(), plan


def test_neardup_verify_broadcast_is_size_gated(spark, sf_dir):
    """VERDICT r2 #5: the verify joins in embedding_neardup_lsh broadcast
    only under the row threshold; above it the plan falls through to a
    shuffled join — the 100 TB path is code, not a comment."""
    from big_data_table_spark.functions.similarity import embedding_neardup_lsh
    from big_data_table_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    below = embedding_neardup_lsh(emb)  # fixture rows << default threshold
    plan_below = below._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_below

    # above the gate no hint is emitted; Catalyst stats then decide — at
    # fixture scale they'd still auto-broadcast the tiny side, so pin the
    # unhinted strategy by turning auto-broadcast off (what the stats do
    # at real scale)
    # save/restore the PRE-TEST value — `conf.unset` resets to the session
    # default and would silently clobber a custom threshold set elsewhere
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        above = embedding_neardup_lsh(emb, broadcast_max_bytes=0)
        plan_above = above._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_above
        assert "SortMergeJoin" in plan_above or "ShuffledHashJoin" in plan_above
        b = sorted(map(tuple, above.select("vec_a", "vec_b").collect()))
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    # hashes unchanged: both strategies produce the same pairs
    a = sorted(map(tuple, below.select("vec_a", "vec_b").collect()))
    assert a == b and len(a) > 0
