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
