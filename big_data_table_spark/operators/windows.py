"""Window / ordering operators (engine extensions; SURVEY.md §2 notes the
reference has no window functions — its head/tail preview,
big.data.table.R:62-66, is the closest thing).

Scale notes: a window with ``partitionBy`` shuffles once on the partition
keys; an *unpartitioned* ordered window collapses to a single task and is
forbidden in the hot path here (global top-k uses the
per-partition-then-merge form Spark implements for ``orderBy().limit()``,
i.e. TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global ordered top-k.  Physical plan is TakeOrderedAndProject:
    per-partition heap + driver merge of k·P rows — O(k) memory, no global
    sort shuffle."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    by: str | Iterable[str],
    order: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group via ``row_number`` over a partitioned window.
    Deterministic only when ``order`` is a total order within each group —
    callers must include a tie-break key."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running(
    df: DataFrame,
    by: str | Iterable[str],
    order: list[Column],
    aggs: dict[str, Column],
) -> DataFrame:
    """Running (cumulative) aggregates over an ordered per-group frame."""
    by = [by] if isinstance(by, str) else list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select("*", *[v.over(w).alias(k) for k, v in aggs.items()])


def sessionize(
    df: DataFrame,
    user: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event of the same ``user`` exceeds ``gap_seconds``.
    lag → gap flag → cumulative sum, two window passes over one shuffle on
    ``user``.  (Streaming equivalent: ``F.session_window`` — see
    ``streaming/events.py``.)"""
    w = Window.partitionBy(user).orderBy(F.col(ts).asc())
    # cast through timestamp first: TIMESTAMP_NTZ → BIGINT is not a legal
    # direct cast, and NTZ → TIMESTAMP is exact under the pinned UTC
    # session tz (sources/readers.py:ensure_session_confs)
    tsec = F.col(ts).cast("timestamp").cast("long")
    gap = tsec - F.lag(tsec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")


def two_phase_position(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    out: str = "pos",
) -> DataFrame:
    """Global 0-based position in ``order_cols`` order WITHOUT a global
    sort — the generalized form of the packing/training-order/decile
    scheme: an in-bucket ``row_number`` partitioned by ``bucket`` plus
    a cumulated bucket-count offset table broadcast back.  REQUIREMENT:
    ``bucket`` must be monotone non-decreasing along the total order
    ``order_cols`` defines (equal-ordering rows must share a bucket),
    and the number of distinct buckets must be bounded by construction
    (a hash prefix, a value band, a calendar day) — the offset window
    runs over one row per bucket.  Exactly the positions a single
    ``ROW_NUMBER() OVER (ORDER BY ...)`` would assign."""
    d = df.withColumn("_tp_b", bucket)
    w_in = Window.partitionBy("_tp_b").orderBy(*order_cols)
    d = d.withColumn(out, F.row_number().over(w_in) - 1)
    totals = d.groupBy("_tp_b").agg(F.count(F.lit(1)).alias("_tp_n"))
    w_off = Window.orderBy("_tp_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_tp_b", F.coalesce(F.sum("_tp_n").over(w_off), F.lit(0)).alias("_tp_off")
    )
    return (
        d.join(F.broadcast(offsets), "_tp_b")
        .withColumn(out, (F.col(out) + F.col("_tp_off")).cast("long"))
        .drop("_tp_b", "_tp_off")
    )
