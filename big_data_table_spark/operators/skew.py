"""Skew mitigation — the patterns that keep hot keys from serializing a
1000-executor cluster (SURVEY.md §4.3: the reference has no shuffle at all,
so skew was the *user's* problem at load time; here it is an engine
concern).

Two tools, complementary to AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our sessions):

* :func:`salted_agg` — two-stage aggregation: group on (key, salt) first
  (spreads a hot key over N reducers), then re-aggregate by key.  Correct
  for any algebraic aggregate expressed as (partial, merge) pair; results
  are identical to the direct groupBy (pinned by oracle tests).
* :func:`salted_broadcast_left` — replicate-left/salt-right join for a
  skewed *join* key when the dimension is too big to broadcast whole but
  a hot-key subset is: split hot keys out, broadcast-join them, union
  with the sort-merge remainder.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    by: str | Iterable[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial`` aggregates run per (key, salt); ``merge`` combines the
    per-salt partials by key, referencing the partial output columns.
    e.g. count: partial ``{"n": F.count(F.lit(1))}``, merge
    ``{"n": F.sum("n")}``; mean: partials sum+count, merge sums + divide.

    The salt is ``pmod(hash-free round-robin)`` derived from
    ``spark_partition_id()`` — rows already co-located keep their
    locality, so stage 1 is map-side-only for the dominant key pattern.
    """
    by = [by] if isinstance(by, str) else list(by)
    salted = df.withColumn(SALT_COL, F.spark_partition_id() % n_salts)
    stage1 = salted.groupBy(SALT_COL, *by).agg(*[v.alias(k) for k, v in partial.items()])
    return stage1.groupBy(*by).agg(*[v.alias(k) for k, v in merge.items()])


def split_hot_keys(
    df: DataFrame, key: str, threshold: int
) -> tuple[DataFrame, DataFrame]:
    """Partition a table into (hot, cold) by key frequency — one count
    aggregation + a broadcast semi/anti join against the (small) hot-key
    list."""
    hot_keys = (
        df.groupBy(key).count().filter(F.col("count") > threshold).select(key)
    )
    hot = df.join(F.broadcast(hot_keys), on=key, how="left_semi")
    cold = df.join(F.broadcast(hot_keys), on=key, how="left_anti")
    return hot, cold


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_threshold: int,
) -> DataFrame:
    """Skew-aware inner join: hot-key rows (on the left) join their
    matching right rows via broadcast; cold rows take the normal shuffled
    path; results union.  Equivalent to ``left.join(right, on)`` —
    pinned by oracle tests — but immune to a single hot key pinning one
    reducer.

    At 100 TB: ``hot_threshold`` ≈ rows-per-healthy-task; the broadcast
    side is only the right rows matching hot keys (semi-join pruned), not
    the whole dimension.
    """
    hot_left, cold_left = split_hot_keys(left, on, hot_threshold)
    hot_right = right.join(
        F.broadcast(hot_left.select(on).distinct()), on=on, how="left_semi"
    )
    hot_joined = hot_left.join(F.broadcast(hot_right), on=on, how="inner")
    cold_joined = cold_left.join(right, on=on, how="inner")
    return hot_joined.unionByName(cold_joined)
