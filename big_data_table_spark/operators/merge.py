"""MERGE / CDC operators — upsert and SCD2 history without a lakehouse
format (Delta/Iceberg jars are absent; the anti-join + union formulation
is the portable equivalent, and the one you inline into ``foreachBatch``
for streaming CDC).

Scale notes: the anti-join shuffles on the key unless the update batch is
small — the normal case for CDC, so the updates side is broadcast by
default.  The SCD2 close-out touches only matched keys (semi join), never
rewrites unmatched history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE semantics (matched → replace, not matched → insert):
    ``updates ∪ (target ⟕̸ updates)``.  Column sets must match."""
    key = [key] if isinstance(key, str) else list(key)
    upd_keys = updates.select(*key).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    untouched = target.join(upd_keys, on=key, how="left_anti")
    return updates.unionByName(untouched)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the currently-open row of
    each updated key (``valid_to`` ← update's effective date) and append
    the update as the new open row.

    ``history`` carries ``valid_from``/``valid_to``; ``updates`` carries
    the business columns + ``effective_col``.  Rows of keys not updated
    pass through untouched.
    """
    key = [key] if isinstance(key, str) else list(key)
    upd_keys = F.broadcast(updates.select(*key).distinct())

    open_rows = history.filter(F.col(valid_to) == open_end)
    closed_rows = history.filter(F.col(valid_to) != open_end)

    eff = updates.select(
        *key, F.col(effective_col).alias("__eff")
    )
    newly_closed = (
        open_rows.join(F.broadcast(eff), on=key, how="inner")
        .withColumn(valid_to, F.col("__eff"))
        .drop("__eff")
    )
    still_open = open_rows.join(upd_keys, on=key, how="left_anti")

    new_versions = updates.withColumn(
        valid_from, F.col(effective_col)
    ).withColumn(valid_to, F.lit(open_end)).drop(effective_col)

    return closed_rows.unionByName(newly_closed).unionByName(still_open).unionByName(
        new_versions, allowMissingColumns=False
    )
