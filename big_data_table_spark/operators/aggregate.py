"""Aggregation operators.

Re-expresses the reference's aggregation surface (SURVEY.md §2
"Aggregations") with Catalyst's automatic partial→final split replacing the
reference's manual ``outer.aggregate`` protocol (big.data.table.R:138-151) —
the correctness trap analyzed in SURVEY.md §4.2 (``.N`` re-aggregation
returning the count of partials, mean-of-means) cannot occur here.

Scale notes: every grouped aggregate below is a map-side partial aggregate +
one shuffle on the group keys + final aggregate; high-cardinality keys
(``l_orderkey``) stay balanced under hash partitioning, and AQE coalesces
the post-shuffle partitions.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core import NODE_COL, NODE_REF


def agg_all(
    df: DataFrame,
    by: str | Iterable[str],
    fn: Callable[[str], Column] = F.sum,
    cols: Iterable[str] | None = None,
    prefix: str = "",
) -> DataFrame:
    """``lapply(.SD, fn)`` — aggregate every non-group column (reference
    README.md:220-224, tests-06-readme.R:244-253).  Numeric columns only by
    default, matching what ``sum``/``mean`` over ``.SD`` does in practice.
    """
    by = [by] if isinstance(by, str) else list(by)
    if cols is None:
        numeric = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}
        cols = [
            c
            for c, t in df.dtypes
            if c not in by and (t in numeric or t.startswith("decimal"))
        ]
    return df.groupBy(*by).agg(*[fn(c).alias(prefix + c) for c in cols])


def partials(
    df: DataFrame,
    by: str | Iterable[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-shard partial aggregation — the reference's *default* result
    shape (``outer.aggregate=FALSE``, big.data.table.R:138-151; pinned by
    tests-04-sub-.big.data.table.R:23-32 as nrow == nodes × groups).
    Exposed as an opt-in diagnostic: group keys are prefixed with the
    physical partition id ``.node``."""
    by = [by] if isinstance(by, str) else list(by)
    return (
        df.withColumn(NODE_COL, F.spark_partition_id())
        .groupBy(F.col(NODE_REF), *by)
        .agg(*[v.alias(k) for k, v in aggs.items()])
    )


def two_phase(
    df: DataFrame,
    by: str | Iterable[str],
    aggs: dict[str, Column],
    final: dict[str, Column],
) -> DataFrame:
    """The reference's manual two-phase pattern
    ``bdt[, .(v=sum(v)), k][, .(v=sum(v)), k]`` (README.md:166-178,
    tests-06-readme.R:135-164).  In Spark a single ``groupBy.agg`` already
    executes partial→final; this helper exists to pin the *chained* form's
    equivalence in tests (and for re-aggregating ``partials`` output)."""
    by = [by] if isinstance(by, str) else list(by)
    phase1 = partials(df, by, aggs)
    return phase1.groupBy(*by).agg(*[v.alias(k) for k, v in final.items()])


def dsum(col: str | Column, scale: int = 6) -> Column:
    """Deterministic double sum: cast to decimal before summing so the
    result is independent of partition count and accumulation order, then
    back to double.  Floating-point ``sum`` is non-associative — the same
    query on 32 vs 1000 partitions would differ in the last bits; exact
    decimal accumulation makes results bit-stable and oracle-comparable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 6) -> Column:
    """Deterministic double mean via exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(c)
    )
