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


def histogram_quantiles(
    df: DataFrame,
    by: str | Iterable[str],
    value_col: str,
    quantiles: Iterable[float] = (0.5, 0.9, 0.99),
    bin_width: float = 1000.0,
) -> DataFrame:
    """Per-group quantiles from a MERGEABLE fixed-bin histogram sketch —
    the 100 TB quantile path that exact ``percentile`` (full sort per
    group) cannot serve.

    The sketch is the (group, bin) → count table with equi-width bins
    anchored at 0: building it IS one map-side-combinable aggregation, so
    Catalyst's partial aggregate is the per-partition sketch and the
    shuffle merges sketches — no second pass, no data-dependent range
    scan, sketch size bounded by value range / bin_width regardless of
    row count.  (A t-digest via applyInPandas would route every row
    through Python for strictly worse plans at the same rank-error
    grain; the fixed-bin form keeps the whole pipeline JVM-side.)

    The quantile estimate for q is the LOWER EDGE of the first bin whose
    cumulative count reaches ceil(q·n) — deterministic and shared with
    the DuckDB oracle by construction; absolute error ≤ bin_width is
    asserted against exact percentiles in tests/test_operators.py.
    """
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by)
    sketch = (
        df.select(*by, (F.floor(F.col(value_col) / bin_width)).alias("bin"))
        .groupBy(*by, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*by).orderBy("bin")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*by))
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    hits = cum.select(*by, "bin", "cum", "n", qs).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    return hits.groupBy(*by, "q").agg(
        (F.min("bin") * F.lit(bin_width)).alias("est")
    )
