"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_table_spark.catalog``; every catalog
entry pairs the Spark query with its DuckDB oracle built to be
value-identical (exact decimal aggregation, shared md5-based hash
primitives, aligned integer widths — see catalog module docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_table_spark import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary over lineitem (the reference's canonical grouped-aggregation
    shape at full width)."""
    return _catalog.CATALOG["q1_pricing_summary"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline
    extensions).  Each callable takes (spark, sf_dir) → DataFrame."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``.
    Omitted keys (physical-partitioning diagnostics) get the driver's
    rows-only check."""
    return _catalog.oracle_sql()
