"""Warehouse-analytics dual-dialect builders (cohort / retention
style reports over the orders fixture).

Reference behavioral anchor: the grouped-aggregation + self-join
surface the reference forwards to data.table (SURVEY.md §2 Layer B;
tests-06-readme.R:200-260) — these compose it into the standard
customer-lifecycle reports a warehouse runs.
"""

from __future__ import annotations

from .portable import DUCK, SPARK, epoch_s

__all__ = ["cohort_retention_sql"]


def _months_between_int(later: str, earlier: str, dialect: str) -> str:
    """Whole-month difference between two month-truncated dates."""
    if dialect == SPARK:
        return f"CAST(months_between({later}, {earlier}) AS INT)"
    return f"CAST(date_diff('month', {earlier}, {later}) AS INT)"


def cohort_retention_sql(dialect: str) -> str:
    """Customer cohort-retention matrix: cohort = first-order month;
    for each (cohort, month offset) the distinct customers active that
    month and the retention rate vs cohort size.

    Scale shape: two aggregations over orders (first-order month, then
    distinct monthly activity — both map-side combinable on custkey)
    meet in an equi-join keyed on custkey; the cohort-size side is
    months-grain tiny and broadcast-able.  No window functions, no
    self-join on the fact table."""
    m = "date_trunc('month', o_orderdate)"
    off = _months_between_int("m", "cohort", dialect)
    rate = "ROUND(CAST(n_active AS DOUBLE) / n_cohort, 6)"
    return (
        f"WITH first_m AS (SELECT o_custkey AS c, MIN({m}) AS cohort "
        "  FROM orders GROUP BY o_custkey), "
        f"activity AS (SELECT DISTINCT o_custkey AS c, {m} AS m FROM orders), "
        "cohort_sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort "
        "  FROM first_m GROUP BY cohort), "
        "active AS (SELECT cohort, "
        f"  {off} AS month_offset, "
        "  CAST(COUNT(DISTINCT a.c) AS BIGINT) AS n_active "
        "  FROM activity a JOIN first_m f ON a.c = f.c "
        f"  GROUP BY cohort, {off}) "
        f"SELECT {epoch_s('ac.cohort', dialect)} AS cohort_month, "
        "month_offset, n_active, n_cohort, "
        f"{rate} AS retention "
        "FROM active ac JOIN cohort_sizes cs ON ac.cohort = cs.cohort"
    )
