"""Warehouse-analytics dual-dialect builders (cohort / retention
style reports over the orders fixture).

Reference behavioral anchor: the grouped-aggregation + self-join
surface the reference forwards to data.table (SURVEY.md §2 Layer B;
tests-06-readme.R:200-260) — these compose it into the standard
customer-lifecycle reports a warehouse runs.
"""

from __future__ import annotations

from .portable import DUCK, SPARK, epoch_s

__all__ = ["cohort_retention_sql", "dau_wau_sql"]


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


def dau_wau_sql(dialect: str) -> str:
    """Rolling engagement report: per day, the distinct active users
    (DAU), the 7-day rolling distinct users (WAU), and the DAU/WAU
    stickiness ratio.

    Rolling COUNT(DISTINCT) cannot ride a window frame in either
    engine; the scalable form is the standard day-grid range join:
    dedup events to (day, user) pairs first (the ONLY fact-scale
    aggregate), then join the tiny day dimension (broadcast) against
    user-days with a 7-day range predicate — a bounded ≤7× fan-out of
    already-deduped pairs, never of raw events."""
    day = "date_trunc('day', ts)"
    return (
        f"WITH du AS (SELECT DISTINCT {day} AS day, user_id FROM events), "
        "days AS (SELECT DISTINCT day FROM du), "
        "dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day), "
        "wau AS (SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau "
        "  FROM days d JOIN du u "
        "  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
        "  GROUP BY d.day) "
        f"SELECT {epoch_s('dau.day', dialect)} AS day_s, dau.dau, wau.wau, "
        "ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness "
        "FROM dau JOIN wau ON dau.day = wau.day"
    )
