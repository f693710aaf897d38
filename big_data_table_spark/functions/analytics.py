"""Warehouse-analytics dual-dialect builders (cohort / retention
style reports over the orders fixture).

Reference behavioral anchor: the grouped-aggregation + self-join
surface the reference forwards to data.table (SURVEY.md §2 Layer B;
tests-06-readme.R:200-260) — these compose it into the standard
customer-lifecycle reports a warehouse runs.
"""

from __future__ import annotations

from .portable import DUCK, SPARK, epoch_s
from . import dedup as _dedup

__all__ = ["cohort_retention_sql", "dau_wau_sql", "split_balance_sql", "vocab_growth_sql", "grouped_corr_sql", "audience_overlap_sql"]


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
        f"SELECT /*+ BROADCAST(cs) */ {epoch_s('ac.cohort', dialect)} AS cohort_month, "
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
        "wau AS (SELECT /*+ BROADCAST(d) */ d.day, "
        "  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau "
        "  FROM days d JOIN du u "
        "  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day "
        "  GROUP BY d.day) "
        f"SELECT {epoch_s('dau.day', dialect)} AS day_s, dau.dau, wau.wau, "
        "ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness "
        "FROM dau JOIN wau ON dau.day = wau.day"
    )


def split_balance_sql(dialect: str) -> str:
    """Split-balance drift report: for every (split, lang) cell of the
    deterministic train/val/test assignment, the within-split share vs
    the overall corpus share, and the absolute drift — the check a
    pipeline runs before accepting a split (a skewed val set silently
    biases every eval).

    The split CASE is the SAME content-hash assignment
    ``train_val_test_split`` uses (operators/sampling.py), so the
    report audits the production splitter, not a copy.  One fact-scale
    aggregate; the three share tables are split/lang-grain tiny."""
    from ..operators.sampling import split_case_sql

    case = split_case_sql(
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        dialect="spark" if dialect == SPARK else "duck",
    )
    return (
        f"WITH assigned AS (SELECT {case} AS split, lang FROM documents), "
        "cells AS (SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "  FROM assigned GROUP BY split, lang), "
        "split_tot AS (SELECT split, SUM(n) AS nt FROM cells GROUP BY split), "
        "lang_tot AS (SELECT lang, SUM(n) AS nl FROM cells GROUP BY lang), "
        "grand AS (SELECT SUM(n) AS g FROM cells) "
        "SELECT /*+ BROADCAST(st), BROADCAST(lt), BROADCAST(grand) */ c.split, c.lang, c.n, "
        "ROUND(CAST(c.n AS DOUBLE) / nt, 6) AS split_share, "
        "ROUND(CAST(nl AS DOUBLE) / g, 6) AS corpus_share, "
        "ROUND(ABS(CAST(c.n AS DOUBLE) / nt - CAST(nl AS DOUBLE) / g), 6) AS drift "
        "FROM cells c JOIN split_tot st ON c.split = st.split "
        "JOIN lang_tot lt ON c.lang = lt.lang CROSS JOIN grand"
    )


def vocab_growth_sql(dialect: str, n_buckets: int = 10) -> str:
    """Vocabulary-growth (Heaps-law) curve over word-3-gram shingles:
    cumulative distinct shingle count after each decile of the corpus
    (by doc_id order) — the report that says whether more data still
    buys new n-gram coverage.  (Unigrams would be degenerate on the
    fixture's ~50-word synthetic vocabulary — exhausted in decile 0;
    3-grams keep growing combinatorially, like real corpora do.)

    Scale shape: 'cumulative distinct' never materializes per-doc
    running sets; each shingle contributes ONE row at its first-seen
    doc (a map-side-combinable MIN aggregate), first-seen docs bucket
    into deciles, and the cumulative sum runs over the ≤n_buckets-row
    result — the window is over the tiny side."""
    return (
        f"WITH {_dedup._words_cte(dialect)}, "
        f"{_dedup._shingles_cte(dialect)}, "
        "bounds AS (SELECT MAX(doc_id) AS mx FROM documents), "
        "first_seen AS (SELECT sh, MIN(doc_id) AS fd FROM shingles GROUP BY sh), "
        "bucketed AS (SELECT LEAST(CAST(FLOOR(CAST(fd AS DOUBLE) / (mx + 1) "
        f"  * {n_buckets}) AS INT), {n_buckets - 1}) AS bucket, "
        "  COUNT(*) AS new_terms FROM first_seen CROSS JOIN bounds GROUP BY 1) "
        "SELECT CAST(bucket AS INT) AS bucket, "
        "CAST(new_terms AS BIGINT) AS new_terms, "
        "CAST(SUM(new_terms) OVER (ORDER BY bucket "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "  AS cum_vocab "
        "FROM bucketed"
    )


def grouped_corr_sql(dialect: str) -> str:
    """Per-group Pearson correlation and OLS slope of
    (l_quantity → l_extendedprice) — the reference's arbitrary-``j``
    aggregate surface (``dt[, cor(x, y), by]``) carried to exact
    cross-engine arithmetic.

    Moments (Σx, Σy, Σxy, Σx², Σy², n) accumulate in EXACT decimal —
    quantity is (9,2)-exact, extendedprice (12,2)-exact (verified 2 dp;
    narrow operands keep DuckDB's width-18 multiply path from
    overflowing) — then every moment casts through (38,6) to double and
    the correlation formula runs in IEEE arithmetic: identical operands
    → identical doubles on both engines (sqrt and the 4 arithmetic ops
    are correctly rounded per IEEE 754).  One map-side-combinable
    aggregate; no second pass."""
    x = "CAST(l_quantity AS DECIMAL(9,2))"
    y = "CAST(l_extendedprice AS DECIMAL(12,2))"

    def d(expr: str) -> str:
        return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,6)) AS DOUBLE)"

    return (
        "WITH m AS (SELECT l_returnflag, "
        "  CAST(COUNT(*) AS DOUBLE) AS n, "
        f"  {d(x)} AS sx, {d(y)} AS sy, "
        f"  {d(f'{x} * {y}')} AS sxy, "
        f"  {d(f'{x} * {x}')} AS sxx, "
        f"  {d(f'{y} * {y}')} AS syy "
        "  FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, "
        # NULLIF guards: a zero-variance group divides by zero, where
        # Spark (non-ANSI) yields NULL but DuckDB yields inf/nan — force
        # NULL on both engines instead
        "ROUND((n * sxy - sx * sy) / "
        "  SQRT(NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)), 6) "
        "  AS corr_qty_price, "
        "ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6) AS ols_slope "
        "FROM m"
    )


def audience_overlap_sql(dialect: str) -> str:
    """Audience-overlap matrix: for every event-type pair, the distinct
    users doing both, each side's audience size, and the Jaccard
    overlap — the cross-feature engagement report behind "users who X
    also Y".

    Scale shape: events dedup to (type, user) pairs first (the only
    fact-scale aggregate); the pair self-join fans out per USER, and a
    user holds at most |event_types| rows (5 here), so the join is
    bounded ≤ C(|types|, 2) pairs per user — never |events|², and the
    per-pair aggregate is map-side combinable."""
    return (
        "WITH du AS (SELECT DISTINCT event_type AS et, user_id FROM events), "
        "sizes AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY et), "
        "shared AS (SELECT a.et AS type_a, b.et AS type_b, "
        "  CAST(COUNT(*) AS BIGINT) AS n_both "
        "  FROM du a JOIN du b ON a.user_id = b.user_id AND a.et < b.et "
        "  GROUP BY a.et, b.et) "
        "SELECT /*+ BROADCAST(sa), BROADCAST(sb) */ type_a, type_b, n_both, "
        "sa.n AS n_a, sb.n AS n_b, "
        "ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard "
        "FROM shared JOIN sizes sa ON type_a = sa.et "
        "JOIN sizes sb ON type_b = sb.et"
    )
