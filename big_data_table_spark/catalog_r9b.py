"""Round-9 wave-5 builders: relational-surface gaps (UNPIVOT, skyline /
Pareto frontier, blocked fuzzy matching), a mergeable moments sketch,
gap-fill imputation (IGNORE NULLS window), and the exact set-similarity
join via prefix filtering (entry glue — the algorithm lives in
functions/dedup.py).  Builders only — registration and driver-window
ordering stay in catalog.py (the r8 split's convention).

Engine facts these builders rely on (probed this round, both engines):
``UNPIVOT (v FOR k IN (...))`` parses with IDENTICAL text in Spark 4
and DuckDB 1.x and emits the column-name string as ``k``;
``levenshtein`` and ``quarter`` agree; ``events.value`` and
``o_totalprice`` are exactly 2-dp (``CAST(x AS DECIMAL(8,2)) = x``
row-for-row), so DECIMAL(8,2)/(18,2) quantization below is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog_base import register_views
from .functions.portable import SPARK, last_value_ignore_nulls


# ------------------------------------------------------------------ #
# UNPIVOT — the wide->long inverse of the pivot surface
# ------------------------------------------------------------------ #

def unpivot_quarter_revenue_builder(dialect: str) -> str:
    """Wide quarterly-revenue columns melted back to long form with the
    relational UNPIVOT operator — the inverse surface of
    ``pivot_linestatus`` (reference `dcast`/`melt` pairing).  The wide
    stage is one exact-decimal conditional aggregation; UNPIVOT itself
    is a zero-shuffle per-row flatMap (4 output rows per input row, no
    exchange).  The same SQL text parses in both engines (probed); the
    quarter label is the unpivoted column NAME, so both engines emit
    identical strings q1..q4."""
    q = "CAST(o_totalprice AS DECIMAL(18,2))"
    cols = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN quarter(o_orderdate) = {i} "
        f"THEN {q} END), 0) AS DOUBLE) AS q{i}"
        for i in (1, 2, 3, 4)
    )
    return f"""
WITH wide AS (
  SELECT o_orderpriority, {cols}
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, quarter, revenue
FROM wide UNPIVOT (revenue FOR quarter IN (q1, q2, q3, q4))
"""


# ------------------------------------------------------------------ #
# mergeable moments sketch — exact power sums -> shape statistics
# ------------------------------------------------------------------ #

def grouped_moments_builder(dialect: str) -> str:
    """Distribution-shape profile per event type — mean, population
    stddev, skewness, excess kurtosis — from EXACT decimal power sums
    S1..S4, the classic mergeable "moments sketch" (additive partials:
    map-side combinable, shard-mergeable, one pass; the reason this
    scales is the same reason ``grouped_correlation``'s moments do).

    Exactness: value is 2-dp (probed), so ``DECIMAL(8,2)`` quantization
    is lossless and every power stays inside both engines' exact decimal
    multiply paths — v^2 (17,4), v^3 (26,6); the 4th power is the ONE
    dialect split in the algebra: DuckDB overflow-checks a decimal
    multiply against the OPERAND width's own max (measured: (18,4)
    squared errors at 1.15e18 > 10^18-1) so its term upcasts to
    (19,4)x(19,4) = int128, while Spark — where (19,4)x(19,4) would hit
    the precision-39->38 cap and ROUND scale 8 to 7 — keeps the bare
    (17,4)x(17,4) = (35,8).  Both spellings are EXACT (no rounding on
    either path), so the engines still sum identical values.  Each sum
    casts through (38,6) to DOUBLE
    (the grouped_corr_sql discipline) and the moment formulas then run
    in IEEE arithmetic on identical operands; fractional powers are
    avoided (sigma^3 = m2*sqrt(m2), kurtosis divides by m2*m2)."""
    v = "CAST(value AS DECIMAL(8,2))"
    v2w = (
        f"({v} * {v})"
        if dialect == SPARK
        else f"CAST({v} * {v} AS DECIMAL(19,4))"
    )

    def d(expr: str) -> str:
        return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,6)) AS DOUBLE)"

    return f"""
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
    {d(v)} AS s1,
    {d(f'{v} * {v}')} AS s2,
    {d(f'({v} * {v}) * {v}')} AS s3,
    {d(f'{v2w} * {v2w}')} AS s4
  FROM events GROUP BY event_type),
c AS (
  SELECT event_type, n, s1 / n AS mean,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - 3 * (s1 / n) * (s2 / n)
      + 2 * ((s1 / n) * (s1 / n)) * (s1 / n) AS m3,
    s4 / n - 4 * (s1 / n) * (s3 / n)
      + 6 * ((s1 / n) * (s1 / n)) * (s2 / n)
      - 3 * (((s1 / n) * (s1 / n)) * ((s1 / n) * (s1 / n))) AS m4
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n,
  ROUND(mean, 6) AS mean,
  ROUND(SQRT(m2), 6) AS stddev_pop,
  ROUND(m3 / NULLIF(m2 * SQRT(m2), 0), 6) AS skewness,
  ROUND(m4 / NULLIF(m2 * m2, 0) - 3, 6) AS kurtosis_excess
FROM c
"""


# ------------------------------------------------------------------ #
# skyline / Pareto frontier
# ------------------------------------------------------------------ #

def _pareto_pts_cte() -> str:
    return """pts AS (
  SELECT p_brand, p_size,
    MIN(CAST(p_retailprice AS DECIMAL(12,2))) AS minp,
    CAST(COUNT(*) AS BIGINT) AS n_parts_at_size
  FROM part GROUP BY p_brand, p_size)"""


def parts_pareto_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand SKYLINE (Pareto frontier) of parts: maximize p_size,
    minimize p_retailprice — the classic dominance operator (Borzsony
    et al., ICDE'01) the reference's query surface lacks.  Spark form:
    one exchange to the (brand, size) grain, then a strict-preceding
    running MIN over sizes DESC *partitioned by brand* — the window
    input is bounded by |size domain| rows per brand (the house rule
    for global-order windows), sizes are unique within a brand after
    the group-by, and a point survives iff no strictly-larger size is
    as cheap.  The oracle states dominance directly (NOT EXISTS) — an
    algorithm-diverse pairing: window recurrence vs quadratic
    definition must agree point-for-point."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
WITH {_pareto_pts_cte()},
w AS (
  SELECT p_brand, p_size, minp, n_parts_at_size,
    MIN(minp) OVER (PARTITION BY p_brand ORDER BY p_size DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_larger
  FROM pts)
SELECT p_brand, p_size, CAST(minp AS DOUBLE) AS frontier_price,
  n_parts_at_size
FROM w WHERE best_larger IS NULL OR minp < best_larger
"""
    )


def parts_pareto_frontier_oracle() -> str:
    return f"""
WITH {_pareto_pts_cte()}
SELECT a.p_brand, a.p_size, CAST(a.minp AS DOUBLE) AS frontier_price,
  a.n_parts_at_size
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.p_brand = a.p_brand AND b.p_size >= a.p_size
    AND b.minp <= a.minp
    AND (b.p_size > a.p_size OR b.minp < a.minp))
"""


# ------------------------------------------------------------------ #
# blocked fuzzy matching (edit distance)
# ------------------------------------------------------------------ #

def part_name_fuzzy_builder(dialect: str) -> str:
    """Entity-resolution pairs: same-brand parts whose names are within
    edit distance 2 (``levenshtein`` agrees between engines — probed).
    The scale design is the standard blocked fuzzy join: a cheap
    equality BLOCK (p_brand) bounds the self-join, then a length-
    difference filter (|len a - len b| <= 2 is NECESSARY for edit
    distance <= 2) prunes before the quadratic distance evaluates —
    the same block-then-verify shape as the LSH pipeline, with the
    block key playing the band role.  At 100 TB the block key widens
    to (brand, length bucket); the verify stage is embarrassingly
    parallel either way."""
    return """
SELECT a.p_brand, a.p_partkey AS pk_a, b.p_partkey AS pk_b,
  a.p_name AS name_a, b.p_name AS name_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
"""


# ------------------------------------------------------------------ #
# gap-fill imputation (forward fill via IGNORE NULLS)
# ------------------------------------------------------------------ #

def events_forward_fill_builder(dialect: str) -> str:
    """Forward-fill imputation — the pandas ``ffill`` / kdb ``fills``
    surface: a deterministic mask NULLs every 5th event's value, then
    ``last_value IGNORE NULLS`` over the per-user time order carries
    the last observation forward (dialect-split spelling,
    portable.last_value_ignore_nulls; leading NULLs stay NULL).
    Aggregated to a per-type audit so the output is bounded: masked /
    filled / unfillable counts and the exact-decimal sum of the
    values actually imputed.  The window is user-partitioned (bounded
    per-user history — no global order), and the whole operator is one
    window pass + one aggregation."""
    lv = last_value_ignore_nulls("v", dialect)
    return f"""
WITH masked AS (
  SELECT event_type, user_id, ts, event_id,
    CASE WHEN event_id % 5 = 0 THEN NULL
         ELSE CAST(value AS DECIMAL(8,2)) END AS v
  FROM events),
filled AS (
  SELECT event_type, v,
    {lv} OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vf
  FROM masked)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  CAST(SUM(CASE WHEN v IS NULL AND vf IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT) AS n_filled,
  CAST(SUM(CASE WHEN vf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unfillable,
  CAST(CAST(SUM(CASE WHEN v IS NULL THEN vf END) AS DECIMAL(38,6))
    AS DOUBLE) AS imputed_sum
FROM filled GROUP BY event_type
"""


# ------------------------------------------------------------------ #
# stream-stream LEFT OUTER join (entry glue; impl in streaming/events)
# ------------------------------------------------------------------ #

def stream_left_outer_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.events import click_purchase_left_join

    register_views(spark, sf_dir)
    return click_purchase_left_join(spark, sf_dir, within_minutes=10)


def stream_left_outer_oracle() -> str:
    """Batch model of the watermarked left-outer stream-stream join.
    The join itself is the inner oracle's LEFT JOIN; the streaming part
    is the EMISSION rule for NULL-extended rows: a click is declared
    unmatched only once the query watermark passes the end of its join
    window.  With both sides watermarked, Spark's global watermark is
    the MIN over the two sides (each ``max event time - 30 min``) —
    modeled by the LEAST() horizon below; clicks whose window end is
    not strictly below it are withheld by the drained bounded stream
    (calibrated at sf0.001 AND sf0.01: the one-row difference between
    the single- and two-sided horizon at sf0.001 selects this form;
    microsecond timestamps keep the <-vs-<= boundary tie-free)."""
    return """
WITH mx AS (
  SELECT LEAST(
    MAX(CASE WHEN event_type = 'click' THEN ts END),
    MAX(CASE WHEN event_type = 'purchase' THEN ts END))
    - INTERVAL 30 MINUTE AS wm
  FROM events),
c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
      WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
      FROM events WHERE event_type = 'purchase')
SELECT c.click_id, p.purchase_id, c.user_id,
  CAST(floor(epoch(p.p_ts)) AS BIGINT)
    - CAST(floor(epoch(c.c_ts)) AS BIGINT) AS gap_seconds
FROM c CROSS JOIN mx m LEFT JOIN p
  ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
 AND p.p_ts <= c.c_ts + INTERVAL 10 MINUTE
WHERE p.purchase_id IS NOT NULL
   OR c.c_ts + INTERVAL 10 MINUTE < m.wm
"""
