"""Round-8 builders: the persisted Count-Min day store (completing the
five-sketch store matrix), classic-analytics batch, sequence/funnel
windows, and LLM-pipeline calibration reports (builders only,
registration stays in catalog.py)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog_base import register_views
from .catalog_r5 import _ROLLUP_RANGE
from .functions.portable import DUCK, SPARK
from .sources.readers import Tables


# ------------------------------------------------------------------ #
# persisted CMS day store — the ADDITIVE member of the store matrix
# ------------------------------------------------------------------ #

def cms_rollup_persisted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted Count-Min day store, full verb cycle end-to-end
    (functions/sketches.py:cms_rollup_*): build per-day d×w counter
    tables for every day but the last, append the last day as TWO
    chunks (split by user parity), REPLAY one chunk's append (safe —
    the additive class's append verb is an idempotent per-(day, chunk)
    partition overwrite, so the replay rewrites the same counters
    instead of doubling them), compact the chunked day to one file,
    then answer the 14-day top-20 frequency query from the store alone.
    Counter addition is exact, so the SUM-merged range sketch is
    bit-for-bit the sketch a one-shot pass over the range would build —
    the oracle (`cms_heavy_hitters_sql` on the range-restricted events)
    proves it via the driver hash.  Store cost: ≤ days·chunks·d·w rows
    per range query, never an events rescan."""
    import shutil
    import tempfile

    from .functions import sketches as SK

    lo, hi = _ROLLUP_RANGE
    ev = Tables(spark, sf_dir).events
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(),
        f"bdt_cms_rollup_{spark.sparkContext.applicationId}_{sf_tag}",
    )
    shutil.rmtree(path, ignore_errors=True)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    SK.cms_rollup_build(ev.filter(day != hi), path)
    last = ev.filter(day == hi)
    SK.cms_rollup_append_chunk(last.filter(F.col("user_id") % 2 == 0), path, hi, 1)
    for _ in range(2):  # second run = the replay; idempotent by contract
        SK.cms_rollup_append_chunk(
            last.filter(F.col("user_id") % 2 == 1), path, hi, 2
        )
    SK.cms_rollup_compact(spark, path, hi)
    rng = ev.filter(day.between(lo, hi))
    top = (
        rng.groupBy(F.col("user_id").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "v")
        .limit(20)
        .localCheckpoint(eager=True)  # feeds both the probe and the audit
    )
    est = SK.cms_rollup_range_estimates(spark, path, lo, hi, top.select("v"))
    return top.join(est, "v").select(
        F.col("v").alias("key"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )


def _cms_rollup_persisted_oracle() -> str:
    from .functions import sketches as SK

    lo, hi = _ROLLUP_RANGE
    src = (
        f"(SELECT * FROM events "
        f"WHERE CAST(ts AS DATE) BETWEEN DATE '{lo}' AND DATE '{hi}')"
    )
    return SK.cms_heavy_hitters_sql(src, "user_id", topk=20, dialect=DUCK)


def cms_rollup_grouped_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CMS store's GROUP dimension (per-tenant/per-type frequency):
    one counter table per (day, event_type) in a single build pass, the
    shared `rollup_expire` retention verb dropping every pre-range day
    (proving expiry cannot touch a pruned range read), then per-type
    top-5 heavy hitters answered from the store's SUM-merged counters
    with the exact audit alongside.  Oracle:
    `cms_heavy_hitters_by_group_sql` on the range-restricted events —
    bit-identical estimates by exact counter addition."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from .functions import sketches as SK

    lo, hi = _ROLLUP_RANGE
    ev = Tables(spark, sf_dir).events
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(),
        f"bdt_cms_rollup_grp_{spark.sparkContext.applicationId}_{sf_tag}",
    )
    shutil.rmtree(path, ignore_errors=True)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    SK.cms_rollup_grouped_build(ev, path)
    SK.rollup_expire(path, lo)  # retention: pre-range days drop by dir
    rng = ev.filter(day.between(lo, hi))
    exact = rng.groupBy(
        F.col("event_type").alias("g"), F.col("user_id").cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    top = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.col("true_cnt").desc(), "v")
            ),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    est = SK.cms_rollup_grouped_range_estimates(
        spark, path, lo, hi, top.select("g", "v")
    )
    return top.join(est, ["g", "v"]).select(
        F.col("g").alias("event_type"),
        F.col("v").alias("key"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )


def _cms_rollup_grouped_range_oracle() -> str:
    from .functions import sketches as SK

    lo, hi = _ROLLUP_RANGE
    src = (
        f"(SELECT * FROM events "
        f"WHERE CAST(ts AS DATE) BETWEEN DATE '{lo}' AND DATE '{hi}')"
    )
    return SK.cms_heavy_hitters_by_group_sql(
        src, "event_type", "user_id", topk=5, dialect=DUCK
    )


# ------------------------------------------------------------------ #
# classic analytics batch
# ------------------------------------------------------------------ #

def orders_market_basket_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top-20 part pairs co-purchased in the
    same order, with lift (= P(a,b)/(P(a)P(b)) — the association-rule
    screen behind 'frequently bought together').

    Scale shape: the self-join is keyed by orderkey, so fan-out is
    bounded by items-per-order (≤7 in TPC-H) — sub-quadratic by
    construction, never a part×part cartesian; the distinct item table
    is checkpointed once (Spark re-inlines multi-referenced CTEs), the
    top-20 comes from TakeOrderedAndProject, and the per-part count
    lookups join the BROADCAST 20-row top side against the full count
    table, not the reverse."""
    register_views(spark, sf_dir)
    items = spark.sql(
        "SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem"
    ).localCheckpoint(eager=True)
    pcnt = items.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    n = items.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    a = items.select("ok", F.col("pk").alias("part_a"))
    b = items.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co_cnt"))
    )
    top = pairs.orderBy(F.col("co_cnt").desc(), "part_a", "part_b").limit(20)
    ca = pcnt.select(F.col("pk").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = pcnt.select(F.col("pk").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        ca.join(F.broadcast(top), "part_a")
        .join(cb.hint("broadcast"), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "co_cnt",
            F.round(
                F.col("co_cnt").cast("double")
                * F.col("n_orders")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


def _orders_market_basket_oracle() -> str:
    return """
WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pcnt AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY pk),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
pairs AS (
  SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS co_cnt
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk),
top AS (
  SELECT part_a, part_b, co_cnt FROM pairs
  ORDER BY co_cnt DESC, part_a, part_b LIMIT 20)
SELECT t.part_a, t.part_b, t.co_cnt,
  ROUND(CAST(t.co_cnt AS DOUBLE) * (SELECT n_orders FROM n)
    / (CAST(ca.cnt AS DOUBLE) * cb.cnt), 6) AS lift
FROM top t
JOIN pcnt ca ON ca.pk = t.part_a
JOIN pcnt cb ON cb.pk = t.part_b
"""


def orders_backlog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog profile: each order is 'open' from o_orderdate to
    its last line's ship date; per calendar month, the peak and
    trough of the number of simultaneously open orders — the classic
    interval-overlap count via +1/-1 boundary events and a running sum.

    Scale shape: the per-order interval table aggregates lineitem once
    (checkpointed — both delta branches reuse it), deltas collapse to
    ≤ distinct-days rows BEFORE the running sum, so the one
    unpartitioned window runs over a calendar-bounded table (~2.5k
    rows for 7 years — the house rule for global windows), never over
    orders.  Backlog only changes on boundary days, so the event-day
    MAX/MIN are the true monthly extremes."""
    from pyspark.sql import Window

    register_views(spark, sf_dir)
    per = spark.sql(
        """SELECT o.o_orderdate AS open_d, c.close_d
           FROM orders o JOIN (
             SELECT l_orderkey, MAX(l_shipdate) AS close_d
             FROM lineitem GROUP BY l_orderkey) c
           ON c.l_orderkey = o.o_orderkey"""
    ).localCheckpoint(eager=True)
    deltas = (
        per.select(F.col("open_d").alias("d"), F.lit(1).alias("x"))
        .unionAll(per.select(F.col("close_d").alias("d"), F.lit(-1).alias("x")))
        .groupBy("d")
        .agg(F.sum("x").cast("long").alias("delta"))
    )
    run = deltas.withColumn(
        "backlog",
        F.sum("delta")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return run.groupBy(
        F.year("d").cast("int").alias("year"),
        F.month("d").cast("int").alias("month"),
    ).agg(
        F.max("backlog").cast("long").alias("peak_backlog"),
        F.min("backlog").cast("long").alias("min_backlog"),
    )


def _orders_backlog_oracle() -> str:
    return """
WITH closes AS (
  SELECT l_orderkey, MAX(l_shipdate) AS close_d
  FROM lineitem GROUP BY l_orderkey),
per AS (
  SELECT o.o_orderdate AS open_d, c.close_d
  FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey),
deltas AS (
  SELECT d, CAST(SUM(x) AS BIGINT) AS delta FROM (
    SELECT open_d AS d, 1 AS x FROM per
    UNION ALL
    SELECT close_d AS d, -1 AS x FROM per) u
  GROUP BY d),
run AS (
  SELECT d, CAST(SUM(delta) OVER (
      ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS BIGINT) AS backlog
  FROM deltas)
SELECT CAST(year(d) AS INT) AS year, CAST(month(d) AS INT) AS month,
  CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
  CAST(MIN(backlog) AS BIGINT) AS min_backlog
FROM run GROUP BY 1, 2
"""


def _ltv_cohort_builder(dialect: str) -> str:
    """Cohort lifetime-value triangle: customers grouped by the month of
    their FIRST order; per (cohort month, month offset) the active
    customer count and exact-decimal revenue — the retention/LTV table
    every subscription dashboard draws.  Months are encoded
    y·12+m (monotone, so MIN(first month) is exact integer arithmetic,
    no date subtraction dialect drift); one first-order aggregate + one
    join + one cohort aggregate."""
    return """
WITH ords AS (
  SELECT o_custkey AS ck,
    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
    CAST(o_totalprice AS DECIMAL(18,6)) AS rev
  FROM orders),
fo AS (SELECT ck, MIN(m) AS m0 FROM ords GROUP BY ck)
SELECT
  CAST(FLOOR((f.m0 - 1) / 12.0) AS INT) AS cohort_year,
  CAST(f.m0 - 12 * FLOOR((f.m0 - 1) / 12.0) AS INT) AS cohort_month,
  CAST(o.m - f.m0 AS INT) AS month_offset,
  CAST(COUNT(DISTINCT o.ck) AS BIGINT) AS n_active,
  CAST(CAST(SUM(o.rev) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
FROM ords o JOIN fo f ON f.ck = o.ck
GROUP BY 1, 2, 3
"""


def _last_touch_builder(dialect: str) -> str:
    """Last-touch attribution: each purchase is credited to the most
    recent NON-purchase event by the same user within a 7-day window
    ('direct' when none) — credit counts and exact-decimal credited
    revenue per touch type.  The carried touch is a single MAX over a
    per-user window of '<zero-padded epoch>|<type>' strings: the string
    MAX is the latest preceding touch (ties break on type,
    deterministically, in both engines), so no IGNORE NULLS dialect
    drift and no self-join.  The window is user-partitioned — the
    100 TB shape."""
    from .functions.portable import epoch_s

    es = epoch_s("ts", dialect)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
    CAST(value AS DECIMAL(18,6)) AS val, {es} AS es
  FROM events),
w AS (
  SELECT user_id, event_type, es, val,
    MAX(CASE WHEN event_type <> 'purchase'
        THEN lpad(CAST(es AS STRING), 12, '0') || '|' || event_type END)
      OVER (PARTITION BY user_id ORDER BY es, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM ev),
p AS (
  SELECT CASE
      WHEN touch IS NULL THEN 'direct'
      WHEN es - CAST(substr(touch, 1, 12) AS BIGINT) > 604800 THEN 'direct'
      ELSE substr(touch, 14) END AS touch_type,
    val
  FROM w WHERE event_type = 'purchase')
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(CAST(SUM(val) AS DECIMAL(38,6)) AS DOUBLE) AS credited_value
FROM p GROUP BY touch_type
"""
