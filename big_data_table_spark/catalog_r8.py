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
    with_a = ca.join(F.broadcast(top), "part_a")  # ≤20 rows out
    return (
        cb.join(F.broadcast(with_a), "part_b")  # ALWAYS broadcast the
        # bounded top-20 side; the full per-part count table streams
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


# ------------------------------------------------------------------ #
# sequence / funnel windows
# ------------------------------------------------------------------ #

def events_funnel_windowed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order, gap-bounded funnel (view → click → purchase, each
    step within 30 minutes of the previous): per-stage distinct-user
    counts.  Unlike the presence-based `events_funnel`, ORDER and GAP
    both matter — a click before its view, or 31 minutes after it,
    does not qualify — which is the MATCH_RECOGNIZE-shaped question
    answered here with two chained per-user window passes (the
    encoded last-touch MAX of `events_attribution_last_touch`): pass 1
    marks clicks with a qualifying view, pass 2 marks purchases with a
    qualifying click.  All windows are user-partitioned (the 100 TB
    shape); the qualified-click table is checkpointed because both the
    stage count and the second pass consume it."""
    from .functions.portable import epoch_s

    register_views(spark, sf_dir)
    ev = spark.sql(
        f"SELECT user_id, event_type, event_id, {epoch_s('ts', SPARK)} AS es"
        " FROM events"
    )
    from pyspark.sql import Window

    w1 = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vc = ev.filter(F.col("event_type").isin("view", "click")).withColumn(
        "last_view",
        F.max(F.when(F.col("event_type") == "view", F.col("es"))).over(w1),
    )
    qc = (
        vc.filter(
            (F.col("event_type") == "click")
            & F.col("last_view").isNotNull()
            & (F.col("es") - F.col("last_view") <= 1800)
        )
        .select("user_id", "event_id", "es")
        .localCheckpoint(eager=True)
    )
    u = qc.select("user_id", F.lit(0).alias("is_p"), "event_id", "es").unionAll(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.lit(1).alias("is_p"), "event_id", "es"
        )
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("es", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        u.withColumn(
            "last_qc", F.max(F.when(F.col("is_p") == 0, F.col("es"))).over(w2)
        )
        .filter(
            (F.col("is_p") == 1)
            & F.col("last_qc").isNotNull()
            & (F.col("es") - F.col("last_qc") <= 1800)
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_converted"))
    )
    viewers = ev.filter(F.col("event_type") == "view").agg(
        F.countDistinct("user_id").cast("long").alias("n_viewers")
    )
    clickers = qc.agg(
        F.countDistinct("user_id").cast("long").alias("n_qualified_clickers")
    )
    return viewers.crossJoin(clickers).crossJoin(conv)


def _events_funnel_windowed_oracle() -> str:
    from .functions.portable import epoch_s

    es = epoch_s("ts", DUCK)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, {es} AS es FROM events),
w1 AS (
  SELECT user_id, event_type, event_id, es,
    MAX(CASE WHEN event_type = 'view' THEN es END) OVER
      (PARTITION BY user_id ORDER BY es, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
  FROM ev WHERE event_type IN ('view', 'click')),
qc AS (
  SELECT user_id, event_id, es FROM w1
  WHERE event_type = 'click' AND last_view IS NOT NULL
    AND es - last_view <= 1800),
u AS (
  SELECT user_id, 0 AS is_p, event_id, es FROM qc
  UNION ALL
  SELECT user_id, 1 AS is_p, event_id, es FROM ev
  WHERE event_type = 'purchase'),
w2 AS (
  SELECT user_id, is_p, es,
    MAX(CASE WHEN is_p = 0 THEN es END) OVER
      (PARTITION BY user_id ORDER BY es, is_p, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_qc
  FROM u)
SELECT
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev
   WHERE event_type = 'view') AS n_viewers,
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM qc)
    AS n_qualified_clickers,
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM w2
   WHERE is_p = 1 AND last_qc IS NOT NULL AND es - last_qc <= 1800)
    AS n_converted
"""


# ------------------------------------------------------------------ #
# LLM-pipeline calibration reports
# ------------------------------------------------------------------ #

def minhash_estimate_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR calibration — the third honesty report next to
    `ann_recall_report` (IVF recall) and `dedup_lsh_recall_report` (LSH
    candidate recall): for every LSH candidate pair, the signature
    estimate of Jaccard (agreeing components / 12) against the exact
    n-gram Jaccard, grouped by agreement count: pair count, the
    estimate, mean exact similarity, and mean absolute error.  This is
    the number that says how far the 12-component signature can be
    trusted before the exact verify stage — i.e. whether
    estimate-threshold shortcuts are safe at production scale.

    Spark plan: signatures, band candidates, and the exact-Jaccard
    truth table each computed ONCE and checkpointed (CTE inlining would
    re-run the shingle pipeline per reference); candidates not in the
    truth table carry exact J = 0 via the left join."""
    from .functions import dedup as DD
    from .functions.dedup import N_HASHES

    register_views(spark, sf_dir)
    sigs = spark.sql(DD.minhash_signature_sql(SPARK)).localCheckpoint(eager=True)
    bands = spark.sql(DD.minhash_bands_sql(SPARK)).localCheckpoint(eager=True)
    cands = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    truth = DD.ngram_jaccard_pairs(spark, threshold=0.05).localCheckpoint(
        eager=True
    )  # DF form: the filtered-shingle set inside is checkpointed once
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(N_HASHES)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(N_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(N_HASHES)
    )
    per = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_agree", agree.cast("int"))
        .join(truth, ["doc_a", "doc_b"], "left")
        .withColumn("exact_j", F.coalesce(F.col("jaccard"), F.lit(0.0)))
        .withColumn(
            "abs_err",
            F.abs(
                F.col("n_agree") / F.lit(12).cast("double") - F.col("exact_j")
            ),
        )
    )
    return per.groupBy("n_agree").agg(
        F.round(F.col("n_agree").cast("double") / 12, 6).alias("est_jaccard"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("exact_j").cast("decimal(18,6)")).cast("decimal(38,6)")
            / F.count(F.lit(1)),
            6,
        ).cast("double").alias("mean_exact_jaccard"),
        F.round(
            F.sum(F.col("abs_err").cast("decimal(18,6)")).cast("decimal(38,6)")
            / F.count(F.lit(1)),
            6,
        ).cast("double").alias("mean_abs_err"),
    )


def _minhash_estimate_report_oracle() -> str:
    from .functions import dedup as DD
    from .functions.dedup import N_HASHES

    sigs = DD.minhash_signature_sql(DUCK)
    cands = DD.minhash_lsh_pairs_sql(DUCK)
    truth = DD.ngram_jaccard_pairs_sql(DUCK, threshold=0.05)
    agree = " + ".join(
        f"(CASE WHEN a.h{k} = b.h{k} THEN 1 ELSE 0 END)" for k in range(N_HASHES)
    )
    return f"""
WITH per AS (
  SELECT CAST({agree} AS INT) AS n_agree,
    COALESCE(t.jaccard, 0) AS exact_j
  FROM ({cands}) c
  JOIN ({sigs}) a ON a.doc_id = c.doc_a
  JOIN ({sigs}) b ON b.doc_id = c.doc_b
  LEFT JOIN ({truth}) t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
SELECT n_agree,
  ROUND(CAST(n_agree AS DOUBLE) / 12, 6) AS est_jaccard,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(ROUND(CAST(SUM(CAST(exact_j AS DECIMAL(18,6))) AS DECIMAL(38,6))
    / COUNT(*), 6) AS DOUBLE) AS mean_exact_jaccard,
  CAST(ROUND(CAST(SUM(CAST(ABS(CAST(n_agree AS DOUBLE) / 12 - exact_j)
      AS DECIMAL(18,6))) AS DECIMAL(38,6))
    / COUNT(*), 6) AS DOUBLE) AS mean_abs_err
FROM per GROUP BY n_agree
"""


def _corpus_burstiness_builder(dialect: str) -> str:
    """Term burstiness (Church–Gale variance-to-mean ratio of per-doc
    counts, zeros included): VMR ≈ 1 means Poisson scatter (function
    words), VMR >> 1 means the term clumps into few documents (topical
    / boilerplate) — the screen that separates stopword-like noise from
    content-bearing terms before vocabulary or quality decisions.  For
    the top-10 document-frequency terms: df, total count, and VMR.
    All moments are exact BIGINT sums cast to DOUBLE only inside the
    final closed-form ((tf2·n − tf²)/(tf·n)), so both engines compute
    the identical float."""
    from .functions.portable import arr_len, lateral_arr, split_ws

    w = split_ws("lower(text)", dialect)
    return f"""
WITH words AS (
  SELECT /*+ REPARTITION(32) */ doc_id, {w} AS w FROM documents),
docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', dialect)} >= 1),
tok AS (SELECT doc_id, tk FROM docs {lateral_arr('w', 'tk', dialect)}),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
perdoc AS (
  SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, tk),
stats AS (
  SELECT tk, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(c) AS BIGINT) AS tf,
    CAST(SUM(c * c) AS BIGINT) AS tf2
  FROM perdoc GROUP BY tk),
top AS (SELECT tk, df, tf, tf2 FROM stats ORDER BY df DESC, tk LIMIT 10)
SELECT tk AS term, df, tf,
  ROUND((CAST(tf2 AS DOUBLE) * (SELECT n FROM nd) - CAST(tf AS DOUBLE) * tf)
    / (CAST(tf AS DOUBLE) * (SELECT n FROM nd)), 6) AS vmr
FROM top
"""


def vocab_oov_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary out-of-coverage curve: rank word types by frequency on
    the TRAIN split (doc_id % 5 != 0), then measure on the held-out
    split what fraction of token OCCURRENCES fall outside the top-N
    vocabulary for N in {100, 500, 1000}, plus the count of never-seen
    types — the curve that sizes a vocabulary (or budgets a subword
    fallback) before training a tokenizer.

    Spark plan: the global frequency rank comes from
    `two_phase_position` (bucket = capped count band), NOT a global
    ROW_NUMBER — the oracle's single ORDER BY proves the distributed
    rank is the global one, the same equivalence `training_order_
    shuffle` pins; the token table is checkpointed (train and test both
    consume it); the 3-row size table broadcasts."""
    from .functions.portable import arr_len, lateral_arr, split_ws
    from .operators.windows import two_phase_position

    register_views(spark, sf_dir)
    w = split_ws("lower(text)", SPARK)
    tok = spark.sql(
        f"""WITH words AS (
          SELECT /*+ REPARTITION(32) */ doc_id, {w} AS w FROM documents),
        docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', SPARK)} >= 1)
        SELECT doc_id, tk FROM docs {lateral_arr('w', 'tk', SPARK)}"""
    ).localCheckpoint(eager=True)
    freq = (
        tok.filter(F.col("doc_id") % 5 != 0)
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ranked = two_phase_position(
        freq,
        -F.least(F.col("c"), F.lit(4096)),
        [F.col("c").desc(), F.col("tk")],
        out="pos",
    )
    testc = (
        tok.filter(F.col("doc_id") % 5 == 0)
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
    )
    j = testc.join(ranked.select("tk", "pos"), "tk", "left")
    sizes = spark.sql("SELECT 100 AS n UNION ALL SELECT 500 UNION ALL SELECT 1000")
    oov = F.when(F.col("pos").isNull() | (F.col("pos") >= F.col("n")), F.col("tc")).otherwise(F.lit(0))
    return (
        j.crossJoin(F.broadcast(sizes))
        .groupBy("n")
        .agg(
            F.sum("tc").cast("long").alias("n_test_tokens"),
            F.sum(oov).cast("long").alias("n_oov_tokens"),
            F.round(F.sum(oov) / F.sum("tc").cast("double"), 6).alias("oov_rate"),
            F.sum(F.col("pos").isNull().cast("long")).cast("long").alias(
                "n_unseen_types"
            ),
        )
        .select(
            F.col("n").cast("int").alias("vocab_size"),
            "n_test_tokens",
            "n_oov_tokens",
            "oov_rate",
            "n_unseen_types",
        )
    )


def _vocab_oov_curve_oracle() -> str:
    from .functions.portable import arr_len, lateral_arr, split_ws

    w = split_ws("lower(text)", DUCK)
    return f"""
WITH words AS (
  SELECT doc_id, {w} AS w FROM documents),
docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', DUCK)} >= 1),
tok AS (SELECT doc_id, tk FROM docs {lateral_arr('w', 'tk', DUCK)}),
freq AS (
  SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok
  WHERE doc_id % 5 <> 0 GROUP BY tk),
ranked AS (
  SELECT tk, ROW_NUMBER() OVER (ORDER BY c DESC, tk) - 1 AS pos FROM freq),
testc AS (
  SELECT tk, CAST(COUNT(*) AS BIGINT) AS tc FROM tok
  WHERE doc_id % 5 = 0 GROUP BY tk),
j AS (
  SELECT t.tk, t.tc, r.pos FROM testc t LEFT JOIN ranked r ON r.tk = t.tk),
sizes AS (SELECT 100 AS n UNION ALL SELECT 500 UNION ALL SELECT 1000)
SELECT CAST(n AS INT) AS vocab_size,
  CAST(SUM(tc) AS BIGINT) AS n_test_tokens,
  CAST(SUM(CASE WHEN pos IS NULL OR pos >= n THEN tc ELSE 0 END) AS BIGINT)
    AS n_oov_tokens,
  ROUND(SUM(CASE WHEN pos IS NULL OR pos >= n THEN tc ELSE 0 END)
    / CAST(SUM(tc) AS DOUBLE), 6) AS oov_rate,
  CAST(SUM(CASE WHEN pos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unseen_types
FROM j CROSS JOIN sizes GROUP BY n
"""


def _decon_width_sql(dialect: str, w: int, eval_source: str = "src0") -> str:
    """One width's corpus-level decontamination summary: per training
    doc the fraction of its distinct word-``w``-gram shingles appearing
    anywhere in the eval source, rolled up to (width, n_train_docs,
    n_flagged at >= 0.5, mean contamination).  The per-doc stage is the
    `decontamination_sql` shape with the shingle width parametric —
    eval shingles stay a DISTINCT broadcast-scale probe side."""
    from .functions.portable import arr_el, arr_len, lateral_seq, split_ws

    words = split_ws("lower(text)", dialect)
    el = lambda i: arr_el("w", i, dialect)  # noqa: E731
    sh = " || ' ' || ".join(el(f"i + {k}") if k else el("i") for k in range(w))
    lat = lateral_seq("1", f"{arr_len('w', dialect)} - {w - 1}", "i", dialect)
    frac = "ROUND(CAST(n_hit AS DOUBLE) / n_sh, 6)"
    return f"""
SELECT {w} AS ngram_w,
  CAST(COUNT(*) AS BIGINT) AS n_train_docs,
  CAST(SUM(CASE WHEN {frac} >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(ROUND(CAST(SUM(CAST({frac} AS DECIMAL(18,6))) AS DECIMAL(38,6))
    / COUNT(*), 6) AS DOUBLE) AS mean_contamination
FROM (
  WITH words AS (
    SELECT /*+ REPARTITION(32) */ doc_id, {words} AS w FROM documents),
  docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', dialect)} >= {w}),
  shingles AS (
    SELECT DISTINCT doc_id, sh FROM (
      SELECT doc_id, {sh} AS sh FROM docs {lat}) _s),
  ds AS (
    SELECT s.doc_id, s.sh, d.source FROM shingles s
    JOIN documents d ON s.doc_id = d.doc_id),
  eval_sh AS (SELECT DISTINCT sh FROM ds WHERE source = '{eval_source}')
  SELECT t.doc_id, COUNT(*) AS n_sh,
    SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM (SELECT doc_id, sh FROM ds WHERE source <> '{eval_source}') t
  LEFT JOIN eval_sh e ON t.sh = e.sh GROUP BY t.doc_id) _per
"""


_DECON_WIDTHS = (2, 3, 5)


def decontamination_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination CALIBRATION curve: the corpus-level overlap
    summary at shingle widths 2/3/5 — short shingles over-flag (common
    phrases), long shingles under-flag (miss paraphrase), and this
    table is how a pipeline picks the width+threshold before running
    the real `decontamination_report` drop.  Each width's block runs
    once as its own plan (a DataFrame union, so Spark never re-inlines
    a shared CTE three times); the eval shingle set stays the
    broadcast-scale probe side at every width."""
    register_views(spark, sf_dir)
    out = None
    for w in _DECON_WIDTHS:
        df = spark.sql(_decon_width_sql(SPARK, w))
        out = df if out is None else out.unionAll(df)
    return out


def _decontamination_curve_oracle() -> str:
    return "\nUNION ALL\n".join(_decon_width_sql(DUCK, w) for w in _DECON_WIDTHS)


def embedding_norm_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile with robust outliers: n, exact median
    norm, MAD, and the count beyond the 3·1.4826·MAD robust-z cut —
    the embedding-space health check (collapsed or exploding vectors
    show up as norm outliers long before recall drops).  Norms are the
    shared in-order array fold (`similarity.dot` ≡ list_dot_product,
    the equivalence every embedding oracle already rests on); medians
    are the pinned percentile ≡ quantile_cont equivalence; the ≤|labels|
    median/MAD tables broadcast back, so raw vectors shuffle never and
    norms once per aggregate — `grouped_mad_outliers` lifted to the
    embeddings table."""
    from .functions.similarity import dot
    from .sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    nv = emb.select(
        "label",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).localCheckpoint(eager=True)  # the norm fold runs ONCE; median,
    # deviation, and outlier passes all reuse it (the multi-consumer
    # checkpoint discipline)
    med = nv.groupBy("label").agg(F.percentile("nrm", F.lit(0.5)).alias("med"))
    dev = (
        nv.join(F.broadcast(med), "label")
        .withColumn("dev", F.abs(F.col("nrm") - F.col("med")))
        .localCheckpoint(eager=True)  # feeds both the MAD agg and the
        # outlier count
    )
    mads = dev.groupBy("label", "med").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad"),
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
    )
    out = (
        dev.join(F.broadcast(mads.select("label", "mad")), "label")
        .groupBy("label")
        .agg(
            F.sum(
                F.when(F.col("dev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return mads.join(out, "label").select(
        "label",
        "n_vecs",
        F.round("med", 6).alias("med_norm"),
        F.round("mad", 6).alias("mad_norm"),
        "n_outliers",
    )


def _embedding_norm_outliers_oracle() -> str:
    from .functions.similarity import _dot_sql

    return f"""
WITH v0 AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
nv AS (SELECT label, sqrt({_dot_sql('e', 'e', DUCK)}) AS nrm FROM v0),
med AS (SELECT label, quantile_cont(nrm, 0.5) AS med FROM nv GROUP BY label),
dev AS (
  SELECT nv.label, nv.nrm, med.med, ABS(nv.nrm - med.med) AS dev
  FROM nv JOIN med ON med.label = nv.label),
mads AS (
  SELECT label, med, quantile_cont(dev, 0.5) AS mad,
    CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM dev GROUP BY label, med),
outl AS (
  SELECT d.label,
    CAST(SUM(CASE WHEN d.dev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
      AS BIGINT) AS n_outliers
  FROM dev d JOIN mads m ON m.label = d.label GROUP BY d.label)
SELECT m.label, m.n_vecs, ROUND(m.med, 6) AS med_norm,
  ROUND(m.mad, 6) AS mad_norm, o.n_outliers
FROM mads m JOIN outl o ON o.label = m.label
"""


def _pq_distortion_builder(dialect: str) -> str:
    """PQ quantization-distortion report — the codebook-quality twin of
    `ann_recall_report`: per subspace, the mean squared reconstruction
    error of assigning every vector to its nearest codeword, the mean
    subvector energy (squared norm), their ratio (relative distortion —
    the number that says how much signal 1-byte codes keep), and the
    count of codewords actually used (dead codes = wasted codebook).
    Same deterministic first-16 codebook and 9-dp DECIMAL distance
    discipline as `ann_pq_topk` (similarity.py:ann_pq_topk_sql), so the
    report describes exactly the codes that ANN path searches, and all
    sums are exact decimals — partition-order independent."""
    from .functions.similarity import _dot_sql, _l2sq_sql, _subslice_sql, _vecs_cte

    dim, n_subs, n_codes = 64, 8, 16
    sub_len = dim // n_subs
    lat = (
        f"LATERAL VIEW explode(sequence(0, {n_subs - 1})) _t AS s"
        if dialect == SPARK
        else f", UNNEST(range(0, {n_subs})) AS _t(s)"
    )
    sub = _subslice_sql("e", f"1 + s * {sub_len}", sub_len, dialect)
    d_code = _l2sq_sql("sub.sub", "cb.csub", dialect)
    en = _dot_sql("sub", "sub", dialect)
    return f"""
WITH {_vecs_cte(dialect)},
subs0 AS (SELECT vec_id, s, {sub} AS sub FROM v {lat}),
subs AS (
  SELECT vec_id, s, sub,
    CAST(ROUND({en}, 9) AS DECIMAL(18,9)) AS en
  FROM subs0),
cb AS (SELECT vec_id AS cid, s, sub AS csub FROM subs WHERE vec_id < {n_codes}),
assign AS (
  SELECT vec_id, s, cid, d, en FROM (
    SELECT sub.vec_id, sub.s, cb.cid, sub.en,
      CAST(ROUND({d_code}, 9) AS DECIMAL(18,9)) AS d,
      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
        ORDER BY ROUND({d_code}, 9) ASC, cb.cid ASC) AS rn
    FROM subs sub JOIN cb ON sub.s = cb.s) _a
  WHERE rn = 1)
SELECT CAST(s AS INT) AS s,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS mse,
  ROUND(CAST(SUM(en) AS DOUBLE) / COUNT(*), 6) AS mean_energy,
  ROUND(CAST(SUM(d) AS DOUBLE) / CAST(SUM(en) AS DOUBLE), 6)
    AS distortion_ratio,
  CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_codes_used
FROM assign
GROUP BY s
"""


def events_user_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-concentration report: the Gini coefficient of events
    per user (0 = perfectly even, → 1 = a few power users generate
    everything) — the one-number answer to 'how concentrated is our
    traffic', and the robustness caveat for any per-user mean.

    The sorted-rank Gini formula G = Σ cᵢ·(2·rankᵢ − n + 1) / (n·Σc)
    needs a GLOBAL ascending rank — supplied by `two_phase_position`
    (banded rank, no global sort; the oracle's ROW_NUMBER proves the
    equivalence).  Every term is exact BIGINT arithmetic; only the
    final ratio is a double."""
    from .operators.windows import two_phase_position
    from .sources.readers import load_events

    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ranked = two_phase_position(
        counts,
        F.least(F.col("c"), F.lit(4096)),
        [F.col("c"), F.col("user_id")],
        out="pos",
    )
    ranked = ranked.localCheckpoint(eager=True)  # stats + weighted sum reuse
    stats = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("total_events"),
    )
    return (
        ranked.crossJoin(F.broadcast(stats))
        .agg(
            F.max("n_users").alias("n_users"),
            F.max("total_events").alias("total_events"),
            F.round(
                F.sum(
                    F.col("c") * (2 * F.col("pos") - F.col("n_users") + 1)
                ).cast("double")
                / (F.max("n_users") * F.max("total_events")).cast("double"),
                6,
            ).alias("gini"),
        )
    )


def _events_user_gini_oracle() -> str:
    return """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) - 1 AS pos,
    COUNT(*) OVER () AS n
  FROM counts)
SELECT CAST(MAX(n) AS BIGINT) AS n_users,
  CAST(SUM(c) AS BIGINT) AS total_events,
  ROUND(CAST(SUM(c * (2 * pos - n + 1)) AS DOUBLE)
    / (MAX(n) * CAST(SUM(c) AS DOUBLE)), 6) AS gini
FROM ranked
"""


def text_zipf_fit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: least-squares slope of ln(frequency) over ln(rank)
    for the top-1000 corpus terms — natural corpora sit near −1, and a
    corpus that doesn't (synthetic boilerplate, template spam, heavy
    dedup residue) shows it here first, making this the cheapest
    corpus-shape smoke test in the pipeline.

    The global frequency rank is `two_phase_position` (the oracle's
    ROW_NUMBER pins equivalence); ln values are ROUNDED to 6 dp and
    cast to DECIMAL before the regression moments, and the products are
    re-rounded to scale 6, so every sum is exact and order-independent
    (the DECIMAL(38,>6)→DOUBLE cast trap never fires).  The closed-form
    slope/intercept are evaluated in doubles at the very end."""
    from .functions.portable import arr_len, lateral_arr, split_ws
    from .operators.windows import two_phase_position

    register_views(spark, sf_dir)
    w = split_ws("lower(text)", SPARK)
    freq = spark.sql(
        f"""WITH words AS (
          SELECT /*+ REPARTITION(32) */ doc_id, {w} AS w FROM documents),
        docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', SPARK)} >= 1),
        tok AS (SELECT tk FROM docs {lateral_arr('w', 'tk', SPARK)})
        SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tk"""
    )
    ranked = two_phase_position(
        freq,
        -F.least(F.col("c"), F.lit(4096)),
        [F.col("c").desc(), F.col("tk")],
        out="pos",
    ).filter(F.col("pos") < 1000)
    d6 = "decimal(18,6)"
    xy = ranked.select(
        F.round(F.log(F.col("pos") + 1), 6).cast(d6).alias("x"),
        F.round(F.log("c"), 6).cast(d6).alias("y"),
    ).select(
        "x",
        "y",
        F.round(F.col("x") * F.col("y"), 6).cast(d6).alias("xy"),
        F.round(F.col("x") * F.col("x"), 6).cast(d6).alias("xx"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").cast("decimal(38,6)").cast("double").alias("sx"),
        F.sum("y").cast("decimal(38,6)").cast("double").alias("sy"),
        F.sum("xy").cast("decimal(38,6)").cast("double").alias("sxy"),
        F.sum("xx").cast("decimal(38,6)").cast("double").alias("sxx"),
    )
    slope = (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "n_terms",
        F.round(slope, 4).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n_terms"), 4
        ).alias("zipf_intercept"),
    )


def _text_zipf_fit_oracle() -> str:
    from .functions.portable import arr_len, lateral_arr, split_ws

    w = split_ws("lower(text)", DUCK)
    return f"""
WITH words AS (SELECT doc_id, {w} AS w FROM documents),
docs AS (SELECT doc_id, w FROM words WHERE {arr_len('w', DUCK)} >= 1),
tok AS (SELECT tk FROM docs {lateral_arr('w', 'tk', DUCK)}),
freq AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tk),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tk) - 1 AS pos FROM freq),
xy0 AS (
  SELECT CAST(ROUND(ln(pos + 1), 6) AS DECIMAL(18,6)) AS x,
    CAST(ROUND(ln(c), 6) AS DECIMAL(18,6)) AS y
  FROM ranked WHERE pos < 1000),
xy AS (
  SELECT x, y,
    CAST(ROUND(x * y, 6) AS DECIMAL(18,6)) AS xy,
    CAST(ROUND(x * x, 6) AS DECIMAL(18,6)) AS xx
  FROM xy0),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
    CAST(CAST(SUM(x) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
    CAST(CAST(SUM(y) AS DECIMAL(38,6)) AS DOUBLE) AS sy,
    CAST(CAST(SUM(xy) AS DECIMAL(38,6)) AS DOUBLE) AS sxy,
    CAST(CAST(SUM(xx) AS DECIMAL(38,6)) AS DOUBLE) AS sxx
  FROM xy)
SELECT n_terms,
  ROUND((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 4)
    AS zipf_slope,
  ROUND((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
    / n_terms, 4) AS zipf_intercept
FROM m
"""


def _doc_length_histogram_builder(dialect: str) -> str:
    """Per-source document-length histogram in decimal-magnitude buckets
    (1–9, 10–99, … tokens — the bucket is the DIGIT COUNT of the token
    count, exact integer arithmetic in both engines, no log2 float-edge
    drift at power-of-two boundaries): doc count, token share, and mean
    length per bucket — the at-a-glance length profile a curriculum or
    packing config is tuned against."""
    from .functions.portable import arr_len, split_ws

    n = arr_len(split_ws("lower(text)", dialect), dialect)
    return f"""
WITH lens AS (
  SELECT source, CAST({n} AS BIGINT) AS n_tokens FROM documents),
b AS (
  SELECT source, n_tokens,
    CAST(length(CAST(n_tokens AS STRING)) AS INT) AS magnitude
  FROM lens WHERE n_tokens > 0)
SELECT source, magnitude,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 2) AS mean_tokens
FROM b GROUP BY source, magnitude
"""


def _source_kl_drift_builder(dialect: str) -> str:
    """Source-mixture drift between corpus halves (doc_id parity as the
    before/after stand-in): KL(p‖q) and KL(q‖p) over the add-1-smoothed
    source distributions — the alarm that fires when a crawl's source
    mix shifts under the training distribution.  Per-source ln terms
    are ROUNDED to 6 dp and summed as exact decimals (the tfidf ln
    discipline), so both engines emit the identical float."""
    return """
WITH h AS (
  SELECT source, CAST(doc_id % 2 AS INT) AS half FROM documents),
src AS (SELECT DISTINCT source FROM h),
c AS (
  SELECT s.source,
    CAST(COALESCE(SUM(CASE WHEN h.half = 0 THEN 1 END), 0) + 1 AS BIGINT) AS ca,
    CAST(COALESCE(SUM(CASE WHEN h.half = 1 THEN 1 END), 0) + 1 AS BIGINT) AS cb
  FROM src s LEFT JOIN h ON h.source = s.source
  GROUP BY s.source),
t AS (
  SELECT source, ca, cb,
    CAST(SUM(ca) OVER () AS DOUBLE) AS na,
    CAST(SUM(cb) OVER () AS DOUBLE) AS nb
  FROM c),
terms AS (
  SELECT
    CAST(ROUND((ca / na) * ln((ca / na) / (cb / nb)), 6)
      AS DECIMAL(18,6)) AS fwd,
    CAST(ROUND((cb / nb) * ln((cb / nb) / (ca / na)), 6)
      AS DECIMAL(18,6)) AS rev
  FROM t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
  CAST(CAST(SUM(fwd) AS DECIMAL(38,6)) AS DOUBLE) AS kl_forward,
  CAST(CAST(SUM(rev) AS DECIMAL(38,6)) AS DOUBLE) AS kl_reverse
FROM terms
"""


def _lang_id_calibration_builder(dialect: str) -> str:
    """Language-ID CALIBRATION: accuracy of the marker-stopword
    classifier against the gold ``lang`` column, per marker-hit-count
    band (the classifier's native confidence signal) — the
    honesty-report form of `text_lang_id_confusion`: does more evidence
    actually mean more accuracy, and where is the abstain ('und')
    boundary worth moving?  One pass over documents; the lang scorer is
    the shared `lang_select_sql` body, so the calibration describes
    exactly the classifier the pipeline runs."""
    from .functions.text import lang_select_sql

    return f"""
WITH pred AS ({lang_select_sql(dialect)}),
j AS (
  SELECT LEAST(p.best, 8) AS marker_band,
    CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END AS ok
  FROM pred p JOIN documents d ON d.doc_id = p.doc_id)
SELECT CAST(marker_band AS INT) AS marker_band,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ok) AS BIGINT) AS n_correct,
  ROUND(SUM(ok) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM j GROUP BY marker_band
"""


def _events_bounce_rate_builder(dialect: str) -> str:
    """Bounce-rate by session entry type: sessions are the standard
    per-user 30-minute-gap windows (`events_sessionize`'s rule), the
    entry event is the session's first row in (es, event_id) order
    (the encoded-MIN trick — deterministic under timestamp ties), and a
    bounce is a single-event session.  Per entry type: sessions,
    bounces, bounce rate — the landing-page health table.  Every window
    is user-partitioned."""
    from .functions.portable import epoch_s

    es = epoch_s("ts", dialect)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, {es} AS es FROM events),
g AS (
  SELECT user_id, event_type, event_id, es,
    LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev
  FROM ev),
s AS (
  SELECT user_id, event_type, event_id, es,
    SUM(CASE WHEN prev IS NULL OR es - prev > 1800 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY es, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g),
sess AS (
  SELECT user_id, sid,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    MIN(lpad(CAST(es AS STRING), 12, '0') || '|'
        || lpad(CAST(event_id AS STRING), 12, '0') || '|' || event_type)
      AS first_row
  FROM s GROUP BY user_id, sid)
SELECT substr(first_row, 27) AS entry_type,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
  ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
    / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM sess GROUP BY substr(first_row, 27)
"""


def _conversion_latency_builder(dialect: str) -> str:
    """First-view → first-purchase conversion latency profile: for every
    user whose first purchase follows their first view, the latency in
    seconds — count, exact p50/p90 (the pinned percentile ≡
    quantile_cont equivalence on BIGINT seconds), and the exact-integer
    mean.  One grouped aggregate per user, one tiny profile aggregate —
    the activation-funnel timing table."""
    from .functions.portable import epoch_s

    es = epoch_s("ts", dialect)
    pct = "percentile" if dialect == SPARK else "quantile_cont"
    return f"""
WITH ev AS (SELECT user_id, event_type, {es} AS es FROM events),
u AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN es END) AS v0,
    MIN(CASE WHEN event_type = 'purchase' THEN es END) AS p0
  FROM ev GROUP BY user_id),
lat AS (
  SELECT CAST(p0 - v0 AS BIGINT) AS lat FROM u
  WHERE v0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= v0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
  ROUND({pct}(lat, 0.5), 2) AS p50_latency_s,
  ROUND({pct}(lat, 0.9), 2) AS p90_latency_s,
  ROUND(CAST(SUM(lat) AS DOUBLE) / COUNT(*), 2) AS mean_latency_s
FROM lat
"""


def _supplier_hhi_builder(dialect: str) -> str:
    """Supplier-concentration HHI per part type: the Herfindahl–
    Hirschman index Σ shareᵢ² of supplier revenue shares within each
    p_type (10000·HHI > 2500 is the classic 'highly concentrated'
    procurement-risk flag).  Revenue accumulates in exact decimals;
    each share² term is rounded to 9 dp and summed as DECIMAL(18,9)
    (the ann_pq distance discipline), so the index is
    partition-order-independent and engine-identical.  One revenue
    aggregate + one per-type rollup; the ≤|types|-row totals broadcast
    back onto the supplier shares."""
    return """
WITH rev AS (
  SELECT p.p_type AS ptype, l.l_suppkey AS sk,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6))
      AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type, l.l_suppkey),
tot AS (
  SELECT ptype, CAST(SUM(r) AS DECIMAL(38,6)) AS rt,
    CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM rev GROUP BY ptype),
terms AS (
  SELECT rev.ptype, tot.n_suppliers,
    CAST(ROUND(
      (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE))
      * (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE)), 9)
      AS DECIMAL(18,9)) AS sq
  FROM rev JOIN tot ON tot.ptype = rev.ptype)
SELECT ptype AS p_type, MAX(n_suppliers) AS n_suppliers,
  CAST(ROUND(CAST(SUM(sq) AS DECIMAL(38,9)) * 10000, 2) AS DOUBLE)
    AS hhi_x10000
FROM terms GROUP BY ptype
"""


def _dup_cluster_histogram_builder(dialect: str) -> str:
    """Exact-duplicate cluster-size histogram: group documents by
    content hash, bucket cluster sizes (1, 2, 3-4, 5-8, 9+ — powers of
    two via exact integer CASE, no log float edges), and report per
    bucket the cluster count, doc count, and share of the corpus — the
    one-table answer to 'how duplicated is this crawl and in what
    shape' that decides whether exact dedup alone is worth a pass
    before the expensive near-dup stages.  One hash aggregate + one
    bounded histogram aggregate; the scalar corpus size broadcasts."""
    return """
WITH cl AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS sz
  FROM documents GROUP BY md5(text)),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
b AS (
  SELECT CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2'
    WHEN sz <= 4 THEN '3-4' WHEN sz <= 8 THEN '5-8'
    ELSE '9+' END AS size_bucket, sz
  FROM cl)
SELECT size_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(SUM(sz) AS BIGINT) AS n_docs,
  ROUND(SUM(sz) / CAST((SELECT n FROM nd) AS DOUBLE), 6) AS corpus_share
FROM b GROUP BY size_bucket
"""


def _brand_return_rate_builder(dialect: str) -> str:
    """Return rate per part brand with the Wilson 95% lower bound — the
    rate you can actually act on when brands have very different
    volumes (a 100%-return brand with 2 lines must rank below a
    40%-return brand with 10k lines; the plain ratio gets that wrong,
    the Wilson bound gets it right).  p̂ and the bound are closed forms
    over exact BIGINT counts; SQRT is IEEE-exact cross-engine (the
    established sqrt-not-power discipline), so both engines emit the
    identical double."""
    z2 = "3.8416"  # z^2 for z = 1.96
    phat = "(CAST(r AS DOUBLE) / n)"
    wilson = (
        f"({phat} + {z2} / (2 * n) - 1.96 * SQRT(({phat} * (1 - {phat})"
        f" + {z2} / (4 * n)) / n)) / (1 + {z2} / n)"
    )
    return f"""
WITH c AS (
  SELECT p.p_brand AS brand,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand)
SELECT brand, n AS n_lines, r AS n_returned,
  ROUND({phat}, 6) AS return_rate,
  ROUND({wilson}, 6) AS wilson_lower_95
FROM c
"""


def shingle_df_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of `_shingle_df_profile_builder`: the shingle-DF
    aggregate is the expensive stage and feeds both the histogram and
    the occurrence total, so it is computed ONCE and checkpointed (the
    SQL text's scalar subquery re-inlines it — measured 8 exchanges vs
    3 here)."""
    from .functions.dedup import _shingles_cte, _words_cte

    register_views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_words_cte(SPARK)}, {_shingles_cte(SPARK, distinct=True)} "
        "SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM shingles GROUP BY sh"
    ).localCheckpoint(eager=True)
    tot = df.agg(F.sum("df").cast("long").alias("t"))
    bucket = (
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") == 2, "2")
        .when(F.col("df") <= 4, "3-4")
        .when(F.col("df") <= 8, "5-8")
        .when(F.col("df") <= 16, "9-16")
        .when(F.col("df") <= 50, "17-50")
        .otherwise("51+")
    )
    return (
        df.select(bucket.alias("df_bucket"), "df")
        .groupBy("df_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("df").cast("long").alias("n_occurrences"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "df_bucket",
            "n_shingles",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("t").cast("double"), 6).alias(
                "occurrence_share"
            ),
        )
    )


def _shingle_df_profile_builder(dialect: str) -> str:
    """Shingle document-frequency profile — the `max_df` calibration
    table for the n-gram Jaccard verifier: `ngram_jaccard_pairs_sql`
    drops shingles with df > 50 (stopword-like 3-grams that would
    connect everything), and this histogram shows exactly how much
    evidence that cut removes — per df bucket (1 / 2 / 3-4 / 5-8 /
    9-16 / 17-50 / 51+): distinct shingles, total occurrences, and the
    occurrence share.  The 51+ row IS the dropped mass.  One distinct
    shingle aggregate + one bounded histogram aggregate."""
    from .functions.dedup import _shingles_cte, _words_cte

    return f"""
WITH {_words_cte(dialect)}, {_shingles_cte(dialect, distinct=True)},
df AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM shingles GROUP BY sh),
tot AS (SELECT CAST(SUM(df) AS BIGINT) AS t FROM df),
b AS (
  SELECT CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'
    WHEN df <= 4 THEN '3-4' WHEN df <= 8 THEN '5-8'
    WHEN df <= 16 THEN '9-16' WHEN df <= 50 THEN '17-50'
    ELSE '51+' END AS df_bucket, df
  FROM df)
SELECT df_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(SUM(df) AS BIGINT) AS n_occurrences,
  ROUND(SUM(df) / CAST((SELECT t FROM tot) AS DOUBLE), 6)
    AS occurrence_share
FROM b GROUP BY df_bucket
"""


def embedding_centroid_margin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label separability report: for each label, the NEAREST other
    centroid by cosine — high nearest-centroid cosine means the two
    classes' prototypes nearly coincide, the early warning for label
    noise or collapsed embeddings (and the number that predicts whether
    per-label LSH blocking can work at all).  Centroids come from the
    SHARED `similarity.centroid_means_sql` stage (one recipe, every
    consumer);
    centroid dot products round each element product to 9 dp and sum as
    exact DECIMAL(18,9) (the PQ distance discipline), so the |labels|²
    cosine table is engine-identical.  The means table is checkpointed
    — both join sides and the norm rows reuse it."""
    from pyspark.sql import Window

    from .functions.similarity import centroid_means_sql

    register_views(spark, sf_dir)
    means = spark.sql(centroid_means_sql(SPARK)).localCheckpoint(eager=True)
    a = means.select(
        F.col("label").alias("la"), "pos", F.col("mv").alias("va")
    )
    b = means.select(
        F.col("label").alias("lb"), "pos", F.col("mv").alias("vb")
    )
    prods = (
        a.join(b, "pos")
        .groupBy("la", "lb")
        .agg(
            F.sum(F.round(F.col("va") * F.col("vb"), 9).cast("decimal(18,9)"))
            .cast("double")
            .alias("dotp")
        )
        .localCheckpoint(eager=True)  # norms + cross pairs reuse it
    )
    norms = prods.filter(F.col("la") == F.col("lb")).select(
        F.col("la").alias("l"), F.sqrt("dotp").alias("nrm")
    )
    cos = (
        prods.filter(F.col("la") != F.col("lb"))
        .join(F.broadcast(norms.withColumnRenamed("l", "la")), "la")
        .withColumnRenamed("nrm", "na")
        .join(F.broadcast(norms.withColumnRenamed("l", "lb")), "lb")
        .withColumnRenamed("nrm", "nb")
        .select(
            "la",
            "lb",
            F.round(F.col("dotp") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
    )
    top = cos.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("la").orderBy(F.col("cos").desc(), "lb")
        ),
    ).filter(F.col("rn") == 1)
    return top.select(
        F.col("la").alias("label"),
        F.col("lb").alias("nearest_label"),
        F.col("cos").alias("nearest_cosine"),
    )


def _embedding_centroid_margin_oracle() -> str:
    from .functions.similarity import centroid_means_sql

    means = centroid_means_sql(DUCK)
    return f"""
WITH means AS ({means}),
prods AS (
  SELECT a.label AS la, b.label AS lb,
    CAST(SUM(CAST(ROUND(a.mv * b.mv, 9) AS DECIMAL(18,9))) AS DOUBLE)
      AS dotp
  FROM means a JOIN means b ON a.pos = b.pos
  GROUP BY a.label, b.label),
norms AS (SELECT la AS l, SQRT(dotp) AS nrm FROM prods WHERE la = lb),
cos AS (
  SELECT p.la, p.lb,
    ROUND(p.dotp / (na.nrm * nb.nrm), 6) AS cos
  FROM prods p
  JOIN norms na ON na.l = p.la
  JOIN norms nb ON nb.l = p.lb
  WHERE p.la <> p.lb),
ranked AS (
  SELECT la, lb, cos,
    ROW_NUMBER() OVER (PARTITION BY la ORDER BY cos DESC, lb) AS rn
  FROM cos)
SELECT la AS label, lb AS nearest_label, cos AS nearest_cosine
FROM ranked WHERE rn = 1
"""
