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
