"""Round-13 catalog builders — DAY-dimension retention durability, the
r12 VERDICT's one weak component: ``rollup_expire`` (the shared fourth
verb of all eight day-partitioned sketch stores) now persists a
MONOTONE ``.day_retention`` marker BEFORE its directory drops, and
every day-store append verb — driver-side for explicit-day appends,
executor-side for the data-borne-day batch appends the streaming
foreachBatch sinks write through — REFUSES a forgotten day, so a late
at-least-once replay raises instead of silently resurrecting expired
data (the ``chunk_expire`` discipline completed along the day axis).
QuerySpec registrations live HERE (``r13_specs``, merged by catalog.py
— the chunk convention); the driver-window lists stay in catalog.py.

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R:1-648) has no persisted stores — this is declared
extension surface for the 100 TB training-data pipeline; the entry is
oracle-paired so the retention verb meets the same correctness bar as
the forwarded reference surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog_base import register_views
from .sources.readers import Tables

_DR_RANGE = ("2024-01-08", "2024-01-21")
_DR_CUT = "2024-01-12"  # days strictly below this are forgotten


def rollup_day_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-dimension retention with the durability marker
    (functions/sketches.py:rollup_expire — r12 VERDICT #1): build the
    per-day HLL register store through the INCREMENTAL append verb (one
    ``day=`` partition per day, prior files untouched), expire every
    day before the cutoff — issued TWICE plus once with a LOWER cutoff
    (all no-ops after the first: the marker is monotone and the dirs
    are gone) — then REPLAY the expired first day's append: the shared
    appender guard RAISES (``.day_retention`` marker, persisted BEFORE
    the drops — crash ordering pinned in tests/test_round13.py) instead
    of resurrecting the forgotten day.  The per-day estimates are then
    answered over the FULL original span, which makes the guard
    load-bearing twice: a resurrected day would surface as an extra
    result row (row-count mismatch), and the ``replay_blocked`` flag
    the query carries records that the guard actually fired (a silent
    non-raise flips every row's flag against the oracle's TRUE).
    Oracle: the direct per-day estimate over the RETAINED days' raw
    events — parity proves the post-expiry store equals the rebuild
    over retained days.  At 100 TB: expiry stays O(days) directory
    removal + one marker write; the guard costs the appenders a
    metadata read (explicit-day verbs) or one JVM projection
    (data-borne batch verbs) — never a scan."""
    import os
    import shutil
    import tempfile

    from .functions import sketches as SK

    register_views(spark, sf_dir)
    lo, hi = _DR_RANGE
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    ev = Tables(spark, sf_dir).events.filter(day.between(lo, hi))
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(),
        f"bdt_day_ret_{spark.sparkContext.applicationId}_{sf_tag}",
    )
    shutil.rmtree(path, ignore_errors=True)
    days = sorted(r[0] for r in ev.select(day.alias("d")).distinct().collect())
    for d in days:
        SK.hll_rollup_append_day(ev.filter(day == d), path, d)
    SK.rollup_expire(path, _DR_CUT)
    SK.rollup_expire(path, _DR_CUT)  # replay — no-op
    SK.rollup_expire(path, lo)  # lower cutoff — marker monotone
    blocked = False
    try:  # late replay of the forgotten first day — must raise
        SK.hll_rollup_append_day(ev.filter(day == days[0]), path, days[0])
    except ValueError:
        blocked = True
    store = spark.read.parquet(path).select(
        F.col("day").cast("string").alias("day"), "bucket", "reg"
    )
    return SK.hll_estimate(
        store.filter(F.col("day").between(lo, hi)), ["day"]
    ).select("day", "hll_est", F.lit(blocked).alias("replay_blocked"))


def rollup_day_retention_oracle() -> str:
    from .functions import sketches as SK
    from .functions.portable import DUCK

    lo, hi = _DR_RANGE
    est = SK.hll_estimate_sql(
        f"(SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id "
        f"FROM events "
        f"WHERE CAST(ts AS DATE) BETWEEN DATE '{lo}' AND DATE '{hi}' "
        f"AND CAST(CAST(ts AS DATE) AS VARCHAR) >= '{_DR_CUT}')",
        "day",
        "user_id",
        dialect=DUCK,
    )
    return f"SELECT day, hll_est, TRUE AS replay_blocked FROM ({est})"


def r13_specs():
    """Round-13 QuerySpec registrations, merged into the catalog by
    catalog.py (the chunk convention)."""
    from .catalog_base import QuerySpec

    return {
        "rollup_day_retention": QuerySpec(
            rollup_day_retention_q,
            rollup_day_retention_oracle(),
            doc="Day-dimension retention durability for the eight "
            "day-partitioned sketch stores: monotone .day_retention "
            "marker persisted before the drops, appender guards raise "
            "on a replayed forgotten day; per-day estimates over the "
            "full span == rebuild over the retained days.",
        ),
    }
