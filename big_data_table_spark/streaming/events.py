"""Structured Streaming over the ``events`` fixture — the streaming
extension (SURVEY.md §2 "Streaming": absent from the reference, whose only
asynchrony is fire-and-forget eval, rscl.R:63-65).

Patterns covered: file-source streams with an explicit schema, watermarks,
tumbling/sliding windows, session windows, and a stateful per-key operator
via ``applyInPandasWithState``.  Local tests drive a bounded parquet batch
through the stream with ``processAllAvailable`` + a memory sink; on a real
cluster the same plans run over kafka/file sources unchanged.

The events fixture's ``ts`` physical has changed across driver generations
(TIMESTAMP(NANOS) → timestamp[us]); like the batch reader
(sources/readers.py:load_events) the stream source probes the parquet
footer once and normalizes in-plan, so every operator below sees one
canonical session-tz ``TimestampType`` column.
"""

from __future__ import annotations

import itertools
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import ensure_session_confs

_qid = itertools.count()

def _raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _probe_ts(spark: SparkSession, sf_dir: str) -> str:
    """One footer-only batch read to learn the fixture's ``ts`` physical
    ("bigint" nanos / "timestamp_ntz" micros / "timestamp").  The file
    stream source needs the schema declared up front, so the probe cannot
    be folded into the stream plan itself; it reads no row groups."""
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return dict(batch.dtypes)["ts"]


_TS_SPARK_TYPE = {
    "bigint": T.LongType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "timestamp": T.TimestampType(),
}


def _normalize_ts(df: DataFrame, ts_type: str) -> DataFrame:
    if ts_type == "bigint":
        # integer division — `/ 1000` routes through double and is inexact
        # above 2^53 (see sources/readers.py:load_events)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    ensure_session_confs(spark)
    ts_type = _probe_ts(spark, sf_dir)
    # the file-stream source requires a directory; point it at sf_dir with
    # a glob filter selecting only the events file
    reader = spark.readStream.schema(_raw_schema(_TS_SPARK_TYPE[ts_type])).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        # source rate limiting: bounds each micro-batch to N files so a
        # backlog is drained in steady increments instead of one giant batch
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(sf_dir)
    return _normalize_ts(raw, ts_type)


@contextmanager
def _stream_shuffle_scope(spark: SparkSession):
    """Stateful streaming shuffles do NOT go through AQE: the shuffle /
    state-store partition count is frozen at query start from
    ``spark.sql.shuffle.partitions``.  On an untouched session that is
    the static 200 default — 200 tasks AND 200 state stores per stateful
    operator regardless of volume.  Scope the conf to the stream run:
    size it to the session's actual parallelism when it is still the
    default, restore on exit.  Sessions that set the conf themselves
    (``session.connect`` does) are left alone; at cluster scale the same
    rule applies — state partitioning must be an explicit choice, sized
    to executors × a growth factor, never the default."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    if before == "200":  # the untouched global default
        spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        yield
    finally:
        spark.conf.set(key, before)


def _run_to_completion(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a bounded stream to completion through a memory sink and
    return the final result as a batch DataFrame."""
    name = f"bdt_stream_{next(_qid)}"
    spark = stream_df.sparkSession
    with _stream_shuffle_scope(spark):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def tumbling_counts(spark: SparkSession, sf_dir: str, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Complete-mode aggregation (every window emitted at end-of-stream), so
    the bounded-input result equals the batch tumbling aggregation — the
    oracle-comparable contract.  Window start is emitted as epoch seconds
    (bigint) for cross-engine comparability.  The value sum uses exact
    decimal accumulation (see operators/aggregate.py:dsum).
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
        )
    )
    out = _run_to_completion(agg, "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("ws"),
        "event_type",
        "n",
        "v",
    )


def sliding_counts(spark: SparkSession, sf_dir: str, minutes: int = 10, slide: int = 5) -> DataFrame:
    """Sliding-window event counts (window length > slide → overlapping)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes", f"{slide} minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_completion(agg, "complete")
    return out.select(F.unix_timestamp(F.col("window.start")).alias("ws"), "n")


def session_windows(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Per-user session windows with a ``gap_minutes`` inactivity gap
    (``F.session_window`` — the streaming-native form of
    operators/windows.py:sessionize)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_completion(agg, "complete")
    return out.select(
        F.unix_timestamp(F.col("session_window.start")).alias("ss"),
        F.unix_timestamp(F.col("session_window.end")).alias("se"),
        "user_id",
        "n_events",
    )


def click_purchase_join(spark: SparkSession, sf_dir: str, within_minutes: int = 10) -> DataFrame:
    """Stream-stream inner join: each click paired with same-user
    purchases within ``within_minutes`` AFTER it.  Both sides carry
    watermarks and the join condition bounds event time on both ends, so
    Spark can expire join state — the required shape for an unbounded
    stream-stream join (state is otherwise infinite).
    """
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
        "inner",
    )
    out = _run_to_completion(joined, "append")
    return out.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias("gap_seconds"),
    )


def deduped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: the stream unioned with itself (every
    event twice) then ``dropDuplicates`` on the event key — state-backed
    exactly-once semantics per key.  The deduped aggregate must equal the
    plain batch aggregate (each event counted ONCE).  In production the
    watermarked form (``dropDuplicatesWithinWatermark``) bounds the dedup
    state; bounded fixture input keeps full-state dedup exact here."""
    ev = read_events_stream(spark, sf_dir)
    doubled = ev.unionByName(read_events_stream(spark, sf_dir))
    deduped = doubled.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    )
    return _run_to_completion(agg, "complete").select("event_type", "n", "v")


def deduped_counts_watermarked(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Production-shape streaming dedup: ``dropDuplicatesWithinWatermark``
    bounds the dedup state to the watermark horizon (full-state
    ``dropDuplicates`` grows without bound on an infinite stream), and
    ``maxFilesPerTrigger`` rate-limits the file source so one giant
    backlog cannot flood a single micro-batch — the two knobs an actual
    100 TB backfill needs.

    The duplicate probe is the stream unioned with itself (every event
    arrives exactly twice, zero event-time skew between copies), so ANY
    positive watermark horizon covers the duplicate gap and the deduped
    aggregate must equal the plain batch aggregate — same oracle as
    ``deduped_counts``."""
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    doubled = ev.unionByName(read_events_stream(spark, sf_dir, max_files_per_trigger))
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    )
    return _run_to_completion(agg, "complete").select("event_type", "n", "v")


def foreachbatch_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once file sink via ``foreachBatch``: every micro-batch
    lands in its own ``batch=<id>`` directory with overwrite semantics,
    so a retried batch REPLACES its own output instead of appending a
    duplicate — the idempotence contract that makes file sinks
    exactly-once under at-least-once execution.  The sink directory is
    then read back through partition discovery and aggregated; the
    result must equal the plain batch aggregate.  Rate-limited to one
    file per trigger to exercise the multi-batch path."""
    import os
    import shutil
    import tempfile

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    # applicationId-keyed for the same concurrent-session isolation as
    # stream_hll_cardinality's sink below.
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"bdt_foreachbatch_sink_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    back = spark.read.parquet(out_dir)  # batch=<id> becomes a partition col
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    )


def stream_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance over a stream: every micro-batch's
    HLL register table (≤256 rows regardless of batch size) lands in its
    own ``batch=<id>`` directory — the sketch-checkpointing pattern: the
    sink grows with batches·m, never with data.  The merged estimate
    (register MAX across batches, fully distributed, no driver collect)
    must equal the batch estimate over the complete stream — the HLL
    merge law, exercised through real micro-batch boundaries this time
    (the batch entry proves it over two filters).  Rate-limited to one
    file per trigger to force the multi-batch path."""
    import os
    import shutil
    import tempfile

    from ..functions import sketches as SK

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    # keyed by applicationId: two concurrent sessions (parallel pytest
    # workers, a bench run alongside tests) get disjoint sink dirs, so
    # neither can rmtree/overwrite the other's batch directories.  The
    # rmtree only clears THIS session's previous invocation.
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_hll_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.hll_registers(batch_df.select("user_id"), [], "user_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    back = spark.read.parquet(out_dir).groupBy("bucket").agg(
        F.max("reg").alias("reg")
    )
    return SK.hll_estimate_global(back)


def stream_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-WINDOW streaming sketch maintenance — the streaming writer of
    the persisted daily rollup (functions/sketches.py): every
    micro-batch appends its per-day HLL register rows (≤256 per day
    touched by the batch) into the sketch store; the read side MAX-merges
    across batches and estimates per day.  A day split across many
    micro-batches converges to the same registers as a one-shot build —
    the merge law through BOTH real micro-batch boundaries AND the
    persisted-store merge.  Oracle: the batch per-day HLL estimates over
    the complete stream.  Rate-limited to one file per trigger to force
    multi-batch.

    The per-batch sink grows with batches·days·m — the exact tiny-file
    failure mode the rollup store's compaction verb exists for — so
    after the stream drains, the sink is COMPACTED into the
    day-partitioned rollup store (one file per day,
    functions/sketches.py:hll_stream_sink_compact) and the per-day
    estimates are answered from the compacted store: the streaming
    writer maintains the SAME storage artifact the batch
    build/append/range API serves, and read cost stays proportional to
    days, not batch count.  Results are unchanged by the merge law
    (per-day register MAX over batches == one-shot registers), so the
    recorded oracle hash is identical."""
    import os
    import shutil
    import tempfile

    from ..functions import sketches as SK

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_hll_daily_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = SK.hll_registers(
            batch_df.select(
                F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
                "user_id",
            ),
            ["day"],
            "user_id",
        )
        regs.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    rollup_dir = out_dir + "_store"
    shutil.rmtree(rollup_dir, ignore_errors=True)
    SK.hll_stream_sink_compact(spark, out_dir, rollup_dir)
    store = spark.read.parquet(rollup_dir).select(
        F.col("day").cast("string").alias("day"), "bucket", "reg"
    )
    return SK.hll_estimate(store, ["day"]).select("day", "hll_est")


def enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (a user→nation mapping derived from the nation table), then
    aggregated.  The static side is planned per micro-batch (broadcast —
    the standard streaming-enrichment shape; no watermark needed on the
    static side)."""
    import os

    ev = read_events_stream(spark, sf_dir)
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    enriched = ev.withColumn("nk", F.col("user_id") % 25).join(
        F.broadcast(nation), on="nk", how="left"
    )
    agg = enriched.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    )
    return _run_to_completion(agg, "complete").select("n_name", "n", "v")


def stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    cumulative event count + max value carried in explicit state.  The
    bounded fixture arrives as one micro-batch, so the final emission per
    user equals the batch group aggregate (deterministic, oracle-comparable
    on (user_id, n_events))."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.streaming.state import GroupState

    ev = read_events_stream(spark, sf_dir)

    out_schema = "user_id long, n_events long, max_value double"
    state_schema = "n long, mx double"

    def update(key, pdf_iter, state: GroupState):
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )
    return _run_to_completion(agg, "update")


def versioned_dim(spark: SparkSession, sf_dir: str, n_versions: int = 10) -> DataFrame:
    """A deterministic SCD2-style versioned dimension derived from
    nation: per key ``nk``, ``n_versions`` versions at an irregular
    per-key cadence (offset ``nk % 5`` hours, step ``3 + nk % 3`` days
    from 2024-01-01 — covering the events fixture's January window),
    interval-ized with ``lead`` so membership is a plain range
    predicate.  The interval-ization runs ONCE, batch-side, on the
    static dim — that is what makes the streaming as-of below stateless."""
    import os

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    versions = nation.select(
        "nk", "n_name", F.explode(F.sequence(F.lit(0), F.lit(n_versions - 1))).alias("k")
    ).select(
        "nk",
        F.concat("n_name", F.lit("/v"), F.col("k")).alias("attr"),
        F.expr(
            "TIMESTAMP '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, nk % 5, 0, 0)"
            " + make_interval(0, 0, 0, CAST(k * (3 + nk % 3) AS INT), 0, 0, 0)"
        ).alias("valid_from"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("nk").orderBy("valid_from")
    return versions.withColumn("valid_until", F.lead("valid_from").over(w))


def asof_enriched_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side as-of enrichment: each streamed event picks the
    LATEST dimension version effective at-or-before its event time.

    The as-of is re-expressed so it stays inside Structured Streaming's
    stateless subset: the correlated 'max version ≤ ts' is precomputed
    batch-side as validity intervals (``versioned_dim``), turning the
    enrichment into a plain stream-static broadcast join with a range
    predicate — no stream-side window function, no state store, no
    watermark, append mode.  Events before their key's first version
    survive with a NULL attr (left join).  At 100 TB the dim broadcast
    is the same SCD2 pattern a warehouse uses; a dim too big to
    broadcast would bucket both sides on ``nk``."""
    evn = read_events_stream(spark, sf_dir).withColumn(
        "nk", F.col("user_id") % 25
    )
    dim = F.broadcast(versioned_dim(spark, sf_dir))
    joined = evn.join(
        dim,
        (evn["nk"] == dim["nk"])
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_until").isNull() | (F.col("ts") < F.col("valid_until"))),
        "left",
    )
    out = joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ets"),
        "attr",
    )
    return _run_to_completion(out, "append")


def late_data_accounting(
    spark: SparkSession,
    sf_dir: str,
    delay: str = "1 hour",
    minutes: int = 5,
    return_query_progress: bool = False,
):
    """Watermark late-data semantics, pinned end to end: the bounded
    events fixture is replayed as THREE micro-batches
    (maxFilesPerTrigger = 1) — two on-time files, then the first day's
    events, which by then sit weeks behind the watermark and are
    DROPPED before the aggregation.  Append mode then emits exactly the
    tumbling windows whose end the final watermark passed.

    Three batches, not two, because Spark runs TWO watermarks
    (SPARK-24156): eviction uses the value updated from batch N-1's
    stats, but the LATE-EVENTS input filter uses the value from batch
    N-2 — a late file in batch 1 is admitted (filter watermark still
    1970) and instantly emitted as closed windows.  The middle on-time
    batch advances the filter watermark so batch 2's late rows actually
    drop.  (Verified against the StateStoreSave plan, which prints both
    watermarks.)

    Both effects are deterministic on the bounded fixture, so the
    result is oracle-expressible in plain SQL: windows over the on-time
    subset with ``window_end <= max(on_time_ts) − delay``.  The drop
    count itself is read from the engine's own accounting
    (``numRowsDroppedByWatermark``) when ``return_query_progress`` —
    pinned in tests/test_round2.py to the late file's DISTINCT WINDOW
    count (the filter sits after the map-side partial aggregate, so it
    counts (window) partial rows, not raw events).

    Batch order is forced with explicit mtimes (the file source
    processes oldest-first); at scale the same op is the standard
    late-arrival audit on any watermarked job."""
    import shutil
    import tempfile

    ensure_session_confs(spark)
    from ..sources.readers import load_events

    staged = tempfile.mkdtemp(prefix="bdt_late_")
    # stage from the NORMALIZED batch read (ts is session-tz timestamp
    # whatever the fixture physical), so the replay files always carry
    # Spark's own TIMESTAMP(MICROS) and the stream schema below is exact
    raw = load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    cut = F.lit("2024-01-02 00:00:00").cast("timestamp")
    mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
    a_dir = os.path.join(staged, "a")
    b_dir = os.path.join(staged, "b")
    late_dir = os.path.join(staged, "c")
    raw.filter((F.col("ts") >= cut) & (F.col("ts") < mid)).coalesce(1).write.parquet(a_dir)
    raw.filter(F.col("ts") >= mid).coalesce(1).write.parquet(b_dir)
    raw.filter(F.col("ts") < cut).coalesce(1).write.parquet(late_dir)
    t0 = 1_600_000_000
    for d, t in ((a_dir, t0), (b_dir, t0 + 100), (late_dir, t0 + 200)):
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t, t))

    stream = (
        spark.readStream.schema(_raw_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(staged + "/*")
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", f"{minutes} minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("window.start").alias("ws"), "n")
    )
    name = f"bdt_stream_{next(_qid)}"
    with _stream_shuffle_scope(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            dropped = sum(
                s["numRowsDroppedByWatermark"]
                for p in q.recentProgress
                for s in p["stateOperators"]
            )
        finally:
            q.stop()
    # the memory sink holds the results; the staged replay files are done
    shutil.rmtree(staged, ignore_errors=True)
    out = spark.table(name)
    if return_query_progress:
        return out, dropped
    return out


def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the ADDITIVE sketch family: every
    micro-batch writes ITS OWN d×w Count-Min counter table to the sink
    (``batch=<id>`` dirs — per-batch-id overwrite, so a replayed batch is
    idempotent), and the read side SUM-merges across batches.  Because
    counts are additive-EXACT, the merged counter table equals a one-shot
    build BIT-FOR-BIT regardless of how the stream was batched — a
    stronger merge law than the HLL store's lossy-looking (but also
    exact) register MAX.  The merged sketch is probed with the exact
    top-20 users, so the output — and the recorded oracle,
    `cms_heavy_hitters_sql` itself — is identical to the batch entry's:
    the driver hash proves streaming maintenance changed nothing,
    measured overestimates included.  At 100 TB: per-tenant frequency
    sketches maintained by the stream, queries answered from ≤ d·w rows."""
    import shutil
    import tempfile

    from ..functions.sketches import _double_hashed_values, cms_counter_table

    w, d = 1024, 4
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_cms_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cms_counter_table(batch_df, "user_id", w, d).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    merged = (
        spark.read.parquet(out_dir)
        .groupBy("rw", "cl")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    from ..sources.readers import load_events

    exact = (
        load_events(spark, sf_dir)
        .select(F.col("user_id").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    from ..functions.sketches import exact_top_keys

    top = exact_top_keys(exact, "true_cnt", "v", 20).localCheckpoint(
        eager=True
    )  # TakeOrderedAndProject: per-partition top-20 + driver merge of
    # 20·partitions rows; same deterministic tie-break as the old
    # row_number spine, no single-task global sort (r8-verdict fix)
    hh = _double_hashed_values(top.select("v"), "v")
    rcol = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("rw")
    pos = ((F.col("h1") + F.col("rw") * (F.col("h2") * 2 + 1)) % w).alias("cl")
    probe = hh.select("v", rcol, F.col("h1"), F.col("h2")).select("v", "rw", pos)
    est = (
        probe.join(merged, ["rw", "cl"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return top.join(est, "v").select(
        F.col("v").alias("key"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )


def stream_tdigest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer of the persisted QUANTILE store: each micro-batch
    digests its values per day and writes the digest rows to a
    ``batch=<id>`` dir (per-batch-id overwrite — the foreachBatch replay
    contract delivers each value exactly once into the store, which is
    precisely the discipline ``tdigest_rollup_append_day`` documents for
    the additive-weight family; contrast the HLL/Bloom stores, which
    tolerate at-least-once natively).  Read side: per-day digest rows
    from ALL batches merge exactly like a multi-file store day.
    Driver-hashed claims, stable under merge-order dependence: each
    day's merged estimate ranks within ±0.03 of q over that day's raw
    values, and the day's TOTAL WEIGHT from the store exactly equals its
    raw value count — weight conservation through real micro-batch
    boundaries."""
    import shutil
    import tempfile

    from ..operators.tdigest import tdigest_day_digests, _compress, _quantile

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_td_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        tdigest_day_digests(batch_df, "ts", "value").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    import numpy as np
    import pandas as pd

    qs = [0.5, 0.9, 0.99]

    def merge_day(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(a) for a in pdf["means"]])
        weights = np.concatenate([np.asarray(a) for a in pdf["weights"]])
        cm, cw = _compress(means, weights, 200.0)
        day = pdf.iloc[0]["day"]
        n = int(round(float(weights.sum())))
        return pd.DataFrame(
            [(day, q, _quantile(cm, cw, q), n) for q in qs],
            columns=["day", "q", "est", "n_values"],
        )

    est = F.broadcast(
        spark.read.parquet(out_dir)
        .groupBy("day")
        .applyInPandas(
            merge_day, schema="day string, q double, est double, n_values long"
        )
    )
    from ..sources.readers import load_events

    raw = (
        load_events(spark, sf_dir)
        .select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            F.col("value").cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    ranked = raw.join(est, "day").groupBy("day", "q", "est", "n_values").agg(
        (
            F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("rank"),
    )
    return ranked.select(
        "day",
        "q",
        (F.abs(F.col("rank") - F.col("q")) <= 0.03).alias("ok"),
        "n_values",
    )


def stream_bloom_seen_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer of the persisted SEEN-KEYS Bloom index — the
    store whose mergeability class (position-SET union) makes streaming
    trivial: appends are idempotent, so the writer needs NO replay guard
    at all.  The three streaming writers now span the spectrum the
    stores document: register MAX (`stream_hll_daily`) and set union
    (here) tolerate at-least-once natively; additive weights
    (`stream_tdigest_daily`) require foreachBatch's exactly-once batch
    replay.  Every micro-batch folds its user ids into the store via
    `bloom_index_append`; after the stream drains the store compacts to
    one ≤m-row file and a mixed probe (all seen users + a provably
    disjoint shifted set) audits membership — decisions equal the
    in-query `bloom_membership_sql` filter bit-for-bit, which is the
    recorded oracle."""
    import shutil
    import tempfile

    from ..functions import sketches as SK
    from ..sources.readers import load_events

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    path = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_bloom_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(path, ignore_errors=True)
    empty = spark.createDataFrame([], "user_id long")
    SK.bloom_index_build(empty, path, "user_id", m=4096, k=4)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.bloom_index_append(batch_df, path, "user_id")

    with _stream_shuffle_scope(spark):
        q = ev.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    n_files = SK.bloom_index_compact(spark, path)

    batch_ev = load_events(spark, sf_dir)
    members = batch_ev.select(F.col("user_id").cast("long").alias("v")).distinct()
    shift = members.agg((F.max("v") + 1).alias("s"))
    nonmembers = members.crossJoin(F.broadcast(shift)).select(
        (F.col("v") + F.col("s")).alias("v")
    )
    probe = members.unionByName(nonmembers)
    probed = SK.bloom_index_probe(spark, path, probe, "v")
    flags = probed.join(
        members.withColumn("member", F.lit(True)), "v", "left"
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.when(F.col("possible"), 1).otherwise(0))
        .cast("long")
        .alias("n_possible"),
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(F.when(F.col("possible") & F.col("member").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    ).withColumn("n_files", F.lit(n_files).cast("long"))


def stream_packing_ledger(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Streaming SEQUENCE PACKING, resolved at the right boundary.  The
    packing LAYOUT is a function of the whole corpus (a global prefix
    sum in content-hash order), so any design that assigns bins inside
    micro-batches — per-batch bins with carried offsets — depends on
    arrival order and batch boundaries: rejected.  What streams cleanly
    is the per-document TOKEN LEDGER: each micro-batch writes ``(doc_id,
    md5(text), n_tokens)`` rows — deterministic facts of each document,
    the SET merge class, so replays and batching are invisible by
    construction — and the layout is then a deterministic batch function
    of the ledger SET alone (``pack_sequences(hash_col=...)``: the text
    never travels again).  The returned per-bin report shares the BATCH
    packing entry's oracle VERBATIM — the driver hash proves streaming
    ingestion changed nothing.

    Unlike the events streams (one fixture file → one micro-batch), this
    entry re-writes the corpus as FOUR files and rate-limits the file
    source to one file per trigger, so the ledger is genuinely assembled
    across four micro-batches — the batch-boundary-independence claim is
    exercised, not vacuously true.

    At 100 TB: tokenization (the expensive part — here a whitespace
    count, in production the learned subword walk) runs incrementally as
    documents arrive; the layout job reads only the compact ledger
    (`doc_id, 32-hex, long` per document) whenever a training run needs
    a new packing — the lambda split every loader pipeline uses."""
    import shutil
    import tempfile

    from ..functions.packing import pack_sequences, pack_summary
    from ..functions.portable import SPARK as _SPARK_D
    from ..functions.portable import arr_len, split_ws
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_pack_{spark.sparkContext.applicationId}_{n_files}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    ledger_dir = os.path.join(root, "ledger")
    docs.repartition(n_files).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    tok = F.expr(arr_len(split_ws("text", _SPARK_D), _SPARK_D)).cast("long")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                "doc_id", F.md5("text").alias("h"), tok.alias("n_tokens")
            )
            .write.mode("overwrite")
            .parquet(os.path.join(ledger_dir, f"batch={batch_id}"))
        )

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    ledger = spark.read.parquet(ledger_dir).distinct()
    packed = pack_sequences(
        ledger, budget=2048, id_col="doc_id", tokens_col="n_tokens", hash_col="h"
    )
    return pack_summary(packed, budget=2048)


def _batched_corpus_stream(
    spark,
    docs,
    root: str,
    src_dir: str,
    n: int = 4,
    key_col: str = "doc_id",
    prefix: str = "crawl",
):
    """Write ``docs`` as ``n`` single-file batch groups (group b =
    ``key_col % n``) with strictly increasing mtimes, and return a
    one-file-per-trigger file stream over them — the deterministic
    micro-batch delivery the crawl-dedup, quality-monitor and
    CMS-store entries reconstruct in pure SQL (batch membership lives
    in the DATA, not in file-listing order).  ``key_col``/``prefix``
    generalize the helper to any keyed table (events use user_id)."""
    import shutil
    import time

    os.makedirs(src_dir, exist_ok=True)
    now = time.time()
    for b in range(n):
        stage = os.path.join(root, f"stage{b}")
        docs.filter(F.col(key_col) % n == b).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, f"{prefix}_{b}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (now + b, now + b))
        shutil.rmtree(stage)
    return (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def stream_setjoin_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier loop with the EXACT set-similarity index —
    the exact-join twin of :func:`stream_crawl_dedup` (which probes the
    approximate LSH index): documents arrive in three micro-batches
    (``doc_id % 3``, file mtimes pin the order); each batch is probed
    against the persisted prefix-filter index BEFORE being appended —
    ``setjoin_index_probe`` → ``setjoin_index_append``.  Batch 0
    bootstraps the store and FREEZES the prefix order; batches 1-2 rank
    their prefixes under that frozen order, so every probe's candidate
    rule stays lossless across the whole evolution (one consistent
    total order, functions/dedup.py module comment).  The union of the
    probe results is every CROSS-BATCH pair with exact Jaccard >= 1/2 —
    pure-SQL reconstructible because batch membership is data-borne:
    the oracle is the brute shared-shingle join filtered to pairs whose
    sides land in different batches.  At 100 TB this is the exact-dedup
    ingest topology: the parquet index is the only state, each trigger
    costs |batch|-sized shingling + candidate-bounded verification, and
    no Spark state store is involved."""
    import shutil
    import tempfile

    from ..functions.dedup import (
        setjoin_index_append,
        setjoin_index_build,
        setjoin_index_probe,
    )
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_sjcrawl_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    idx = os.path.join(root, "index")
    sink = os.path.join(root, "pairs")

    stream = _batched_corpus_stream(spark, docs, root, src_dir, n=3)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.dedup import _shingle_rel

        view = f"sjcrawl_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        bspark = batch_df.sparkSession
        if batch_id == 0:
            # bootstrap: the store is born from this batch, freezing
            # the prefix order; there is no earlier corpus to probe.
            # Keyed on the BATCH ID, not filesystem state — a replayed
            # batch 0 re-runs the idempotent overwrite build instead of
            # probing a store that already contains itself
            setjoin_index_build(bspark, idx, view)
            return
        # ONE checkpointed shingle relation per trigger, shared by the
        # probe and the append (r10 review: each verb re-exploding the
        # batch doubled the dominant per-trigger cost).  exclude= makes
        # the probe itself replay-idempotent: if this trigger's append
        # committed but the checkpoint didn't, the replayed probe still
        # adjudicates against the store AS IT WAS (r10 ADVICE)
        bsh = _shingle_rel(bspark, view)
        pairs = setjoin_index_probe(
            bspark, idx, view, sh=bsh, exclude=batch_df.select("doc_id")
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )
        setjoin_index_append(bspark, idx, view, sh=bsh)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    return (
        spark.read.parquet(sink)
        .select("doc_a", "doc_b", "i", "n_a", "n_b", "jaccard")
    )


def stream_simhash_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier loop over the persisted SimHash signature
    index — the hamming-distance member of the crawl trio
    (:func:`stream_crawl_dedup` probes the MinHash-LSH buckets,
    :func:`stream_setjoin_crawl` the EXACT prefix-filter store):
    documents arrive in three micro-batches (``doc_id % 3``, file
    mtimes pin the order); each batch is probed against the signature
    index BEFORE being appended — ``simhash_index_probe`` (hamming
    <= 1; quarter-band candidates lossless by pigeonhole) →
    ``simhash_index_append``.  Batch 0 bootstraps the store, keyed on
    the BATCH ID (a replayed batch 0 re-runs the idempotent overwrite
    build); signatures are DETERMINISTIC, so replayed appends write
    byte-identical rows the probe's DISTINCT read absorbs, and ONE
    checkpointed signature relation per trigger feeds both verbs.  The
    union of the probe results is every CROSS-BATCH pair within
    hamming 1 — batch membership is data-borne, so the oracle is the
    one-shot signature reconstruction filtered to cross-batch sides.
    At 100 TB: per-trigger work is |batch| signature hashing +
    candidate-bounded verification against 32-char index rows; the
    parquet index is the only state, no Spark state store."""
    import shutil
    import tempfile

    from ..functions.dedup import (
        _simhash_rel,
        simhash_index_append,
        simhash_index_build,
        simhash_index_probe,
    )
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_shcrawl_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    idx = os.path.join(root, "index")
    sink = os.path.join(root, "pairs")

    stream = _batched_corpus_stream(spark, docs, root, src_dir, n=3)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        view = f"shcrawl_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        bspark = batch_df.sparkSession
        if batch_id == 0:
            simhash_index_build(bspark, idx, view)
            return
        sig = _simhash_rel(bspark, view).localCheckpoint(eager=True)
        # exclude= the batch's own ids: a replayed trigger whose append
        # committed but whose checkpoint didn't re-adjudicates against
        # the store AS IT WAS (probe-level replay idempotence)
        pairs = simhash_index_probe(
            bspark, idx, view, max_hamming=1, sig=sig,
            exclude=batch_df.select("doc_id"),
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )
        simhash_index_append(bspark, idx, view, sig=sig)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    return spark.read.parquet(sink).select("doc_a", "doc_b", "hamming")


def stream_semantic_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier loop over the persisted SEMANTIC (embedding)
    index — extending the crawl matrix to the embedding modality
    (MinHash-LSH / EXACT prefix-filter / SimHash / nearest-centroid
    cells): embeddings arrive in three micro-batches (``vec_id % 3``,
    file mtimes pin the order); each batch is assigned ONCE under the
    store's FROZEN coarse quantizer and that checkpointed assignment
    feeds both the probe (same-cell cosine >= threshold vs the store)
    and the append.  Batch 0 bootstraps, keyed on the BATCH ID: it
    freezes the quantizer as its 8 smallest vec_ids and writes its own
    assignments (idempotent overwrite).  Assignments are DETERMINISTIC
    functions of (vector, frozen centroids), so replayed appends write
    byte-identical rows the probe's DISTINCT read absorbs.  The union
    of the probe results is every CROSS-BATCH same-cell pair within
    the threshold — batch membership is data-borne, so the oracle is
    the one-shot assignment of the whole corpus under the same frozen
    centroids, filtered to cross-batch sides.  At 100 TB: per-trigger
    work is |batch| assignment (|centroids| comparisons each) +
    sum-of-cell-intersection pair verification; the corpus is never
    re-assigned; the parquet index is the only state."""
    import shutil
    import tempfile

    from ..functions.similarity import (
        semantic_index_append,
        semantic_index_assign,
        semantic_index_build,
        semantic_index_probe,
    )
    from ..sources.readers import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_semcrawl_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    idx = os.path.join(root, "index")
    sink = os.path.join(root, "pairs")

    stream = _batched_corpus_stream(
        spark, vecs, root, src_dir, n=3, key_col="vec_id", prefix="semcrawl"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        view = f"semcrawl_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        bspark = batch_df.sparkSession
        if batch_id == 0:
            semantic_index_build(bspark, idx, view)
            return
        assigned = semantic_index_assign(bspark, idx, view).localCheckpoint(
            eager=True
        )
        # exclude= the batch's own ids: a replayed trigger whose append
        # committed but whose checkpoint didn't re-adjudicates against
        # the store AS IT WAS (probe-level replay idempotence)
        pairs = semantic_index_probe(
            bspark, idx, view, assigned=assigned,
            exclude=batch_df.select("vec_id"),
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )
        semantic_index_append(bspark, idx, view, assigned=assigned)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    return spark.read.parquet(sink).select("id_a", "id_b", "cos_sim")


def stream_crawl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRAWL-FRONTIER dedup loop as a stream: documents arrive in
    four micro-batches (deterministic split ``doc_id % 4``, one file per
    trigger, file mtimes pin the order), and each batch is adjudicated
    against the persisted LSH index BEFORE being appended to it —
    ``lsh_index_probe`` → ``lsh_index_append``, the exact
    `incremental_dedup_persisted` loop driven by Structured Streaming
    instead of a driver script.  Batch 0 bootstraps: in-batch exact
    adjudication only, then ``lsh_index_build`` creates the store.

    Because the batch key is part of the DATA (not an artifact of file
    listing), the whole evolution is oracle-expressible: a doc is
    ``exact_vs_corpus`` iff an earlier-batch doc shares its digest,
    ``exact_in_batch`` iff a smaller-id same-batch doc does,
    ``neardup_vs_corpus`` iff any earlier-batch doc shares a band
    bucket — the driver hash checks every per-batch decision count
    against that pure-SQL reconstruction.  At 100 TB this is the
    steady-state ingest topology: the index store is the only state,
    batch work is |batch|-sized, and the stream needs no Spark state
    store at all (the parquet index IS the state, replay-safe by the
    SET merge class)."""
    import shutil
    import tempfile

    from ..functions.dedup import (
        lsh_index_append,
        lsh_index_build,
        lsh_index_probe,
    )
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_crawl_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    idx = os.path.join(root, "index")
    sink = os.path.join(root, "decisions")
    os.makedirs(src_dir)

    stream = _batched_corpus_stream(spark, docs, root, src_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        view = f"crawl_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        bspark = batch_df.sparkSession
        if not os.path.isdir(os.path.join(idx, "digests")):
            # bootstrap: in-batch exact arm only (the probe's rule with
            # no corpus), then the store is born from this batch
            flags = batch_df.select("doc_id", F.md5("text").alias("h"))
            first = flags.groupBy("h").agg(F.min("doc_id").alias("first_id"))
            dec = flags.join(first, "h").select(
                "doc_id",
                F.when(
                    F.col("doc_id") != F.col("first_id"), F.lit("exact_in_batch")
                )
                .otherwise(F.lit("keep"))
                .alias("decision"),
            )
            dec.withColumn("batch", (F.col("doc_id") % 4).cast("long")).write.mode(
                "overwrite"
            ).parquet(os.path.join(sink, f"batch={batch_id}"))
            lsh_index_build(bspark, idx, view)
        else:
            # exclude= the batch's own ids: a replayed trigger whose
            # append committed but whose checkpoint didn't
            # re-adjudicates against the store AS IT WAS
            dec = lsh_index_probe(
                bspark, idx, view, exclude=batch_df.select("doc_id")
            )
            dec.withColumn("batch", (F.col("doc_id") % 4).cast("long")).write.mode(
                "overwrite"
            ).parquet(os.path.join(sink, f"batch={batch_id}"))
            lsh_index_append(bspark, idx, view)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    return (
        spark.read.parquet(sink)
        .groupBy("batch", "decision")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def stream_quality_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DATA-QUALITY monitoring — the per-increment score
    dashboard an ingest pipeline watches for drift: each micro-batch
    (the deterministic ``doc_id % 4`` delivery) is scored with the
    SHARED quality formula (`quality_select_sql` pointed at the batch
    view) and appends one summary row — doc count, decimal-exact score
    sum, below-threshold count — to the monitor sink.  The read side
    reports per-batch mean quality and the sub-0.45 share; because the
    batch key lives in the data, the oracle reconstructs every row with
    a plain GROUP BY doc_id % 4.  At 100 TB: per-batch work is
    |batch|-sized, the sink grows one row per increment, and a drift
    alert is a query over that tiny table — the pattern every ingest
    SLO check uses."""
    import shutil
    import tempfile

    from ..functions.portable import SPARK
    from ..functions.text import quality_select_sql
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_qm_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    sink = os.path.join(root, "monitor")
    stream = _batched_corpus_stream(spark, docs, root, src_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        view = f"qm_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        scores = batch_df.sparkSession.sql(
            quality_select_sql(SPARK, table=view)
        )
        row = (
            batch_df.select("doc_id")
            .join(scores, "doc_id")
            .agg(
                F.min((F.col("doc_id") % 4).cast("long")).alias("batch"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.col("quality_score").cast("decimal(18,6)")).alias("q_sum"),
                F.sum(F.when(F.col("quality_score") < 0.45, 1).otherwise(0))
                .cast("long")
                .alias("n_below"),
            )
        )
        row.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    m = spark.read.parquet(sink)
    return m.select(
        "batch",
        "n_docs",
        F.round(
            F.col("q_sum").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_quality"),
        "n_below",
        F.round(F.col("n_below") / F.col("n_docs").cast("double"), 6).alias(
            "below_share"
        ),
    )


def stream_bm25_index_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer INTO the persisted BM25 inverted index — the
    text-retrieval store joins the streaming-writer family (every
    persisted store family has one; merge class drives the replay
    contract).  Three deterministic micro-batches (``doc_id % 3``,
    mtime-ordered single-file groups) each index themselves as
    ``chunk=<batch_id>`` partitions (`bm25_index_append` — tokenize
    ONLY the increment); batch 1's append is then REPLAYED after the
    stream (additive class: the per-chunk dynamic overwrite must be a
    no-op), the store is COMPACTED to the reserved ``chunk=-1``
    (SUM-merge — for the additive class compaction IS the merge, so
    the read is bit-identical), and the top-20 query is answered from
    the compacted store alone.  Shares `bm25_index_persisted`'s
    oracle VERBATIM: however the stream batched the corpus, the
    SUM-merged postings equal the one-shot counts exactly."""
    import shutil
    import tempfile

    from ..functions import text as TX
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_bm25_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    store = os.path.join(root, "store")
    n = 3
    stream = _batched_corpus_stream(
        spark, docs, root, src_dir, n=n, key_col="doc_id", prefix="bm25"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        view = f"bm25_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        TX.bm25_index_append(batch_df.sparkSession, store, view, chunk=batch_id)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # replay batch 1 (reconstructible from the data-borne key): the
    # dynamic chunk=1 overwrite must be a no-op
    docs.filter(F.col("doc_id") % n == 1).createOrReplaceTempView("bm25_replay")
    TX.bm25_index_append(spark, store, "bm25_replay", chunk=1)
    TX.bm25_index_compact(spark, store)
    return TX.bm25_index_topk(spark, store)


def stream_cms_rollup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer INTO the persisted CMS day store — the missing
    edge of the matrix: `stream_cms_heavy_hitters` proved the additive
    merge law into a flat per-batch sink, r8's `cms_rollup_persisted`
    proved the store's verb cycle in batch; this entry maintains the
    REAL (day, chunk)-partitioned store layout from a stream.  Three
    deterministic micro-batches (user_id % 3, mtime-ordered single-file
    groups — batch membership lives in the data) each append their
    counters as ``chunk=<batch_id>`` partitions under every day they
    touch (`cms_rollup_append_batch`); batch 1's append is then
    REPLAYED after the stream, proving the additive class's
    exactly-once contract holds as dynamic-overwrite idempotency in
    the store itself.  The 14-day range top-20 is answered by the
    standard store read and shares the batch entry's oracle VERBATIM
    (`cms_heavy_hitters_sql` on the range-restricted events): however
    the stream batched the days, SUM-merged counters equal the
    one-shot sketch bit-for-bit."""
    import shutil
    import tempfile

    from ..functions import sketches as SK
    from ..sources.readers import load_events

    lo, hi = "2024-01-08", "2024-01-21"
    ev = load_events(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_cmsroll_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    store = os.path.join(root, "store")
    n = 3
    stream = _batched_corpus_stream(
        spark, ev, root, src_dir, n=n, key_col="user_id", prefix="events"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.cms_rollup_append_batch(batch_df, store, batch_id)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # replay batch 1 (its rows are reconstructible from the data-borne
    # key): the dynamic (day, chunk=1) overwrite must be a no-op
    SK.cms_rollup_append_batch(ev.filter(F.col("user_id") % n == 1), store, 1)

    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    rng = ev.filter(day.between(lo, hi))
    top = (
        rng.groupBy(F.col("user_id").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "v")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    est = SK.cms_rollup_range_estimates(spark, store, lo, hi, top.select("v"))
    return top.join(est, "v").select(
        F.col("v").alias("key"),
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )


def stream_mg_rollup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer INTO the persisted Misra-Gries/SpaceSaving day
    store (the sixth store family's streaming edge): three
    deterministic micro-batches (user_id % 3, the shared
    `_batched_corpus_stream` device) each append their per-day
    summaries as ``chunk=<batch_id>`` partitions
    (`mg_rollup_append_batch`); batch 1's append is then REPLAYED after
    the stream — the summary is a deterministic function of the batch
    slice, so the replay writes byte-identical rows and the range
    read's DISTINCT absorbs them (SET class: at-least-once delivery
    is natively safe, no overwrite choreography).  The 14-day range
    top-20 with provable [lower, upper] bounds is answered from the
    summaries alone and audited against exact counts; the oracle
    replicates the batch slicing via ``chunk_sql = user_id % 3``, so
    however the stream interleaved days, the answer is value-identical
    by construction."""
    import shutil
    import tempfile

    from ..functions import sketches as SK
    from ..sources.readers import load_events

    lo, hi = "2024-01-08", "2024-01-21"
    ev = load_events(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_mgroll_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    store = os.path.join(root, "store")
    n = 3
    stream = _batched_corpus_stream(
        spark, ev, root, src_dir, n=n, key_col="user_id", prefix="events"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.mg_rollup_append_batch(batch_df, store, batch_id)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # replay batch 1 (reconstructible from the data-borne key): the
    # appended rows are byte-identical, the DISTINCT read absorbs them
    SK.mg_rollup_append_batch(ev.filter(F.col("user_id") % n == 1), store, 1)

    top = SK.mg_rollup_range_topk(spark, store, lo, hi, topk=20)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    exact = (
        ev.filter(day.between(lo, hi))
        .groupBy(F.col("user_id").cast("long").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    return exact.join(F.broadcast(top), "key").select(
        "key",
        "lower_cnt",
        "upper_cnt",
        "true_cnt",
        F.col("true_cnt").between(F.col("lower_cnt"), F.col("upper_cnt"))
        .alias("in_bounds"),
    )


def stream_mg_grouped_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer INTO the GROUPED SpaceSaving store (r10: the
    grouped store's streaming edge, completing the batch/streaming ×
    plain/grouped matrix for the sixth family): three deterministic
    micro-batches (user_id % 3, the shared `_batched_corpus_stream`
    device) each append their per-(day, event_type) summaries as
    ``chunk=<batch_id>`` partitions (`mg_rollup_grouped_append_batch`);
    batch 2's append is then REPLAYED after the stream — grouped
    summaries are deterministic functions of the batch slice, so the
    replay writes byte-identical rows the chunked range read's DISTINCT
    absorbs (SET class).  The 14-day PER-TYPE top-5 with provable
    [lower, upper] bounds is answered from the summaries alone
    (≤ days·chunks·cap rows per group) and audited in-row against the
    exact per-(type, user) counts; the oracle replicates the batch
    slicing via ``chunk_sql = user_id % 3``."""
    import shutil
    import tempfile

    from ..functions import sketches as SK
    from ..sources.readers import load_events

    lo, hi = "2024-01-08", "2024-01-21"
    ev = load_events(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_mggrp_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    store = os.path.join(root, "store")
    n = 3
    stream = _batched_corpus_stream(
        spark, ev, root, src_dir, n=n, key_col="user_id", prefix="events"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        SK.mg_rollup_grouped_append_batch(batch_df, store, batch_id)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # replay batch 2 (reconstructible from the data-borne key): the
    # appended rows are byte-identical, the DISTINCT read absorbs them
    SK.mg_rollup_grouped_append_batch(
        ev.filter(F.col("user_id") % n == 2), store, 2
    )
    # compact the last day (merge WITHOUT re-prune; the grouped range
    # algebra is bit-identical before/after — the merge law — so the
    # oracle's chunked model still holds)
    SK.mg_rollup_grouped_compact(spark, store, hi)

    top = SK.mg_rollup_grouped_chunked_range_topk(spark, store, lo, hi, topk=5)
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    exact = (
        ev.filter(day.between(lo, hi))
        .groupBy(
            F.col("event_type").cast("string").alias("g"),
            F.col("user_id").cast("long").alias("key"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    return exact.join(F.broadcast(top), ["g", "key"]).select(
        "g",
        "key",
        "lower_cnt",
        "upper_cnt",
        "true_cnt",
        F.col("true_cnt").between(F.col("lower_cnt"), F.col("upper_cnt"))
        .alias("in_bounds"),
    )


def click_purchase_left_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 10
) -> DataFrame:
    """Stream-stream LEFT OUTER join — the unmatched-side completion of
    :func:`click_purchase_join`: every click emits, paired with same-user
    purchases within ``within_minutes`` after it, or NULL-extended once
    the watermark proves no match can still arrive.  Outer stream-stream
    joins are exactly the inner shape plus a state-expiry contract: the
    NULL row for an unmatched click is emitted only when the watermark
    passes the end of its join window (until then a match could still
    come), so the 30-minute watermark delay both bounds state AND
    schedules the NULL emissions.  Clicks whose join window is still
    inside the final watermark horizon when the bounded fixture drains
    never get a verdict and are withheld — the batch oracle models the
    same horizon with ``c_ts + within + delay < max(ts)`` over the
    fixture (boundary calibrated empirically; microsecond timestamps
    keep ties off the boundary)."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")
        ),
        "leftOuter",
    )
    out = _run_to_completion(joined, "append")
    return out.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias(
            "gap_seconds"
        ),
    )


def stream_bitmap_rollup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer INTO the persisted EXACT bitmap presence store
    (the seventh store family's streaming edge): three deterministic
    micro-batches (user_id % 3, the shared `_batched_corpus_stream`
    device) each append their per-day bitmaps as ``chunk=<batch_id>``
    partitions (`bitmap_rollup_append_batch`); batch 1's append is then
    REPLAYED after the stream — the IDEMPOTENT-MERGE class absorbs it
    in the read path's BIT_OR itself (BIT_OR(x, x) = x): no DISTINCT,
    no overwrite choreography, no summary-determinism argument — the
    strongest at-least-once contract in the store matrix.  The 14-day
    per-day DAU + range-wide distinct report is answered from the
    bitmaps alone; the oracle is the PLAIN COUNT(DISTINCT) over the
    range-restricted raw events — chunking and batch interleave are
    invisible to an associative idempotent merge, so the oracle needs
    no chunk model at all."""
    import shutil
    import tempfile

    from ..functions import bitmap_store as BS
    from ..sources.readers import load_events

    lo, hi = "2024-01-08", "2024-01-21"
    ev = load_events(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_bmroll_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    store = os.path.join(root, "store")
    n = 3
    stream = _batched_corpus_stream(
        spark, ev, root, src_dir, n=n, key_col="user_id", prefix="events"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        BS.bitmap_rollup_append_batch(batch_df, store, batch_id)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # replay batch 1 (reconstructible from the data-borne key): BIT_OR
    # absorbs the duplicate bitmaps with zero effect
    BS.bitmap_rollup_append_batch(ev.filter(F.col("user_id") % n == 1), store, 1)

    return BS.bitmap_rollup_range_daily(spark, store, lo, hi)


def click_purchase_full_join(
    spark: SparkSession, sf_dir: str, within_minutes: int = 10
) -> DataFrame:
    """Stream-stream FULL OUTER join — completing the outer-join
    streaming family beside :func:`click_purchase_join` (inner) and
    :func:`click_purchase_left_join` (left): every click AND every
    purchase eventually emits, matched or NULL-extended.  Each side's
    NULL emission is scheduled by the state-expiry contract: an
    unmatched CLICK emits once the watermark passes the end of its
    join window (c_ts + within), an unmatched PURCHASE once the
    watermark passes p_ts itself (matching clicks have c_ts <= p_ts,
    so none can still arrive) — the batch oracle models both horizons
    against the two-sided LEAST() watermark (calibrated at both
    SFs)."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")
        ),
        "fullOuter",
    )
    out = _run_to_completion(joined, "append")
    return out.select(
        "click_id",
        "purchase_id",
        F.coalesce("c_user", "p_user").alias("user_id"),
        (F.col("p_ts").cast("long") - F.col("c_ts").cast("long")).alias(
            "gap_seconds"
        ),
    )


def stream_ivf_index_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming writer for the persisted IVF ANN store — the ANN arm
    of the crawl matrix (MinHash-LSH / prefix-filter / SimHash /
    nearest-centroid / BM25 / now IVF): embeddings arrive in three
    micro-batches (``vec_id % 3``, file mtimes pin the order); batch 0
    BOOTSTRAPS the store (``ivf_build`` — distributed Lloyd trains the
    coarse quantizer on the bootstrap batch alone), later batches
    append under the FROZEN centroids (``ivf_append`` — broadcast
    assignment, no Lloyd ever again).  Batch 2's append is issued
    TWICE: the at-least-once replay the probe-side LAG dedupe absorbs
    (ann_ivf_persisted_search, r12) — the top-k is pinned unchanged by
    the oracle.  The read-back is the standard persisted search over
    the full store.

    The oracle is ``_ann_ivf_trained_oracle(train_where=...)`` — the
    SAME unrolled-Lloyd text, with init + iterations restricted to the
    bootstrap batch and the FINAL assignment over the whole corpus —
    proving the stream's train-once-append-frozen evolution equals the
    one-shot reconstruction.  At 100 TB: per-trigger work is |batch| x
    |centroids| broadcast comparisons + a cid-partitioned append; the
    corpus is never re-assigned, the parquet index is the only state,
    and the periodic ``ivf_requantize`` retrain (catalog_r12) repays
    the quantizer drift this topology accumulates."""
    import shutil
    import tempfile

    from ..functions.clustering import (
        ann_ivf_persisted_search,
        ivf_append,
        ivf_build,
    )
    from ..sources.readers import load_table

    vecs = load_table(spark, sf_dir, "embeddings")
    root = os.path.join(
        tempfile.gettempdir(),
        f"bdt_stream_ivf_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "src")
    idx = os.path.join(root, "index")

    stream = _batched_corpus_stream(
        spark, vecs, root, src_dir, n=3, key_col="vec_id", prefix="ivfstore"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        bvecs = batch_df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        if batch_id == 0:
            ivf_build(bvecs, idx, k=8, n_iter=2)
            return
        ivf_append(bspark, idx, bvecs)
        if batch_id == 2:  # the deliberate at-least-once replay
            ivf_append(bspark, idx, bvecs)

    with _stream_shuffle_scope(spark):
        q = stream.writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    full = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qdf = full.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    return ann_ivf_persisted_search(spark, idx, qdf, n_probe=2, topk=5)
