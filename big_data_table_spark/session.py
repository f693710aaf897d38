"""SparkSession lifecycle — the engine's analogue of the reference's
cluster layer (``rscl.connect`` / ``rscl.close``, reference rscl.R:13-47).

The reference opens N Rserve TCP connections and treats the list as the
cluster handle; here the cluster handle is a ``SparkSession``.  Every knob
is chosen for the target deployment (many-executor cluster over columnar
storage) while remaining correct on ``local[N]``:

* AQE on — runtime coalescing / skew-join splitting replaces the
  reference's static per-node dispatch (rscl.R:63-68).
* ``spark.sql.shuffle.partitions`` sized to the parallelism actually
  available instead of the 200 default.
* UTC session timezone so results are comparable with external oracles
  (DuckDB timestamps are UTC-naive).
* Arrow enabled: every pandas interchange (gather ``to_pandas``, pandas
  UDFs) goes through columnar batches, not row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "big-data-table-spark"


def default_parallelism() -> int:
    """Local-mode thread count; on a real cluster this is ignored."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def connect(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Open the cluster handle (reference ``rscl.connect`` rscl.R:13-40).

    The reference recycles host×port vectors to build N connections and
    auto-loads packages per node; Spark subsumes both (executor launch +
    ``spark.submit.pyFiles``).  ``extra_conf`` is the escape hatch for
    per-deployment settings.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # fixtures store ns-precision timestamps; read TIMESTAMP(NANOS)
        # columns as raw int64 nanos (converted to micros by the readers) —
        # `false` would make Spark reject such files outright, and
        # ensure_session_confs() pins `true` as well
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def close(spark: SparkSession) -> None:
    """Reference ``rscl.close`` (rscl.R:45-47)."""
    spark.stop()
