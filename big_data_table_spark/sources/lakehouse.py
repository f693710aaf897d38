"""Lakehouse-format connectors — Delta / Iceberg / Hudi.

None of their jars ship in this environment (the pyspark guide's v1
image note), so each reader resolves at call time: the real
``spark.read.format(...)`` when the catalog/classpath supports it, else a
clearly-marked ``NotImplementedError`` explaining the missing dependency.
The call signatures and option plumbing are the production shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _format_available(spark: SparkSession, fmt_class: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(fmt_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta Lake read (optionally time-traveled to ``version``).
    Requires delta-spark on the classpath."""
    if not _format_available(spark, "org.apache.spark.sql.delta.sources.DeltaDataSource"):
        raise NotImplementedError(
            "Delta Lake requires the delta-spark jars on the classpath "
            "(absent in this environment); plumbing only"
        )
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", str(version))
    return reader.load(path)


def read_iceberg(spark: SparkSession, table: str, snapshot_id: int | None = None) -> DataFrame:
    """Iceberg catalog-table read (optionally pinned to a snapshot).
    Requires iceberg-spark-runtime + catalog conf."""
    if not _format_available(spark, "org.apache.iceberg.spark.source.IcebergSource"):
        raise NotImplementedError(
            "Iceberg requires iceberg-spark-runtime on the classpath "
            "(absent in this environment); plumbing only"
        )
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    if not _format_available(spark, "org.apache.hudi.DefaultSource"):
        raise NotImplementedError(
            "Hudi requires hudi-spark-bundle on the classpath "
            "(absent in this environment); plumbing only"
        )
    return spark.read.format("hudi").load(path)
