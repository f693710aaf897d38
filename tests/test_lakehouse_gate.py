"""Lakehouse connector gate, both arms pinned (VERDICT r7 #7).

The Delta/Iceberg/Hudi readers (sources/lakehouse.py) are classpath-
probed: with the jars absent (this sandbox) each raises a clearly-marked
NotImplementedError naming the missing dependency; with the jars present
the real ``spark.read`` path runs.  Arm 1 executes here; arm 2 is
skip-marked on the probe so the moment the environment gains the jars the
real read path is already under test.
"""

from __future__ import annotations

import pytest

from big_data_table_spark.sources import lakehouse

_FORMATS = [
    (
        lakehouse.read_delta,
        ("/tmp/nonexistent-delta",),
        "org.apache.spark.sql.delta.sources.DeltaDataSource",
        "delta-spark",
    ),
    (
        lakehouse.read_iceberg,
        ("cat.db.tbl",),
        "org.apache.iceberg.spark.source.IcebergSource",
        "iceberg-spark-runtime",
    ),
    (
        lakehouse.read_hudi,
        ("/tmp/nonexistent-hudi",),
        "org.apache.hudi.DefaultSource",
        "hudi-spark-bundle",
    ),
]


@pytest.mark.parametrize(
    "reader,args,fmt_class,jar_name",
    _FORMATS,
    ids=["delta", "iceberg", "hudi"],
)
def test_gate_raises_with_named_dependency_when_jars_absent(
    spark, reader, args, fmt_class, jar_name
):
    if lakehouse._format_available(spark, fmt_class):
        pytest.skip(f"{jar_name} present on this classpath; absent-arm n/a")
    with pytest.raises(NotImplementedError, match=jar_name):
        reader(spark, *args)


def test_gate_real_read_path_when_delta_jars_present(spark, tmp_path):
    """Arm 2: with delta-spark on the classpath, a real write+read
    round-trips.  Skipped in this sandbox; green the day jars appear."""
    if not lakehouse._format_available(
        spark, "org.apache.spark.sql.delta.sources.DeltaDataSource"
    ):
        pytest.skip("delta-spark absent from classpath (expected here)")
    path = str(tmp_path / "delta_tbl")
    spark.range(10).write.format("delta").save(path)
    assert lakehouse.read_delta(spark, path).count() == 10


def test_probe_is_accurate_for_a_class_known_present(spark):
    """The probe itself must not be a stub: it says True for a class
    that IS on every Spark classpath and False for one that is not."""
    assert lakehouse._format_available(
        spark, "org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat"
    )
    assert not lakehouse._format_available(spark, "com.example.NoSuchFormat")
