"""Sources — every way data enters the engine.

Reference surface being re-expressed (SURVEY.md §2 "Scans / sources"):

* per-node ``fread`` CSV read          (reference tests-06-readme.R:87-98)
* quoted-expression source             (reference tests-06-readme.R:107-112)
* local table upload                   (reference tests-03-as.big.data.table.R:39-51)
* generator-function source            (reference tests-04-sub-.big.data.table.R:11-15)
* attach-to-resident-data              (reference as.big.data.table.R:63-91)
* parquet fixtures                     (TESTDATA.md; not in the reference)

All readers return plain ``DataFrame``; `BigDataTable` wraps them.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every query path depends on.

    Idempotent and safe on an externally-created session (the driver
    harness builds its own ``SparkSession``):

    * ``nanosAsLong`` — the ``events`` fixture stores TIMESTAMP(NANOS),
      which the Spark parquet reader rejects outright; reading the raw
      int64 and converting to micros in :func:`load_events` keeps the
      scan distributed and pushdown-capable.
    * UTC session timezone — result comparability with UTC-naive oracles.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_session_confs(spark)
    return spark.read.parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture with ``ts`` normalized to session-tz ``timestamp``.

    The fixture's physical type has changed across driver generations, so
    all three observed physicals are handled; every downstream operator
    (``unix_timestamp``, ``cast(ts AS bigint)``, window functions) sees
    one canonical ``TimestampType``:

    * ``timestamp[us]`` (current fixtures) — read as TIMESTAMP_NTZ, cast
      to TIMESTAMP.  Session tz is pinned UTC, so the wall-clock values
      are unchanged and the cast is exact.
    * ``TIMESTAMP(NANOS)`` (older fixtures) — rejected by the parquet
      reader unless ``nanosAsLong``; the int64 nanos are divided to
      micros with ``div`` (64-bit INTEGER division: ``F.col/1000``
      routes through double, inexact above 2^53, truncating ~1.5% of
      ns-range longs 1µs low).  Lossless — fixture values are
      micro-precision.
    * plain ``timestamp`` — already canonical.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table by name, normalizing quirky physical types."""
    if name == "events":
        return load_events(spark, sf_dir)
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


class Tables:
    """Lazy named access to the fixture star schema.

    ``Tables(spark, sf_dir).lineitem`` — each table is loaded once per
    instance.  This is the engine-side analogue of the reference's
    "multiple named datasets resident per node"
    (reference big.data.table.R:281-291).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in FIXTURE_TABLES:
            raise AttributeError(f"unknown fixture table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def __getitem__(self, name: str) -> DataFrame:
        return getattr(self, name)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: str | None = None,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV source (reference ``fread`` path, tests-06-readme.R:87-98).

    Prefer an explicit ``schema`` at scale — ``inferSchema`` costs an
    extra full pass over the input.
    """
    ensure_session_confs(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same pushdown/pruning properties as parquet."""
    ensure_session_confs(spark)
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """JDBC source.  At scale, ALWAYS pass ``partition_column`` +
    bounds — without them the whole table streams through one executor.
    (No JDBC driver ships in this environment; reads require the driver
    jar on the classpath.)"""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    ensure_session_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def from_pandas(spark: SparkSession, pdf, schema=None) -> DataFrame:
    """Local table upload (reference ``as.big.data.table.data.table``,
    as.big.data.table.R:96-122).  Arrow path; the shuffle that the
    reference performs client-side (chunk routing over sockets,
    big.data.table.R:196-208) is Spark's problem now."""
    ensure_session_confs(spark)
    return spark.createDataFrame(pdf, schema=schema)


def from_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Quoted-expression source (reference ``as.big.data.table.call``,
    as.big.data.table.R:50-58): the dataset is *defined by an
    expression* evaluated cluster-side."""
    ensure_session_confs(spark)
    return spark.sql(sql)


def from_generator(
    spark: SparkSession,
    fn: Callable[..., "object"],
    schema: str,
    n_partitions: int = 8,
    **kwargs,
) -> DataFrame:
    """Generator-function source (reference ``as.big.data.table.function``,
    as.big.data.table.R:35-45): ship a named function to every shard and
    bind its output as that shard's data.

    ``fn(partition_id, **kwargs) -> pandas.DataFrame`` runs once per
    partition via ``mapInPandas`` over ``spark.range`` — the Spark-native
    version of "call f() on each node".  Deterministic iff ``fn`` is
    deterministic in ``partition_id``.
    """
    ensure_session_confs(spark)

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            for pid in pdf["id"].tolist():
                yield fn(int(pid), **kwargs)

    seed_df = spark.range(n_partitions).repartition(n_partitions, "id")
    return seed_df.mapInPandas(gen, schema=schema)


def ls_tables(spark: SparkSession) -> list[str]:
    """Names of cluster-resident datasets (reference ``rscl.ls`` —
    ``ls(.GlobalEnv)`` per node, rscl.R:124-126; one catalog, one
    answer)."""
    return [t.name for t in spark.catalog.listTables()]


def ls_str(spark: SparkSession) -> dict[str, str]:
    """Structure dump of every resident dataset (reference ``rscl.ls.str``,
    rscl.R:131-137): name → schema."""
    return {
        t.name: spark.table(t.name).schema.simpleString()
        for t in spark.catalog.listTables()
    }


def ls_str_print(spark: SparkSession) -> str:
    """The PRINT shape of ``rscl.ls.str`` (reference rscl.R:131-137): a
    ``# Rserve node <nm> ----`` header per node followed by that node's
    ``ls.str`` capture, cat'd with newlines.  Spark has ONE catalog (the
    driver/executor topology replaces per-node environments), so the
    print is one ``# Spark session <appId> ----`` header plus one
    ``<name> : <schema>`` line per resident dataset, names sorted.

    The reference's golden tests pin the EXACT output line count and
    its affine growth in the resident-dataset count (tests-02-rscl.R:
    66-76 — 28 lines with one dataset per node, 52 after a second: the
    per-dataset line block is a fixed size, so lines = a + b·datasets).
    The pytest twin (tests/test_round14.py) pins the same shape law
    here: ``1 + len(ls_tables())`` lines, +1 per registered view, exact
    line format — VERDICT r13 #5, the last test-strategy gap from
    SURVEY §5."""
    names = sorted(t.name for t in spark.catalog.listTables())
    lines = [f"# Spark session {spark.sparkContext.applicationId} ----"]
    lines += [
        f"{n} : {spark.table(n).schema.simpleString()}" for n in names
    ]
    return "\n".join(lines)


def attach_view(spark: SparkSession, name: str) -> DataFrame:
    """Adopt data already resident in the cluster (reference
    ``as.big.data.table.list``, as.big.data.table.R:63-91).  Schema
    agreement across shards is a non-check in Spark — a catalog table
    has exactly one schema."""
    return spark.table(name)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (reference ``write.csv`` per node, tests-06-readme.R:88)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
