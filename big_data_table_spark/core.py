"""`BigDataTable` — the engine's single data abstraction.

The reference's ``big.data.table`` is a zero-row local proxy for row-sharded
``data.table`` objects on N remote R processes (reference
as.big.data.table.R:4-14); every query is an unevaluated ``[i, j, by]`` call
scattered to each shard and gathered client-side (big.data.table.R:117-153,
274-294).  Here the proxy is a lazy :class:`pyspark.sql.DataFrame`; the
scatter/gather engine is Catalyst + the Spark scheduler, and the
partial→final aggregation split the reference makes the *user* manage
(``outer.aggregate``, big.data.table.R:138-151) is performed automatically
and provably correctly by ``HashAggregateExec``.

Intentional semantic departure (SURVEY.md §4.2): the reference returns
*per-shard partials by default* and re-running the aggregate over partials is
documented-wrong for ``.N``/``mean``.  This engine is **correct by default**
(global aggregation); per-shard partials are the opt-in
``outer_aggregate=False`` mode, reproduced with
``groupBy(spark_partition_id(), *keys)``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Partition-id column exposed in partials mode.  Dot-prefixed names are
# user-reserved in the reference too (nondotnames, big.data.table.R:328-331);
# Spark attribute references to a dotted name need backticks (NODE_REF).
NODE_COL = ".node"
NODE_REF = "`.node`"


def _as_column(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _as_columns(cols) -> list[Column]:
    if cols is None:
        return []
    if isinstance(cols, (str, Column)):
        cols = [cols]
    return [_as_column(c) for c in cols]


def is_big_data_table(x: Any) -> bool:
    """Reference ``is.big.data.table`` (big.data.table.R:18-25).  The
    ``check.nodes`` shard-existence probe has no analogue: a DataFrame's
    partitions cannot dangle."""
    return isinstance(x, BigDataTable)


class BigDataTable:
    """Lazy distributed table with the reference's query surface.

    Construction mirrors the reference's four ``as.big.data.table.*``
    methods (SURVEY.md A11-A14) via the :mod:`..sources.readers`
    functions; wrap any DataFrame directly with ``BigDataTable(df)``.
    """

    def __init__(self, df: DataFrame, var: str | None = None):
        self.df = df
        #: name of the cluster-resident dataset this handle points at
        #: (reference ``var`` attribute, as.big.data.table.R:13); None for
        #: anonymous plans.
        self.var = var

    # ------------------------------------------------------------------ #
    # construction / gather
    # ------------------------------------------------------------------ #

    @classmethod
    def from_pandas(cls, spark: SparkSession, pdf, partition_by=None, schema=None) -> "BigDataTable":
        """Scatter a local table (reference as.big.data.table.R:96-122).

        ``partition_by`` hash-partitions on the key columns — the Spark
        version of the reference's keyed shard routing
        (big.data.table.R:196-198); without it Spark's default split
        replaces the reference's contiguous ``cut`` chunking
        (big.data.table.R:201-202).
        """
        df = spark.createDataFrame(pdf, schema=schema)
        out = cls(df)
        return out.partition_by(partition_by) if partition_by else out

    @classmethod
    def from_view(cls, spark: SparkSession, name: str) -> "BigDataTable":
        """Adopt resident data (reference as.big.data.table.R:63-91)."""
        return cls(spark.table(name), var=name)

    @classmethod
    def from_sql(cls, spark: SparkSession, sql: str) -> "BigDataTable":
        """Expression-defined dataset (reference as.big.data.table.R:50-58)."""
        return cls(spark.sql(sql))

    def to_pandas(self):
        """Gather (reference ``as.data.table.big.data.table``,
        as.big.data.table.R:133-135).  All-shards fetch — driver-memory
        bound by design, exactly like the reference's ``rbindlist``."""
        return self.df.toPandas()

    # ------------------------------------------------------------------ #
    # the query operator: bdt[i, j, by]  →  bdt.q(i=, j=, by=)
    # ------------------------------------------------------------------ #

    def q(
        self,
        i: Column | int | None = None,
        j: Mapping[str, Column] | Iterable[str | Column] | None = None,
        by: str | Iterable[str] | None = None,
        keyby: str | Iterable[str] | None = None,
        outer_aggregate: bool | Callable[[DataFrame], DataFrame] = True,
        new_var: str | None = None,
        new_copy: bool = False,
    ) -> "BigDataTable":
        """The ``bdt[i, j, by]`` query operator (reference
        big.data.table.R:274-294) as a fluent method.

        * ``i`` — row filter: a boolean Column, or an int → ``limit(i)``.
        * ``j`` — projection/aggregation: mapping ``name -> Column`` (every
          computed column is therefore always aliased), or a plain list of
          columns.  With ``by``/``keyby`` present, ``j`` entries are
          aggregate expressions (data.table's grouped ``j``).
        * ``by`` / ``keyby`` — group keys; ``keyby`` additionally sorts the
          result by the keys (data.table semantics: ``by`` preserves
          appearance order — unobservable in a distributed engine — while
          ``keyby`` sorts; we pin only the ``keyby`` ordering).
        * ``outer_aggregate`` — True: global, correct-by-default
          aggregation (Catalyst partial→final split).  False: per-shard
          partials, the reference's default (big.data.table.R:138-151),
          with partition id exposed as ``.node``.  Callable: global
          aggregation then ``fn(result_df)`` — the reference's
          ``outer.aggregate=function`` (big.data.table.R:141-143).
        * ``new_var`` — remote materialization (big.data.table.R:281-291):
          register the result as a temp view and return a handle to it
          instead of fetching; ``new_copy=True`` additionally persists
          (the reference's deep ``copy()``).
        """
        df = self.df
        if i is not None:
            if isinstance(i, int):
                df = df.limit(i)
            else:
                # strings are SQL expressions — the closest ergonomic
                # analogue of data.table's NSE filter in `i`
                df = df.filter(F.expr(i) if isinstance(i, str) else i)

        keys = _as_columns(keyby if keyby is not None else by)
        grouping_requested = by is not None or keyby is not None

        if keys:
            aggs = self._j_to_aggs(j)
            if outer_aggregate is False:
                df = df.withColumn(NODE_COL, F.spark_partition_id())
                df = df.groupBy(F.col(NODE_REF), *keys).agg(*aggs)
            else:
                df = df.groupBy(*keys).agg(*aggs)
        elif grouping_requested and isinstance(j, Mapping):
            # explicit empty `by=[]` with a Mapping j is data.table's
            # "aggregate over everything" — route to a global aggregate
            # (df.agg), NOT a projection, which would fail on agg exprs
            aggs = self._j_to_aggs(j)
            if outer_aggregate is False:
                df = df.withColumn(NODE_COL, F.spark_partition_id())
                df = df.groupBy(F.col(NODE_REF)).agg(*aggs)
            else:
                df = df.agg(*aggs)
        elif j is not None:
            if isinstance(j, Mapping):
                # grouped-less aggregate (e.g. global sum) vs projection:
                # whether every expr is an aggregate is unknowable
                # statically, so a Mapping j WITHOUT `by` is a projection;
                # global aggregates are q(j={...}, by=[]) or .agg()
                exprs = [
                    (F.expr(v) if isinstance(v, str) else v).alias(k)
                    for k, v in j.items()
                ]
                df = df.select(*exprs)
            else:
                df = df.select(*_as_columns(j))

        if keyby is not None:
            df = df.orderBy(*_as_columns(keyby))

        if callable(outer_aggregate) and outer_aggregate is not True:
            df = outer_aggregate(df)

        out = BigDataTable(df)
        if new_var is not None:
            return out.materialize(new_var, persist=new_copy)
        return out

    def agg(
        self,
        j: Mapping[str, Column],
        by: str | Iterable[str] | None = None,
        keyby: str | Iterable[str] | None = None,
        outer_aggregate: bool | Callable = True,
    ) -> "BigDataTable":
        """Global (or grouped) aggregation even with no group keys —
        ``bdt[, .(v=sum(value))]``."""
        keys = _as_columns(keyby if keyby is not None else by)
        aggs = [v.alias(k) for k, v in j.items()]
        df = self.df
        if outer_aggregate is False:
            df = df.withColumn(NODE_COL, F.spark_partition_id())
            df = df.groupBy(F.col(NODE_REF), *keys).agg(*aggs)
        elif keys:
            df = df.groupBy(*keys).agg(*aggs)
        else:
            df = df.agg(*aggs)
        if keyby is not None:
            df = df.orderBy(*_as_columns(keyby))
        if callable(outer_aggregate) and outer_aggregate is not True:
            df = outer_aggregate(df)
        return BigDataTable(df)

    def _j_to_aggs(self, j) -> list[Column]:
        if j is None:
            # bare .N — count per group (reference README.md:176-178)
            return [F.count(F.lit(1)).alias("N")]
        if isinstance(j, Mapping):
            return [
                (F.expr(v) if isinstance(v, str) else v).alias(k)
                for k, v in j.items()
            ]
        return _as_columns(j)

    def explain(self, mode: str = "formatted") -> None:
        """Physical-plan inspection — first-class because plan shape IS
        the performance contract at scale (see plans/explainer.py for
        assertable properties)."""
        self.df.explain(mode)

    # ------------------------------------------------------------------ #
    # mutation (":=" analogues) and materialization
    # ------------------------------------------------------------------ #

    def with_columns(self, **cols: Column) -> "BigDataTable":
        """``:=`` by-reference assignment analogue (reference
        big.data.table.R:108,301).  DataFrames are immutable; rebinding the
        handle gives the same UX and the lazy plan means no work happens
        until an action — the reference needed ``send=TRUE`` to suppress
        result shipping, Spark's laziness does that automatically."""
        return BigDataTable(self.df.withColumns(dict(cols)), var=self.var)

    def materialize(self, name: str, persist: bool = False) -> "BigDataTable":
        """Remote materialization ``new.var=`` (big.data.table.R:281-291):
        register under ``name``; ``persist=True`` ≈ ``new.copy`` (deep
        copy), pinning the data in cluster memory/disk."""
        df = self.df
        if persist:
            df = df.persist()
        df.createOrReplaceTempView(name)
        return BigDataTable(df, var=name)

    def drop_var(self, spark: SparkSession) -> None:
        """``rm(x)`` on every node (reference tests-06-readme.R:101)."""
        if self.var:
            spark.catalog.dropTempView(self.var)
        self.df.unpersist()

    # ------------------------------------------------------------------ #
    # partitioning (reference bdt.partition / bdt.assign)
    # ------------------------------------------------------------------ #

    def partition_by(self, cols, n: int | None = None) -> "BigDataTable":
        """(Re)declare partitioning (reference ``bdt.partition``,
        big.data.table.R:219-260).  The reference only recomputes metadata
        — its data movement is commented-out TODO code
        (big.data.table.R:236-253); Spark actually moves the rows.
        Unlike the reference there is no "partitions ≤ nodes" cap
        (as.big.data.table.R:10-11) — partitions ≫ executors is normal.
        """
        cols = [c if isinstance(c, str) else c for c in ([cols] if isinstance(cols, str) else list(cols))]
        df = self.df.repartition(n, *cols) if n else self.df.repartition(*cols)
        out = BigDataTable(df, var=self.var)
        out._partition_cols = list(cols)
        return out

    def partitions(self) -> DataFrame:
        """The distinct partition-key combinations (reference ``partitions``
        attribute recomputation: per-node ``unique`` + client ``unique`` of
        the union, big.data.table.R:229-230 — here one distributed
        ``distinct``)."""
        cols = getattr(self, "_partition_cols", None)
        if not cols:
            raise ValueError("no partition_by columns declared")
        return self.df.select(*cols).distinct()

    def repartition(self, n: int) -> "BigDataTable":
        """Equal-chunk round-robin sharding (reference ``cut`` chunking,
        big.data.table.R:201-202)."""
        return BigDataTable(self.df.repartition(n), var=self.var)

    # ------------------------------------------------------------------ #
    # per-shard escape hatch (reference `[[` / bdt.eval / rscl.eval)
    # ------------------------------------------------------------------ #

    def map_shards(
        self,
        fn: Callable,
        schema: str,
        combine: bool = True,
        with_node_id: bool = False,
    ) -> "BigDataTable | DataFrame":
        """Arbitrary per-shard compute (reference ``[[.big.data.table``
        with ``expr=``, big.data.table.R:310-324, and ``bdt.eval``,
        big.data.table.R:117-153).

        ``fn(iterator_of_pandas_batches) -> iterator_of_pandas_batches``
        runs once per partition via ``mapInPandas`` (Arrow-batched — the
        fast Python path).  Note the iterator may carry *several* batches
        per shard (Arrow batch size), so per-shard aggregation inside
        ``fn`` must fold over the whole iterator, not emit per batch.  ``combine=False`` (reference ``rbind=FALSE``,
        tests-06-readme.R:279-296) tags output rows with their partition
        id instead of returning a detached per-node list — the caller can
        ``groupBy('.node')`` to recover per-shard results.  The tag is
        added *after* ``fn`` (mapInPandas preserves partitioning, so the
        id is still the shard that produced the row) — ``fn`` never sees
        or manages the bookkeeping column.
        """
        out = self.df.mapInPandas(fn, schema=schema)
        if with_node_id or not combine:
            out = out.withColumn(NODE_COL, F.spark_partition_id())
        return BigDataTable(out)

    def apply_by_group(self, by, fn: Callable, schema: str) -> "BigDataTable":
        """Grouped-map UDTF (``applyInPandas``) — the scalable form of
        "ship a function, run it on each group" (reference
        as.big.data.table.R:35-45 generalized from per-node to per-group,
        which is the partition-parallel unit that survives 1000 executors).
        """
        return BigDataTable(self.df.groupBy(*_as_columns(by)).applyInPandas(fn, schema=schema))

    def eval_nodes(self, expr_fn: Callable[[DataFrame], DataFrame], nodes: list[int] | None = None) -> DataFrame:
        """Reference ``[[i=]]`` node targeting (big.data.table.R:315-322):
        run ``expr_fn`` over only a subset of shards.  Node addressing is
        anti-Spark; the faithful scalable equivalent is a partition-id
        filter, which Spark evaluates without touching other partitions'
        data lineage."""
        df = self.df.withColumn(NODE_COL, F.spark_partition_id())
        if nodes is not None:
            df = df.filter(F.col(NODE_REF).isin(nodes))
        return expr_fn(df.drop(NODE_COL))

    # ------------------------------------------------------------------ #
    # metadata (reference dim/names/print/str/core.data.table)
    # ------------------------------------------------------------------ #

    @property
    def names(self) -> list[str]:
        """Reference ``names.big.data.table`` (big.data.table.R:27-34) —
        there it asks node 1 over the wire; here it is plan metadata."""
        return self.df.columns

    def dim(self) -> tuple[int, int]:
        """Reference ``dim.big.data.table`` (big.data.table.R:36-47):
        per-node dims summed + column-count assert.  One Spark action."""
        return (self.df.count(), len(self.df.columns))

    @property
    def nrow(self) -> int:
        return self.df.count()

    @property
    def ncol(self) -> int:
        return len(self.df.columns)

    def core_table(self) -> DataFrame:
        """0-row typed prototype (reference ``core.data.table``,
        big.data.table.R:348-355 — per-node ``x[0L]`` rbind; here
        ``limit(0)``)."""
        return self.df.limit(0)

    def column_probe(self, j: int | str):
        """``bdt[[j]]`` type probe (big.data.table.R:311-312): the typed
        empty column → its Spark DataType."""
        if isinstance(j, int):
            return self.df.schema[j].dataType
        return self.df.schema[self.df.columns.index(j)].dataType

    def head(self, n: int = 5) -> DataFrame:
        return self.df.limit(n)

    def tail(self, n: int = 5) -> list:
        return self.df.tail(n)

    def print_(self, topn: int = 5) -> str:
        """Reference ``print.big.data.table`` (big.data.table.R:49-74),
        full contract: head of the FIRST node + ``---`` separator + tail
        of the LAST node (tail printed without the column-name header),
        with the reference's three warnings — single-node cluster, empty
        first node, empty last node — and its 0-row messages ("Null
        data.table" / "Empty data.table").  Node == partition of the
        current plan; within-partition row order is scan order, which is
        deterministic for file-backed tables (the reference's node order
        is connection order — same caveat).  Cost: one count for the
        dim check + two ≤topn-row collects; never a full gather.

        Returns the printed block so callers/tests can pin it."""
        import warnings

        ncol = len(self.df.columns)
        nrow = self.df.count()
        if nrow == 0:
            if ncol == 0:
                out = "Null data.table (0 rows and 0 cols)"
            else:
                names = ",".join(self.df.columns[:6]) + (
                    "..." if ncol > 6 else ""
                )
                out = (
                    f"Empty data.table (0 rows) of {ncol} "
                    f"col{'s' if ncol > 1 else ''}: {names}"
                )
            print(out)
            return out
        npart = self.df.rdd.getNumPartitions()
        if npart == 1:
            warnings.warn(
                "Running big.data.table with single node, print will be "
                "incorrect."
            )
        pid = F.spark_partition_id()
        head_rows = (
            self.df.withColumn(NODE_COL, pid)
            .filter(F.col(NODE_REF) == 0)
            .drop(NODE_COL)
            .limit(topn)
            .collect()
        )
        if not head_rows:
            warnings.warn(
                "First node doesn't have any rows, print will be incorrect."
            )
        tail_rows = (
            self.df.withColumn(NODE_COL, pid)
            .filter(F.col(NODE_REF) == npart - 1)
            .drop(NODE_COL)
            .tail(topn)
        )
        if not tail_rows:
            warnings.warn(
                "Last node doesn't have any rows, print will be incorrect."
            )

        def fmt(rows: list) -> list[str]:
            return [
                " ".join(str(v) for v in row) for row in rows
            ]

        block: list[str] = []
        if head_rows:
            block.append(" ".join(self.df.columns))
            block.extend(fmt(head_rows))
        if head_rows or tail_rows:
            block.append("---")
        if tail_rows:
            block.extend(fmt(tail_rows))  # no column header on the tail
        out = "\n".join(block)
        print(out)
        return out

    def size_estimate(self) -> int:
        """Estimated bytes of the (optimized) plan output — the engine's
        ``object.size`` analogue (reference README.md:230-231 sizes each
        shard remotely; here Catalyst statistics answer without touching
        data)."""
        return int(
            self.df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )

    def str_(self) -> dict:
        """Reference ``str.big.data.table`` (big.data.table.R:76-99):
        rows, cols, per-node row counts."""
        per_node = (
            self.df.withColumn(NODE_COL, F.spark_partition_id())
            .groupBy(F.col(NODE_REF))
            .count()
            .orderBy(F.col(NODE_REF))
            .collect()
        )
        total = sum(r["count"] for r in per_node)
        return {
            "nrow": total,
            "ncol": len(self.df.columns),
            "schema": self.df.schema.simpleString(),
            "rows_per_node": [r["count"] for r in per_node],
        }

    # ------------------------------------------------------------------ #
    # dunder conveniences
    # ------------------------------------------------------------------ #

    def __getitem__(self, i):
        """``bdt[cond]`` filter sugar."""
        if isinstance(i, Column):
            return BigDataTable(self.df.filter(i), var=self.var)
        if isinstance(i, (list, tuple)):
            return BigDataTable(self.df.select(*_as_columns(i)), var=self.var)
        raise TypeError("use .q(...) for full [i, j, by] queries")

    def __repr__(self) -> str:
        return f"BigDataTable(var={self.var!r}, schema={self.df.schema.simpleString()})"
