"""Ports of the reference's semantic pins (SURVEY.md §5) to the Spark
engine: the query operator's modes, constructor edge cases, metadata ops,
and the per-shard escape hatch."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark import BigDataTable, NODE_COL, is_big_data_table
from big_data_table_spark.operators.aggregate import agg_all, dsum, partials, two_phase
from big_data_table_spark.sources.readers import Tables, from_generator


def gen_pdf(n=1000, seed=123):
    """Deterministic gen.data analogue (reference
    tests-04-sub-.big.data.table.R:11-14): year/high/normal/low/value."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "year": rng.choice([2011, 2012, 2013, 2014], n),
            "high": rng.randint(1, int(0.9 * n) + 1, n),
            "normal": rng.randint(1, int(0.1 * n) + 1, n),
            "low": rng.choice(list("abcdefghij"), n),
            "value": rng.randn(n),
        }
    )


# ------------------------------------------------------------------ #
# query operator modes (reference tests-04)
# ------------------------------------------------------------------ #

def test_global_agg_default(spark):
    """outer_aggregate=True (our default): ONE row per group, regardless
    of partitioning — the correct-by-default departure (SURVEY.md §4.2)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4)
    out = bdt.q(j={"value": F.sum("value")}, by="year").to_pandas()
    assert len(out) == 4
    assert set(out.columns) == {"year", "value"}


def test_partials_mode_row_count_law(spark):
    """outer_aggregate=False: nrow == nodes × groups (reference
    tests-04:23 and tests-05:23 pin partials nrow = 4 × final nrow)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4)
    part = bdt.q(j={"value": F.sum("value")}, by="year", outer_aggregate=False)
    pdf = part.to_pandas()
    n_nodes = pdf[NODE_COL].nunique()
    assert n_nodes == 4
    # every node holds every year (n=1000 rows round-robin over 4 nodes)
    assert len(pdf) == n_nodes * 4
    # re-aggregating partials == global (the reference's manual two-phase)
    refit = pdf.groupby("year")["value"].sum().reset_index()
    glob = bdt.q(j={"value": F.sum("value")}, by="year").to_pandas()
    m = refit.merge(glob, on="year", suffixes=("_p", "_g"))
    assert (abs(m["value_p"] - m["value_g"]) < 1e-9).all()


def test_outer_aggregate_callable(spark):
    """outer.aggregate=<function> (reference big.data.table.R:141-143)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = bdt.q(
        j={"value": F.sum("value")},
        by="year",
        outer_aggregate=lambda df: df.filter(F.col("value") > 0),
    ).to_pandas()
    assert (out["value"] > 0).all()


def test_dot_n_count(spark):
    """bare ``.N`` by group (reference README.md:176-178)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = bdt.q(by="year").to_pandas()
    assert out["N"].sum() == 1000


def test_keyby_sorts(spark):
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = bdt.q(j={"v": F.sum("value")}, keyby="year").to_pandas()
    assert list(out["year"]) == sorted(out["year"])


def test_i_filter_and_limit(spark):
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    assert bdt.q(i=F.col("year") == 2011).nrow == (gen_pdf()["year"] == 2011).sum()
    assert bdt.q(i=7).nrow == 7


def test_two_phase_equals_single_phase(spark):
    """Chained two-phase == one-shot global (reference tests-04:30-31
    equivalence across aggregation routes)."""
    df = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4).df
    chained = two_phase(
        df,
        by="year",
        aggs={"v": F.sum(F.col("value").cast("decimal(28,12)"))},
        final={"v": F.sum("v")},
    ).toPandas()
    single = (
        df.groupBy("year").agg(F.sum(F.col("value").cast("decimal(28,12)")).alias("v")).toPandas()
    )
    m = chained.merge(single, on="year", suffixes=("_c", "_s"))
    assert (m["v_c"] == m["v_s"]).all()


# ------------------------------------------------------------------ #
# constructor edge cases (reference tests-03:62-111 / FIXTURES.md A5)
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("n", [3, 4, 5])
def test_rows_vs_partitions_edges(spark, n):
    """rows <, ==, > partition count: global results stay correct; empty
    partitions are silent (the reference pinned exact per-node
    distributions; Spark's contract is correctness, not placement)."""
    pdf = pd.DataFrame({"a": range(1, n + 1)})
    bdt = BigDataTable.from_pandas(spark, pdf).repartition(4)
    assert bdt.dim() == (n, 1)
    assert bdt.q(j={"s": F.sum("a")}).to_pandas()["s"][0] == n * (n + 1) // 2


def test_partition_key_cardinality_below_nodes(spark):
    """partition_by with 3 distinct keys on a 4-way layout (reference
    tests-03:104-111: keyed routing leaves one node empty)."""
    pdf = pd.DataFrame({"a": [1, 2, 3, 1, 2, 3], "b": [0.1] * 6})
    bdt = BigDataTable.from_pandas(spark, pdf).partition_by("a", n=4)
    parts = bdt.partitions().toPandas()
    assert sorted(parts["a"]) == [1, 2, 3]
    st = bdt.str_()
    assert st["nrow"] == 6
    assert sum(1 for c in st["rows_per_node"] if c > 0) <= 3


def test_empty_table(spark):
    bdt = BigDataTable(spark.range(0).select(F.col("id").alias("a")))
    assert bdt.dim() == (0, 1)
    assert bdt.q(j={"n": F.count(F.lit(1))}).to_pandas()["n"][0] == 0


# ------------------------------------------------------------------ #
# metadata (reference A22-A27)
# ------------------------------------------------------------------ #

def test_metadata_surface(spark):
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    assert bdt.names == ["year", "high", "normal", "low", "value"]
    assert bdt.dim() == (1000, 5)
    assert bdt.core_table().count() == 0  # x[0L] prototype
    assert bdt.core_table().columns == bdt.names
    from pyspark.sql import types as T

    assert isinstance(bdt.column_probe("value"), T.DoubleType)
    assert isinstance(bdt.column_probe(0), (T.LongType, T.IntegerType))
    assert is_big_data_table(bdt) and not is_big_data_table(bdt.df)


def test_materialize_new_var(spark):
    """new.var remote materialization (reference big.data.table.R:281-291):
    result registered cluster-side, nothing gathered; queryable by name."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    agg = bdt.q(j={"v": F.sum("value")}, by="year", new_var="year_sums", new_copy=True)
    assert agg.var == "year_sums"
    via_view = BigDataTable.from_view(spark, "year_sums")
    assert via_view.nrow == 4
    agg.drop_var(spark)


def test_with_columns(spark):
    """:= assignment analogue."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = bdt.with_columns(v2=F.col("value") * 2, flag=F.col("year") >= 2013)
    assert out.names[-2:] == ["v2", "flag"]
    pdf = out.q(i=F.col("flag")).to_pandas()
    assert (pdf["year"] >= 2013).all()


# ------------------------------------------------------------------ #
# escape hatch (reference `[[` / A21) + generator source (A11)
# ------------------------------------------------------------------ #

def test_map_shards_combine(spark):
    def per_shard(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)], "v": [pdf["value"].sum()]})

    bdt = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4)
    out = bdt.map_shards(per_shard, schema="n long, v double")
    pdf = out.to_pandas()
    assert pdf["n"].sum() == 1000  # rbind=TRUE gather of per-node results


def test_map_shards_no_combine_tags_nodes(spark):
    """rbind=FALSE (reference tests-06:279-296): per-node results stay
    addressable via the .node tag."""
    def per_shard(batches):
        for pdf in batches:
            yield pdf[["year", "value"]].head(2)

    bdt = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4)
    out = bdt.map_shards(per_shard, schema="year long, value double", combine=False)
    pdf = out.to_pandas()
    assert NODE_COL in pdf.columns
    assert pdf[NODE_COL].nunique() == 4


def test_apply_by_group(spark):
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["value"] = pdf["value"] - pdf["value"].mean()
        return pdf[["year", "value"]]

    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = bdt.apply_by_group("year", center, schema="year long, value double")
    pdf = out.to_pandas()
    means = pdf.groupby("year")["value"].mean()
    assert (means.abs() < 1e-9).all()


def test_eval_nodes_subset(spark):
    """[[i=]] node targeting (reference big.data.table.R:315-322)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf()).repartition(4)
    total = bdt.eval_nodes(lambda df: df.agg(F.count(F.lit(1)).alias("n"))).collect()[0]["n"]
    sub = bdt.eval_nodes(
        lambda df: df.agg(F.count(F.lit(1)).alias("n")), nodes=[0, 1]
    ).collect()[0]["n"]
    assert total == 1000 and 0 < sub < 1000


def test_generator_source_deterministic(spark):
    def gen(pid, n=100):
        import numpy as np

        idx = np.arange(n)
        return pd.DataFrame({"pid": [pid] * n, "x": (pid * 1000 + idx).astype("int64")})

    df1 = from_generator(spark, gen, schema="pid long, x long", n_partitions=4).toPandas()
    df2 = from_generator(spark, gen, schema="pid long, x long", n_partitions=4).toPandas()
    assert len(df1) == 400
    assert sorted(df1["x"]) == sorted(df2["x"])


def test_agg_all_numeric(spark):
    """lapply(.SD, sum) over all numeric columns."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf())
    out = agg_all(bdt.df, by="year", fn=lambda c: F.sum(c), prefix="sum_")
    assert {"sum_high", "sum_normal", "sum_value"}.issubset(set(out.columns))
    assert "sum_low" not in out.columns  # string column excluded


def test_clean_corpus_near_dedup_variant(spark):
    """The near-dedup pipeline variant (iterative CC stage included)
    drops at least as many docs as the exact-only variant and never
    produces more rows."""
    from big_data_table_spark.pipelines import clean_corpus

    base = clean_corpus(spark, "/root/testdata/sf0.001", min_quality=0.55).toPandas()
    near = clean_corpus(
        spark, "/root/testdata/sf0.001", min_quality=0.55, near_dedup=True
    ).toPandas()
    assert near["n_docs"].sum() <= base["n_docs"].sum()
    assert near["n_docs"].sum() > 0


def test_from_sql_expression_source(spark):
    """A12: expression-defined dataset (as.big.data.table.call)."""
    BigDataTable.from_pandas(spark, gen_pdf()).materialize("gensrc")
    bdt = BigDataTable.from_sql(
        spark, "SELECT year, value * 2 AS v2 FROM gensrc WHERE year >= 2013"
    )
    pdf = bdt.to_pandas()
    assert set(pdf["year"].unique()) <= {2013, 2014}
    assert bdt.names == ["year", "v2"]
    spark.catalog.dropTempView("gensrc")


def test_print_head_tail(spark):
    """A24: print = head of first node + '---' + tail of last node
    (reference big.data.table.R:49-74; full contract pinned in
    tests/test_round6.py)."""
    bdt = BigDataTable.from_pandas(spark, gen_pdf(50))
    assert bdt.head(3).count() == 3
    assert len(bdt.tail(3)) == 3
    # 50 rows over 32 shuffle partitions leaves the LAST node empty, so
    # print_ legitimately warns (reference parity: big.data.table.R:59-66
    # warns on empty edge nodes).  Assert-and-capture it (r14 VERDICT
    # residual nit) so the suite summary stays clean and a NEW warning
    # class can't hide behind this expected one.
    with pytest.warns(UserWarning, match="Last node doesn't have any rows"):
        out = bdt.print_(topn=2)
    assert "year" in out.splitlines()[0] and "---" in out.splitlines()


def test_rbindlapply(spark):
    """A28: rbindlist(lapply(X, FUN))."""
    from big_data_table_spark.operators.setops import rbindlapply

    out = rbindlapply(
        [1, 2, 3],
        lambda k: spark.range(k).withColumn("src", F.lit(k)),
    )
    assert out.count() == 6  # 1 + 2 + 3
    assert out.groupBy("src").count().count() == 3


def test_require_ships_module_and_probes_import(spark, tmp_path):
    """session.require round-trip (reference rscl.R:145-158): stage a
    module via addPyFile, probe its import on every core, then actually
    USE it inside a mapInPandas task."""
    from big_data_table_spark.session import require

    mod = tmp_path / "bdt_shipped_mod.py"
    mod.write_text("def triple(x):\n    return 3 * x\n")

    matrix = require(spark, ["bdt_shipped_mod", "definitely_not_a_module"], paths=[str(mod)])
    ok = {
        r["package"]: r["min_ok"]
        for r in matrix.groupBy("package").agg(F.min("ok").alias("min_ok")).collect()
    }
    assert ok["bdt_shipped_mod"] is True
    assert ok["definitely_not_a_module"] is False
    errs = matrix.filter(~F.col("ok")).select("error").distinct().collect()
    assert "ModuleNotFoundError" in errs[0]["error"]

    def use(batches):
        import bdt_shipped_mod

        for pdf in batches:
            pdf["id"] = pdf["id"].map(bdt_shipped_mod.triple)
            yield pdf

    out = sorted(r["id"] for r in spark.range(4).mapInPandas(use, "id long").collect())
    assert out == [0, 3, 6, 9]
