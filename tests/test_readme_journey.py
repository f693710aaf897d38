"""The reference's executable-README user journey (tests-06-readme.R)
ported end-to-end: build a typed table, ship it, query it, materialize a
derived dataset, lookup-join it back, gather, and round-trip through CSV
— one continuous session, mirroring the reference's integration-style
test strategy (SURVEY.md §5: zero mocks, live cluster)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from big_data_table_spark import BigDataTable
from big_data_table_spark.operators.aggregate import agg_all
from big_data_table_spark.operators.joins import lookup_join
from big_data_table_spark.sources.readers import read_csv, write_csv


def iris_like(n_per_species: int = 50) -> pd.DataFrame:
    """Deterministic iris-shaped table (the reference's canonical typed
    fixture, FIXTURES.md A2).  R's factor Species maps to string —
    the documented type departure (SURVEY.md §7)."""
    rows = []
    for si, sp in enumerate(["setosa", "versicolor", "virginica"]):
        for i in range(n_per_species):
            rows.append(
                {
                    "sepal_length": 4.0 + si + (i % 10) / 10.0,
                    "sepal_width": 2.0 + si / 2 + (i % 5) / 10.0,
                    "petal_length": 1.0 + si * 1.5 + (i % 7) / 10.0,
                    "petal_width": 0.1 + si * 0.8 + (i % 3) / 10.0,
                    "species": sp,
                }
            )
    return pd.DataFrame(rows)


def test_readme_journey(spark, tmp_path):
    pdf = iris_like()

    # 1. upload + shard (tests-06:107-124; as.big.data.table.data.table)
    bdt = BigDataTable.from_pandas(spark, pdf).repartition(4)
    assert bdt.dim() == (150, 5)
    assert bdt.names[-1] == "species"
    # factor -> string departure, same values
    assert bdt.column_probe("species").typeName() == "string"

    # 2. grouped means over .SD (tests-06:244-253: lapply(.SD, mean))
    means = agg_all(bdt.df, by="species", fn=F.avg, prefix="avg_")
    assert means.count() == 3

    # 3. remote materialization y <- ... (tests-06:214-225: new.var)
    y = BigDataTable(means).materialize("y", persist=True)
    assert y.var == "y"
    assert BigDataTable.from_view(spark, "y").nrow == 3

    # 4. node-local-style lookup join y[x, on=Species] (tests-06:255-257)
    joined = lookup_join(bdt.df, spark.table("y"), on="species", broadcast=True)
    assert joined.count() == 150
    assert "avg_petal_width" in joined.columns
    # every row carries its species' mean
    chk = (
        joined.groupBy("species")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("avg_sepal_length").cast("bigint").alias("k"),
        )
        .collect()
    )
    assert all(r["n"] == 50 and r["k"] == 1 for r in chk)

    # 5. gather round-trip equivalence (tests-06:299-306)
    back = bdt.to_pandas()
    assert len(back) == 150
    got = back.groupby("species")["petal_length"].sum().sort_index()
    exp = pdf.groupby("species")["petal_length"].sum().sort_index()
    assert np.allclose(got, exp)

    # 6. CSV round trip (tests-06:87-98: write.csv + fread)
    path = str(tmp_path / "iris_csv")
    write_csv(bdt.df, path)
    back2 = read_csv(
        spark,
        path,
        schema="sepal_length double, sepal_width double, petal_length double, "
        "petal_width double, species string",
        infer_schema=False,
    )
    assert back2.count() == 150
    assert (
        back2.agg(F.sum(F.col("sepal_length").cast("decimal(18,6)"))).collect()[0][0]
        == bdt.df.agg(F.sum(F.col("sepal_length").cast("decimal(18,6)"))).collect()[0][0]
    )

    # 7. cleanup rm(x, y) (tests-06:101)
    y.drop_var(spark)
    assert "y" not in [t.name for t in spark.catalog.listTables()]


def test_print_golden_line_counts(spark):
    """The reference pins EXACT print line counts
    (tests-06-readme.R:178-181: 12 lines default, 6 at topn=2, 4 at
    topn=1, 22 at topn=10).  Same golden form here: header + topn head
    + ``---`` + topn tail == 2·topn + 2 lines, so a formatting
    regression is caught the way the reference catches it."""
    bdt = BigDataTable.from_pandas(spark, iris_like()).repartition(4)
    for topn in (1, 2, 5, 10):
        block = bdt.print_(topn=topn)
        assert len(block.splitlines()) == 2 * topn + 2, (topn, block)
