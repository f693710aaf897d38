"""Property-based equivalence tests (hypothesis): the engine's query
operator vs a local pandas oracle on randomized small frames — the
reference's local-vs-distributed equivalence technique
(tests-03-as.big.data.table.R:53-60) generalized from one fixed workload
to generated ones."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_table_spark import BigDataTable
from big_data_table_spark.operators.joins import asof_join
from big_data_table_spark.operators.setops import rbindlist

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def frames(draw, min_rows=1, max_rows=40):
    n = draw(st.integers(min_rows, max_rows))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=n, max_size=n))
    ints = draw(
        st.lists(st.integers(-(10**6), 10**6), min_size=n, max_size=n)
    )
    floats = draw(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "k": keys,
            "i": np.array(ints, dtype="int64"),
            "x": np.array(floats, dtype="float64"),
        }
    )


@SETTINGS
@given(pdf=frames())
def test_grouped_agg_matches_pandas(spark, pdf):
    bdt = BigDataTable.from_pandas(spark, pdf).repartition(3)
    got = (
        bdt.q(j={"n": F.count(F.lit(1)), "si": F.sum("i")}, by="k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        pdf.groupby("k")
        .agg(n=("i", "size"), si=("i", "sum"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "si": "int64"}), exp.astype({"n": "int64", "si": "int64"})
    )


@SETTINGS
@given(pdf=frames())
def test_filter_then_count_matches_pandas(spark, pdf):
    bdt = BigDataTable.from_pandas(spark, pdf)
    thresh = float(pdf["x"].median())
    got = bdt.q(i=F.col("x") > thresh).nrow
    assert got == int((pdf["x"] > thresh).sum())


@SETTINGS
@given(pdf=frames(min_rows=4), nsplit=st.integers(2, 4))
def test_rbindlist_partition_roundtrip(spark, pdf, nsplit):
    """Splitting a frame and rbinding the shards reproduces the whole —
    the reference's shard/gather identity."""
    chunks = np.array_split(pdf, nsplit)
    dfs = [spark.createDataFrame(c) for c in chunks if len(c)]
    whole = rbindlist(dfs).toPandas()
    assert len(whole) == len(pdf)
    assert whole["i"].sum() == pdf["i"].sum()


@SETTINGS
@given(
    lt=st.lists(st.integers(0, 500), min_size=1, max_size=30),
    rt=st.lists(st.integers(0, 500), min_size=1, max_size=15),
)
def test_asof_matches_merge_asof(spark, lt, rt):
    left = pd.DataFrame({"t": sorted(lt)}).astype("int64")
    left["lid"] = np.arange(len(left), dtype="int64")
    right = (
        pd.DataFrame({"t": sorted(set(rt))}).astype("int64").reset_index(drop=True)
    )
    right["rv"] = np.arange(len(right), dtype="int64")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            right_cols=["rv"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(left, right, on="t", direction="backward")
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"), check_names=False
    )
