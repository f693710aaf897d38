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
    # iloc-slice instead of np.array_split(DataFrame): the latter routes
    # through pandas' deprecated swapaxes and will break on a future pandas
    bounds = np.linspace(0, len(pdf), nsplit + 1, dtype=int)
    chunks = [pdf.iloc[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])]
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
            bucket_width=100,  # keyless → the bucketed two-pass path
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(left, right, on="t", direction="backward")
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"), check_names=False
    )


@settings(deadline=None, max_examples=40)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=400,
    ),
    splits=st.integers(min_value=1, max_value=5),
)
def test_tdigest_compress_merge_properties(vals, splits):
    """Digest invariants that must hold for ANY input and ANY partition
    split: total weight conserved, centroid means sorted and inside the
    data range, quantile estimates monotone in q and inside [min, max],
    and merging per-chunk digests equals (within rank tolerance) the
    one-shot digest."""
    import numpy as np

    from big_data_table_spark.operators.tdigest import (
        _compress,
        _quantile,
    )

    arr = np.array(vals, dtype=float)
    m1, w1 = _compress(arr, np.ones_like(arr), 100.0)
    assert abs(w1.sum() - len(arr)) < 1e-9
    assert (np.diff(m1) >= 0).all()
    assert m1[0] >= arr.min() - 1e-9 and m1[-1] <= arr.max() + 1e-9

    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    ests = [_quantile(m1, w1, q) for q in qs]
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    assert all(arr.min() - 1e-9 <= e <= arr.max() + 1e-9 for e in ests)

    # chunked build + merge ≈ one-shot build (the mergeability contract)
    chunks = np.array_split(arr, splits)
    ms, ws = [], []
    for c in chunks:
        if len(c):
            cm, cw = _compress(c, np.ones_like(c), 100.0)
            ms.append(cm)
            ws.append(cw)
    mm, mw = _compress(np.concatenate(ms), np.concatenate(ws), 100.0)
    assert abs(mw.sum() - len(arr)) < 1e-9
    for q in qs:
        merged_est = _quantile(mm, mw, q)
        # compare by RANK, not value (values can sit on a plateau)
        rank = (arr <= merged_est).mean()
        lo = (arr < merged_est).mean()
        assert lo - 0.15 <= q <= rank + 0.15
