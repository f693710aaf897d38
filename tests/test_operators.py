"""Operator-level semantic pins: join direction (the SURVEY §7 risk
register), as-of vs pandas merge_asof, range join, set ops, windows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark.operators import joins as J
from big_data_table_spark.operators import setops as SO
from big_data_table_spark.operators import windows as W


def test_lookup_join_is_left_join_of_x(spark):
    """data.table ``y[x, on=]`` keeps unmatched x rows with NULL y columns
    — the easy-to-flip direction pinned by SURVEY.md §7."""
    x = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "xv": [10, 20, 30]}))
    y = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "yv": [100, 200]}))
    out = J.lookup_join(x, y, on="k").toPandas().sort_values("k")
    assert len(out) == 3
    assert pd.isna(out.loc[out.k == 3, "yv"]).all()


def test_semi_anti_partition_x(spark):
    x = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 4]}))
    keys = spark.createDataFrame(pd.DataFrame({"k": [2, 4, 9]}))
    semi = sorted(r["k"] for r in J.semi_join(x, keys, "k").collect())
    anti = sorted(r["k"] for r in J.anti_join(x, keys, "k").collect())
    assert semi == [2, 4] and anti == [1, 3]
    assert sorted(semi + anti) == [1, 2, 3, 4]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Backward as-of join == pandas merge_asof on the same data
    (allow_exact_matches=True semantics, per-group)."""
    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 60),
            "t": np.sort(rng.randint(0, 1000, 60)).astype("int64"),
            "lid": np.arange(60, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 25),
            "t": np.sort(rng.randint(0, 1000, 25)).astype("int64"),
            "rv": np.arange(25, dtype="int64") * 10,
        }
    )
    # make t unique per group so ties can't differ between engines
    right = right.drop_duplicates(subset=["g", "t"])
    out = (
        J.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="g",
            right_cols=["rv"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="g",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["rv"].astype("float64"), expected["rv"].astype("float64"), check_names=False
    )


def test_asof_join_forward(spark):
    left = pd.DataFrame({"t": [5, 15, 25], "lid": [0, 1, 2]})
    right = pd.DataFrame({"t": [10, 20], "rv": [100, 200]})
    out = (
        J.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            right_cols=["rv"],
            direction="forward",
            bucket_width=10,  # keyless → bucketed; forces cross-bucket carry
        )
        .toPandas()
        .sort_values("lid")
    )
    assert list(out["rv"].fillna(-1)) == [100, 200, -1]


def test_asof_join_keyless_requires_bucket_width(spark):
    """Scale-safety contract: a keyless as-of (no `by`) REFUSES to build
    the single-task unpartitioned-window plan — `bucket_width` routes it
    through the bucketed formulation instead (VERDICT r2 #4)."""
    left = spark.createDataFrame(pd.DataFrame({"t": [1, 2], "lid": [0, 1]}))
    right = spark.createDataFrame(pd.DataFrame({"t": [1], "rv": [10]}))
    with pytest.raises(ValueError, match="UNPARTITIONED"):
        J.asof_join(left, right, on="t", right_cols=["rv"])


def test_asof_join_bucketed_plan_has_no_unpartitioned_window(spark):
    """Every windowspecdefinition in the bucketed keyless plan carries a
    partition spec (no global-sort window survives to the physical plan)."""
    import re

    left = spark.createDataFrame(pd.DataFrame({"t": [5, 15, 25], "lid": [0, 1, 2]}))
    right = spark.createDataFrame(pd.DataFrame({"t": [10, 20], "rv": [100, 200]}))
    out = J.asof_join(
        left, right, on="t", right_cols=["rv"], bucket_width=10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected Window nodes in the bucketed as-of plan"
    for spec in specs:
        # spec = "part1, part2, ..., order ASC NULLS FIRST, ..., frame" —
        # an unpartitioned window starts directly with the ordering expr
        first = spec.split(",")[0]
        assert "ASC" not in first and "DESC" not in first, (
            f"unpartitioned window in plan: windowspecdefinition({spec})"
        )


def test_range_join(spark):
    left = spark.createDataFrame(pd.DataFrame({"v": [5, 15, 25, 35]}))
    right = spark.createDataFrame(
        pd.DataFrame({"lo": [0, 10, 30], "hi": [9, 19, 39], "tag": ["a", "b", "c"]})
    )
    out = J.range_join(left, right, "v", "lo", "hi", bucket_width=10.0).toPandas()
    got = dict(zip(out["v"], out["tag"]))
    assert got == {5: "a", 15: "b", 35: "c"}  # 25 matches nothing


def test_rbindlist_fill(spark):
    a = spark.createDataFrame(pd.DataFrame({"x": [1], "y": [2.0]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [3]}))
    out = SO.rbindlist([a, b], fill=True).toPandas()
    assert len(out) == 2 and out["y"].isna().sum() == 1


def test_distinct_by(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 1, 2], "v": [9, 8, 7]}))
    assert SO.distinct_by(df, ["k"]).count() == 2
    assert SO.distinct_by(df).count() == 3


def test_topk_per_group_deterministic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4, "v": [3, 1, 2, 4, 5, 8, 7, 6], "id": range(8)})
    )
    out = W.topk_per_group(df, "g", [F.col("v").desc(), F.col("id")], k=2).toPandas()
    assert sorted(out.loc[out.g == "a", "v"]) == [3, 4]
    assert sorted(out.loc[out.g == "b", "v"]) == [7, 8]


def test_sessionize_gap_law(spark):
    pdf = pd.DataFrame(
        {
            "u": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 02:00:00",
                 "2024-01-01 00:00:00"]
            ),
        }
    )
    out = W.sessionize(spark.createDataFrame(pdf), "u", "ts", gap_seconds=1800).toPandas()
    u1 = out[out.u == 1].sort_values("ts")["session_id"].tolist()
    assert u1 == [1, 1, 2]  # 2h gap starts a new session
    assert out[out.u == 2]["session_id"].tolist() == [1]


def test_scd2_apply(spark):
    """SCD2: updated key's open row closes at the effective date; new
    version opens; untouched keys pass through."""
    from big_data_table_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "v": ["a0", "a1", "b0"],
                "valid_from": ["2020-01-01", "2022-01-01", "2021-01-01"],
                "valid_to": ["2022-01-01", "9999-12-31", "9999-12-31"],
            }
        )
    )
    upd = spark.createDataFrame(
        pd.DataFrame({"k": [1], "v": ["a2"], "eff": ["2024-01-01"]})
    )
    out = scd2_apply(hist, upd, key="k", effective_col="eff").toPandas()
    assert len(out) == 4
    k1 = out[out.k == 1].sort_values("valid_from")
    assert list(k1["v"]) == ["a0", "a1", "a2"]
    assert list(k1["valid_to"]) == ["2022-01-01", "2024-01-01", "9999-12-31"]
    k2 = out[out.k == 2]
    assert list(k2["valid_to"]) == ["9999-12-31"]


def test_upsert_insert_and_update(spark):
    from big_data_table_spark.operators.merge import upsert

    target = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    updates = spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": [99, 30]}))
    out = upsert(target, updates, key="k").toPandas().sort_values("k")
    assert dict(zip(out["k"], out["v"])) == {1: 10, 2: 99, 3: 30}


def test_split_by_hash_stability_and_disjointness(spark):
    """Split membership is a pure key function: identical across
    repartitionings, disjoint, and ~proportional."""
    from big_data_table_spark.operators.sampling import split_by_hash

    df = spark.range(5000).withColumnRenamed("id", "k")
    a = split_by_hash(df.repartition(3), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    b = split_by_hash(df.repartition(17), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    pa = a.toPandas().set_index("k")["split"]
    pb = b.toPandas().set_index("k")["split"]
    assert (pa.sort_index() == pb.sort_index()).all()  # partitioning-independent
    counts = pa.value_counts()
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert counts.sum() == 5000  # fractions sum to 1 -> no NULL split


def test_connected_components_long_chain_no_lineage_blowup(spark):
    """Regression: a high-diameter graph (30-node path) must converge
    without driver OOM — each round localCheckpoints to truncate lineage
    (pre-fix, planning memory grew per round and died ~10 rounds in)."""
    from big_data_table_spark.operators.graph import connected_components

    n = 30
    nodes = spark.createDataFrame(pd.DataFrame({"id": list(range(n))}))
    edges = spark.createDataFrame(
        pd.DataFrame({"a": list(range(n - 1)), "b": list(range(1, n))})
    )
    cc = connected_components(nodes, edges, "id", "a", "b", max_iter=n + 2).toPandas()
    assert (cc["label"] == 0).all()


def test_rbindlapply_idcol(spark):
    from big_data_table_spark.operators.setops import rbindlapply

    out = rbindlapply([2, 3], lambda k: spark.range(k), idcol="src").toPandas()
    assert len(out) == 5
    assert sorted(out["src"].unique()) == [2, 3]
