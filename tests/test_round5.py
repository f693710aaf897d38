"""Round-5 pins: HLL 64-bit hash fold, as-of atomic struct carry with NULL
right columns, require() probe coverage, HLL inclusion-exclusion error band,
WAV decode, sequence packing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from big_data_table_spark.functions import sketches as SK
from big_data_table_spark.functions.portable import DUCK
from big_data_table_spark.operators import joins as J


# --------------------------------------------------------------------- #
# HLL: 64-bit inputs are folded, not truncated (ADVICE r4, medium)
# --------------------------------------------------------------------- #


def test_hll_fold_distinguishes_keys_above_2_32(spark):
    """Keys that differ ONLY in the high 32 bits must not collapse:
    snowflake-style ids ``v << 32`` all share low word 0, so truncation
    (`% 2^32`) hashes every one of the 1000 distinct keys to hash(0) →
    estimate 1; the lo^hi fold keeps them distinct → estimate ≈ 1000."""
    vals = [v << 32 for v in range(1, 1001)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    est = SK.hll_estimate_global(SK.hll_registers(df, [], "v")).collect()[0]["hll_est"]
    assert est > 800, f"high-word keys collapsed: estimate {est} for 1000 distinct"


def test_hll_fold_spark_duckdb_lockstep(spark):
    """The folded hash must stay bit-identical across engines — same
    estimate from the DataFrame path and the DuckDB oracle SQL on values
    straddling 2^32."""
    import duckdb

    vals = [(v,) for v in range(1, 301)] + [
        (v + (1 << 32) * k,) for v in range(1, 301) for k in (1, 2)
    ]
    df = spark.createDataFrame(vals, "v long")
    spark_est = SK.hll_estimate_global(SK.hll_registers(df, [], "v")).collect()[0][
        "hll_est"
    ]
    con = duckdb.connect()
    con.register("t64", pd.DataFrame({"v": [v[0] for v in vals]}))
    duck_est = con.execute(
        SK.hll_estimate_sql("t64", "", "v", dialect=DUCK)
    ).fetchone()[0]
    con.close()
    assert spark_est == duck_est, (spark_est, duck_est)


def test_hll_fold_identity_below_2_32(spark):
    """For values < 2^32 the fold is the identity (hi word is 0), so the
    r4-pinned fixture estimates are unchanged by the fix: spot-check the
    exact estimate for a known input against its pre-fix value class —
    the estimate for 1..1000 must equal the estimate for the same values
    run through the old truncating hash (trivially true since they are
    the same hash here; this pins the fold's identity property)."""
    df = spark.createDataFrame([(v,) for v in range(1, 1001)], "v long")
    est = SK.hll_estimate_global(SK.hll_registers(df, [], "v")).collect()[0]["hll_est"]
    # nominal HLL band at p=8 for n=1000: ±3*1.04/sqrt(256) ≈ ±20%
    assert abs(est - 1000) / 1000 < 0.2, est


# --------------------------------------------------------------------- #
# as-of: NULL right columns survive the carry atomically (ADVICE r4, low)
# --------------------------------------------------------------------- #


def _null_carry_frames(spark):
    # right row at t=3 matches backward from t=5, and its `a` is
    # legitimately NULL; the older row (t=1) has a=10 — a per-column fill
    # back-slides a to 10 while taking b from t=3, mixing rows.
    left = spark.createDataFrame([(1, 5), (1, 2)], "k int, t int")
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1],
                "t": [1, 3],
                "a": pd.array([10, None], dtype="Int64"),
                "b": ["x", "y"],
            }
        )
    )
    return left, right


def test_asof_keyed_null_right_column_stays_null(spark):
    left, right = _null_carry_frames(spark)
    out = {
        r["t"]: (r["a"], r["b"])
        for r in J.asof_join(left, right, on="t", by="k").collect()
    }
    assert out[5] == (None, "y"), f"per-column back-slide: {out[5]}"
    assert out[2] == (10, "x")


def test_asof_bucketed_null_right_column_stays_null(spark):
    left, right = _null_carry_frames(spark)
    out = {
        r["t"]: (r["a"], r["b"])
        for r in J.asof_join(
            left.drop("k"), right.drop("k"), on="t", bucket_width=2.0
        ).collect()
    }
    assert out[5] == (None, "y"), f"per-column back-slide: {out[5]}"
    assert out[2] == (10, "x")


def test_asof_bucketed_cross_bucket_null_carry(spark):
    """The cross-bucket boundary carry must also keep the matched row's
    NULLs: right rows land in bucket 0, left in a far bucket with no
    in-bucket match — resolved via the broadcast boundary table."""
    left = spark.createDataFrame([(100,)], "t int")
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [1, 3],
                "a": pd.array([10, None], dtype="Int64"),
                "b": ["x", "y"],
            }
        )
    )
    row = J.asof_join(left, right, on="t", bucket_width=5.0).collect()[0]
    assert (row["a"], row["b"]) == (None, "y"), (row["a"], row["b"])


# --------------------------------------------------------------------- #
# require(): probe matrix covers every advertised task (ADVICE r4, low)
# --------------------------------------------------------------------- #


def test_require_probe_covers_every_core(spark):
    from big_data_table_spark.session import require

    n = spark.sparkContext.defaultParallelism
    probes = require(spark, ["math"]).collect()
    assert len(probes) == n
    assert {r["probe_id"] for r in probes} == set(range(n))
    assert all(r["ok"] for r in probes)
