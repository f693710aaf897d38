"""Scale invariants on generated data an order of magnitude beyond the
largest fixture (5M rows) — closed-form expected values, so correctness
at this size is exact, not sampled.  These pin the properties that must
survive a 100× scale-up: partition-count independence of aggregates,
partials→final equivalence, salted == direct, hash-sample stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_table_spark.operators.aggregate import partials
from big_data_table_spark.operators.skew import salted_agg
from big_data_table_spark.operators.sampling import sample_by_hash

N = 5_000_000


@pytest.fixture(scope="module")
def big(spark):
    # k: 1000 groups; skew: key 0 owns an extra 20% of rows; v exact ints
    df = (
        spark.range(N)
        .withColumn("k", F.when(F.col("id") % 5 == 0, 0).otherwise(F.col("id") % 1000))
        .withColumn("v", F.col("id") % 97)
    )
    return df.persist()


def test_grouped_agg_partition_independent(big):
    a = (
        big.repartition(7)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    b = (
        big.repartition(64)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    pa = a.toPandas().sort_values("k").reset_index(drop=True)
    pb = b.toPandas().sort_values("k").reset_index(drop=True)
    assert pa.equals(pb)
    assert pa["n"].sum() == N
    total = big.agg(F.sum("v")).collect()[0][0]
    assert pa["s"].sum() == total


def test_two_phase_partials_equal_direct_at_scale(big):
    p = partials(big.repartition(32), by="k", aggs={"s": F.sum("v"), "n": F.count(F.lit(1))})
    refit = p.groupBy("k").agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    direct = big.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    diff = (
        refit.alias("a")
        .join(direct.alias("b"), "k")
        .filter((F.col("a.s") != F.col("b.s")) | (F.col("a.n") != F.col("b.n")))
        .count()
    )
    assert diff == 0


def test_salted_agg_handles_hot_key(big):
    """Key 0 holds ~1.2M of 5M rows (hot).  Salted result == direct."""
    direct = dict(
        (r["k"], (r["s"], r["n"]))
        for r in big.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("k") < 3)
        .collect()
    )
    salted = dict(
        (r["k"], (r["s"], r["n"]))
        for r in salted_agg(
            big,
            by="k",
            partial={"s": F.sum("v"), "n": F.count(F.lit(1))},
            merge={"s": F.sum("s"), "n": F.sum("n")},
            n_salts=32,
        )
        .filter(F.col("k") < 3)
        .collect()
    )
    assert direct == salted
    assert direct[0][1] >= N / 5  # the hot key really is hot (exactly every 5th row)


def test_hash_sample_partition_independent_at_scale(big):
    a = sample_by_hash(big.repartition(5), "id", 0.01).count()
    b = sample_by_hash(big.repartition(50), "id", 0.01).count()
    assert a == b
    assert abs(a / N - 0.01) < 0.001


def test_weighted_sample_partition_independent_at_scale(spark, big):
    """A-ES weighted sampling is a pure function of the data: the same
    5M-row table through 7 vs 64 partitions must select the IDENTICAL
    sample (content-hash uniforms, not engine RNG)."""
    from big_data_table_spark.operators.sampling import weighted_sample_sql

    sql = weighted_sample_sql(
        "spark", k=50, key_expr="id", weight_expr="v + 1", table="big5m"
    )
    out = {}
    for nparts, tag in ((7, "a"), (64, "b")):
        big.repartition(nparts).createOrReplaceTempView("big5m")
        out[tag] = (
            spark.sql(sql).toPandas().sort_values("id").reset_index(drop=True)
        )
    assert out["a"].equals(out["b"])
    assert len(out["a"]) == 50


def test_hll_rollup_merge_law_at_scale(spark, big):
    """The rollup architecture's load-bearing law at 5M rows: per-'day'
    register tables MAX-merged must equal the one-shot registers over
    the union BIT-FOR-BIT (not approximately — the merge law is exact
    even though the estimate is not), and the estimate must sit inside
    the p=8 nominal band around the known distinct count (spark.range →
    all ids distinct).  Also partition-count independent: the same
    registers from 7 and 32 partitions."""
    from big_data_table_spark.functions import sketches as SK

    ev = big.select(
        F.when(F.col("id") % 2 == 0, "2024-01-01")
        .otherwise("2024-01-02")
        .alias("day"),
        F.col("id").alias("v"),
    )
    per_day = SK.hll_registers(ev, ["day"], "v")
    merged = per_day.groupBy("bucket").agg(F.max("reg").alias("reg"))
    direct = SK.hll_registers(ev.select("v"), [], "v")
    # bucket is unique per table, so pairwise-equal row sets ⇔ the inner
    # join on (bucket, reg) covers both sides completely
    n_m, n_d = merged.count(), direct.count()
    n_match = merged.join(direct, ["bucket", "reg"]).count()
    assert n_m == n_d == n_match  # exact register equality, not estimates

    est = SK.hll_estimate_global(merged).collect()[0]["hll_est"]
    assert abs(est - N) / N < 0.2, est  # 3·1.04/sqrt(256) ≈ 0.2

    est7 = SK.hll_estimate_global(
        SK.hll_registers(ev.select("v").repartition(7), [], "v")
    ).collect()[0]["hll_est"]
    assert est7 == est


def test_training_order_permutation_at_scale(spark, big):
    """The two-phase training-order rank at 5M rows: positions are a
    closed-form-checkable permutation (sum == N(N−1)/2, max == N−1) and
    the per-bucket spine stays balanced — no bucket exceeds 2× the mean,
    so the in-bucket windows never degenerate toward a global sort.
    Partition-count independence is spot-checked on a deterministic key
    slice (full collect of 5M rows would be a driver OOM, which is the
    point of the operator)."""
    from big_data_table_spark.functions.packing import training_order

    docs = big.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 1_000_003).cast("string")).alias(
            "text"
        ),
    )
    out = training_order(docs).persist()
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("s"),
        F.max("pos").alias("mx"),
        F.countDistinct("pos").alias("nd"),
    ).collect()[0]
    n = agg["n"]
    assert n == N
    assert agg["mx"] == N - 1
    assert agg["nd"] == N
    assert agg["s"] == N * (N - 1) // 2  # exact: a dense 0..N-1 permutation

    # bucket balance from the md5 prefix of the text itself
    bal = (
        docs.select(F.substring(F.md5("text"), 1, 2).alias("b"))
        .groupBy("b")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("av"))
        .collect()[0]
    )
    assert bal["mx"] <= 2 * bal["av"]

    slice_a = {
        r["doc_id"]: r["pos"]
        for r in training_order(docs.repartition(7))
        .filter(F.col("doc_id") % 100_003 == 0)
        .collect()
    }
    slice_b = {
        r["doc_id"]: r["pos"]
        for r in training_order(docs.repartition(64))
        .filter(F.col("doc_id") % 100_003 == 0)
        .collect()
    }
    assert slice_a == slice_b and len(slice_a) > 0
    out.unpersist()


def test_theta_union_merge_law_at_scale(spark, big):
    """The theta store's load-bearing law at 5M rows: per-'day' KMV
    samples (k smallest distinct hashes per day) union-estimated must
    be partition-count independent BIT-FOR-BIT, and the estimate must
    sit inside the 3σ KMV band around the known distinct count
    (spark.range → all ids distinct).  Unlike HLL registers, merged
    theta samples are not identical to a one-shot sample (theta picks
    the min over days); what must hold exactly is determinism — the
    estimator is a pure function of the data, never of partitioning."""
    from pyspark.sql import Window

    from big_data_table_spark.functions import sketches as SK

    k = 256

    def estimate(n_part):
        ev = big.repartition(n_part).select(
            F.when(F.col("id") % 2 == 0, "2024-01-01")
            .otherwise("2024-01-02")
            .alias("day"),
            F.col("id").alias("v"),
        )
        rows = SK._theta_day_sample(ev, "v", k).localCheckpoint(eager=True)
        full = float(SK._MOD)
        theta = (
            rows.groupBy("day", "n")
            .agg(F.max("h").alias("hk"))
            .select(
                F.when(F.col("n") > k, F.col("hk").cast("double"))
                .otherwise(F.lit(full))
                .alias("th")
            )
        )
        thmin = theta.agg(F.min("th").alias("th"))
        c = (
            rows.crossJoin(F.broadcast(thmin))
            .filter(F.col("h") < F.col("th"))
            .agg(F.countDistinct("v").alias("c"))
        )
        r = c.crossJoin(thmin).select(
            F.round(F.col("c") * F.lit(full) / F.col("th"), 4).alias("est")
        )
        return r.collect()[0]["est"]

    est = estimate(32)
    assert abs(est - N) / N < 3.0 / (k**0.5) + 0.01, est
    assert estimate(7) == est  # partitioning-independent, bit-for-bit


def test_cms_store_merge_law_at_scale(spark, big):
    """The CMS store's load-bearing law at 5M rows: per-'day' counter
    tables built from a 2-way chunk split of each day, SUM-merged, must
    equal the one-shot counter table BIT-FOR-BIT (addition is exact —
    partitioning and chunking can never change a count), and every
    probe estimate must respect the no-underestimate guarantee against
    the closed-form true counts of the `big` fixture: key 0 owns
    exactly every 5th row (N/5 = 1M); a key k in 1..999 NOT divisible
    by 5 owns all 5000 rows with id%1000==k (none of them hit the
    id%5==0 branch); keys divisible by 5 (500, ...) never occur at all
    (id%1000==k forces id%5==0, which maps to key 0) — for those the
    guarantee still holds with true count 0, and the estimate is
    whatever collision mass the cells carry (>= 0 trivially), so they
    are deliberately NOT probed here."""
    from big_data_table_spark.functions import sketches as SK

    ev = big.select(
        F.when(F.col("id") % 2 == 0, "2024-01-01")
        .otherwise("2024-01-02")
        .alias("day"),
        F.col("k").alias("v"),
    )
    direct = {
        (r["day"], r["rw"], r["cl"]): r["cnt"]
        for r in SK._cms_day_counters(
            ev.withColumn("ts", F.col("day")), "v", "ts", 1024, 4
        ).collect()
    }
    chunked = (
        SK._cms_day_counters(
            ev.filter(F.col("v") % 2 == 0).withColumn("ts", F.col("day")),
            "v", "ts", 1024, 4,
        )
        .unionAll(
            SK._cms_day_counters(
                ev.filter(F.col("v") % 2 == 1).withColumn("ts", F.col("day")),
                "v", "ts", 1024, 4,
            )
        )
        .groupBy("day", "rw", "cl")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    merged = {
        (r["day"], r["rw"], r["cl"]): r["cnt"] for r in chunked.collect()
    }
    assert merged == direct  # SUM-merge == one-shot, bit for bit

    # probe a few keys against the closed-form truth: est >= true always
    probe = spark.createDataFrame([(0,), (1,), (7,), (999,)], "v long")
    rows = (
        spark.createDataFrame(
            [(d, rw, cl, c) for (d, rw, cl), c in direct.items()],
            "day string, rw int, cl bigint, cnt long",
        )
        .groupBy("rw", "cl")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    hh = SK._double_hashed_values(probe, "v")
    rcol = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("rw")
    pos = ((F.col("h1") + F.col("rw") * (F.col("h2") * 2 + 1)) % 1024).alias("cl")
    cells = hh.select("v", "h1", "h2", rcol).select("v", "rw", pos)
    est = {
        r["v"]: r["est"]
        for r in rows.join(F.broadcast(cells), ["rw", "cl"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    # closed-form (see docstring): key 0 = every 5th row exactly; keys
    # 1/7/999 (not divisible by 5) own all 5000 of their id%1000 rows
    truth = {0: N // 5, 1: 5000, 7: 5000, 999: 5000}
    for v, t in truth.items():
        assert est[v] >= t, (v, est[v], t)


def test_bitmap_store_exact_at_scale(spark, big):
    """The bitmap index's exactness law an order of magnitude beyond
    the fixtures: 5M rows / 1M distinct ids packed into ~16k words —
    popcount sums equal COUNT(DISTINCT) exactly, per day and over the
    union, and the BIT_OR merge is partition-count independent (the
    100 TB property: the index answer can never drift with layout)."""
    from big_data_table_spark.functions import bitmap_store as BS

    ev = big.select(
        (F.col("id") % 1_000_000).alias("user_id"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-01-0"), ((F.col("id") % 3) + 1).cast("string"),
                F.lit(" 00:00:00"),
            )
        ).alias("ts"),
    )
    rows_a = BS.bitmap_day_rows(ev.repartition(7), 0).persist()
    rows_b = BS.bitmap_day_rows(ev.repartition(64), 0)
    a = sorted(map(tuple, rows_a.collect()))
    assert a == sorted(map(tuple, rows_b.collect()))
    per_day = {
        r.day: r.dau
        for r in rows_a.groupBy("day")
        .agg(F.sum(F.bit_count("bm")).alias("dau"))
        .collect()
    }
    direct = {
        r.day: r.n
        for r in ev.select(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert per_day == direct
    union_pop = (
        rows_a.groupBy("word")
        .agg(F.bit_or("bm").alias("bm"))
        .agg(F.sum(F.bit_count("bm")).alias("n"))
        .collect()[0]["n"]
    )
    assert union_pop == ev.select("user_id").distinct().count()
    rows_a.unpersist()
