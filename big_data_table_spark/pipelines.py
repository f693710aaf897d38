"""Composed training-data pipelines — the operators of ``functions/`` and
``operators/`` chained the way a 100 TB corpus job actually runs them:

    quality filter → exact dedup → (optional) near-dup clustering →
    deterministic split

Each stage is a DataFrame→DataFrame function, so the whole pipeline is ONE
lazy Catalyst plan (plus the bounded iterative CC stage when enabled) —
no materialization between stages unless asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register_views
from .functions.portable import SPARK
from .functions.text import quality_score_sql
from .operators.sampling import split_by_hash


def quality_filter(spark: SparkSession, min_score: float) -> DataFrame:
    """documents with quality_score ≥ min_score (functions/text.py
    heuristic), keeping the doc row."""
    scores = spark.sql(quality_score_sql(SPARK)).select("doc_id", "quality_score")
    docs = spark.table("documents")
    return docs.join(scores, "doc_id").filter(F.col("quality_score") >= min_score)


def exact_dedup_keepers(docs: DataFrame) -> DataFrame:
    """One representative (min doc_id) per distinct text."""
    keep = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi")


def neardup_keepers(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Drop near-duplicates: MinHash-LSH candidates → connected
    components → keep min-id per cluster.  Iterative (bounded) stage."""
    from .catalog_breadth import _minhash_lsh_pairs_fn
    from .operators.graph import connected_components

    pairs = _minhash_lsh_pairs_fn(spark, spark.conf.get("bdt.sf_dir"))
    cc = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id", src="doc_a", dst="doc_b"
    )
    survivors = cc.filter(F.col("node") == F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(survivors, "doc_id", "left_semi")


def clean_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 0.55,
    near_dedup: bool = False,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """The composed pipeline → per-split corpus summary
    (split, n_docs, chars)."""
    register_views(spark, sf_dir)
    spark.conf.set("bdt.sf_dir", sf_dir)
    docs = quality_filter(spark, min_quality)
    docs = exact_dedup_keepers(docs)
    if near_dedup:
        docs = neardup_keepers(spark, docs)
    out = split_by_hash(
        docs, key="doc_id", fractions=fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
