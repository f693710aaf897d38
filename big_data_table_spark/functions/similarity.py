"""Similarity search over the ``embeddings`` table (``embedding:
array<float>``) — ANN extensions (BASELINE.json north-star).

Cosine is computed entirely JVM-side with higher-order array functions
(``zip_with`` + ``aggregate`` fold) — no Python UDF in the hot path.  The
fold runs in array-index order in both Spark and DuckDB, and results are
rounded (6 dp for decisions, 9 dp for ranking) so the two engines'
last-bit float behavior cannot flip a comparison.

Scale design:

* brute-force top-k — queries are broadcast against the corpus; the
  per-partition work is a k-heap (row_number window per query), so cost is
  |Q|·|corpus| scans with no corpus shuffle.  This is the *baseline*.
* LSH-bucketed variant (random-hyperplane signs derived from md5, so the
  planes are deterministic and oracle-reproducible) — candidates meet only
  within a signature bucket: the scale path for |Q| ≈ |corpus|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import DUCK, SPARK


# --------------------------------------------------------------------- #
# DataFrame-API cosine (library surface)
# --------------------------------------------------------------------- #

def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as an in-order JVM fold (no UDF)."""
    prod = F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# --------------------------------------------------------------------- #
# dual-dialect SQL builders (oracle-checkable)
# --------------------------------------------------------------------- #

def _dot_sql(a: str, b: str, dialect: str) -> str:
    if dialect == SPARK:
        return (
            f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
            "(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _cos_sql(a: str, b: str, dialect: str) -> str:
    return (
        f"({_dot_sql(a, b, dialect)} / "
        f"(sqrt({_dot_sql(a, a, dialect)}) * sqrt({_dot_sql(b, b, dialect)})))"
    )


def embedding_neardup_sql(dialect: str, threshold: float = 0.95) -> str:
    """Near-duplicate pairs by cosine ≥ threshold, blocked by ``label``
    (pairs across labels are not compared — the pipeline's cheap blocking
    key).  Output: (vec_a, vec_b, cosine rounded to 6 dp)."""
    cos = _cos_sql("a.embedding", "b.embedding", dialect)
    return (
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"ROUND({cos}, 6) AS cos_sim "
        "FROM embeddings a JOIN embeddings b "
        "ON a.label = b.label AND a.vec_id < b.vec_id "
        f"WHERE ROUND({cos}, 6) >= {threshold}"
    )


def ann_topk_sql(dialect: str, n_queries: int = 5, k: int = 10) -> str:
    """Brute-force cosine top-k: the first ``n_queries`` vectors by id are
    the query set; rank the rest of the corpus per query.  Ranking key is
    (cosine rounded to 9 dp DESC, vec_id ASC) — a total order shared by
    both engines."""
    cos = _cos_sql("q.embedding", "c.embedding", dialect)
    return (
        f"WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}), "
        "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
        f"ROUND({cos}, 9) AS cos_sim "
        "FROM q JOIN embeddings c ON c.vec_id <> q.vec_id), "
        "ranked AS (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk "
        "FROM scored) "
        f"SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk "
        f"FROM ranked WHERE rnk <= {k}"
    )


def _hyperplane_bit_sql(plane: int, dialect: str) -> str:
    """Deterministic random hyperplane: dimension d's sign for plane p is
    the high bit of md5('p|d')'s first hex char.  The signed sum's sign is
    the signature bit — identical construction in both engines."""
    if dialect == SPARK:
        signed = (
            "aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), (acc, i) -> acc + "
            f"CASE WHEN substr(md5(concat('{plane}|', CAST(i AS STRING))), 1, 1) >= '8' "
            "THEN CAST(element_at(embedding, i) AS DOUBLE) "
            "ELSE -CAST(element_at(embedding, i) AS DOUBLE) END)"
        )
    else:
        signed = (
            "list_sum(list_transform(range(1, len(embedding) + 1), i -> "
            f"CASE WHEN substr(md5(concat('{plane}|', CAST(i AS VARCHAR))), 1, 1) >= '8' "
            "THEN CAST(embedding[i] AS DOUBLE) "
            "ELSE -CAST(embedding[i] AS DOUBLE) END))"
        )
    return f"CASE WHEN {signed} >= 0 THEN '1' ELSE '0' END"


def ann_lsh_pairs_sql(dialect: str, n_planes: int = 8, threshold: float = 0.9) -> str:
    """LSH-bucketed near-neighbor pairs — the scale path: random-hyperplane
    signature buckets, exact cosine verification only *within* a bucket.
    At 100 TB the bucket join replaces the quadratic all-pairs compare."""
    bits = ", ".join(f"{_hyperplane_bit_sql(p, dialect)} AS b{p}" for p in range(n_planes))
    sig = "concat(" + ", ".join(f"b{p}" for p in range(n_planes)) + ")"
    cos = _cos_sql("a.embedding", "b.embedding", dialect)
    return (
        f"WITH sigs AS (SELECT vec_id, embedding, {bits} FROM embeddings), "
        f"bucketed AS (SELECT vec_id, embedding, {sig} AS sig FROM sigs) "
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"ROUND({cos}, 6) AS cos_sim "
        "FROM bucketed a JOIN bucketed b ON a.sig = b.sig AND a.vec_id < b.vec_id "
        f"WHERE ROUND({cos}, 6) >= {threshold}"
    )


__all__ = [
    "dot",
    "cosine",
    "embedding_neardup_sql",
    "ann_topk_sql",
    "ann_lsh_pairs_sql",
    "SPARK",
    "DUCK",
]
