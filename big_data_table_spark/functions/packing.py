"""Sequence packing — deterministic document → context-window binning,
the last step of every LLM training-data pipeline (after dedup, quality
filtering, and tokenization the surviving documents are packed into
fixed-token-budget context windows).

Semantics: documents are laid out in **content-hash order** (md5 of the
text — deterministic, partitioning-independent, and decorrelated from
crawl order, which is exactly why real pipelines shuffle by hash before
packing) and assigned greedily to consecutive bins of ``budget`` tokens:
``bin_id = floor(exclusive_prefix_sum(tokens) / budget)``.  A document
whose tokens straddle a bin boundary is charged to the bin where it
starts, so a bin can overflow by at most ``max_doc_tokens - 1`` — the
standard concat-then-chunk packing model (what a T5/GPT-style loader
does when it concatenates documents and slices fixed-length windows),
NOT bin-packing-with-rejection, which is inherently sequential and
cannot scale.

Scale (100 TB): the global prefix sum is the textbook two-phase
distributed scan, never a global sort —

1. range-partition on the first hex byte of the hash (256 buckets whose
   lexicographic order IS md5-string order), windowed cumsum **inside**
   each bucket;
2. bucket offsets from a 256-row aggregate (one row per bucket —
   metadata-sized, broadcast back), added to the in-bucket prefix.

Every window in the plan is partitioned except the one over the 256-row
bucket-total table, which is bounded by construction (same pattern as
the as-of boundary-table carry, operators/joins.py).  DuckDB oracle:
a plain global-window cumsum — same numbers, different physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import DUCK, SPARK, arr_len, split_ws


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: list[str] | None = None,
    tokens_col: str | None = None,
    hash_col: str | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-document bin assignment: ``(by…, doc_id, n_tokens, bin_id)``.

    Tokens default to whitespace tokens (``functions.text.token_count_sql``
    semantics); pass ``tokens_col`` to charge a precomputed count instead
    — e.g. the learned subword counts from :mod:`.subword`, the realistic
    packing currency (``sequence_packing_subword`` in the catalog).  Ties
    on identical text (same md5) break by ``id_col`` so the layout is
    total and reproducible.

    ``by`` packs independently per group (the realistic setup — bins
    never mix languages or sources); bin ids restart at 0 per group.
    With ``by`` the offset window is partitioned too, so the plan has
    NO unpartitioned window at all; without it the offset window runs
    over the ≤256-row bucket-total table, bounded by construction.

    ``hash_col`` supplies a precomputed layout hash instead of
    ``md5(text_col)`` — what lets a persisted token LEDGER ``(doc_id,
    h, n_tokens)`` drive packing without carrying the text at all
    (the streaming ingestion path, ``stream_packing_ledger``).
    ``carry`` names extra columns to pass through to the output
    untouched (e.g. the draw's source/epoch in the curriculum packing
    composition) — they take no part in the layout."""
    by = list(by or [])
    carry = list(carry or [])
    n_tokens = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else F.expr(arr_len(split_ws(text_col, SPARK), SPARK)).cast("long")
    )
    d = docs.select(
        *by,
        *carry,
        F.col(id_col).alias("doc_id"),
        (F.col(hash_col) if hash_col else F.md5(F.col(text_col))).alias("h"),
        n_tokens.alias("n_tokens"),
    )
    # phase 1: in-bucket exclusive prefix sum, windows partitioned by the
    # 2-hex-char range bucket (lexicographic bucket order == md5 order)
    d = d.withColumn("bucket", F.substring("h", 1, 2))
    w_in = (
        Window.partitionBy(*by, "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("in_prefix", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))

    # phase 2: per-group bucket offsets — ≤256 rows per group, broadcast
    # back onto the doc stream
    totals = d.groupBy(*by, "bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_off = (
        Window.partitionBy(*by)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *by,
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("offset"),
    )
    return (
        d.join(F.broadcast(offsets), by + ["bucket"])
        .select(
            *by,
            *carry,
            "doc_id",
            "n_tokens",
            F.floor((F.col("offset") + F.col("in_prefix")) / F.lit(budget))
            .cast("long")
            .alias("bin_id"),
            # the doc's global token prefix within its group — exposed so
            # downstream layout metadata (pack_boundaries' attention-mask
            # offsets) needn't recompute the two-phase sum
            (F.col("offset") + F.col("in_prefix")).cast("long").alias("prefix"),
        )
    )


def pack_summary(
    packed: DataFrame, budget: int = 2048, by: list[str] | None = None
) -> DataFrame:
    """Per-bin report: doc count, token sum, and fill ratio against the
    budget (overflow > 1.0 is the charged-where-it-starts straddle)."""
    by = list(by or [])
    return packed.groupBy(*by, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill_ratio"),
    )


def pack_sequences_sql(
    budget: int = 2048,
    dialect: str = DUCK,
    by: list[str] | None = None,
    tokens_cte: str | None = None,
) -> str:
    """Dual-dialect oracle: the same layout as ONE global-window cumsum
    per group (correct at oracle scale; the Spark path replaces the
    global window with the two-phase scan).  ``tokens_cte`` — a CTE body
    yielding ``(doc_id, n_tokens)`` — swaps the charged counts, matching
    :func:`pack_sequences`'s ``tokens_col`` (the subword integration).
    It may open with ``RECURSIVE`` to upgrade the whole WITH clause."""
    by = list(by or [])
    bysel = "".join(f"{c}, " for c in by)
    part = ("PARTITION BY " + ", ".join(by) + " ") if by else ""
    grp = "".join(f"{c}, " for c in by)
    tok = arr_len(split_ws("text", dialect), dialect)
    if tokens_cte:
        d_cte = f"""{tokens_cte},
d AS (
  SELECT {bysel}documents.doc_id, md5(text) AS h, t.n_tokens
  FROM documents JOIN toks t ON t.doc_id = documents.doc_id)"""
    else:
        d_cte = f"""d AS (
  SELECT {bysel}doc_id, md5(text) AS h, CAST({tok} AS BIGINT) AS n_tokens
  FROM documents)"""
    return f"""
WITH {d_cte},
p AS (
  SELECT {bysel}doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER ({part}
      ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM d)
SELECT {bysel}CAST(FLOOR(prefix / {budget}.0) AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
  ROUND(SUM(n_tokens) / CAST({budget} AS DOUBLE), 6) AS fill_ratio
FROM p GROUP BY {grp}bin_id
"""


def training_order(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: list[str] | None = None,
) -> DataFrame:
    """Deterministic global TRAINING-ORDER permutation: ``(by…, doc_id,
    pos)`` with ``pos`` a dense 0..n−1 position in ``(md5(text),
    doc_id)`` order — the "shuffled" serving order a training run reads
    sequentially.  Content-hash order is the same determinism discipline
    as the split/sample operators (operators/sampling.py): the
    permutation depends only on the DATA, never on partitioning, cluster
    size, or read order, so a re-run (or a different cluster) feeds
    batches in the identical sequence — reproducible training without
    materializing a random key.

    Same two-phase scheme as :func:`pack_sequences`, which is why it
    lives here: an in-bucket ``row_number`` partitioned by the 2-hex-char
    md5 prefix (lexicographic bucket order == md5 order), plus a
    broadcast ≤256-row bucket-count offset table.  NO unpartitioned
    window over the corpus — the global sort a naive ``ROW_NUMBER() OVER
    (ORDER BY md5)`` would demand is exactly what this avoids at 100 TB
    (the offset window runs over bucket totals, bounded by construction;
    with ``by`` it is partitioned too)."""
    by = list(by or [])
    d = docs.select(
        *by, F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h")
    ).withColumn("bucket", F.substring("h", 1, 2))
    w_in = Window.partitionBy(*by, "bucket").orderBy("h", "doc_id")
    d = d.withColumn("in_rank", F.row_number().over(w_in) - 1)
    totals = d.groupBy(*by, "bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    w_off = (
        Window.partitionBy(*by)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *by,
        "bucket",
        F.coalesce(F.sum("bucket_n").over(w_off), F.lit(0)).alias("offset"),
    )
    return (
        d.join(F.broadcast(offsets), by + ["bucket"])
        .select(
            *by,
            "doc_id",
            (F.col("offset") + F.col("in_rank")).cast("long").alias("pos"),
        )
    )


def pack_boundaries(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-bin DOCUMENT-BOUNDARY metadata — what the trainer actually
    consumes next to the packed bins: for each bin, the in-bin start
    offset of every document (``prefix − bin_id·budget``; the first may
    be negative when a straddling doc is charged to the bin where it
    starts), serialized as a comma-joined string in offset order so the
    column is hash-stable across engines.  This is the table a
    block-diagonal attention mask or a document-boundary loss mask is
    built from.  Offsets are always in ``[0, budget)`` — the straddle
    rule charges a doc to the bin where it STARTS, so only bin ends
    overflow.  One grouped aggregate over the packed rows; nothing
    re-reads text."""
    off = (F.col("prefix") - F.col("bin_id") * F.lit(budget)).cast("long")
    return (
        packed.select("bin_id", off.alias("off"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("off")), lambda x: x.cast("string")
                ),
            ).alias("boundaries"),
        )
    )


def pack_boundaries_sql(budget: int = 2048, dialect: str = DUCK) -> str:
    """Dual-dialect oracle for :func:`pack_boundaries`: the global-window
    prefix (oracle scale) → per-bin sorted offset string."""
    tok = arr_len(split_ws("text", dialect), dialect)
    if dialect == SPARK:
        bounds = (
            "concat_ws(',', transform(array_sort(collect_list(off)), "
            "x -> CAST(x AS STRING)))"
        )
    else:
        bounds = "array_to_string(list(off ORDER BY off), ',')"
    return f"""
WITH d AS (
  SELECT doc_id, md5(text) AS h, CAST({tok} AS BIGINT) AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS prefix
  FROM d),
o AS (
  SELECT CAST(FLOOR(prefix / {budget}.0) AS BIGINT) AS bin_id,
    CAST(prefix - CAST(FLOOR(prefix / {budget}.0) AS BIGINT) * {budget}
      AS BIGINT) AS off
  FROM p)
SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs, {bounds} AS boundaries
FROM o GROUP BY bin_id
"""
