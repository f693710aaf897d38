"""Subword tokenization — a deterministic, dependency-free greedy
longest-match tokenizer with a corpus-learned vocabulary, de-stubbing the
"swap in a BPE count upstream" caveat in :mod:`.packing` (every real
training-data pipeline charges context windows in subword tokens, not
whitespace words).

Model (identical on both engines by construction):

* **pre-tokenization** — text splits on whitespace; subword tokens never
  cross a word boundary (the standard WordPiece/BPE setup);
* **vocabulary** — the top-``k`` substrings of length ``LMIN..LMAX``
  ranked by corpus frequency (occurrences weighted by word frequency,
  ties broken by substring text — a total order, so the top-``k`` cut is
  deterministic).  This is the "top-k corpus substrings" vocabulary:
  learning is ONE distributed aggregation (explode positions × lengths →
  weighted count → top-k), not an iterative merge loop — the iterative
  part of this operator is the greedy WALK below;
* **tokenization** — greedy longest-match: at each position take the
  longest vocabulary entry matching there, else consume one character.
  Per-word token counts are computed over DISTINCT words and joined back
  onto the corpus, so the expensive walk runs once per word type, not
  per occurrence.

The greedy walk is a pointer chase over a precomputed ``step`` table
``(word, pos, advance)``: relational to build (positions grid × candidate
lengths × vocabulary semi-join → MAX length per position, default 1), and
the walk itself needs only ``max word length`` rounds of
``pos -> pos + advance``:

* **Spark** — a bounded iterative DataFrame loop (one hash join per
  round against the step table, per-round eager ``localCheckpoint``, a
  1-row liveness aggregate per round — the same iterative discipline as
  kmeans/pq_fit/graph components); at 100 TB the step table is
  (distinct word types × avg length) rows — joined, never collected;
* **DuckDB oracle** — the same CTEs plus ``WITH RECURSIVE`` for the
  walk.  Spark 4.1 parses the identical statement (pinned in tests), so
  the iterative loop is cross-checked against the recursive-SQL
  execution on BOTH engines.

Positions and candidate lengths come from a STATIC integer grid
(1..``MAXLEN``) filtered by word length — not correlated laterals, whose
semantics differ across engines.  ``MAXLEN = 64`` bounds the walk.

Word types LONGER than ``MAXLEN`` (URLs, unsegmented CJK runs, DNA-like
strings — common in real multilingual corpora) do not enter the grid or
the walk; they are charged ``⌈len/LMAX⌉`` tokens — the greedy walk's
lower bound (every step advances at most ``LMAX`` chars) — identically
on both engines, so the operator DEGRADES instead of failing on a corpus
the fixtures never show.  The Spark entry point keeps the hard raise
behind ``strict=True``.  Fixture max word length is 8, so the fallback
branch is empty there and every recorded hash is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .portable import DUCK, SPARK, arr_len, lateral_arr, lateral_seq, split_ws

LMIN = 2
LMAX = 6
MAXLEN = 64  # static position-grid bound == max supported word length


def _core_ctes(dialect: str, k: int, src: str = "documents") -> str:
    """The shared non-recursive CTE chain: corpus words → vocabulary →
    ``step`` table (word, p, adv)."""
    words_lat = lateral_arr(split_ws("text", dialect), "w", dialect)
    pos_lat = lateral_seq("1", str(MAXLEN), "p", dialect)
    len_lat = lateral_seq(str(LMIN), str(LMAX), "l", dialect)
    return f"""
wfreq AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wcount
  FROM {src} {words_lat}
  WHERE LENGTH(w) >= 1
  GROUP BY w),
cand AS (
  SELECT substr(word, p, l) AS tok, SUM(wcount * 1) AS cnt
  FROM wfreq {pos_lat} {len_lat}
  WHERE p + l - 1 <= LENGTH(word)
  GROUP BY substr(word, p, l)),
vocab AS (
  SELECT tok FROM cand ORDER BY cnt DESC, tok LIMIT {k}),
grid AS (
  SELECT word, p FROM (SELECT DISTINCT word FROM wfreq) {pos_lat}
  WHERE p <= LENGTH(word) AND LENGTH(word) <= {MAXLEN}),
glen AS (
  SELECT word, p, l, substr(word, p, l) AS sub
  FROM grid {len_lat}
  WHERE p + l - 1 <= LENGTH(word)),
hit AS (
  SELECT g.word, g.p, MAX(g.l) AS ml
  FROM glen g JOIN vocab v ON v.tok = g.sub
  GROUP BY g.word, g.p),
step AS (
  SELECT g.word, g.p, COALESCE(h.ml, 1) AS adv
  FROM grid g LEFT JOIN hit h ON h.word = g.word AND h.p = g.p)"""


def subword_walk_ctes(dialect: str, k: int = 64, src: str = "documents") -> str:
    """The full CTE chain (opens with ``RECURSIVE``): vocabulary →
    step table → recursive greedy walk → per-word-type ``wordtok`` and
    per-occurrence ``doc_words``.  Composable: packing's oracle splices
    it in via ``pack_sequences_sql(tokens_cte=...)``."""
    words_lat = lateral_arr(split_ws("text", dialect), "w", dialect)
    return f"""RECURSIVE {_core_ctes(dialect, k, src)},
walk AS (
  SELECT word, 1 AS pos, 0 AS ntok
  FROM (SELECT DISTINCT word FROM wfreq WHERE LENGTH(word) <= {MAXLEN})
  UNION ALL
  SELECT w.word, w.pos + s.adv, w.ntok + 1
  FROM walk w JOIN step s ON s.word = w.word AND s.p = w.pos),
wordtok AS (
  SELECT word, CAST(MAX(ntok) AS BIGINT) AS ntok FROM walk GROUP BY word
  UNION ALL
  SELECT word,
    CAST(FLOOR(CAST(LENGTH(word) + {LMAX - 1} AS DOUBLE) / {LMAX}) AS BIGINT)
    AS ntok
  FROM (SELECT DISTINCT word FROM wfreq WHERE LENGTH(word) > {MAXLEN})),
doc_words AS (
  SELECT doc_id, w AS word FROM {src} {words_lat} WHERE LENGTH(w) >= 1)"""


def subword_doc_tokens_cte(dialect: str, k: int = 64, src: str = "documents") -> str:
    """``subword_walk_ctes`` extended with ``toks (doc_id, n_tokens)`` —
    the shape :func:`..packing.pack_sequences_sql` expects."""
    return f"""{subword_walk_ctes(dialect, k, src)},
toks AS (
  SELECT d.doc_id, CAST(SUM(t.ntok) AS BIGINT) AS n_tokens
  FROM doc_words d JOIN wordtok t ON t.word = d.word
  GROUP BY d.doc_id)"""


def subword_token_count_sql(dialect: str, k: int = 64, src: str = "documents") -> str:
    """One dual-dialect statement (recursive-CTE walk): per-document
    ``(doc_id, n_tokens_ws, n_tokens_subword)``.  Runs as the DuckDB
    oracle; Spark 4.1 executes the identical text (cross-check pinned in
    test_round6)."""
    return f"""
WITH {subword_walk_ctes(dialect, k, src)}
SELECT d.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
  CAST(SUM(t.ntok) AS BIGINT) AS n_tokens_subword
FROM doc_words d JOIN wordtok t ON t.word = d.word
GROUP BY d.doc_id
"""


def subword_word_tokens(
    spark: SparkSession, k: int = 64, src: str = "documents", strict: bool = False
) -> DataFrame:
    """Per-word-type subword token counts ``(word, ntok)`` via the
    bounded iterative walk (the Spark-native path).  Requires the
    corpus views registered (catalog.register_views).

    Word types longer than ``MAXLEN`` never enter the step table or the
    walk — they are charged ``⌈len/LMAX⌉`` tokens (the walk's lower
    bound; see module docstring).  ``strict=True`` restores the hard
    raise for pipelines that want the grid bound enforced.  An empty
    corpus (no words survive the length filter) returns an empty
    ``(word, ntok)`` frame instead of entering the walk loop."""
    # all word TYPES (including over-long ones, which have no step rows)
    all_words = spark.sql(
        f"WITH {_core_ctes(SPARK, k, src)} SELECT word FROM wfreq"
    ).withColumn("wl", F.length("word"))
    fallback = (
        all_words.filter(F.col("wl") > F.lit(MAXLEN))
        .select(
            "word",
            F.floor((F.col("wl") + F.lit(LMAX - 1)) / F.lit(LMAX))
            .cast("long")
            .alias("ntok"),
        )
        # build-phase frame, same discipline as `step`: ≤ one row per
        # over-long word TYPE, checkpointed so the query-path plan does
        # not re-derive the wfreq chain a second time
        .localCheckpoint(eager=True)
    )
    if strict:
        over = fallback.limit(1).count()  # 1-row guard probe
        if over:
            raise ValueError(
                f"word type longer than the MAXLEN={MAXLEN} position grid "
                "(strict=True); raise MAXLEN or drop strict for the "
                "ceil(len/LMAX) degradation"
            )
    step = spark.sql(
        f"WITH {_core_ctes(SPARK, k, src)} "
        "SELECT word AS s_word, p AS s_p, adv FROM step"
    ).localCheckpoint(eager=True)
    words = (
        step.select(F.col("s_word").alias("word"))
        .distinct()
        .withColumn("wl", F.length("word"))
    )
    max_len = words.agg(F.max("wl").alias("m")).collect()[0]["m"] or 0
    if max_len == 0:
        # empty corpus (or all word types over-long): nothing to walk —
        # the for-else below would mis-raise and reduce() over an empty
        # list would TypeError
        return fallback
    frontier = words.select(
        "word", "wl", F.lit(1).alias("pos"), F.lit(0).alias("ntok")
    ).localCheckpoint(eager=True)
    finished: list[DataFrame] = []
    for _ in range(max_len):
        stepped = (
            frontier.join(
                step,
                (F.col("word") == F.col("s_word")) & (F.col("pos") == F.col("s_p")),
            )
            .select(
                "word",
                "wl",
                (F.col("pos") + F.col("adv")).alias("pos"),
                (F.col("ntok") + 1).alias("ntok"),
            )
            .localCheckpoint(eager=True)  # per-round: bounds the lineage
        )
        finished.append(stepped.filter(F.col("pos") > F.col("wl")).select("word", "ntok"))
        frontier = stepped.filter(F.col("pos") <= F.col("wl"))
        if frontier.isEmpty():  # 1-row liveness probe, kmeans discipline
            break
    else:
        raise RuntimeError("greedy walk did not terminate within max word length")
    from functools import reduce

    walked = reduce(DataFrame.unionByName, finished).select(
        "word", F.col("ntok").cast("long").alias("ntok")
    )
    return walked.unionByName(fallback)


def subword_token_counts(spark: SparkSession, k: int = 64, src: str = "documents") -> DataFrame:
    """Per-document ``(doc_id, n_tokens_ws, n_tokens_subword)`` — the
    iterative-walk word-type counts joined back onto the corpus."""
    wordtok = subword_word_tokens(spark, k, src)
    doc_words = spark.sql(
        f"SELECT doc_id, w AS word FROM {src} "
        f"{lateral_arr(split_ws('text', SPARK), 'w', SPARK)} "
        "WHERE LENGTH(w) >= 1"
    )
    return (
        doc_words.join(wordtok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens_ws"),
            F.sum("ntok").cast("long").alias("n_tokens_subword"),
        )
    )


def subword_fertility(
    spark: SparkSession, k: int = 64, src: str = "documents"
) -> DataFrame:
    """Per-language tokenizer FERTILITY report: subword tokens per
    whitespace word and chars per subword token, by the corpus's gold
    ``lang`` column — the table a multilingual pipeline reads before
    fixing per-language token budgets (high-fertility languages burn
    context budget faster; the standard argument for temperature-
    rebalancing a multilingual mixture, and the standard metric for
    comparing tokenizers across languages).  Measures the SAME learned
    tokenizer the packing/serving entries charge — report and pipeline
    agree by construction.

    Cost on top of :func:`subword_token_counts`: one broadcast-sized
    join onto documents and a ≤n_langs-row aggregate — the walk still
    runs once per word TYPE."""
    counts = subword_token_counts(spark, k, src)
    docs = spark.sql(
        f"SELECT doc_id, lang, CAST(LENGTH(text) AS BIGINT) AS n_chars FROM {src}"
    )
    return (
        docs.join(counts, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens_ws").cast("long").alias("n_words"),
            F.sum("n_tokens_subword").cast("long").alias("n_subword_tokens"),
            F.round(
                F.sum("n_tokens_subword").cast("double")
                / F.sum("n_tokens_ws").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double")
                / F.sum("n_tokens_subword").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )


def subword_fertility_sql(dialect: str, k: int = 64, src: str = "documents") -> str:
    """Dual-dialect oracle of :func:`subword_fertility` — the recursive-
    CTE walk grouped by language instead of document."""
    return f"""
WITH {subword_walk_ctes(dialect, k, src)},
perdoc AS (
  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(t.ntok) AS BIGINT) AS n_sub
  FROM doc_words d JOIN wordtok t ON t.word = d.word GROUP BY d.doc_id)
SELECT s.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(p.n_words) AS BIGINT) AS n_words,
  CAST(SUM(p.n_sub) AS BIGINT) AS n_subword_tokens,
  ROUND(CAST(SUM(p.n_sub) AS DOUBLE) / CAST(SUM(p.n_words) AS DOUBLE), 6)
    AS fertility,
  ROUND(CAST(SUM(LENGTH(s.text)) AS DOUBLE) / CAST(SUM(p.n_sub) AS DOUBLE), 6)
    AS chars_per_token
FROM {src} s JOIN perdoc p ON p.doc_id = s.doc_id
GROUP BY s.lang
"""
