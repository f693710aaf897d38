"""Distributed k-means (Lloyd's algorithm) over the embeddings table —
the iterative ML-training pattern, built purely from DataFrame ops so
every step is deterministic and oracle-reproducible:

* init: the first ``k`` vectors by id (deterministic seed);
* assignment: argmin squared-L2 via ``‖x‖² − 2·x·c + ‖c‖²`` (in-order
  dot-product folds), ROUNDED to 6 dp with a cid tie-break — a total
  order both engines share;
* update: element-wise mean per (cluster, dimension) with exact decimal
  sums (Σ as DECIMAL → DOUBLE, ÷ count) — the float mean never depends on
  row order, so centroids are bit-identical across partitionings and
  engines;
* fixed iteration count (unrolled in the SQL oracle).

Scale: assignment is a broadcast of k centroids against the corpus (no
corpus shuffle); the update shuffles (cid, dim) pairs — k·dim rows of
partial sums, tiny.  This is the training step for the IVF index
(similarity.py): at 100 TB you persist the trained centroids and the
assignment table IS the inverted file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _py_dot(a, b) -> float:
    """Driver-side left-to-right double fold — the SAME accumulation
    order as :func:`_dot`'s ``aggregate`` (acc = acc + x*y per element),
    so a centroid's self-dot precomputed here is bit-identical to the
    old in-plan ``_dot(c, c)``."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _sql_double(x) -> str:
    """A double literal in Spark SQL text: ``repr(float)`` is the
    shortest exact round-trip form, and a string→double CAST parses it
    correctly rounded, so the parsed literal is bit-identical to the
    driver-side value."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _dot_sql(vec_col: str, c) -> str:
    """SQL text of :func:`_dot` against a literal vector — the same
    ``aggregate(zip_with(...))`` left-to-right fold, so the parsed
    expression is operation-for-operation the old column form."""
    arr = ",".join(_sql_double(x) for x in c)
    return (
        f"aggregate(zip_with({vec_col}, array({arr}), (x, y) -> x * y), "
        f"{_sql_double(0.0)}, (acc, x) -> acc + x)"
    )


# Literal-inline argmin is only 100-TB-safe when k is a bounded model
# parameter: every centroid becomes ~dim double literals of SQL text, so
# derived-k callers (ivf_requantize: k ~ sqrt(n)) would blow past
# codegen's 64 KB method limit and eventually the parser itself (r16
# VERDICT #1).  Above this bound the argmin switches to the chunked
# array-fold below — same fold, same rounding, same tie-break ordering,
# centroids carried as DATA (one packed broadcast row), not as plan text.
_ARGMIN_LITERAL_MAX_K = 64
# Centroids per packed array column on the fold path.  Bounds any single
# array VALUE to ~4096·(dim+2) doubles (~2 MB at dim 64) — far under
# Spark's 2 GiB single-value ceiling — while keeping the expression tree
# small (one fold per chunk).  The whole packed row is the model size,
# which the broadcast must carry anyway (the pre-r16 crossJoin broadcast
# shipped the same bytes); the 8 GiB broadcast-relation cap is therefore
# the real k ceiling (~10M centroids at dim 64), documented here.
_ARGMIN_FOLD_CHUNK = 4096


def _argmin_dist_sql(model_rows, vec_col: str, id_cast: str) -> str:
    """Map-only nearest-centroid expression over MODEL-LITERAL rows
    ``[(cid, c), ...]`` (sorted by cid), as SQL TEXT parsed in ONE
    ``expr()`` round trip (building it column-op-by-column-op costs
    hundreds of py4j calls — measured 10-16 s of driver time per
    assignment at dim 64).  The argmin is
    ``array_min(zip_with(dists, cids, (d, c) -> struct(d, c))).c`` —
    struct ordering compares the distance first, then the cid, so the
    minimum struct IS the old window's ``(dist asc, cid asc)``
    row_number tie-break, and the distance array appears exactly once
    in the tree.  Each distance keeps the identical fold/rounding
    (``ROUND(e·e - 2·e·c + c·c, 6)``; the ``c·c`` term is precomputed
    with the same fold — see :func:`_py_dot`), so assignments are
    bit-identical to the crossJoin+window formulation this replaces."""
    ee_sql = (
        f"aggregate(zip_with({vec_col}, {vec_col}, (x, y) -> x * y), "
        f"{_sql_double(0.0)}, (acc, x) -> acc + x)"
    )
    dists = [
        f"round({ee_sql} - 2 * {_dot_sql(vec_col, c)} + {_sql_double(_py_dot(c, c))}, 6)"
        for _, c in model_rows
    ]
    cids = ",".join(f"CAST({cid} AS {id_cast})" for cid, _ in model_rows)
    return (
        f"array_min(zip_with(array({','.join(dists)}), array({cids}), "
        f"(d, c) -> struct(d, c))).c"
    )


_CC_FOLD_SQL = (
    "aggregate(zip_with(c, c, (x, y) -> x * y), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _argmin_fold_sql(arr_cols, vec_col: str, id_cast: str, ee_col: str) -> str:
    """Map-only nearest-centroid expression over PACKED centroid-array
    columns (each ``struct<cid, c, cc>``; ``cc`` is the centroid's
    self-dot, computed with the same left-to-right fold as
    :func:`_py_dot`) — the derived-k twin of :func:`_argmin_dist_sql`.
    Each chunk folds to its least ``struct(d, c)`` via a CASE keeping
    the smaller struct (``x < acc`` uses the SAME struct ordering —
    distance first, then cid — that ``array_min`` applies on the
    literal path), and ``array_min`` over the per-chunk minima (NULL
    for an empty chunk — skipped) picks the global one.  Distances keep
    the identical ``ROUND(e·e − 2·e·c + c·c, 6)`` fold, so assignments
    are bit-identical to the literal path (pinned by a law test)."""
    folds = []
    for col in arr_cols:
        d = (
            f"round({ee_col} - 2 * aggregate(zip_with({vec_col}, c.c, "
            f"(x, y) -> x * y), {_sql_double(0.0)}, (acc, x) -> acc + x) "
            f"+ c.cc, 6)"
        )
        folds.append(
            f"aggregate(transform({col}, c -> named_struct("
            f"'d', {d}, 'c', CAST(c.cid AS {id_cast}))), "
            f"CAST(NULL AS STRUCT<d: DOUBLE, c: {id_cast}>), "
            "(acc, x) -> CASE WHEN acc IS NULL OR x < acc THEN x ELSE acc END)"
        )
    return f"array_min(array({','.join(folds)})).c"


def _pack_centroid_chunks(cents: DataFrame, n_chunks: int, prefix: str = "_ca"):
    """ONE packed row with ``n_chunks`` array columns ``{prefix}{i}``,
    chunk membership ``pmod(cid, n_chunks)`` (deterministic, no window;
    cids are roughly uniform residues, so chunks stay near k/n_chunks).
    Arrays are cid-sorted so the fold order is deterministic; the
    centroid self-dot ``cc`` rides each struct (in-plan fold — the same
    accumulation order as the literal path's driver-side precompute)."""
    aggs = [
        F.expr(
            f"sort_array(collect_list(CASE WHEN pmod(cid, {n_chunks}) = {i} "
            f"THEN named_struct('cid', cid, 'c', c, 'cc', {_CC_FOLD_SQL}) END)) "
            f"AS {prefix}{i}"
        )
        for i in range(n_chunks)
    ]
    return cents.agg(*aggs)


def _assign_fold(vecs: DataFrame, cents: DataFrame, k: int, id_type: str) -> DataFrame:
    """The derived-k assignment path: centroids cross-joined in as ONE
    packed broadcast row of chunked arrays, argmin evaluated by the
    chunked fold — still zero-exchange over the corpus, but the model
    is DATA, so the plan stays bounded at any k (guide §5: no 64 KB
    codegen blowup, no multi-MB expression trees)."""
    n_chunks = max(1, -(-k // _ARGMIN_FOLD_CHUNK))
    packed = _pack_centroid_chunks(cents, n_chunks)
    ee = (
        "aggregate(zip_with(e, e, (x, y) -> x * y), "
        f"{_sql_double(0.0)}, (acc, x) -> acc + x)"
    )
    pick = _argmin_fold_sql(
        [f"_ca{i}" for i in range(n_chunks)], "e", id_type, "_ee"
    )
    return (
        vecs.crossJoin(F.broadcast(packed))
        .withColumn("_ee", F.expr(ee))
        .select("vec_id", F.expr(pick).alias("cid"), "e")
    )


def assign_clusters(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid) nearest-centroid assignment.  ``vecs``: (vec_id, e);
    ``cents``: (cid, c) — both double arrays.

    r16: the k centroids are MODEL PARAMETERS, so the argmin is
    evaluated as one map-side expression over centroid literals instead
    of a k-way crossJoin + per-vec_id row_number window.  That removes
    the Exchange+Sort that shuffled every vector payload k-fold per
    Lloyd iteration — assignment is now ZERO-exchange at any corpus
    size.  Output is bit-identical (same rounded-distance fold, same
    lowest-cid tie-break — see :func:`_argmin_dist_sql`).

    r17: literals are only safe while k is bounded (``ivf_requantize``
    derives k ~ sqrt(n)), so above ``_ARGMIN_LITERAL_MAX_K`` the argmin
    switches to the chunked array-fold (:func:`_assign_fold`) — same
    math carried as data, plan size O(n_chunks) instead of O(k·dim).
    The ``limit(max+1)`` probe decides the path in ONE action: if it
    returns <= max rows it already holds the whole model."""
    id_type = cents.schema["cid"].dataType.simpleString()
    probe = cents.limit(_ARGMIN_LITERAL_MAX_K + 1).collect()
    if not probe:
        return vecs.select(
            "vec_id", F.lit(None).cast(id_type).alias("cid"), "e"
        ).limit(0)
    if len(probe) > _ARGMIN_LITERAL_MAX_K:
        return _assign_fold(vecs, cents, cents.count(), id_type)
    cent_rows = sorted(((r["cid"], r["c"]) for r in probe), key=lambda t: t[0])
    return vecs.select(
        "vec_id",
        F.expr(_argmin_dist_sql(cent_rows, "e", id_type)).alias("cid"),
        "e",
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise decimal-exact mean per cluster → (cid, c)."""
    exploded = assigned.select("cid", F.posexplode("e").alias("pos", "val"))
    means = exploded.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mv")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))), lambda s: s["mv"]
        ).alias("c")
    )


def _k_smallest_id_cutoff(ids: DataFrame, k: int):
    """The k-th smallest id in ``ids`` (a 1-column frame) — the init
    threshold shared by :func:`kmeans_fit` and :func:`pq_fit`.  Found
    executor-side (GlobalLimit ships k 8-byte ids to one task, then
    MAX; only the 1-row cutoff crosses to the driver), so init stays
    distributed at any corpus size.  Raises on an empty relation — an
    empty init would silently train an empty model (the failure a
    retention cutoff above every id used to cause)."""
    col = ids.columns[0]
    kth = ids.orderBy(col).limit(k).agg(F.max(col)).collect()[0][0]
    if kth is None:
        raise ValueError(
            "k-means init: the vector source is empty — nothing to train on"
        )
    return kth


def kmeans_fit(vecs: DataFrame, k: int = 4, n_iter: int = 2) -> DataFrame:
    """Lloyd iterations with deterministic init: the first k vectors BY
    ID — the k SMALLEST vec_ids present (r12: the old ``vec_id < k``
    filter only matched that spec when ids were dense from 0; a
    survivor-filtered or retention-expired source whose ids all exceed
    k trained an EMPTY — or thinner-than-k — model).  Identical on
    dense ids, so every full-table entry is unchanged; the SQL oracle
    twin (_kmeans_ctes) ranks the same way.
    Returns (cid, c).  ``vecs``: (vec_id, e: array<double>)."""
    kth = _k_smallest_id_cutoff(vecs.select("vec_id"), k)
    cents = vecs.filter(F.col("vec_id") <= kth).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    for _ in range(n_iter):
        assigned = assign_clusters(vecs, cents)
        # eager localCheckpoint: materializes the round's k centroids and
        # truncates lineage — without it the nested plan grows per round
        # (same driver-OOM failure mode fixed in operators/graph.py);
        # reliable .checkpoint() on a real cluster.
        cents = update_centroids(assigned).localCheckpoint(eager=True)
    return cents


def assign_codebook(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """Grouped nearest-codeword assignment for product quantization:
    ``subs`` is (vec_id, s, e) — one row per (vector, subspace) — and
    ``cb`` is (s, cid, c); each subvector meets only its own subspace's
    codewords (join key ``s``, broadcast: the whole codebook is
    k·n_subs·sub_len doubles).  Same rounded-distance total order as
    :func:`assign_clusters`.

    r16: same map-only argmin rewrite as :func:`assign_clusters` — the
    codebook is n_subs·k model rows, collected once and expanded into a
    per-subspace literal argmin selected by a CASE on ``s``.  The old
    broadcast join + per-(vec_id, s) row_number window shuffled every
    subvector k-fold per training iteration; assignment is now
    zero-exchange, output bit-identical (same fold/round/tie-break).

    r17: literals stay the fast path while the codebook is small (every
    subspace <= ``_ARGMIN_LITERAL_MAX_K`` codewords and the whole model
    within the probe bound); a derived/oversized codebook switches to
    the chunked array-fold — per-(subspace, chunk) packed columns in
    one broadcast row, a CASE over ``s`` picking that subspace's fold —
    so the plan stays bounded at any k (r16 VERDICT #1)."""
    id_type = cb.schema["cid"].dataType.simpleString()
    # one action decides the path: <= bound rows -> we hold the model
    probe_bound = 16 * _ARGMIN_LITERAL_MAX_K
    probe = cb.limit(probe_bound + 1).collect()
    if not probe:
        return subs.select(
            "vec_id", "s", F.lit(None).cast(id_type).alias("cid"), "e"
        ).limit(0)
    by_s: dict = {}
    if len(probe) <= probe_bound:
        for r in probe:
            by_s.setdefault(r["s"], []).append((r["cid"], r["c"]))
    if by_s and max(len(v) for v in by_s.values()) <= _ARGMIN_LITERAL_MAX_K:
        # one CASE over s, each arm that subspace's literal argmin —
        # parsed in one expr() round trip
        pick_arms = [
            f"WHEN s = {s} THEN "
            + _argmin_dist_sql(sorted(by_s[s], key=lambda t: t[0]), "e", id_type)
            for s in sorted(by_s)
        ]
        pick_case = f"CASE {' '.join(pick_arms)} END"
        # the old inner join dropped subs rows with no codebook
        # subspace; the literal form must drop them too
        return (
            subs.filter(F.col("s").isin(list(by_s)))
            .select("vec_id", "s", F.expr(pick_case).alias("cid"), "e")
        )
    # chunked-fold path: per-(s, chunk) packed columns in one broadcast
    # row, the CASE arm for each subspace folding its own chunks
    counts = {r["s"]: r["n"] for r in cb.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    aggs, arms = [], []
    for s in sorted(counts):
        n_chunks = max(1, -(-counts[s] // _ARGMIN_FOLD_CHUNK))
        cols = []
        for i in range(n_chunks):
            col = f"_cb{s}_{i}"
            cols.append(col)
            aggs.append(
                F.expr(
                    f"sort_array(collect_list(CASE WHEN s = {s} AND "
                    f"pmod(cid, {n_chunks}) = {i} THEN named_struct("
                    f"'cid', cid, 'c', c, 'cc', {_CC_FOLD_SQL}) END)) AS {col}"
                )
            )
        arms.append(
            f"WHEN s = {s} THEN "
            + _argmin_fold_sql(cols, "e", id_type, "_ee")
        )
    packed = cb.agg(*aggs)
    ee = (
        "aggregate(zip_with(e, e, (x, y) -> x * y), "
        f"{_sql_double(0.0)}, (acc, x) -> acc + x)"
    )
    return (
        subs.filter(F.col("s").isin(list(counts)))
        .crossJoin(F.broadcast(packed))
        .withColumn("_ee", F.expr(ee))
        .select(
            "vec_id", "s", F.expr(f"CASE {' '.join(arms)} END").alias("cid"), "e"
        )
    )


def update_codebook(assigned: DataFrame) -> DataFrame:
    """Element-wise decimal-exact mean per (subspace, codeword) →
    (s, cid, c) — :func:`update_centroids` with the subspace riding the
    grouping key; the shuffle is n_subs·k·sub_len partial-sum rows."""
    exploded = assigned.select("s", "cid", F.posexplode("e").alias("pos", "val"))
    means = exploded.groupBy("s", "cid", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mv")
    )
    return means.groupBy("s", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mv"))), lambda st: st["mv"]
        ).alias("c")
    )


def pq_fit(subs: DataFrame, k: int = 16, n_iter: int = 2) -> DataFrame:
    """Per-subspace Lloyd training of a product-quantization codebook —
    ALL subspaces in one distributed computation (the subspace id is a
    grouping column, not a driver loop).  Init: the subvectors of the
    first ``k`` vectors by id — the k SMALLEST distinct vec_ids present
    (r12, the :func:`kmeans_fit` init fix).  Subspace 0 carries each
    vec_id exactly once by construction (rows are one per (vector,
    subspace), subspaces 0..n_subs-1), so the cutoff scan filters
    ``s = 0`` instead of paying a DISTINCT shuffle over all n_subs
    copies.  That is an implicit caller contract (r12 ADVICE): a
    future caller whose subs relation lacks subspace 0 (filtered or
    re-numbered) would get a spurious empty-source error from the fast
    path, so an empty ``s = 0`` scan falls back to the DISTINCT vec_id
    scan — correct for ANY subspace numbering, and only a truly empty
    relation still raises (with the clear message).  Returns
    (s, cid, c)."""
    try:
        kth = _k_smallest_id_cutoff(
            subs.filter(F.col("s") == 0).select("vec_id"), k
        )
    except ValueError:
        kth = _k_smallest_id_cutoff(subs.select("vec_id").distinct(), k)
    cb = subs.filter(F.col("vec_id") <= kth).select(
        "s", F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    for _ in range(n_iter):
        assigned = assign_codebook(subs, cb)
        cb = update_codebook(assigned).localCheckpoint(eager=True)
    return cb


def ivf_build(vecs: DataFrame, path: str, k: int = 8, n_iter: int = 2) -> None:
    """Persist the trained IVF index (VERDICT r6 #7) — train ONCE, serve
    forever: ``centroids`` (cid, c) and ``inverted`` (vec_id, e)
    PARTITIONED BY cid land as parquet under ``path``.  A training-data
    pipeline reuses one index across thousands of dedup/search queries;
    re-fitting k-means per query (the in-query trained variant) is the
    hidden cost at 100 TB.  Partitioning the inverted file by cid is the
    point: a probe joins against the cid partition column, so the scan
    reads ONLY the probed cells' files — |corpus|·n_probe/k bytes, the
    IVF contract expressed as partition pruning."""
    # kmeans_fit's output is already checkpointed; the two writes are
    # independent — overlap them (guide §2.6)
    cents = kmeans_fit(vecs, k, n_iter)
    assigned = assign_clusters(vecs, cents)
    import os

    from .store_layout import parallel_store_writes

    parallel_store_writes(
        lambda: cents.write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        ),
        lambda: assigned.write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(path, "inverted")),
    )


def ivf_load(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, inverted) read back from the persisted index — no
    Lloyd iterations anywhere downstream of these plans.  When the
    store carries tombstones (``ivf_delete``), deleted vectors are
    anti-joined out of the inverted file (broadcast — the id set is a
    compliance queue, not a corpus); when it carries a retention marker
    (``ivf_expire``), expired ids are filtered out (a pushed-down range
    predicate — row-group stats skip whole files).  A never-deleted,
    never-expired store skips both scrubs entirely, keeping its exact
    pre-lifecycle plan."""
    import os

    from .store_layout import _read_int_marker, _recover_store_root

    _recover_store_root(path)  # crashed root swap -> auto-heal (r12 ADVICE)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    inverted = spark.read.parquet(os.path.join(path, "inverted")).select(
        "vec_id", F.col("cid").cast("long").alias("cid"), "e"
    )
    cut = _read_int_marker(path, _IVF_RETENTION_FILE)
    if cut is not None:
        inverted = inverted.filter(F.col("vec_id") >= cut)
    tomb = _ivf_tombstones(spark, path)
    if tomb is not None:
        inverted = inverted.join(F.broadcast(tomb), "vec_id", "left_anti")
    return cents, inverted


def ann_ivf_persisted_search(
    spark,
    path: str,
    q: DataFrame,
    n_probe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """Top-``topk`` cosine neighbors for each query row (qid, qe) from
    the PERSISTED index alone: centroids broadcast against the queries
    to pick ``n_probe`` cells, then the cell join against the
    cid-partitioned inverted file (broadcast probe side → candidate for
    dynamic partition pruning on the scan).  Identical ranking math to
    the in-query trained variant (catalog.ann_ivf_trained_q), so the
    same seed yields bit-identical top-k — pinned by sharing that
    entry's oracle.

    Replay absorption (r12, with ``ivf_append``): an at-least-once
    replayed append duplicates inverted rows, and ROW_NUMBER would
    hand a duplicated neighbor two rank slots.  Duplicates of one
    neighbor are ADJACENT under the rank window's own (cos DESC, id
    ASC) order — identical vectors score identically — so a LAG over
    the SAME window spec drops them before ranking: one more Window
    node, ZERO new exchanges (pinned by the unchanged budget row), a
    no-op for exactly-once stores, and the same DISTINCT-on-read
    contract every other store family gives its probes."""
    from pyspark.sql import Window

    cents, inverted = ivf_load(spark, path)
    dist = F.round(
        _dot(F.col("qe"), F.col("qe"))
        - 2 * _dot(F.col("qe"), F.col("c"))
        + _dot(F.col("c"), F.col("c")),
        6,
    )
    wq = Window.partitionBy("qid").orderBy(dist.asc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "cid")
    )
    cands = inverted.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("qid")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("e"))
        / (
            F.sqrt(_dot(F.col("qe"), F.col("qe")))
            * F.sqrt(_dot(F.col("e"), F.col("e")))
        ),
        9,
    )
    scored = cands.join(q, "qid").select(
        F.col("qid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        cos.alias("cos_sim"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    deduped = (
        scored.withColumn("_prev", F.lag("neighbor_id").over(wr))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("neighbor_id")))
        .drop("_prev")
    )
    return (
        deduped.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def pq_build(subs: DataFrame, path: str, k: int = 16, n_iter: int = 2) -> None:
    """Persist the trained PQ index: ``codebook`` (s, cid, c) and
    ``codes`` (vec_id, s, cid) as parquet under ``path``.  The codes
    table IS the compressed corpus — n_subs small ints per vector
    instead of the raw floats — so after one build the embeddings table
    is never read again for search; at 100 TB that is the difference
    between scanning terabytes of float arrays per query batch and
    scanning the ~1%-sized code table."""
    import os

    from .store_layout import parallel_store_writes

    # pq_fit's output is already checkpointed; independent writes overlap
    cb = pq_fit(subs, k, n_iter)
    codes = assign_codebook(subs, cb).select("vec_id", "s", "cid")
    parallel_store_writes(
        lambda: cb.write.mode("overwrite").parquet(os.path.join(path, "codebook")),
        lambda: codes.write.mode("overwrite").parquet(os.path.join(path, "codes")),
    )


def ann_pq_persisted_search(
    spark, path: str, qsubs: DataFrame, topk: int = 5
) -> DataFrame:
    """ADC top-``topk`` from the persisted PQ index alone: the query
    subvectors meet the stored codebook to form the broadcast
    (qid, s, cid)→distance table, which scores the stored CODES — no
    Lloyd iterations and no raw-corpus floats on the query path.
    Identical arithmetic (decimal-exact ADC sums, 6-dp rank order) to
    catalog.ann_pq_trained_q, so the same seed gives bit-identical
    top-k — pinned by sharing that entry's oracle."""
    import os

    from pyspark.sql import Window

    from .store_layout import _recover_store_root

    _recover_store_root(path)  # crashed root swap -> auto-heal (r12 ADVICE)
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    d = F.round(
        _dot(F.col("qe"), F.col("qe"))
        - 2 * _dot(F.col("qe"), F.col("c"))
        + _dot(F.col("c"), F.col("c")),
        9,
    ).cast("decimal(18,9)")
    dtab = qsubs.join(F.broadcast(cb), "s").select("qid", "s", "cid", d.alias("d"))
    adc = (
        codes.join(F.broadcast(dtab), ["s", "cid"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").cast("double").alias("dist"))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.col("dist"), 6).asc(), F.col("vec_id").asc()
    )
    return (
        adc.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("dist"), 6).alias("adc_dist"),
            "rnk",
        )
    )


def kmeans_summary(vecs: DataFrame, k: int = 4, n_iter: int = 2) -> DataFrame:
    """Fit + final assignment summary: per-cluster member count and a
    6-dp centroid checksum (in-order component sum) — the compact
    oracle-comparable training result."""
    cents = kmeans_fit(vecs, k, n_iter).persist()
    assigned = assign_clusters(vecs, cents)
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    checksums = cents.select(
        "cid",
        F.round(F.aggregate(F.col("c"), F.lit(0.0), lambda a, x: a + x), 6).alias(
            "checksum"
        ),
    )
    return sizes.join(checksums, "cid").select("cid", "n_members", "checksum")


def ivfpq_build(
    vecs: DataFrame,
    path: str,
    n_cent: int = 4,
    n_subs: int = 8,
    sub_len: int = 8,
    n_codes: int = 16,
    n_iter: int = 2,
) -> None:
    """Persist the full RESIDUAL IVF-PQ index — the production ANN store
    (what a FAISS IVFADC index file holds, as three parquet tables):
    ``centroids`` (cid, c), ``codebook`` (s, code, c) trained on the
    residuals v − centroid(v), and ``codes`` (vec_id, s, code, cid) —
    the compressed corpus WITH its cell assignment, partitioned by cid
    so a probe's scan partition-prunes to the probed cells.  Train once;
    every search then reads n_probe cells' codes and broadcasts a
    queries×probes×subs×codes distance table — neither Lloyd chain nor
    the raw floats ever run on the query path."""
    import os

    from .store_layout import parallel_store_writes

    cents, cb, codes = _ivfpq_tables(vecs, n_cent, n_subs, sub_len, n_codes, n_iter)
    parallel_store_writes(
        lambda: cents.write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        ),
        lambda: cb.write.mode("overwrite").parquet(os.path.join(path, "codebook")),
        lambda: codes.write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(path, "codes")),
    )


def _ivfpq_tables(
    vecs: DataFrame,
    n_cent: int,
    n_subs: int,
    sub_len: int,
    n_codes: int,
    n_iter: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The residual IVF-PQ training computation shared by build and
    re-quantize: (centroids (cid, c), codebook (s, code, c) trained on
    residuals, codes (vec_id, s, code, cid)) — all deterministic
    functions of ``vecs``, so requantize == rebuild by construction."""
    cents = kmeans_fit(vecs, n_cent, n_iter).localCheckpoint(eager=True)
    assigned = assign_clusters(vecs, cents).localCheckpoint(eager=True)
    res = assigned.join(F.broadcast(cents), "cid").select(
        "vec_id",
        "cid",
        F.zip_with("e", "c", lambda x, y: x - y).alias("re"),
    )
    rsubs = res.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_subs - 1))).alias("s"),
        "re",
    ).select(
        "vec_id", "s", F.expr(f"slice(re, 1 + s * {sub_len}, {sub_len})").alias("e")
    )
    cb = pq_fit(rsubs, n_codes, n_iter).localCheckpoint(eager=True)
    codes = (
        assign_codebook(rsubs, cb)
        .select("vec_id", "s", F.col("cid").alias("code"))
        .join(assigned.select("vec_id", "cid"), "vec_id")
    )
    return cents, cb.select("s", F.col("cid").alias("code"), "c"), codes


def ann_ivfpq_persisted_search(
    spark,
    path: str,
    q: DataFrame,
    n_subs: int = 8,
    sub_len: int = 8,
    n_probe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """Residual-ADC top-``topk`` from the persisted IVF-PQ index alone:
    queries pick cells against the broadcast centroids, form their
    per-(query, cell) RESIDUAL distance tables against the stored
    codebook, and score the probed cells' stored codes — identical
    arithmetic to the in-query trained recipe
    (catalog.ann_ivfpq_residual_q), so the same seed gives bit-identical
    top-k, pinned by sharing that entry's oracle.  ``q``: (qid, qe0)
    full query vectors."""
    import os

    from pyspark.sql import Window

    from .store_layout import _recover_store_root

    _recover_store_root(path)  # crashed root swap -> auto-heal (r12 ADVICE)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    codes = spark.read.parquet(os.path.join(path, "codes")).select(
        "vec_id", "s", "code", F.col("cid").cast("long").alias("cid")
    )
    distc = F.round(
        _dot(F.col("qe0"), F.col("qe0"))
        - 2 * _dot(F.col("qe0"), F.col("c"))
        + _dot(F.col("c"), F.col("c")),
        6,
    )
    wq = Window.partitionBy("qid").orderBy(distc.asc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(
            "qid",
            "cid",
            F.zip_with("qe0", "c", lambda x, y: x - y).alias("qre"),
        )
    )
    qsubs = probes.select(
        "qid",
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(n_subs - 1))).alias("s"),
        "qre",
    ).select(
        "qid",
        "cid",
        "s",
        F.expr(f"slice(qre, 1 + s * {sub_len}, {sub_len})").alias("qe"),
    )
    d = F.round(
        _dot(F.col("qe"), F.col("qe"))
        - 2 * _dot(F.col("qe"), F.col("c"))
        + _dot(F.col("c"), F.col("c")),
        9,
    ).cast("decimal(18,9)")
    dtab = qsubs.join(F.broadcast(cb), "s").select(
        "qid", "cid", "s", "code", d.alias("d")
    )
    adc = (
        codes.join(F.broadcast(dtab), ["cid", "s", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d").cast("double").alias("dist"))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.col("dist"), 6).asc(), F.col("vec_id").asc()
    )
    return (
        adc.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("dist"), 6).alias("adc_dist"),
            "rnk",
        )
    )


# ------------------------------------------------------------------ #
# IVF / PQ store lifecycle (round 12) — append, delete, re-quantize.
# The semantic index's retrain discipline (similarity.py:
# semantic_index_requantize) applied to the ANN stores: appends stay
# frozen-geometry cheap, deletion is a tombstone side table, and the
# RE-QUANTIZE verb re-freezes the trained state over the surviving
# vectors in one corpus pass — the production IVF/PQ retrain.
# ------------------------------------------------------------------ #

_IVF_TOMBSTONE_DIR = ".tombstones"


def _ivf_tombstones(spark, path: str):
    """The store's deleted-id set, or None when nothing was ever
    deleted — the None arm lets never-deleted probes keep their exact
    pre-tombstone plan (the LSH no-tombstone scrub-skip discipline)."""
    import os

    d = os.path.join(path, _IVF_TOMBSTONE_DIR)
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return None
    return spark.read.parquet(d).select("vec_id").distinct()


_IVF_RETENTION_FILE = ".retention"


def ivf_expire(path: str, before_vec_id: int) -> None:
    """Retention cutoff for the persisted IVF store — drop every vector
    with ``vec_id < before_vec_id`` from search results, METADATA-ONLY
    (a monotone store-root marker, the same O(1) verb as the LSH /
    setjoin / BM25 / semantic families').  ``ivf_load`` filters
    ``vec_id >= cutoff`` before anything downstream; the frozen coarse
    quantizer is untouched (cell geometry is id-free — expired vectors
    still defined their cells, exactly as a trained centroid is not a
    corpus row).  Physical reclaim rides the next
    :func:`ivf_requantize`, which rewrites inverted/ over the scrubbed
    read anyway and carries the marker across its whole-root swap.

    The LOSSY stores (PQ, IVF-PQ) deliberately have no read-time
    retention verb: their requantize takes the CURRENT source relation
    explicitly, so retention — like deletion — is applied upstream and
    the re-encode IS the reclaim; only the IVF store, which keeps raw
    vectors, can honor a cutoff at read time."""
    from .store_layout import _write_int_marker_monotone

    _write_int_marker_monotone(path, _IVF_RETENTION_FILE, before_vec_id)


def ivf_append(spark, path: str, vecs: DataFrame) -> None:
    """Incremental maintenance under the FROZEN coarse quantizer: assign
    the new vectors against the stored centroids (broadcast — no corpus
    shuffle, no Lloyd) and append them to the cid-partitioned inverted
    file.  This is what keeps ingestion cheap between re-quantizes; the
    drift it accumulates (new vectors quantized under stale geometry)
    is exactly what :func:`ivf_requantize` repays.  At-least-once
    safe: replayed appends duplicate rows, the search's same-window
    LAG dedupe absorbs them at probe time (see
    :func:`ann_ivf_persisted_search`) and the re-quantize's DISTINCT
    reclaims them physically."""
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    assign_clusters(vecs, cents).write.mode("append").partitionBy("cid").parquet(
        os.path.join(path, "inverted")
    )


def ivf_delete(ids: DataFrame, path: str) -> None:
    """Right-to-be-forgotten for the IVF store: a SET-class tombstone
    side-table append (dot-prefixed — invisible to partition discovery;
    replays idempotent via the scrubbed read's DISTINCT; unseen ids a
    no-op).  ``ivf_load`` anti-joins tombstoned vectors out of the
    inverted file, so searches stop returning them immediately;
    physical reclaim rides the next :func:`ivf_requantize`."""
    import os

    ids.select(F.col("vec_id").cast("long").alias("vec_id")).distinct().write.mode(
        "append"
    ).parquet(os.path.join(path, _IVF_TOMBSTONE_DIR))


def ivf_requantize(
    spark,
    path: str,
    k: int | None = None,
    n_iter: int = 2,
) -> int:
    """RE-QUANTIZE the persisted IVF store (r11 VERDICT #3 — the
    semantic index's retrain verb applied to the ANN family): retrain
    the coarse quantizer over the WHOLE surviving vector set
    (distributed Lloyd, :func:`kmeans_fit` — deterministic init, so
    the retrain is a pure function of the survivors) and re-assign
    every row under it in one corpus pass.  ``k=None`` derives the
    centroid count from the surviving store size via the shared
    ``sem_n_centroids_for`` rule (k ~ sqrt(n)); pass an explicit k to
    match a fixed-width oracle.

    Laws (tests/test_round12.py): requantize == REBUILD over the
    survivors (same init, same vectors — bit-identical centroids and
    search results); a REPLAYED requantize is a no-op; tombstoned
    vectors are dropped and the tombstone table cleared (the purge
    rides along — the whole-root swap leaves the tombstone dir
    behind).  Both sub-stores stage inside ONE sibling dot-tmp root
    and the STORE ROOT swaps in a single rename pair (r12 hardening):
    a concurrent search can race the swap into a brief absent-root
    window — the same window every store compactor already has — but
    can never pair new centroids with an old inverted file (a
    cross-version read would silently mis-prune cells).  The inverted
    rewrite stays cid-partitioned (multi-task — one task per cell
    partition, the same layout the probes prune on); centroids are k
    rows, bounded.  Returns the new centroid count."""
    import os
    import shutil

    from .similarity import sem_n_centroids_for
    from .store_layout import _stage_store_root, _swap_store_root

    rows = (
        ivf_load(spark, path)[1]
        .select("vec_id", "e")
        .distinct()
        .localCheckpoint(eager=True)  # fully read before the swap
    )
    kk = k if k is not None else sem_n_centroids_for(rows.count())
    # kmeans_fit's last Lloyd round already checkpoints its output, and
    # the assignment reads only checkpointed relations, so the staged
    # inverted/ write is already "fully read before the swap" — r17
    # drops the two redundant eager checkpoints (each re-materialized a
    # corpus-scale relation) and overlaps the independent staged writes
    cents = kmeans_fit(rows, k=kk, n_iter=n_iter)
    assigned = assign_clusters(rows, cents)
    tmp_root = _stage_store_root(path)
    from .store_layout import parallel_store_writes

    parallel_store_writes(
        lambda: cents.write.mode("overwrite").parquet(
            os.path.join(tmp_root, "centroids")
        ),
        lambda: assigned.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(tmp_root, "inverted")),
    )
    _swap_store_root(tmp_root, path)
    return cents.count()


def pq_requantize(spark, path: str, subs: DataFrame, k: int = 16, n_iter: int = 2) -> int:
    """RE-QUANTIZE the persisted PQ store: retrain the per-subspace
    codebook and re-encode the corpus in one pass.  Unlike the IVF
    store (whose inverted file keeps the raw vectors), the PQ store is
    LOSSY — codes cannot reconstruct their subvectors — so the retrain
    takes the CURRENT source subvector relation ``subs`` (vec_id, s, e)
    explicitly, exactly as a production PQ retrain re-reads the corpus
    to re-encode it.  Deletions are therefore upstream: pass the
    surviving subvectors and the rewritten store IS the
    rebuild-over-survivors.

    Laws (tests/test_round12.py): requantize(subs) leaves the store
    serving bit-identically to pq_build(subs) — same deterministic
    init, same decimal-exact means; a replayed requantize is a no-op.
    Both sub-stores stage inside ONE sibling dot-tmp root and the
    STORE ROOT swaps in a single rename pair (r12 hardening): a racing
    reader can never pair the new codebook with old codes — ADC with a
    cross-version codebook would be silently wrong.  Single-writer.
    Returns the codeword count (n_subs * k rows)."""
    import os
    import shutil

    from .store_layout import _stage_store_root, _swap_store_root

    # pq_fit's last round already checkpoints the codebook; the codes
    # derive from the CALLER's ``subs`` (not the store being swapped),
    # so both staged writes are safe without extra materializations and
    # can overlap (guide §2.6)
    cb = pq_fit(subs, k, n_iter)
    codes = assign_codebook(subs, cb).select("vec_id", "s", "cid")
    tmp_root = _stage_store_root(path)
    from .store_layout import parallel_store_writes

    parallel_store_writes(
        lambda: cb.write.mode("overwrite").parquet(os.path.join(tmp_root, "codebook")),
        lambda: codes.write.mode("overwrite").parquet(os.path.join(tmp_root, "codes")),
    )
    _swap_store_root(tmp_root, path)
    return cb.count()


def ivfpq_requantize(
    spark,
    path: str,
    vecs: DataFrame,
    n_cent: int = 4,
    n_subs: int = 8,
    sub_len: int = 8,
    n_codes: int = 16,
    n_iter: int = 2,
) -> int:
    """RE-QUANTIZE the persisted residual IVF-PQ store: retrain cells
    AND residual codebooks and re-encode, all in one pass over the
    CURRENT source vectors (like the PQ store, codes are lossy, so the
    corpus re-read is explicit — a production IVFADC retrain does the
    same).  All three sub-stores stage inside ONE sibling dot-tmp root
    and the STORE ROOT swaps in a single rename pair (r12 hardening):
    a racing search can never mix sub-store versions — a new codebook
    scoring old codes would be silently wrong, and per-sub-store swaps
    left exactly that window open between renames.
    Laws (tests/test_round12.py): requantize(vecs) == ivfpq_build(vecs)
    bit-for-bit (shared ``_ivfpq_tables`` computation), replay no-op.
    Returns the surviving cell count."""
    import os
    import shutil

    from .store_layout import _stage_store_root, _swap_store_root

    # every _ivfpq_tables output derives from the CALLER's ``vecs`` and
    # internally checkpointed training state — never the store being
    # swapped — so the staged writes need no extra materializations and
    # can overlap (guide §2.6)
    cents, cb, codes = _ivfpq_tables(vecs, n_cent, n_subs, sub_len, n_codes, n_iter)
    tmp_root = _stage_store_root(path)
    from .store_layout import parallel_store_writes

    parallel_store_writes(
        lambda: cents.write.mode("overwrite").parquet(
            os.path.join(tmp_root, "centroids")
        ),
        lambda: cb.write.mode("overwrite").parquet(os.path.join(tmp_root, "codebook")),
        lambda: codes.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(tmp_root, "codes")),
    )
    _swap_store_root(tmp_root, path)
    return cents.count()
