"""Size-derived output layout for doc-keyed store rewrites.

The bounded-cardinality stores (HLL registers <= 2^p/day, MG/CMS <=
sketch geometry, Bloom <= m rows) can rewrite through ``coalesce(1)``
forever — their merged relation is a few KB by construction.  The
CORPUS-cardinality stores (LSH digests/band ownership rows, BM25
postings at doc x term cardinality, winnowing fingerprints) cannot: at
100 TB the merged relation is itself TB-scale, and a single-task
single-file rewrite is a multi-hour straggler and an executor-disk
hazard (r11 VERDICT's one scale finding).  This module holds the ONE
sizing rule those rewrites share, the file-count twin of
``catalog_r4.bucket_count_for``'s bucket rule: one output file per
``target_file_bytes`` of Catalyst's free ``sizeInBytes`` estimate,
floor 1 (fixture-scale stores keep their single file, so every pinned
file-count and plan assertion is unchanged at test scale).  No
power-of-two rounding — plain files need no divisibility, only bucket
counts of co-bucketed tables do.

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R) has no persisted index stores at all — this is
extension surface; the rule exists so the maintenance verbs scale the
same way the query paths already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def store_file_count_for(df: DataFrame, target_file_bytes: int = 256 << 20) -> int:
    """Output-file count for a store rewrite: one file per
    ``target_file_bytes`` of the relation's Catalyst ``sizeInBytes``
    estimate (parquet footer stats through the optimizer, no job),
    floor 1.  Copy the RULE, not a constant — a hard-coded 1 is only
    right at fixture scale.  The private PyJava surface is guarded the
    same way ``bucket_count_for`` guards it: a signature change across
    Spark builds degrades to the fixture-scale floor, never a crash."""
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return 1
    return max(1, -(-est // target_file_bytes))


def write_store_relation(
    df: DataFrame,
    dest: str,
    *keys: str,
    sized_on: DataFrame | None = None,
    target_file_bytes: int = 256 << 20,
) -> None:
    """Rewrite ``df`` to ``dest`` with a size-derived file count, hash-
    partitioned on the LEADING key only (r12 review fix: hashing the
    full composite tuple scattered one ``tk``'s rows across every file,
    so the documented file-level skip for the BM25 term-pruned
    ``In(tk, ...)`` read was only row-group-level; partitioning on the
    probe key alone puts each key's rows in exactly one file) and
    sorted within files on ALL ``keys`` (parquet row-group min/max
    stats stay tight for the trailing keys too).  A pathologically hot
    leading key concentrates in its one file — acceptable for these
    stores: the leading key is the probe key, and probe selectivity is
    the point of the layout.  Sizing defaults to ``df`` itself; pass
    ``sized_on`` to size on the raw store read instead (footer stats
    beat a post-aggregate estimate, and over-counting files for a
    shrinking merge is the safe side).  Every store read already
    SUM-merges or DISTINCTs, so a multi-file layout changes nothing
    semantically — pinned result-neutral by the compact/purge law
    tests."""
    n = store_file_count_for(sized_on if sized_on is not None else df, target_file_bytes)
    df.repartition(n, keys[0]).sortWithinPartitions(*keys).write.mode(
        "overwrite"
    ).parquet(dest)


def _stage_store_root(path: str) -> str:
    """The sibling dot-tmp staging root for a whole-root store swap —
    ONE copy of the ``.{name}.requant.tmp`` naming convention the four
    requantize verbs share (and tests pin).  Clears any leftover from a
    crashed prior run and returns the path to stage into."""
    import os
    import shutil

    head, tail = os.path.split(path.rstrip("/"))
    tmp_root = os.path.join(head, f".{tail}.requant.tmp")
    shutil.rmtree(tmp_root, ignore_errors=True)
    return tmp_root


def _swap_store_root(tmp_root: str, path: str) -> None:
    """Swap a fully-staged STORE ROOT into place — the multi-sub-store
    variant of :func:`_swap_dir_in` (r12 hardening).  Per-sub-store
    swaps leave a window between renames where a racing reader pairs
    sub-stores from DIFFERENT versions; for geometry-coupled stores
    (a codebook scoring codes it did not encode, centroids pruning an
    inverted file assigned under other centroids) that read is silently
    wrong, so the requantize verbs stage every sub-store inside ONE
    sibling dot-tmp root and swap the root in a single rename pair.

    Root-level side-marker FILES (compaction watermarks, retention
    cutoffs — state documented to survive every verb except build) are
    carried into the staged root first; half-written ``.tmp`` and
    ``.lock`` files are not.  Side-table DIRECTORIES (tombstones) are
    deliberately left behind: a verb that stages a whole root has
    already folded them into the rewrite."""
    import os
    import shutil

    from .sketches import _swap_dir_in

    for f in os.listdir(path):
        p = os.path.join(path, f)
        if os.path.isfile(p) and not f.endswith((".tmp", ".lock")):
            shutil.copy2(p, os.path.join(tmp_root, f))
    _swap_dir_in(tmp_root, path)
