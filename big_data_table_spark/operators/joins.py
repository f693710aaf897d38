"""Join operators.

The reference's entire join surface is node-local ``data.table`` joins
forwarded through ``[[`` (reference README.md:226-227, "join within the
scope of node") — globally correct only when both sides are co-partitioned
or one is replicated.  Spark's shuffle exchange makes every join global;
Catalyst picks broadcast vs shuffled-hash vs sort-merge, and AQE rewrites at
runtime.  We therefore expose *semantics*, not physical strategies, and add
the two families the reference lacks (as-of, range) Spark-first.

Scale notes (100 TB): dimension sides below
``spark.sql.autoBroadcastJoinThreshold`` broadcast automatically; we still
mark known-small sides with ``F.broadcast`` because at petabyte scale the
statistics that drive auto-broadcast are often missing on fresh scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _right_struct_type(right: DataFrame, right_cols: list[str]) -> StructType:
    """Struct type bundling the carried right-side columns: the as-of fill
    carries the whole matched row as ONE value so per-column NULLs survive."""
    return StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )


def lookup_join(
    x: DataFrame,
    y: DataFrame,
    on: str | list[str],
    broadcast: bool = False,
) -> DataFrame:
    """data.table ``y[x, on=]`` — a **left** join of ``x`` against ``y``
    (unmatched x-rows keep NULL y-columns).  Reference: README.md:226-227,
    tests-06-readme.R:255-257; semantics pinned in SURVEY.md §7's risk
    register because the direction is easy to flip.

    ``broadcast=True`` hints the lookup side — the common case is a small
    dimension (reference: per-Species grouped means joined back to iris).
    """
    right = F.broadcast(y) if broadcast else y
    return x.join(right, on=on, how="left")


def semi_join(x: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """Filter-by-join, ``x[keys, nomatch=0L]`` existence form (reference
    big.data.table.R:196-198 uses the inner form for shard routing)."""
    return x.join(keys, on=on, how="left_semi")


def anti_join(x: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """``x[!keys]`` (reference big.data.table.R:241, the repartition TODO's
    anti-pattern filter)."""
    return x.join(keys, on=on, how="left_anti")


def cross_join(a: DataFrame, b: DataFrame) -> DataFrame:
    """``CJ(a, b)`` full cartesian (reference README.md:117,
    tests-06-readme.R:79).  At scale: output is |a|·|b| — only sane when
    one side is tiny; Spark broadcasts the smaller side (BroadcastNestedLoopJoin)."""
    return a.crossJoin(b)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    bucket_width: float | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join — for each left row, the latest right row with
    ``right.on <= left.on`` (backward; ``forward`` = earliest ``>=``),
    optionally per ``by`` group.  Absent from both the reference and core
    Spark (SURVEY.md §4.3 names it the one debatable custom piece).

    Implementation is the scalable union+window formulation, not a UDF:
    tag and union both inputs, sort within each ``by`` partition by
    ``(on, side)``, and carry the matched right ROW forward as one struct
    through a single ``last(..., ignorenulls=True)`` — atomic, so a right
    column that is legitimately NULL in the matching row stays NULL
    instead of back-sliding to an older right row (per-column fills mix
    columns from different rows).  One shuffle (the window exchange), no
    driver involvement, skew bounded by the ``by`` cardinality — survives
    a 100× scale-up where a per-group ``merge_asof`` pandas UDF would OOM
    on hot groups.

    Without ``by`` there is no partition key, and an unpartitioned window
    would sort the whole union in ONE task — a scale-killer, so it is
    **refused**: pass ``bucket_width`` instead (units of ``on``), which
    routes through the bucketed two-pass formulation
    (:func:`_asof_join_bucketed`) — every window partitioned by time
    bucket, cross-bucket carry via a tiny per-bucket boundary table.

    ``tolerance`` (pandas ``merge_asof(tolerance=)`` / kdb ``wj`` gap
    cap): a match farther than ``tolerance`` from the left row — in
    units of ``on``; SECONDS for timestamp columns (the gap is computed
    via the epoch-seconds double cast) — is nulled out atomically (the
    whole matched row, same no-column-mixing guarantee).  Implemented as
    a post-filter on the carried right row's own ``on`` value, so it
    adds zero shuffles.  Supported on the ``by``-keyed path; the
    bucketed keyless path refuses it explicitly.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    if not by:
        if bucket_width is None:
            raise ValueError(
                "asof_join without `by` would use an UNPARTITIONED window "
                "(whole union sorted in a single task — unusable at "
                "scale).  Pass `by=` for per-key windows, or "
                "`bucket_width=` (units of `on`) for the time-bucketed "
                "formulation."
            )
        if tolerance is not None:
            raise ValueError(
                "tolerance is not supported on the bucketed keyless path "
                "(the cross-bucket boundary carry does not retain the "
                "matched row's own `on`); use the `by`-keyed path"
            )
        return _asof_join_bucketed(
            left, right, on, right_cols, direction, suffix, bucket_width
        )

    if tolerance is not None:
        # carry the matched row's own `on` inside the struct so the gap
        # cap is a pure projection after the window — no extra shuffle
        right = right.withColumn("__r_on", F.col(on))
        right_cols = list(right_cols) + ["__r_on"]

    lcols = left.columns
    out_right = {c: (c + suffix if c in lcols else c) for c in right_cols}
    r_struct = _right_struct_type(right, right_cols)

    # side ordering: in backward mode right rows at ts T must be visible to
    # left rows at the same T → right sorts first (side 0).
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    # build the right side aligned to the union schema explicitly
    r_cols = []
    for c in lcols:
        if c == on or c in by:
            r_cols.append(F.col(c))
        else:
            r_cols.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
    r_cols.append(F.lit(0).alias("__side"))
    r_cols.append(F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"))
    r_tagged = right.select(*r_cols)

    unioned = l_tagged.unionByName(r_tagged)

    order_on = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order_on, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE last() over the whole-row struct: the matched right row wins
    # atomically (a NULL right column never back-slides to an older row)
    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__f")
    )

    if tolerance is None:
        rsel = [F.col("__f")[c].alias(out_right[c]) for c in right_cols]
    else:
        gap = F.col(on).cast("double") - F.col("__f")["__r_on"].cast("double")
        if direction == "forward":
            gap = -gap
        ok = gap <= F.lit(float(tolerance))
        rsel = [
            F.when(ok, F.col("__f")[c]).alias(out_right[c])
            for c in right_cols
            if c != "__r_on"
        ]
    result = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols], *rsel
    )
    return result


def _asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_cols: list[str],
    direction: str,
    suffix: str,
    bucket_width: float,
) -> DataFrame:
    """Keyless as-of without a global sort: bucket the time axis and run
    the union+window pass **partitioned by bucket**, then resolve left
    rows with no in-bucket match through a per-bucket boundary table.

    Two-pass shape:

    1. in-bucket pass — the standard union+window carry, but the window
       partitions on ``floor(on / bucket_width)``, so the sort is
       per-bucket and parallel;
    2. cross-bucket carry — the last (backward) / first (forward) right
       row of EACH bucket is one row per non-empty right bucket (bounded
       by the time-range / bucket_width, thousands not billions), so the
       "latest right row in any earlier bucket" lookup is a broadcast
       non-equi join of that tiny boundary table against the distinct
       missed buckets, then a per-missed-bucket ``row_number`` — every
       window in the plan is partitioned.

    Correctness: a right row in an earlier bucket always has
    ``on < left.on``'s bucket start ≤ ``left.on`` (backward; symmetric
    argument forward), so in-bucket and cross-bucket candidates never
    disagree — the in-bucket match wins whenever it exists.
    """
    backward = direction == "backward"
    lcols = left.columns
    out_right = {c: (c + suffix if c in lcols else c) for c in right_cols}

    def _bucket(col: Column, dtype: str) -> Column:
        num = (
            col.cast("timestamp").cast("double")
            if dtype.startswith("timestamp")
            else col.cast("double")
        )
        return F.floor(num / F.lit(float(bucket_width)))

    l_dtype = dict(left.dtypes)[on]
    r_dtype = dict(right.dtypes)[on]

    r_struct = _right_struct_type(right, right_cols)
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        _bucket(F.col(on), l_dtype).alias("__bucket"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r_sel: list[Column] = []
    for c in lcols:
        if c == on:
            r_sel.append(F.col(c))
        else:
            r_sel.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
    r_sel.append(_bucket(F.col(on), r_dtype).alias("__bucket"))
    r_sel.append(F.lit(0).alias("__side"))
    r_sel.append(F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"))
    r_tagged = right.select(*r_sel)

    order = [F.col(on).asc() if backward else F.col(on).desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # one struct carry — the whole right row wins atomically, and the
    # non-null struct doubles as the has-match flag (same shape as the
    # cross-bucket carry below, so the two passes can never disagree on
    # which columns come from which row)
    filled = l_tagged.unionByName(r_tagged).select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__f")
    )
    left_rows = filled.filter(F.col("__side") == 1)
    hit = left_rows.filter(F.col("__f").isNotNull()).select(
        *[F.col(c) for c in lcols],
        *[F.col("__f")[c].alias(out_right[c]) for c in right_cols],
    )
    miss = left_rows.filter(F.col("__f").isNull()).select(
        *[F.col(c) for c in lcols], "__bucket"
    )

    # boundary: ONE row per non-empty right bucket (the bucket's last /
    # first right row) — tiny by construction, safe to broadcast
    wb = Window.partitionBy("__bucket").orderBy(
        F.col("__r_on").desc() if backward else F.col("__r_on").asc()
    )
    boundary = (
        r_tagged.select("__bucket", F.col(on).alias("__r_on"), "__r")
        .withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    miss_buckets = miss.select("__bucket").distinct()
    bd = boundary.withColumnRenamed("__bucket", "__b_bucket")
    cond = (
        F.col("__b_bucket") < F.col("__bucket")
        if backward
        else F.col("__b_bucket") > F.col("__bucket")
    )
    wc = Window.partitionBy("__bucket").orderBy(
        *(
            [F.col("__r_on").desc(), F.col("__b_bucket").desc()]
            if backward
            else [F.col("__r_on").asc(), F.col("__b_bucket").asc()]
        )
    )
    carry = (
        miss_buckets.join(F.broadcast(bd), cond)
        .withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") == 1)
        .select("__bucket", "__r")
    )
    resolved_miss = miss.join(F.broadcast(carry), "__bucket", "left").select(
        *[F.col(c) for c in lcols],
        *[F.col("__r")[c].alias(out_right[c]) for c in right_cols],
    )
    return hit.unionByName(resolved_miss)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Range join ``left.val BETWEEN right.lo AND right.hi`` without the
    O(n·m) nested-loop Catalyst falls back to for pure inequality joins.

    Strategy: bucketize the range key on both sides (right rows explode to
    every bucket their interval overlaps via ``sequence``), equi-join on
    ``(by…, bucket)``, then re-filter exactly.  Turns a cartesian into a
    hash join whose fan-out is interval_width / bucket_width — the standard
    bucketed-range-join trick Spark itself lacks natively.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / F.lit(bucket_width)))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor(F.col(right_hi) / F.lit(bucket_width)),
            )
        ),
    )
    joined = lb.join(rb, on=by + ["__bucket"], how="inner").filter(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi))
    )
    return joined.drop("__bucket")
