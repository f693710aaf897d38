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
) -> DataFrame:
    """As-of join — for each left row, the latest right row with
    ``right.on <= left.on`` (backward; ``forward`` = earliest ``>=``),
    optionally per ``by`` group.  Absent from both the reference and core
    Spark (SURVEY.md §4.3 names it the one debatable custom piece).

    Implementation is the scalable union+window formulation, not a UDF:
    tag and union both inputs, sort within each ``by`` partition by
    ``(on, side)``, and carry the last non-null right-side values forward
    with ``last(..., ignorenulls=True)``.  One shuffle (the window
    exchange), no driver involvement, skew bounded by the ``by``
    cardinality — survives a 100× scale-up where a per-group
    ``merge_asof`` pandas UDF would OOM on hot groups.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    if not by:
        import warnings

        warnings.warn(
            "asof_join without `by` uses an UNPARTITIONED window — the "
            "whole union sorts in a single task.  Fine for small inputs; "
            "at scale pass `by` (per-key windows) or pre-bucket the time "
            "axis (operators/joins.py:range_join pattern).",
            stacklevel=2,
        )

    lcols = left.columns
    out_right = {c: (c + suffix if c in lcols else c) for c in right_cols}

    # side ordering: in backward mode right rows at ts T must be visible to
    # left rows at the same T → right sorts first (side 0).
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias("__r_" + c) for c in right_cols],
    )
    # build the right side aligned to the union schema explicitly
    r_cols = []
    for c in lcols:
        if c == on or c in by:
            r_cols.append(F.col(c))
        else:
            r_cols.append(F.lit(None).cast(left.schema[c].dataType).alias(c))
    r_cols.append(F.lit(0).alias("__side"))
    r_cols += [F.col(c).alias("__r_" + c) for c in right_cols]
    r_tagged = right.select(*r_cols)

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            "*", *[F.last("__r_" + c, ignorenulls=True).over(w).alias("__f_" + c) for c in right_cols]
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            "*", *[F.last("__r_" + c, ignorenulls=True).over(w).alias("__f_" + c) for c in right_cols]
        )

    result = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col("__f_" + c).alias(out_right[c]) for c in right_cols],
    )
    return result


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
