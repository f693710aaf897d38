"""Set operators (SURVEY.md §2 "sorts, limits, set ops").

The reference's only set op is the implicit gather-side ``rbindlist``
(big.data.table.R:139) plus the ``rbindlapply`` convenience
(big.data.table.R:341-343); ``unique`` appears for partition-key derivation
(as.big.data.table.R:86-87,110).  intersect/except are engine extensions.
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import DataFrame


def rbindlist(dfs: Iterable[DataFrame], fill: bool = False) -> DataFrame:
    """Union-all by column name (reference ``rbindlist``; ``fill=TRUE`` ↔
    ``allowMissingColumns`` — absent columns become NULL)."""
    dfs = list(dfs)
    if not dfs:
        raise ValueError("rbindlist of empty list")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=fill), dfs)


def rbindlapply(xs: Iterable, fn, fill: bool = False, idcol: str | None = None) -> DataFrame:
    """Reference ``rbindlapply`` (big.data.table.R:341-343):
    ``rbindlist(lapply(X, FUN))``; ``idcol`` tags each piece with its
    source element (data.table's ``idcol=``)."""
    from pyspark.sql import functions as F

    dfs = []
    for x in xs:
        df = fn(x)
        if idcol is not None:
            df = df.withColumn(idcol, F.lit(x))
        dfs.append(df)
    return rbindlist(dfs, fill=fill)


def distinct_by(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """``unique(x, by=cols)`` (reference as.big.data.table.R:110).  With
    ``cols`` keeps one arbitrary whole row per key (``dropDuplicates``);
    without, full-row distinct.  One shuffle on the key columns."""
    if cols is None:
        return df.distinct()
    return df.dropDuplicates(list(cols))


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
