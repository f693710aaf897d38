"""Deterministic, reproducible sampling — the training-data splits that
must be stable across runs, engines, and cluster sizes.

``df.sample``/``sampleBy`` use engine RNG seeded per partition — results
change with partitioning, which is exactly wrong for a 100 TB corpus that
re-partitions between runs.  These operators derive the decision from a
content hash of the key: membership is a pure function of the key value —
stable, re-runnable, and reproducible by any engine with md5.

Mechanism: the first 8 hex chars of ``md5(salt|key)`` are uniform over
32-bit values, and lexicographic order on fixed-width lowercase hex is
numeric order — so ``prefix < hex(fraction · 2³²)`` samples a ``fraction``
subset with a plain string compare (no hex→int conversion, which
engines do NOT share).  The DuckDB catalog oracles use the byte-identical
predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_threshold(fraction: float) -> str:
    """Threshold T with (md5-prefix < T) ⇔ (unit < fraction).

    8 lowercase hex chars; fraction ≥ 1 returns the sentinel ``"g"`` —
    lexicographically greater than every hex string ('g' > 'f'), so the
    top split range is inclusive without needing a 9-digit value (which
    would break the fixed-width string compare)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    import math

    v = math.ceil(fraction * 2**32)
    if v >= 2**32:
        return "g"
    return format(v, "08x")


def hash_prefix(key: Column, salt: str = "") -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 8)


def sample_by_hash(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """≈``fraction`` sample with per-key deterministic membership."""
    return df.filter(hash_prefix(F.col(key), salt) < hex_threshold(fraction))


def split_by_hash(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Disjoint named splits (train/val/test) by consecutive hash ranges.
    Fractions must sum to ≤ 1; remainder rows get NULL."""
    acc = 0.0
    bounds = []
    for name, frac in fractions.items():
        bounds.append((hex_threshold(acc), hex_threshold(acc + frac), name))
        acc += frac
    if acc > 1.0 + 1e-9:
        raise ValueError("fractions sum to more than 1")
    p = hash_prefix(F.col(key), salt)
    expr = F.lit(None).cast("string")
    for lo, hi, name in reversed(bounds):
        expr = F.when((p >= lo) & (p < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def sample_predicate_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """The identical predicate as SQL text — valid in Spark SQL and
    DuckDB (md5/substr/string compare only)."""
    return (
        f"substr(md5(concat('{salt}|', CAST({key_expr} AS STRING))), 1, 8)"
        f" < '{hex_threshold(fraction)}'"
    )


def unit_hash_sql(key_expr: str, salt: str = "", dialect: str = "spark") -> str:
    """A deterministic uniform u ∈ (0,1) from md5(salt|key) — portable to
    DuckDB: the two engines share NO hex→int builtin, so the 8-hex-char
    prefix is decoded with an ``instr`` digit lookup per position
    (8 codegen'd terms; exact in double — 32 bits < 2^53) and shifted by
    +0.5/2³² away from 0 so ``ln(u)`` is always finite."""
    t = "STRING" if dialect == "spark" else "VARCHAR"
    h = f"substr(md5(concat('{salt}|', CAST({key_expr} AS {t}))), 1, 8)"
    # float constants: instr yields INT and 15·16⁷ overflows int32 under
    # ANSI mode; the sum is exact in double anyway (32 bits < 2^53)
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1) * {float(16 ** (8 - i))}"
        for i in range(1, 9)
    )
    return f"((({terms}) + 0.5) / 4294967296.0)"


def weighted_sample_sql(
    dialect: str,
    k: int = 20,
    key_expr: str = "o_orderkey",
    weight_expr: str = "o_totalprice",
    table: str = "orders",
    salt: str = "ws",
) -> str:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirtes A-ES scheme: each row gets the exponential key
    ``-ln(u)/w`` with u a content-hash uniform (so the sample is a pure
    function of the data, reproducible across engines/partitionings) and
    the k SMALLEST keys are the sample — heavier rows draw smaller keys
    with probability ∝ w.  The key is rounded to 9 dp with an id
    tie-break (shared total order: Spark/DuckDB libm may differ in the
    last bit).  ORDER BY + LIMIT, not a global window: Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge), so the
    sample never global-sorts at 100 TB."""
    u = unit_hash_sql(key_expr, salt, dialect)
    key = f"ROUND(-ln({u}) / ({weight_expr}), 9)"
    return (
        f"SELECT {key_expr}, {weight_expr}, {key} AS es_key FROM {table} "
        f"ORDER BY es_key ASC, {key_expr} ASC LIMIT {k}"
    )


def weighted_sample_per_group_sql(
    dialect: str,
    k: int = 5,
    group_expr: str = "o_orderpriority",
    key_expr: str = "o_orderkey",
    weight_expr: str = "o_totalprice",
    table: str = "orders",
    salt: str = "wsg",
) -> str:
    """Per-group weighted sampling without replacement — A-ES inside each
    group: the k smallest exponential keys PER GROUP are the sample
    (balanced weighted subsets per class, the stratified counterpart of
    :func:`weighted_sample_sql`).  ROW_NUMBER over (group → key) is one
    shuffle keyed by the group column; at 100 TB a hot group is the skew
    risk and AQE's skew-split applies, since nothing about the key
    depends on partitioning."""
    u = unit_hash_sql(key_expr, salt, dialect)
    key = f"ROUND(-ln({u}) / ({weight_expr}), 9)"
    return (
        f"SELECT grp, {key_expr}, {weight_expr}, es_key, CAST(rn AS BIGINT) AS rn "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp "
        f"ORDER BY es_key ASC, {key_expr} ASC) AS rn "
        f"FROM (SELECT {group_expr} AS grp, {key_expr}, {weight_expr}, "
        f"{key} AS es_key FROM {table}) keyed) t WHERE rn <= {k}"
    )


def split_case_sql(key_expr: str, fractions: dict[str, float], salt: str = "", dialect: str = "spark") -> str:
    """CASE expression assigning split names — dual-dialect (the cast
    type name differs: STRING vs VARCHAR)."""
    t = "STRING" if dialect == "spark" else "VARCHAR"
    p = f"substr(md5(concat('{salt}|', CAST({key_expr} AS {t}))), 1, 8)"
    acc = 0.0
    whens = []
    for name, frac in fractions.items():
        lo, hi = hex_threshold(acc), hex_threshold(acc + frac)
        whens.append(f"WHEN {p} >= '{lo}' AND {p} < '{hi}' THEN '{name}'")
        acc += frac
    return "CASE " + " ".join(whens) + " END"
