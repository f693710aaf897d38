"""Dialect-portable SQL fragments (Spark SQL + DuckDB).

The dedup / text-analysis operators are *algorithmically defined* — MinHash
signatures, SimHash bits, shingle sets.  Their correctness gate is a DuckDB
oracle that must reproduce the same values, so the hash primitives are
deliberately built only from functions with identical semantics in both
engines:

* ``md5`` — identical lowercase hex in Spark and DuckDB (standard MD5);
* ``substr`` / ``concat`` / ``lower`` / ``trim`` — identical;
* ``min`` over fixed-length lowercase-hex strings — plain byte-wise
  ordering in both, so MinHash "minimum hash" is computed on the hex
  string itself (a deterministic total order; no hex→int conversion, which
  the two engines do NOT share);
* regex split / extract-all — Java regex vs RE2, restricted here to the
  shared subset (``\\s`` ``\\w`` classes, ``\\b``, alternation).

Each helper emits the fragment for ``dialect in {"spark", "duck"}``; a
query builder calls the same helpers for both dialects, so the Spark query
and its oracle are *the same algorithm by construction*.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def split_ws(expr: str, dialect: str) -> str:
    """Whitespace-tokenize into an array (leading/trailing trimmed)."""
    if dialect == SPARK:
        return f"split(trim({expr}), '\\\\s+')"
    return f"string_split_regex(trim({expr}), '\\s+')"


def arr_len(expr: str, dialect: str) -> str:
    return f"size({expr})" if dialect == SPARK else f"len({expr})"


def arr_el(expr: str, i: str, dialect: str) -> str:
    """1-based element access (both engines are 1-based here)."""
    return f"element_at({expr}, {i})" if dialect == SPARK else f"{expr}[{i}]"


def lateral_seq(lo: str, hi_inclusive: str, alias: str, dialect: str) -> str:
    """FROM-clause fragment exploding integers lo..hi (inclusive) as
    ``alias``.  Guard hi >= lo at the call site (Spark ``sequence`` with
    hi < lo counts *down*)."""
    if dialect == SPARK:
        return (
            f"LATERAL VIEW explode(sequence({lo}, {hi_inclusive})) "
            f"_t_{alias} AS {alias}"
        )
    # table alias derived from the column alias so two seq laterals can
    # coexist in one FROM (DuckDB rejects duplicate aliases)
    return f", UNNEST(range({lo}, ({hi_inclusive}) + 1)) AS _t_{alias}({alias})"


def lateral_arr(expr: str, alias: str, dialect: str) -> str:
    """FROM-clause fragment exploding an array column as ``alias``."""
    if dialect == SPARK:
        return f"LATERAL VIEW explode({expr}) _tok AS {alias}"
    return f", UNNEST({expr}) AS _tok({alias})"


def regexp_count(expr: str, pattern: str, dialect: str) -> str:
    """Number of non-overlapping matches of ``pattern``."""
    if dialect == SPARK:
        return f"size(regexp_extract_all({expr}, '{pattern}', 0))"
    return f"len(regexp_extract_all({expr}, '{pattern}'))"








def regex_replace_all(expr: str, pattern: str, repl: str, dialect: str) -> str:
    """Replace ALL matches: Spark's regexp_replace is global by default;
    DuckDB needs the explicit 'g' flag."""
    if dialect == SPARK:
        return f"regexp_replace({expr}, '{pattern}', '{repl}')"
    return f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"


def arr_slice_join(expr: str, start: str, n: int, sep: str, dialect: str) -> str:
    """Join ``n`` array elements from 1-based ``start`` with ``sep``.
    Spark: slice(arr, start, n); DuckDB: 1-based inclusive list slicing
    arr[start : start+n-1].  Both tolerate a short tail."""
    if dialect == SPARK:
        return f"array_join(slice({expr}, {start}, {n}), '{sep}')"
    return f"array_to_string(({expr})[({start}):(({start}) + {n - 1})], '{sep}')"


def days_since_epoch(expr: str, dialect: str) -> str:
    """Calendar day as an INTEGER day number (portable date arithmetic:
    day windows become integer offsets, sidestepping the engines'
    incompatible date+interval syntaxes)."""
    if dialect == SPARK:
        return f"datediff(CAST({expr} AS DATE), DATE '1970-01-01')"
    return f"(CAST({expr} AS DATE) - DATE '1970-01-01')"


def epoch_s(expr: str, dialect: str) -> str:
    """Epoch seconds as BIGINT (the portable way to emit a timestamp —
    both engines' native timestamp types hash differently downstream)."""
    if dialect == SPARK:
        return f"CAST(unix_timestamp({expr}) AS BIGINT)"
    return f"CAST(floor(epoch({expr})) AS BIGINT)"


def bit_xor(a: str, b: str, dialect: str) -> str:
    """Bitwise XOR: Spark SQL spells it ``^``; in DuckDB ``^`` is POWER
    and XOR is the ``xor()`` function."""
    if dialect == SPARK:
        return f"({a} ^ {b})"
    return f"xor({a}, {b})"


def last_value_ignore_nulls(expr: str, dialect: str) -> str:
    """``last_value`` skipping NULLs — the forward-fill window primitive.
    Spark puts the ``IGNORE NULLS`` clause AFTER the call, DuckDB takes
    it inside the argument list; semantics are identical (both verified
    on a leading-NULL fixture).  Follow with ``OVER (...)``."""
    if dialect == SPARK:
        return f"last_value({expr}) IGNORE NULLS"
    return f"last_value({expr} IGNORE NULLS)"
