"""Property-based equivalence tests (hypothesis): the engine's query
operator vs a local pandas oracle on randomized small frames — the
reference's local-vs-distributed equivalence technique
(tests-03-as.big.data.table.R:53-60) generalized from one fixed workload
to generated ones."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_table_spark import BigDataTable
from big_data_table_spark.operators.joins import asof_join
from big_data_table_spark.operators.setops import rbindlist

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@st.composite
def frames(draw, min_rows=1, max_rows=40):
    n = draw(st.integers(min_rows, max_rows))
    keys = draw(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=n, max_size=n))
    ints = draw(
        st.lists(st.integers(-(10**6), 10**6), min_size=n, max_size=n)
    )
    floats = draw(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {
            "k": keys,
            "i": np.array(ints, dtype="int64"),
            "x": np.array(floats, dtype="float64"),
        }
    )


@SETTINGS
@given(pdf=frames())
def test_grouped_agg_matches_pandas(spark, pdf):
    bdt = BigDataTable.from_pandas(spark, pdf).repartition(3)
    got = (
        bdt.q(j={"n": F.count(F.lit(1)), "si": F.sum("i")}, by="k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        pdf.groupby("k")
        .agg(n=("i", "size"), si=("i", "sum"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "si": "int64"}), exp.astype({"n": "int64", "si": "int64"})
    )


@SETTINGS
@given(pdf=frames())
def test_filter_then_count_matches_pandas(spark, pdf):
    bdt = BigDataTable.from_pandas(spark, pdf)
    thresh = float(pdf["x"].median())
    got = bdt.q(i=F.col("x") > thresh).nrow
    assert got == int((pdf["x"] > thresh).sum())


@SETTINGS
@given(pdf=frames(min_rows=4), nsplit=st.integers(2, 4))
def test_rbindlist_partition_roundtrip(spark, pdf, nsplit):
    """Splitting a frame and rbinding the shards reproduces the whole —
    the reference's shard/gather identity."""
    # iloc-slice instead of np.array_split(DataFrame): the latter routes
    # through pandas' deprecated swapaxes and will break on a future pandas
    bounds = np.linspace(0, len(pdf), nsplit + 1, dtype=int)
    chunks = [pdf.iloc[lo:hi] for lo, hi in zip(bounds[:-1], bounds[1:])]
    dfs = [spark.createDataFrame(c) for c in chunks if len(c)]
    whole = rbindlist(dfs).toPandas()
    assert len(whole) == len(pdf)
    assert whole["i"].sum() == pdf["i"].sum()


@SETTINGS
@given(
    lt=st.lists(st.integers(0, 500), min_size=1, max_size=30),
    rt=st.lists(st.integers(0, 500), min_size=1, max_size=15),
)
def test_asof_matches_merge_asof(spark, lt, rt):
    left = pd.DataFrame({"t": sorted(lt)}).astype("int64")
    left["lid"] = np.arange(len(left), dtype="int64")
    right = (
        pd.DataFrame({"t": sorted(set(rt))}).astype("int64").reset_index(drop=True)
    )
    right["rv"] = np.arange(len(right), dtype="int64")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            right_cols=["rv"],
            bucket_width=100,  # keyless → the bucketed two-pass path
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(left, right, on="t", direction="backward")
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"), check_names=False
    )


@settings(deadline=None, max_examples=40)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=400,
    ),
    splits=st.integers(min_value=1, max_value=5),
)
def test_tdigest_compress_merge_properties(vals, splits):
    """Digest invariants that must hold for ANY input and ANY partition
    split: total weight conserved, centroid means sorted and inside the
    data range, quantile estimates monotone in q and inside [min, max],
    and merging per-chunk digests equals (within rank tolerance) the
    one-shot digest."""
    import numpy as np

    from big_data_table_spark.operators.tdigest import (
        _compress,
        _quantile,
    )

    arr = np.array(vals, dtype=float)
    m1, w1 = _compress(arr, np.ones_like(arr), 100.0)
    assert abs(w1.sum() - len(arr)) < 1e-9
    assert (np.diff(m1) >= 0).all()
    assert m1[0] >= arr.min() - 1e-9 and m1[-1] <= arr.max() + 1e-9

    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    ests = [_quantile(m1, w1, q) for q in qs]
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    assert all(arr.min() - 1e-9 <= e <= arr.max() + 1e-9 for e in ests)

    # chunked build + merge ≈ one-shot build (the mergeability contract)
    chunks = np.array_split(arr, splits)
    ms, ws = [], []
    for c in chunks:
        if len(c):
            cm, cw = _compress(c, np.ones_like(c), 100.0)
            ms.append(cm)
            ws.append(cw)
    mm, mw = _compress(np.concatenate(ms), np.concatenate(ws), 100.0)
    assert abs(mw.sum() - len(arr)) < 1e-9
    for q in qs:
        merged_est = _quantile(mm, mw, q)
        # compare by RANK, not value (values can sit on a plateau)
        rank = (arr <= merged_est).mean()
        lo = (arr < merged_est).mean()
        assert lo - 0.15 <= q <= rank + 0.15


# --------------------------------------------------------------------- #
# r6: subword tokenizer vs a pure-Python greedy reference on random
# corpora — the local-vs-distributed equivalence technique applied to
# the learned-vocabulary path (vocab derivation AND the walk)
# --------------------------------------------------------------------- #


def _py_vocab(word_counts: dict, k: int) -> set:
    from collections import Counter

    c: Counter = Counter()
    for w, cnt in word_counts.items():
        for length in range(2, 7):
            for p in range(0, len(w) - length + 1):
                c[w[p : p + length]] += cnt
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {tok for tok, _ in ranked}


def _py_greedy_tokens(word: str, vocab: set) -> int:
    pos, n = 0, 0
    while pos < len(word):
        adv = 1
        for length in range(6, 1, -1):
            if pos + length <= len(word) and word[pos : pos + length] in vocab:
                adv = length
                break
        pos += adv
        n += 1
    return n


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=10),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(1, 8),
)
def test_subword_counts_match_python_reference(spark, docs, k):
    from collections import Counter

    from big_data_table_spark.functions import subword as SW

    texts = [" ".join(words) for words in docs]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    spark.createDataFrame(pdf).createOrReplaceTempView("swprop")
    got = {
        r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_subword"])
        for r in SW.subword_token_counts(spark, k=k, src="swprop").collect()
    }
    wc: Counter = Counter(w for words in docs for w in words)
    vocab = _py_vocab(dict(wc), k)
    for i, words in enumerate(docs):
        want = (len(words), sum(_py_greedy_tokens(w, vocab) for w in words))
        assert got[i] == want, (i, words, vocab, got[i], want)


# --------------------------------------------------------------------- #
# r6: packing with an external token count vs a local greedy reference
# --------------------------------------------------------------------- #


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet="xyz ", min_size=1, max_size=12),
            st.integers(1, 50),
        ),
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(8, 200),
)
def test_pack_sequences_tokens_col_matches_reference(spark, rows, budget):
    import hashlib

    from big_data_table_spark.functions.packing import pack_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [t for t, _ in rows],
            "t": [n for _, n in rows],
        }
    )
    out = pack_sequences(
        spark.createDataFrame(pdf), budget=budget, tokens_col="t"
    ).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["bin_id"]) for r in out}
    order = sorted(
        range(len(rows)),
        key=lambda i: (hashlib.md5(rows[i][0].encode()).hexdigest(), i),
    )
    prefix = 0
    for i in order:
        want_bin = prefix // budget
        assert got[i] == (rows[i][1], want_bin), (i, rows[i], got[i], want_bin)
        prefix += rows[i][1]
    # conservation + the bounded-overflow law (charged-where-it-starts)
    assert sum(n for _, n in rows) == sum(v[0] for v in got.values())


@SETTINGS
@given(
    keys=st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=60),
    nsplit=st.integers(1, 4),
)
def test_bloom_positions_no_false_negatives_and_split_invariant(
    spark, keys, nsplit
):
    """Two structural Bloom laws on random key sets: (1) the position
    set of a union equals the union of per-split position sets (why
    append replay is safe for the store), and (2) every built key's
    positions are all present — no false negatives, ever."""
    import pandas as pd

    from big_data_table_spark.functions.sketches import _bloom_positions

    m, k = 512, 3
    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(keys, dtype="int64")}))
    whole = {
        r["pos"] for r in _bloom_positions(df, "v", m, k).collect()
    }
    merged: set = set()
    for i in range(nsplit):
        part = [v for j, v in enumerate(keys) if j % nsplit == i]
        if not part:
            continue
        pdf = spark.createDataFrame(
            pd.DataFrame({"v": pd.Series(part, dtype="int64")})
        )
        merged |= {r["pos"] for r in _bloom_positions(pdf, "v", m, k).collect()}
    assert merged == whole
    # keys that WERE built can never miss: their positions ⊆ whole
    built = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(keys, dtype="int64")})
    )
    for r in _bloom_positions(built, "v", m, k).collect():
        assert r["pos"] in whole


@SETTINGS
@given(
    vals=st.lists(
        st.integers(-(10**6), 10**6), min_size=1, max_size=200
    ),
    nsplit=st.integers(1, 5),
)
def test_cms_counter_split_merge_exact(spark, vals, nsplit):
    """The additive merge law on random multisets: per-split counter
    tables SUM-merge to the one-shot table bit-for-bit, for ANY split —
    the invariant the streaming CMS writer rests on."""
    import pandas as pd

    from big_data_table_spark.functions.sketches import cms_counter_table

    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(vals, dtype="int64")}))
    whole = {
        (r["rw"], r["cl"]): r["cnt"]
        for r in cms_counter_table(df, "v", w=64, d=3).collect()
    }
    merged: dict = {}
    for i in range(nsplit):
        part = [v for j, v in enumerate(vals) if j % nsplit == i]
        if not part:
            continue
        pdf = spark.createDataFrame(
            pd.DataFrame({"v": pd.Series(part, dtype="int64")})
        )
        for r in cms_counter_table(pdf, "v", w=64, d=3).collect():
            key = (r["rw"], r["cl"])
            merged[key] = merged.get(key, 0) + r["cnt"]
    assert merged == whole


@SETTINGS
@given(
    lt=st.lists(st.integers(0, 500), min_size=1, max_size=30),
    rt=st.lists(st.integers(0, 500), min_size=1, max_size=15),
    tol=st.integers(0, 100),
)
def test_asof_tolerance_matches_merge_asof(spark, lt, rt, tol):
    """The gap cap equals pandas merge_asof(tolerance=) on random
    integer time axes (keyed path; per-key group 'g')."""
    left = pd.DataFrame({"t": sorted(lt)}).astype("int64")
    left["g"] = np.int64(1)
    left["lid"] = np.arange(len(left), dtype="int64")
    right = (
        pd.DataFrame({"t": sorted(set(rt))}).astype("int64").reset_index(drop=True)
    )
    right["g"] = np.int64(1)
    right["rv"] = np.arange(len(right), dtype="int64")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="g",
            right_cols=["rv"],
            tolerance=float(tol),
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left, right, on="t", by="g", direction="backward", tolerance=tol
    )
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"), check_names=False
    )


@st.composite
def _corpora(draw):
    """Small corpora over a 3-word alphabet so shared w-grams are
    common: 4-10 docs, 1-14 words each, two sources."""
    n = draw(st.integers(4, 10))
    docs = []
    for i in range(n):
        ln = draw(st.integers(1, 14))
        ws = draw(
            st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=ln, max_size=ln)
        )
        docs.append(
            {
                "doc_id": i,
                "source": draw(st.sampled_from(["s0", "s1"])),
                "text": " ".join(ws),
            }
        )
    return docs


def _py_substring_fraction(docs, w):
    """Independent brute-force reference of dedup/substring_dedup_sql:
    dense covered-position sets, no interval-union shortcut — if the
    SQL's sparse LAG-run arithmetic is wrong anywhere, this disagrees."""
    words = {d["doc_id"]: d["text"].lower().strip().split() for d in docs}
    grams: dict = {}
    for did, ws in words.items():
        for p in range(len(ws) - w + 1):
            grams.setdefault(tuple(ws[p : p + w]), set()).add(did)
    shared = {g for g, s in grams.items() if len(s) >= 2}
    rows = {}
    for d in docs:
        ws = words[d["doc_id"]]
        covered: set = set()
        for p in range(len(ws) - w + 1):
            if tuple(ws[p : p + w]) in shared:
                covered.update(range(p, p + w))
        src = d["source"]
        agg = rows.setdefault(
            src, {"n_docs": 0, "n_words": 0, "dup_words": 0, "hit": 0, "maj": 0}
        )
        agg["n_docs"] += 1
        agg["n_words"] += len(ws)
        agg["dup_words"] += len(covered)
        agg["hit"] += 1 if covered else 0
        agg["maj"] += 1 if 2 * len(covered) > len(ws) else 0
    return rows


@SETTINGS
@given(docs=_corpora())
def test_substring_dedup_matches_python_reference(docs):
    """The substring-duplication audit's sparse interval-union SQL
    (SUM(LEAST(w, pos-LAG(pos)))) equals a dense brute-force coverage
    count on randomized corpora — including all-shared, none-shared,
    and straddling-run shapes hypothesis finds."""
    import duckdb
    import pandas as pd

    from big_data_table_spark.functions.dedup import substring_dedup_sql
    from big_data_table_spark.functions.portable import DUCK

    w = 3
    ref = _py_substring_fraction(docs, w)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    got = con.execute(substring_dedup_sql(DUCK, w=w)).fetchdf()
    con.close()
    assert set(got["source"]) == set(ref)
    for _, r in got.iterrows():
        e = ref[r["source"]]
        assert int(r["n_docs"]) == e["n_docs"]
        assert int(r["n_words"]) == e["n_words"]
        assert int(r["dup_words"]) == e["dup_words"], (r["source"], dict(e))
        assert int(r["n_docs_hit"]) == e["hit"]
        assert int(r["n_docs_majority"]) == e["maj"]
        assert abs(float(r["dup_frac"]) - e["dup_words"] / e["n_words"]) <= 5e-7


@SETTINGS
@given(docs=_corpora())
def test_substring_scrub_matches_python_reference(docs):
    """The keep-one scrub: per shared gram the smallest doc_id owns the
    span; every other occurrence's positions are removed and the doc is
    rebuilt in word order.  The reference rebuilds scrubbed text
    directly and md5-compares — any error in the owner rule, the
    coverage window, or the ordered string rebuild breaks the digest."""
    import hashlib

    import duckdb
    import pandas as pd

    from big_data_table_spark.functions.dedup import substring_scrub_sql
    from big_data_table_spark.functions.portable import DUCK

    w = 3
    words = {d["doc_id"]: d["text"].lower().strip().split() for d in docs}
    grams: dict = {}
    for did, ws in words.items():
        for p in range(len(ws) - w + 1):
            grams.setdefault(tuple(ws[p : p + w]), set()).add(did)
    expected = {}
    for d in docs:
        did = d["doc_id"]
        ws = words[did]
        covered: set = set()
        for p in range(len(ws) - w + 1):
            g = tuple(ws[p : p + w])
            owners = grams[g]
            if len(owners) >= 2 and did != min(owners):
                covered.update(range(p, p + w))
        if covered:
            kept = " ".join(wd for i, wd in enumerate(ws) if i not in covered)
            expected[did] = (
                len(ws),
                len(covered),
                hashlib.md5(kept.encode()).hexdigest(),
            )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    got = con.execute(substring_scrub_sql(DUCK, w=w)).fetchdf()
    con.close()
    assert set(got["doc_id"]) == set(expected)
    for _, r in got.iterrows():
        n_words, n_removed, fp = expected[int(r["doc_id"])]
        assert int(r["n_words"]) == n_words
        assert int(r["n_removed"]) == n_removed
        assert r["scrubbed_fp"] == fp, int(r["doc_id"])


@SETTINGS
@given(
    vals=st.lists(st.integers(-20, 20), min_size=1, max_size=60),
)
def test_two_phase_position_equals_global_rank(spark, vals):
    """operators/windows.two_phase_position (RFM's rank primitive) must
    assign exactly the positions one global ROW_NUMBER would, for any
    monotone bucket function — including capped buckets that collapse
    the tail into one band and heavily-tied values."""
    import pandas as pd

    from big_data_table_spark.operators.windows import two_phase_position

    pdf = pd.DataFrame({"id": range(len(vals)), "v": vals})
    df = spark.createDataFrame(pdf).repartition(5)
    for bucket in (
        F.least(F.col("v"), F.lit(3)),          # capped band
        (F.col("v") / 7).cast("long"),          # coarse band
        F.lit(0),                               # single band (degenerate)
    ):
        got = (
            two_phase_position(df, bucket, [F.col("v"), F.col("id")], out="pos")
            .select("id", "pos")
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        exp = (
            pdf.sort_values(["v", "id"])
            .reset_index(drop=True)
            .assign(pos=range(len(pdf)))
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert list(got["pos"]) == list(exp["pos"])


# ------------------------------------------------------------------ #
# r8 operator math pins
# ------------------------------------------------------------------ #

@SETTINGS
@given(counts=st.lists(st.integers(1, 500), min_size=2, max_size=60))
def test_gini_rank_formula_equals_pairwise_definition(counts):
    """The sorted-rank Gini formula the `events_user_gini` entry uses,
    G = Σ cᵢ·(2·rankᵢ − n + 1) / (n·Σc) over ascending ranks, must equal
    the textbook mean-absolute-difference definition
    G = Σᵢⱼ|cᵢ−cⱼ| / (2·n²·mean) — the identity the entry's correctness
    rests on beyond cross-engine parity."""
    n = len(counts)
    s = sum(counts)
    xs = sorted(counts)
    rank_form = sum(c * (2 * i - n + 1) for i, c in enumerate(xs)) / (n * s)
    pair_form = sum(abs(a - b) for a in counts for b in counts) / (2 * n * n * (s / n))
    assert abs(rank_form - pair_form) < 1e-9


@SETTINGS
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 40)),
        min_size=1,
        max_size=50,
    )
)
def test_backlog_delta_running_sum_equals_interval_count(iv):
    """The +1/−1 boundary-delta running sum `orders_backlog_profile`
    uses: after aggregating deltas per day and cumulating in day order,
    the value at day d equals the brute-force count of intervals with
    open ≤ d < close — the interval-overlap identity (the close day
    itself no longer counts, matching the −1-at-close convention)."""
    intervals = [(o, o + ln) for o, ln in iv]
    deltas: dict[int, int] = {}
    for o, c in intervals:
        deltas[o] = deltas.get(o, 0) + 1
        deltas[c] = deltas.get(c, 0) - 1
    run, backlog = {}, 0
    for d in sorted(deltas):
        backlog += deltas[d]
        run[d] = backlog
    for d, got in run.items():
        want = sum(1 for o, c in intervals if o <= d < c)
        assert got == want, (d, got, want)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),          # user
            st.integers(0, 1_000_000),  # epoch seconds
            st.sampled_from(["view", "click", "error", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_last_touch_encoded_max_matches_python_reference(spark, rows):
    """The encoded-string window MAX that `events_attribution_last_touch`
    uses (lpad(epoch)||'|'||type over strictly-preceding rows) must
    credit every purchase exactly like a direct Python scan that takes
    the max (epoch, type) among preceding non-purchase events and
    applies the 7-day gap — including timestamp-tie cases, which the
    (es, event_id) order key makes deterministic."""
    import pandas as pd

    from big_data_table_spark.catalog_r8 import _last_touch_builder
    from big_data_table_spark.functions.portable import SPARK

    pdf = pd.DataFrame(
        [
            (i, u, es, t, 1.0, None)
            for i, (u, es, t) in enumerate(rows)
        ],
        columns=["event_id", "user_id", "es", "event_type", "value", "props"],
    )
    # python reference
    want: dict[str, int] = {}
    for u in pdf["user_id"].unique():
        g = pdf[pdf["user_id"] == u].sort_values(["es", "event_id"])
        best = None  # (es, type) max among preceding non-purchase rows
        for _, r in g.iterrows():
            if r["event_type"] == "purchase":
                if best is None or r["es"] - best[0] > 604800:
                    key = "direct"
                else:
                    key = best[1]
                want[key] = want.get(key, 0) + 1
            else:
                cand = (r["es"], r["event_type"])
                if best is None or cand > best:
                    best = cand
    # engine form: the entry's SQL with the events scan redirected and
    # ts supplied as epoch seconds directly
    sql = _last_touch_builder(SPARK).replace(
        "FROM events)", "FROM _lt_test_events)"
    )
    import re

    sql = re.sub(r"unix_timestamp\(\w*ts\w*\)|to_unixtime\(ts\)", "es", sql)
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_lt_test_events")
    try:
        got = {
            r["touch_type"]: r["n_purchases"]
            for r in spark.sql(sql).collect()
        }
    finally:
        spark.catalog.dropTempView("_lt_test_events")
    assert got == want, (got, want)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),        # user
            st.integers(0, 20_000),   # epoch seconds (dense -> real gaps)
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bounce_rate_matches_python_reference(spark, rows):
    """`events_bounce_rate`'s whole chain — per-user 30-min-gap
    sessionization, the encoded-MIN first event (deterministic under
    timestamp ties via the (es, event_id) order), and the single-event
    bounce rule — against a direct Python scan on randomized event
    sequences."""
    import pandas as pd

    from big_data_table_spark.catalog_r8 import _events_bounce_rate_builder
    from big_data_table_spark.functions.portable import SPARK

    pdf = pd.DataFrame(
        [(i, u, es, t, 1.0, None) for i, (u, es, t) in enumerate(rows)],
        columns=["event_id", "user_id", "es", "event_type", "value", "props"],
    )
    # python reference
    want: dict[str, list[int]] = {}
    for u in pdf["user_id"].unique():
        g = pdf[pdf["user_id"] == u].sort_values(["es", "event_id"])
        sessions, cur, prev = [], [], None
        for _, r in g.iterrows():
            if prev is not None and r["es"] - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append((r["es"], r["event_id"], r["event_type"]))
            prev = r["es"]
        sessions.append(cur)
        for s in sessions:
            entry_type = min(s)[2]  # (es, event_id, type) lexicographic
            n_sess, n_bounce = want.setdefault(entry_type, [0, 0])
            want[entry_type] = [n_sess + 1, n_bounce + (len(s) == 1)]
    sql = _events_bounce_rate_builder(SPARK).replace(
        "FROM events)", "FROM _br_test_events)"
    )
    import re

    sql = re.sub(r"unix_timestamp\(\w*ts\w*\)|to_unixtime\(ts\)", "es", sql)
    spark.createDataFrame(pdf).createOrReplaceTempView("_br_test_events")
    try:
        got = {
            r["entry_type"]: [r["n_sessions"], r["n_bounces"]]
            for r in spark.sql(sql).collect()
        }
    finally:
        spark.catalog.dropTempView("_br_test_events")
    assert got == want, (got, want)


def _mg_summarize(slice_events: list[int], cap: int):
    """Python reference of sketches.mg_chunk_summary: exact counts, keep
    top-cap by (count DESC, key), thr = largest dropped count."""
    from collections import Counter

    counts = Counter(slice_events)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {k: c for k, c in ordered[:cap]}
    dropped = [c for _, c in ordered[cap:]]
    return kept, (max(dropped) if dropped else 0)


def _mg_bounds(summaries):
    """Python reference of sketches.mg_rollup_range_topk's algebra over
    (kept: dict, ube: dict, thr) summaries: lower = Σ kept counts,
    upper = lower + Σ ube + Σ thresholds of summaries missing the key."""
    tot_thr = sum(thr for _, _, thr in summaries)
    keys = set()
    for kept, _, _ in summaries:
        keys |= kept.keys()
    out = {}
    for k in keys:
        lb = sum(kept.get(k, 0) for kept, _, _ in summaries)
        ube = sum(u.get(k, 0) for _, u, _ in summaries)
        pthr = sum(thr for kept, _, thr in summaries if k in kept)
        out[k] = (lb, lb + ube + tot_thr - pthr)
    return out


@SETTINGS
@given(
    slices=st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=40),
        min_size=1,
        max_size=4,
    ),
    cap=st.integers(1, 6),
)
def test_mg_store_bounds_and_merge_law(slices, cap):
    """The SpaceSaving store's two laws, pinned against brute force on
    generated multisets (mirroring the CMS/backlog property pins):

    1. BOUNDS: for every key any summary kept, the exact total count
       lies in [lower, upper]; keys no summary kept have total ≤ the
       thresholds' sum.
    2. MERGE LAW (compaction): merging all slices into ONE summary via
       the store rule — c sums over present slices, ube absorbs the
       thresholds of slices the key was absent from, thr sums — yields
       bit-identical [lower, upper] for every reported key."""
    from collections import Counter

    truth = Counter(x for s in slices for x in s)
    sums = [(*_mg_summarize(s, cap), ) for s in slices]
    summaries = [(kept, {}, thr) for kept, thr in sums]
    bounds = _mg_bounds(summaries)
    tot_thr = sum(thr for _, _, thr in summaries)
    for k, n in truth.items():
        if k in bounds:
            lb, ub = bounds[k]
            assert lb <= n <= ub, (k, lb, n, ub)
        else:
            assert n <= tot_thr, (k, n, tot_thr)

    # compaction: one merged summary, no re-prune (sketches.mg_rollup_compact)
    merged_kept: dict[int, int] = {}
    merged_ube: dict[int, int] = {}
    for k in {k for kept, _, _ in summaries for k in kept}:
        merged_kept[k] = sum(kept.get(k, 0) for kept, _, _ in summaries)
        merged_ube[k] = sum(
            thr for kept, _, thr in summaries if k not in kept
        )
    compacted = [(merged_kept, merged_ube, tot_thr)]
    assert _mg_bounds(compacted) == bounds


@given(
    sets=st.lists(
        st.lists(st.integers(0, 400), min_size=0, max_size=60),
        min_size=2,
        max_size=4,
    ),
    split=st.integers(2, 5),
)
@SETTINGS
def test_bitmap_pack_algebra_matches_set_algebra(spark, sets, split):
    """The bitmap index's word-packing algebra vs Python set algebra on
    random id sets: per-set popcounts equal cardinalities, pairwise
    AND-popcounts equal intersection sizes, the all-sets OR equals the
    union — and splitting a set's rows into chunks before packing
    changes nothing (the BIT_OR merge law that makes the store's
    at-least-once appends free)."""
    from big_data_table_spark.functions import bitmap_store as BS

    rows = [
        (si, int(v), int(v) % split)
        for si, s in enumerate(sets)
        for v in set(s)
    ]
    if not rows:
        return
    ev = spark.createDataFrame(rows, "sid int, user_id long, chunk int")
    ev = ev.withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    packed = BS._packed_bitmaps(ev, "user_id", "ts", {"sid": F.col("sid")})
    packed_split = BS._packed_bitmaps(
        ev, "user_id", "ts", {"sid": F.col("sid"), "ch": F.col("chunk")}
    )
    merged_split = (
        packed_split.groupBy("day", "sid", "word")
        .agg(F.bit_or("bm").alias("bm"))
    )
    a = sorted(map(tuple, packed.select("sid", "word", "bm").collect()))
    b = sorted(map(tuple, merged_split.select("sid", "word", "bm").collect()))
    assert a == b  # chunk-split + BIT_OR == one-shot pack
    bm_by_sid = {}
    for sid, word, bm in a:
        bm_by_sid.setdefault(sid, {})[word] = bm
    pysets = [set(s) for s in sets]
    for si, s in enumerate(pysets):
        got = sum(bin(v).count("1") for v in bm_by_sid.get(si, {}).values())
        assert got == len(s)
    for i in range(len(pysets)):
        for j in range(i + 1, len(pysets)):
            wi, wj = bm_by_sid.get(i, {}), bm_by_sid.get(j, {})
            inter = sum(
                bin(wi[w] & wj[w]).count("1") for w in set(wi) & set(wj)
            )
            assert inter == len(pysets[i] & pysets[j])
    union_words = {}
    for wm in bm_by_sid.values():
        for w, bm in wm.items():
            union_words[w] = union_words.get(w, 0) | bm
    assert sum(bin(v).count("1") for v in union_words.values()) == len(
        set().union(*pysets)
    )
