#!/usr/bin/env python
"""Generate schema-compatible synthetic fixtures for CI.

The canonical fixtures under /root/testdata are DRIVER-generated and
read-only; they are not committed, so a bare CI runner has no data and
the suite used to self-skip into a meaningless green (ADVICE r2,
tests/conftest.py:26).  This script produces tables with the SAME
schemas, categorical domains, and row-count proportions as the driver's
sf0.001 set, deterministically within one environment (numpy PCG64,
fixed seed — numpy guarantees BitGenerator stream stability but NOT
Generator method output stability across releases, so two runners with
different numpy versions can produce different values; no test compares
values across independently generated fixture sets), so CI can run the
full Spark-vs-DuckDB oracle-parity suite on real data.

The VALUES differ from the driver's fixtures — tests that pin
fixture-specific constants (tuned recall thresholds, driver-data row
counts) carry the ``fixture_pinned`` marker and are skipped when
tests.yml sets BDT_GENERATED_FIXTURES=1 (tests/conftest.py).

Usage: python tools_gen_fixtures.py OUTDIR [--sf 0.001]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.39, 0.16, 0.16, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
EVENT_P = [0.45, 0.30, 0.10, 0.05, 0.10]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
P_ADJ = ["cold", "small", "large", "blue", "red", "green", "hot", "dim"]
P_NOUN = ["widget", "bolt", "rod", "gear", "plate", "tube"]
P_TYPES = ["MEDIUM", "LARGE", "STANDARD", "ECONOMY", "PROMO", "SMALL"]

DAY_US = 86_400_000_000


def _ts_us(base: str, day_offsets: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + (day_offsets * DAY_US).astype("int64"), pa.timestamp("us"))


def generate(outdir: str, sf: float = 0.001, seed: int = 4242) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    scale = sf / 0.001
    n_cust = int(150 * scale)
    n_supp = max(10, int(10 * scale))
    n_part = int(200 * scale)
    n_ord = int(1500 * scale)
    n_li = int(6000 * scale)
    n_ev = int(1000 * scale)
    n_doc = 500 if sf <= 0.01 else int(500 * scale / 10)
    n_emb = 500 if sf <= 0.01 else int(500 * scale / 25)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-900, 9950, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-900, 9950, n_supp), 2)),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{rng.choice(P_ADJ)} {rng.choice(P_NOUN)}" for _ in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(P_TYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900 + rng.uniform(0, 20, n_part), 2)),
    }))
    o_days = rng.uniform(0, 2404, n_ord)  # 1995-01-01 .. 2001-08
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord, p=[0.48, 0.48, 0.04])),
        "o_totalprice": pa.array(np.round(rng.uniform(1300, 499000, n_ord), 2)),
        "o_orderdate": _ts_us("1995-01-01", np.floor(o_days)),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))
    li_order = rng.integers(0, n_ord, n_li)
    li_order.sort()
    linenumber = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):
        if li_order[i] == li_order[i - 1]:
            linenumber[i] = linenumber[i - 1] + 1
    write("lineitem", pa.table({
        "l_orderkey": pa.array(li_order),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(linenumber),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype("float64")),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": _ts_us("1995-01-02", np.floor(rng.uniform(0, 2498, n_li))),
    }))
    ev_ts = np.sort(rng.uniform(0, 30, n_ev))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts_us("2024-01-01", ev_ts),
        "user_id": pa.array(rng.integers(0, max(15, n_ev // 66), n_ev)),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n_ev, p=EVENT_P)),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev) + 0.01, 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: ~10% are near-duplicate perturbations of earlier docs so
    # the dedup operators have real positives to find
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.10:
            words = texts[rng.integers(0, i)].split(" ")
            j = rng.integers(0, len(words))
            words[j] = str(rng.choice(VOCAB))
            texts.append(" ".join(words))
        else:
            n_words = rng.integers(8, 110)
            texts.append(" ".join(rng.choice(VOCAB, n_words)))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: 10 label clusters + ~5% near-duplicate vectors
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs = centers[labels] * 0.05 + rng.normal(0, 0.05, (n_emb, 64))
    for i in range(1, n_emb):
        if rng.random() < 0.05:
            src = rng.integers(0, i)
            vecs[i] = vecs[src] + rng.normal(0, 0.001, 64)
            labels[i] = labels[src]
    # unit-norm rows: the canonical driver fixtures are exactly
    # L2-normalized, and recall thresholds are tuned on that geometry
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=4242)
    a = ap.parse_args()
    generate(a.outdir, a.sf, a.seed)
    print(f"wrote fixtures to {a.outdir} (sf={a.sf})")
