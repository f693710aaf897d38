"""Round-9 wave-11 pins (catalog_r9c.py entries).

The oracle-parity gate already proves value-exactness; these pins cover
what parity can't see —

1. the bitmap index agrees with INDEPENDENT formulations: DAU vs a
   direct COUNT(DISTINCT), pairwise Jaccard vs the distinct-pair-join
   entry (two exact algorithms, one answer);
2. PageRank conservation (ranks sum to 1 within quantization) and the
   teleport floor, plus the top-20 plan shape;
3. Kaplan-Meier monotonicity (survival and risk set both non-increasing)
   and the first-step closed form;
4. the CUSUM argmax matches a driver-side Decimal simulation;
5. equi-depth bands partition each source exactly, in value order;
6. Benford shares sum to 1 per group with all 9 digits present;
7. the OLS trend matches numpy's least squares on the same quantized
   series.
"""

from __future__ import annotations

import math
from decimal import Decimal

from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.catalog_base import register_views
from big_data_table_spark.plans import formatted_plan


def test_bitmap_dau_matches_count_distinct(spark, sf_dir):
    """Exact bitmap popcount DAU == COUNT(DISTINCT user_id) per day —
    the property that makes the bitmap an INDEX, not an estimate."""
    register_views(spark, sf_dir)
    direct = {
        r.day: r.n
        for r in spark.sql(
            "SELECT datediff(CAST(ts AS DATE), DATE '1970-01-01') AS day, "
            "COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1"
        ).collect()
    }
    rows = CATALOG["bitmap_presence_retention"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.prev_dau == direct[r.prev_day], (r.prev_day,)
        assert r.dau == direct[r.day], (r.day,)
        # internal identity of the exact index (not true of sketches):
        assert r.retained + r.churned == r.prev_dau
        assert r.retained + r.new_users == r.dau


def test_bitmap_jaccard_matches_pair_join_entry(spark, sf_dir):
    """The bitmap-popcount Jaccard equals the distinct-pair-join
    formulation (events_audience_overlap) pair for pair — two exact
    algorithms, byte-identical answers."""
    bm = {
        (r.et_a, r.et_b): (r.n_both, r.n_a, r.n_b, r.jaccard)
        for r in CATALOG["bitmap_audience_jaccard"].fn(spark, sf_dir).collect()
    }
    pj = {
        (r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.jaccard)
        for r in CATALOG["events_audience_overlap"].fn(spark, sf_dir).collect()
    }
    # the pair-join entry omits zero-intersection pairs; the bitmap
    # entry's totals spine emits them with an exact 0
    assert set(pj) <= set(bm)
    for k, v in pj.items():
        assert bm[k] == v, (k, bm[k], v)
    for k in set(bm) - set(pj):
        assert bm[k][0] == 0, (k, bm[k])


def test_pagerank_conservation_and_floor(spark, sf_dir):
    """Total rank mass stays 1 (within the 12-dp per-node quantization)
    and every node keeps at least the teleport floor 0.15/n; the top-20
    spine is TakeOrderedAndProject, not a global rank window."""
    from big_data_table_spark.catalog_r9b import _lsh_candidate_edges
    from big_data_table_spark.operators.graph import pagerank

    register_views(spark, sf_dir)
    ranks = pagerank(_lsh_candidate_edges(spark), "doc_a", "doc_b", iters=3)
    vals = [r.r for r in ranks.collect()]
    n = len(vals)
    assert n > 0
    total = sum(vals)  # Decimal-exact sum
    assert abs(total - Decimal(1)) <= Decimal(n) * Decimal("1e-12") * 4, total
    floor = Decimal("0.15") / n
    assert all(v >= floor - Decimal("1e-11") for v in vals), min(vals)
    df = CATALOG["candidate_graph_pagerank"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_km_monotone_and_first_step(spark, sf_dir):
    """Survival and risk set are both non-increasing in t; the first
    event time's survival equals its own single factor 1 - d/n (the
    product has one term there)."""
    rows = sorted(
        CATALOG["customer_survival_km"].fn(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0, r
        assert r.survival <= prev_s + 1e-9, (r.t_days, r.survival, prev_s)
        if prev_n is not None:
            assert r.n_risk <= prev_n, (r.t_days,)
        assert 1 <= r.d_events <= r.n_risk, r
        prev_s, prev_n = r.survival, r.n_risk
    first = rows[0]
    expect = math.exp(round(math.log(1.0 - first.d_events / first.n_risk), 9))
    assert abs(first.survival - round(expect, 6)) < 1e-9


def test_cusum_matches_decimal_simulation(spark, sf_dir):
    """The top-|CUSUM| day equals a driver-side Decimal re-walk of the
    daily series with the same quantized mean — the sequential
    formulation the window computes distributively."""
    register_views(spark, sf_dir)
    daily = sorted(
        (r.day, r.n)
        for r in spark.sql(
            "SELECT datediff(CAST(ts AS DATE), DATE '1970-01-01') AS day, "
            "COUNT(*) AS n FROM events GROUP BY 1"
        ).collect()
    )
    total = sum(n for _, n in daily)
    mu = Decimal(str(round(total / len(daily), 6)))
    cum, series = Decimal(0), []
    for day, n in daily:
        cum += Decimal(n) - mu
        series.append((day, cum))
    best = sorted(series, key=lambda t: (-abs(t[1]), t[0]))[:5]
    got = CATALOG["events_cusum_changepoint"].fn(spark, sf_dir).collect()
    assert len(got) == len(best) == 5
    for r, (d, c) in zip(got, best):
        assert r.day == d
        assert abs(Decimal(str(r.cusum)) - c) < Decimal("1e-9")


def test_equidepth_bands_partition_each_source(spark, sf_dir):
    """Bands 1..4 partition each source's documents exactly (counts sum
    to the source total) in value order (band ranges are disjoint and
    increasing); no band exceeds a quarter by more than one value's
    worth (the whole-value assignment envelope)."""
    register_views(spark, sf_dir)
    totals = {
        r.source: r.n
        for r in spark.sql(
            "SELECT source, COUNT(*) AS n FROM documents GROUP BY 1"
        ).collect()
    }
    heaviest = {
        r.source: r.m
        for r in spark.sql(
            "SELECT source, MAX(c) AS m FROM (SELECT source, n_chars, "
            "COUNT(*) AS c FROM documents GROUP BY 1, 2) _v GROUP BY source"
        ).collect()
    }
    rows = CATALOG["docs_equidepth_bands"].fn(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(totals)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.band)
        assert [r.band for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.n_docs for r in rs) == totals[src]
        for a, b in zip(rs, rs[1:]):
            assert a.len_hi < b.len_lo, (src, a.band)
        quarter = totals[src] / 4
        for r in rs:
            assert r.n_docs <= quarter + heaviest[src], (src, r.band)


def test_benford_shares_complete(spark, sf_dir):
    """All 9 digits present per priority (absent ones as exact 0),
    observed shares sum to 1 within the 9-dp quantization, TVD is a
    constant per group inside [0, 1]."""
    rows = CATALOG["benford_deviation_report"].fn(spark, sf_dir).collect()
    by_p = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append(r)
    for p, rs in by_p.items():
        assert sorted(r.digit for r in rs) == list(range(1, 10)), p
        s = sum(Decimal(str(r.obs_share)) for r in rs)
        assert abs(s - 1) <= Decimal("9e-9"), (p, s)
        tvds = {r.tvd for r in rs}
        assert len(tvds) == 1 and 0.0 <= rs[0].tvd <= 1.0, (p, tvds)


def test_ols_trend_matches_numpy(spark, sf_dir):
    """Per-segment slope/intercept match numpy least squares on the
    same dollar-quantized monthly series (independent algorithm; the
    oracle shares ours)."""
    import numpy as np

    register_views(spark, sf_dir)
    series = spark.sql(
        "SELECT c_mktsegment AS segment, "
        "(year(o_orderdate) - 1992) * 12 + (month(o_orderdate) - 1) AS mx, "
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) "
        "AS y FROM orders JOIN customer ON c_custkey = o_custkey "
        "GROUP BY 1, 2"
    ).collect()
    by_seg = {}
    for r in series:
        by_seg.setdefault(r.segment, []).append((r.mx, r.y))
    got = {
        r.segment: (r.slope_per_month, r.intercept, r.r2)
        for r in CATALOG["segment_monthly_trend"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_seg)
    for seg, pts in by_seg.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        gs, gi, gr2 = got[seg]
        assert abs(gs - slope) < 1e-4 * max(1.0, abs(slope)), (seg, gs, slope)
        assert abs(gi - intercept) < 1e-4 * max(1.0, abs(intercept))
        assert 0.0 <= gr2 <= 1.0


def test_nation_shares_sum_per_region(spark, sf_dir):
    """Region shares are a partition of unity within each region (up to
    the 6-dp per-nation rounding), and customer counts reconcile with
    the table total."""
    register_views(spark, sf_dir)
    region_of = {
        r.n_name: r.n_regionkey
        for r in spark.sql(
            "SELECT n_name, n_regionkey FROM nation"
        ).collect()
    }
    total_cust = spark.sql("SELECT COUNT(*) FROM customer").collect()[0][0]
    rows = CATALOG["nation_balance_report"].fn(spark, sf_dir).collect()
    assert sum(r.n_cust for r in rows) == total_cust
    by_region = {}
    for r in rows:
        by_region.setdefault(region_of[r.nation], []).append(r)
    for reg, rs in by_region.items():
        s = sum(Decimal(str(r.region_share)) for r in rs if r.region_share)
        assert abs(s - 1) <= Decimal("5e-6"), (reg, s)


def test_bitmap_range_plan_reads_only_bitmap_files(spark, sf_dir):
    """The bitmap store's no-rescan contract (the HLL r6 / theta r7 /
    CMS r8 / MG r9 pin applied to the SEVENTH family): the range plan
    scans the partition-pruned bitmap parquet, never the events table."""
    import os
    import tempfile

    from big_data_table_spark.functions import bitmap_store as BS
    from big_data_table_spark.sources.readers import load_events

    ev = load_events(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(), "bitmap_rollup")
    BS.bitmap_rollup_build(ev, path)
    days = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("day=")
    )
    out = BS.bitmap_rollup_range_daily(
        spark, path, days[0], days[-1], checkpoint=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "bitmap_rollup" in plan
    assert "events" not in plan
    assert out.count() == len(days)


def test_bitmap_replay_invisible_and_compaction_bit_neutral(spark, sf_dir):
    """The idempotent-merge laws, pinned on the store lifecycle: (1) a
    replayed append — even of a chunk whose bits ALREADY exist — leaves
    every range answer unchanged (BIT_OR(x, x) = x; strictly stronger
    than the SET class, whose absorption needs row-identical replays);
    (2) compaction changes files, not answers (associativity)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from big_data_table_spark.functions import bitmap_store as BS
    from big_data_table_spark.sources.readers import load_events

    def rows(path, lo, hi):
        return sorted(
            tuple(r)
            for r in BS.bitmap_rollup_range_daily(spark, path, lo, hi).collect()
        )

    ev = load_events(spark, sf_dir)
    day_col = F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    path = os.path.join(tempfile.mkdtemp(), "bitmap_rollup")
    BS.bitmap_rollup_build(ev, path)
    days = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("day=")
    )
    d0 = days[0]
    base = rows(path, days[0], days[-1])

    def n_chunks(day):
        return len(
            [
                c
                for c in os.listdir(os.path.join(path, f"day={day}"))
                if c.startswith("chunk=")
            ]
        )

    chunks_before = n_chunks(d0)
    day_ev = ev.filter(day_col == d0)
    BS.bitmap_rollup_append_chunk(day_ev, path, 7)
    once = rows(path, days[0], days[-1])
    BS.bitmap_rollup_append_chunk(day_ev, path, 7)
    twice = rows(path, days[0], days[-1])
    assert n_chunks(d0) > chunks_before  # the appends were real writes
    assert base == once == twice  # ...and invisible to every answer

    BS.bitmap_rollup_compact(spark, path, d0)
    assert n_chunks(d0) == 1
    assert rows(path, days[0], days[-1]) == base


def test_kcore_fixpoint_within_budget(spark, sf_dir):
    """The bounded-round truncation is honest at fixture scale: a 7th
    peel round changes nothing (fixpoint reached within the entry's 6),
    and every surviving node genuinely has core degree >= 2."""
    from big_data_table_spark.catalog_r9b import _lsh_candidate_edges
    from big_data_table_spark.operators.graph import kcore_edges

    register_views(spark, sf_dir)
    edges = _lsh_candidate_edges(spark)
    six = sorted(map(tuple, kcore_edges(edges, rounds=6).collect()))
    seven = sorted(map(tuple, kcore_edges(edges, rounds=7).collect()))
    assert six == seven
    from collections import Counter

    deg = Counter(s for s, _ in six)
    assert deg and all(c >= 2 for c in deg.values())


def test_auc_matches_driver_rank_formula(spark, sf_dir):
    """The value-grain AUC equals a driver-side tie-aware Mann-Whitney
    computation on the raw rows (independent formulation), and AUC of a
    class against itself-shaped complement stays in [0, 1]."""
    register_views(spark, sf_dir)
    got = {
        r.pair: (r.n_pos, r.n_neg, r.auc, r.gini)
        for r in CATALOG["events_score_auc"].fn(spark, sf_dir).collect()
    }
    rows = spark.sql(
        "SELECT event_type, CAST(value AS DECIMAL(8,2)) AS s FROM events "
        "WHERE event_type IN ('purchase', 'click', 'signup', 'view')"
    ).collect()
    for pos, neg in (("purchase", "click"), ("signup", "view")):
        ps = sorted(float(r.s) for r in rows if r.event_type == pos)
        ns = sorted(float(r.s) for r in rows if r.event_type == neg)
        import bisect

        num = 0.0
        for p in ps:
            lt = bisect.bisect_left(ns, p)
            eq = bisect.bisect_right(ns, p) - lt
            num += lt + eq / 2.0
        auc = num / (len(ps) * len(ns))
        np_, nn_, gauc, ggini = got[f"{pos}_vs_{neg}"]
        assert (np_, nn_) == (len(ps), len(ns))
        assert abs(gauc - round(auc, 6)) < 1e-9, (pos, gauc, auc)
        assert abs(ggini - round(2 * auc - 1, 6)) < 1e-9
        assert 0.0 <= gauc <= 1.0


def test_daily_spine_is_dense(spark, sf_dir):
    """events_rolling_median_exact's ROWS-6-PRECEDING frame means
    'last 7 calendar days' only if the day spine has no gaps — a
    fixture property the dual-dialect oracle cannot check (it runs the
    identical ROWS frame).  Pin it: max - min + 1 == distinct days."""
    register_views(spark, sf_dir)
    r = spark.sql(
        "SELECT CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS span, "
        "CAST(COUNT(DISTINCT d) AS BIGINT) AS n FROM "
        "(SELECT datediff(CAST(ts AS DATE), DATE '1970-01-01') AS d "
        " FROM events) _t"
    ).collect()[0]
    assert r.span == r.n, (r.span, r.n)
