"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines (r9 — the r8 single line outgrew the driver's
2000-char tail capture and the artifact's ``parsed`` came back null):
  line 1 (verbose): metric/value/queries + tier2 + full ``query_stats``
    ({"min", "median", "spread", "runs"} per query) — host-noise
    evidence for humans and judge re-runs reading full stdout.
  line 2 (compact, LAST): {"metric": "headline_query_wall_seconds",
    "value": <total_sec>, "unit": "sec", "queries": {"q1": sec, ...},
    "tier2": {"value": sec, "queries": {...}}, "sf": ...} — ~850 chars,
    always fully inside the driver's tail window.

``queries``/``value`` stay min-per-query (comparable to every earlier
BENCH_r0N.json).  r17 adds ``cpu_cores`` to BOTH lines (headline-only
on the compact line; tier2's rides the verbose line): per-query mean
busy cores — this process tree's CPU seconds over the query's runs
divided by their wall time — so the scaling detector can separate
"parallel but per-action-overhead-bound" (ratio >> 1 with flat wall
across core counts) from "serial" (ratio ~ 1) at a scale factor where
wall time alone cannot (r16 VERDICT #2).  ``query_stats`` makes host
noise visible — the r2 and
r4 driver windows both recorded 20-22 s totals that did not reproduce
on a quiet host (14.4 s judge re-run, r4 verdict), and nothing in the
old JSON could show it was noise.  A large ``spread`` (max−min over
the runs) IS that evidence.

Execution is measured end-to-end with the ``noop`` sink — the full plan
runs distributed (scan → shuffle → agg) without a driver-side collect, so
the timing reflects engine throughput, not result-transfer.

Both JSON lines carry ``loadavg_start`` (and the verbose line
``loadavg_end``) — r10 VERDICT #5: the artifact itself records whether
the host was idle.  The repo's idle rule: cite headline numbers only
from runs whose 1-AND-5-min start load is < 0.5; otherwise re-run idle
and cite that.  r11 VERDICT #4 gives the rule teeth: the harness WAITS
for idleness before starting (up to $SPARK_GRAFT_IDLE_WAIT seconds,
default 1800 — raised from 600 in r14 after two consecutive driver
artifacts exhausted the budget under co-tenant residue; 0 disables),
so the committed artifact IS the idle run by default — a still-busy
host degrades to the old record-and-run behavior, with
``idle_waited_sec`` and ``loadavg_start`` exposing it.

Artifact-grain re-run (r14, VERDICT r13 #3): each measurement pass is
bracketed by EXACT CPU accounting — /proc/stat host-busy seconds minus
this process tree's seconds = what co-tenants burned during the pass
(loadavg_end cannot make that separation: the bench's own 32-thread
bursts inflate it identically).  If co-tenants averaged more than
$SPARK_GRAFT_COTENANT_CORES cores (default 0.2 since r15 — the known
bad runs read 0.29-0.45 and slipped under the old 0.5), the whole pass
re-runs ONCE and every query keeps its min across passes — the per-query
min-of-runs discipline applied at artifact grain.  ``passes`` and
``cotenant_cores`` (one entry per pass) land in both JSON lines.

Gating discipline (r10 VERDICT #6, measured): same-code tier2 totals
varied 42.8-74.4 s across three judge runs — dozens of small store
jobs amplify scheduler noise far beyond any real pruning loss.  The
PLAN PINS (tests/test_exchange_budget.py over all entries + the
no-rescan/pushdown pins in tests/test_round*.py) are the authoritative
store-regression gate; tier2 wall time is ADVISORY context for humans,
never a pass/fail number.  The headline total (min-per-query over 3-5
runs on the frozen r1 list) remains the cross-round comparable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = [
    # name in catalog -> short bench key
    ("q1_pricing_summary", "q1"),
    ("q6_revenue", "q6"),
    ("join3_revenue_by_segment", "join3"),
    ("multi_key_group", "groupby4"),
    ("window_topk_per_group", "wtopk"),
    ("two_phase_agg", "twophase"),
    ("events_sessionize", "sessionize"),
    ("events_asof_purchase", "asof"),
    ("events_tumbling_5min", "tumble"),
    ("q3_shipping_priority", "q3"),
    ("q4_order_priority", "q4"),
    ("dedup_minhash_lsh_pairs", "minhash"),
    ("dedup_simhash", "simhash"),
    ("text_quality_score", "quality"),
    ("embedding_neardup", "neardup"),
    ("ann_topk_cosine", "ann"),
    ("ann_ivf_topk", "ivf"),
    ("multimodal_features", "multimodal"),
    ("dedup_components", "components"),
    ("train_val_test_split", "split"),
]

# Tier 2 (added r8, VERDICT r7 #4): the flagship r5-r7 engine surface —
# persisted sketch/ANN/LSH stores, packing, training-order shuffle —
# timed as its own separately-keyed, separately-totaled section so a
# store-read regression (e.g. losing partition pruning) shows up as a
# NUMBER, not only as a plan-pin test failure.  The HEADLINE list above
# stays frozen at the r1 20 queries for cross-round comparability; this
# section's total is reported under "tier2" and never mixed into
# "value".  Store entries run their full verb cycle (build → append →
# compact → range-read) — that IS the operator; the read regression is
# contained in the total and the per-entry spread shows noise.
TIER2 = [
    ("hll_daily_rollup_range", "hll_range"),
    ("tdigest_rollup_range", "tdigest_range"),
    ("theta_rollup_persisted", "theta_store"),
    ("bloom_index_persisted", "bloom_store"),
    ("incremental_dedup_persisted", "lsh_probe"),
    ("ann_ivf_persisted_topk", "ivf_store"),
    ("sequence_packing", "packing"),
    ("training_order_shuffle", "order_shuffle"),
    # r9: the fifth persisted store (CMS, additive class) gets its
    # regression number from its first full round (VERDICT r8 #5),
    # and the new sixth store (SpaceSaving, summary-prune class) gets
    # a baseline from its birth round
    ("cms_rollup_persisted", "cms_store"),
    ("mg_rollup_persisted", "mg_store"),
    # r9 second extension: the seventh store (exact bitmap,
    # idempotent-merge class) gets a baseline from its birth round
    ("bitmap_rollup_persisted", "bitmap_store"),
    # r10: the persisted EXACT set-similarity (prefix-filter) index —
    # full verb cycle (build / replayed append / compact / pairs) —
    # gets a baseline from its birth round
    ("setjoin_index_persisted", "setjoin_store"),
    # r10 second extension: the SimHash signature index (build /
    # replayed append / banded probe) and the semantic nearest-centroid
    # index (the crawl loop: bootstrap + per-batch assign-probe-append)
    # get baselines from their birth round
    ("simhash_index_probe", "simhash_store"),
    ("stream_semantic_crawl", "semantic_store"),
    # r11: the semantic re-quantize compact (build / frozen append /
    # re-freeze over the whole store / recall report) gets a baseline
    # from its birth round
    ("semantic_requantize_recall", "requant_store"),
    # r12: the ANN-store retrain lifecycle (build / frozen append /
    # replayed tombstone delete / re-quantize / search) gets a
    # baseline from its birth round
    ("ann_ivf_requantize", "ivf_requant"),
]


def _host_cpu_busy_sec() -> float | None:
    """Total non-idle CPU seconds across the whole host since boot
    (/proc/stat first line: user+nice+system+irq+softirq+steal).  With
    :func:`_tree_cpu_sec` this yields an EXACT co-tenant meter — r13
    VERDICT #3: two consecutive driver artifacts ran under co-tenant
    load, and ``loadavg_end`` alone cannot separate a co-tenant burst
    from the bench's own 32-thread bursts (self-load inflates the same
    number), so the artifact-grain re-run check uses CPU accounting
    instead: host busy seconds minus our own process tree's seconds IS
    the co-tenants' consumption, no calibration needed."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        vals = [int(v) for v in parts[1:9]]
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6] + vals[7]
        return busy / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def _tree_cpu_sec() -> float | None:
    """CPU seconds consumed by THIS process tree (bench python + the
    live Spark JVM + its children), via one /proc pass: utime+stime of
    every live process whose ancestry reaches us, plus cutime+cstime
    (already-reaped descendants — those left /proc, so no double
    count).  Known caveat (r14 ADVICE): a descendant that daemonizes
    (reparents to PID 1) leaves the tree and its CPU counts as
    co-tenant load — acceptable for this heuristic because the Spark
    local-mode JVM keeps its children attached; if spurious re-runs
    appear, cgroup CPU accounting is the upgrade path."""
    try:
        me = os.getpid()
        stats: dict[int, tuple[int, float]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    raw = fh.read()
            except OSError:
                continue  # raced a process exit
            # comm may contain spaces/parens: fields resume after ')'
            rest = raw.rsplit(")", 1)[1].split()
            ppid = int(rest[1])
            cpu = (
                int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
            )  # utime stime cutime cstime
            stats[int(d)] = (ppid, cpu)
        total, frontier = 0.0, {me}
        while frontier:
            nxt = set()
            for pid, (ppid, cpu) in stats.items():
                if ppid in frontier:
                    nxt.add(pid)
            for pid in frontier:
                if pid in stats:
                    total += stats[pid][1]
            stats = {p: v for p, v in stats.items() if p not in frontier}
            frontier = nxt
        return total / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def _buff_cache_gb() -> float | None:
    """Page-cache size in GB (/proc/meminfo Buffers+Cached) — the r14
    end-of-day brackets isolated COLD page cache as the second variance
    driver after co-tenant CPU: a run with the day's lowest
    cotenant_cores (0.066) still read tier2 at 1.7x band because the
    sf0.1 parquet and store files were no longer resident.  Recording
    it makes a cache-cold artifact self-diagnosing."""
    try:
        vals = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                k, v = line.split(":", 1)
                if k in ("Buffers", "Cached"):
                    vals[k] = int(v.split()[0])
        return round((vals["Buffers"] + vals["Cached"]) / (1 << 20), 2)
    except (OSError, KeyError, ValueError):  # pragma: no cover
        return None


def _preread_fixtures(sf_dir: str) -> float:
    """Read every fixture byte under ``sf_dir`` to warm the page cache,
    returning MB read — r14 VERDICT #2(b): the end-of-day brackets
    proved a COLD page cache alone swings tier2 from 47 s to 80 s at
    0.066 co-tenant cores (the store lifecycles are small-file-I/O
    bound), so an artifact taken after a reboot or a memory-pressure
    eviction measured the disk, not the engine.  Pre-reading the
    inputs makes the artifact measure compute; ``buff_cache_warm_gb``
    records the post-read cache so a still-cold run is self-diagnosing.
    The tier2 stores themselves are written DURING the run, so they are
    warm by construction."""
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                try:
                    with open(os.path.join(root, f), "rb") as fh:
                        while True:
                            chunk = fh.read(1 << 22)
                            if not chunk:
                                break
                            total += len(chunk)
                except OSError:  # pragma: no cover - raced/unreadable file
                    continue
    except OSError:  # pragma: no cover
        pass
    return round(total / (1 << 20), 1)


def _wait_for_idle(max_wait_sec: float, threshold: float = 0.5) -> float:
    """Block until the 1-AND-5-min load averages are below ``threshold``
    (the repo's idle rule), or ``max_wait_sec`` elapses — r11 VERDICT
    #4: the committed artifact must BE the idle run, not point at one
    (BENCH_r11 recorded loadavg 6.86 and its deltas were environment,
    not code).  Bounded so a busy host degrades to the old behavior
    (run anyway, loadavg_start records the violation) instead of
    hanging the driver.  Disable with SPARK_GRAFT_IDLE_WAIT=0.
    Returns the seconds waited."""
    start = time.monotonic()
    while time.monotonic() - start < max_wait_sec:
        try:
            l1, l5, _ = os.getloadavg()
        except OSError:  # pragma: no cover
            return 0.0
        if l1 < threshold and l5 < threshold:
            break
        time.sleep(5.0)
    return round(time.monotonic() - start, 1)


def _measure_pass(
    CATALOG, spark, sf_dir: str
) -> tuple[
    dict[str, list[float]],
    dict[str, list[float]],
    dict[str, float],
    dict[str, float],
]:
    """One full measurement pass: every headline query 3-5 runs, every
    tier2 entry 2 runs.  Returns the raw run lists ({key: [sec, ...]})
    so the artifact-grain re-run can merge passes with per-query min —
    the same discipline the per-query min-of-runs already applies.

    Also returns per-query MEAN BUSY CORES (r16 VERDICT #2 — the
    driver's 8-vs-32-core wall-clock ratios all read ~1 at sf0.1
    because every query is per-action-overhead-bound, so the scaling
    detector cannot tell "parallel but overhead-bound" from "serial"):
    this process tree's CPU seconds consumed during the query's runs,
    divided by their wall time.  A compute-bound parallel query shows
    ~cores; a serial one ~1 — task-time evidence the wall clock cannot
    carry, directly in the artifact."""
    high_variance = {"simhash", "minhash", "neardup", "components"}

    def _timed(fn, n_runs: int) -> tuple[list[float], float | None]:
        tree0 = _tree_cpu_sec()
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        tree1 = _tree_cpu_sec()
        cpu = None
        if tree0 is not None and tree1 is not None:
            cpu = round((tree1 - tree0) / max(sum(runs), 1e-9), 1)
        return runs, cpu

    head_runs: dict[str, list[float]] = {}
    head_cpu: dict[str, float] = {}
    for name, key in HEADLINE:
        runs, cpu = _timed(CATALOG[name].fn, 5 if key in high_variance else 3)
        head_runs[key] = runs
        if cpu is not None:
            head_cpu[key] = cpu
    # tier 2: min-of-2 (store builds at sf0.1 are seconds each; two runs
    # bound wall time while still absorbing the codegen-compile first run)
    t2_runs: dict[str, list[float]] = {}
    t2_cpu: dict[str, float] = {}
    for name, key in TIER2:
        runs, cpu = _timed(CATALOG[name].fn, 2)
        t2_runs[key] = runs
        if cpu is not None:
            t2_cpu[key] = cpu
    return head_runs, t2_runs, head_cpu, t2_cpu


def _summarize(run_lists: dict[str, list[float]]):
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for key, runs in run_lists.items():
        runs = sorted(runs)
        timings[key] = round(runs[0], 3)
        stats[key] = {
            "min": round(runs[0], 3),
            # statistics.median stays a true median whatever the run
            # count — runs[len//2] labeled the MAX as median for 2 runs
            "median": round(statistics.median(runs), 3),
            "spread": round(runs[-1] - runs[0], 3),
            "runs": len(runs),
        }
    return timings, stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # r13 VERDICT #3: two consecutive driver artifacts exhausted the old
    # 600 s idle budget and started with 5-min load residue — the budget
    # now defaults to 1800 s so the wait outlives a co-tenant gate
    # marathon instead of giving up at its tail.
    idle_waited = _wait_for_idle(
        float(os.environ.get("SPARK_GRAFT_IDLE_WAIT", "1800"))
    )
    try:
        load_start = [round(v, 2) for v in os.getloadavg()]
    except OSError:  # pragma: no cover
        load_start = None
    buff_cache = _buff_cache_gb()  # pre-run page-cache state
    # warm the page cache over the fixtures BEFORE the JVM warm-up so
    # the measured passes never pay cold-disk I/O (r14 VERDICT #2b)
    preread_mb = _preread_fixtures(sf_dir)
    buff_cache_warm = _buff_cache_gb()

    from big_data_table_spark.catalog import CATALOG, register_views
    from big_data_table_spark.session import connect

    spark = connect(app_name="bdt-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    # warm the JVM, the parquet footers, and the Python UDF workers once —
    # steady-state throughput is the metric, not interpreter spawn time
    register_views(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    def _noop(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_noop, "id long").count()

    # measured runs per query, report the min: the first run includes
    # codegen compilation and is exposed to host noise, and this 32-core
    # host shows 2-4× run-to-run scatter under min-of-2 (r2 verdict).
    # The known high-variance lines get min-of-5; everything else
    # min-of-3 — and the artifact records min/median/spread per query so
    # a noisy window is diagnosable from the JSON alone.
    #
    # Artifact-grain re-run (r13 VERDICT #3 — the per-query min
    # discipline applied at artifact grain): bracket each pass with the
    # exact CPU accounting above; if co-tenants averaged more than
    # SPARK_GRAFT_COTENANT_CORES cores during the pass, run ONE more
    # pass and keep the per-query min across passes.  Bounded at 2
    # passes total.
    # r14 VERDICT #2a: threshold lowered 0.5 → 0.2 — the measured idle
    # floor is ~0.03 cores and the three known-inflated artifacts read
    # 0.29-0.45, all of which slipped UNDER the old 0.5; 0.2 separates
    # them from every known-good run (0.07-0.15) with margin both ways.
    cotenant_limit = float(os.environ.get("SPARK_GRAFT_COTENANT_CORES", "0.2"))
    passes = 0
    cotenant_cores: list[float] = []
    head_runs: dict[str, list[float]] = {}
    t2_runs: dict[str, list[float]] = {}
    head_cpu: dict[str, float] = {}
    t2_cpu: dict[str, float] = {}
    while passes < 2:
        host0, tree0 = _host_cpu_busy_sec(), _tree_cpu_sec()
        wall0 = time.perf_counter()
        h, t2, hc, t2c = _measure_pass(CATALOG, spark, sf_dir)
        wall = time.perf_counter() - wall0
        host1, tree1 = _host_cpu_busy_sec(), _tree_cpu_sec()
        for key, runs in h.items():
            head_runs.setdefault(key, []).extend(runs)
        for key, runs in t2.items():
            t2_runs.setdefault(key, []).extend(runs)
        # keep the highest observed busy-core ratio per query: co-tenant
        # CPU is excluded by construction (tree-scoped), so a lower
        # ratio only means the pass was more overhead/IO-stalled
        for key, cpu in list(hc.items()) + list(t2c.items()):
            tgt = head_cpu if key in hc else t2_cpu
            tgt[key] = max(tgt.get(key, 0.0), cpu)
        passes += 1
        if None in (host0, tree0, host1, tree1):  # pragma: no cover
            break  # no /proc accounting — old single-pass behavior
        other = max(0.0, (host1 - host0) - (tree1 - tree0))
        cotenant_cores.append(round(other / max(wall, 1e-9), 3))
        if cotenant_cores[-1] <= cotenant_limit:
            break

    timings, stats = _summarize(head_runs)
    total = round(sum(timings.values()), 3)
    t2_timings, t2_stats = _summarize(t2_runs)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    t2_total = round(sum(t2_timings.values()), 3)

    # r10 VERDICT #5: the artifact itself must carry the load evidence —
    # (1/5/15-min averages; loadavg_end is what the run itself plus any
    # co-tenants did).  The repo's own idle rule: cite headline numbers
    # only when 1-AND-5-min load < 0.5 at start.
    try:
        load_end = [round(v, 2) for v in os.getloadavg()]
    except OSError:  # pragma: no cover - loadavg always exists on linux
        load_end = None

    # Two lines (r9, VERDICT r8 #3 — the r8 single line outgrew the
    # driver's 2000-char tail capture and parsed as null):
    #   line 1 (verbose): everything incl. per-query min/median/spread —
    #     for humans and judge re-runs reading full stdout.  tier2 is
    #     placed BEFORE query_stats so a tail fragment of this line can
    #     never contain a complete decoy sub-object with a "metric" key.
    #   line 2 (compact, LAST): headline value + per-query mins + tier2
    #     totals, ~850 chars — always fully inside the tail window and
    #     the only parseable JSON line there.
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds_verbose",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tier2": {
                    "value": t2_total,
                    "queries": t2_timings,
                    "query_stats": t2_stats,
                    "cpu_cores": t2_cpu,
                },
                "query_stats": stats,
                # mean busy cores per query (tree CPU / wall) — r16
                # VERDICT #2: lets the driver separate parallel-but-
                # overhead-bound from serial when wall-clock core
                # ratios read ~1 at sf0.1
                "cpu_cores": head_cpu,
                "sf": sf_val,
                "loadavg_start": load_start,
                "loadavg_end": load_end,
                "idle_waited_sec": idle_waited,
                "passes": passes,
                "cotenant_cores": cotenant_cores,
                "buff_cache_gb": buff_cache,
                "buff_cache_warm_gb": buff_cache_warm,
                "preread_mb": preread_mb,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tier2": {"value": t2_total, "queries": t2_timings},
                # headline-only here (the scaling detector reads the
                # headline list; tier2 ratios ride the verbose line) so
                # the compact line stays inside the 2000-char tail
                "cpu_cores": head_cpu,
                "sf": sf_val,
                "loadavg_start": load_start,
                "idle_waited_sec": idle_waited,
                "passes": passes,
                "cotenant_cores": cotenant_cores,
                "buff_cache_gb": buff_cache,
                "buff_cache_warm_gb": buff_cache_warm,
                "preread_mb": preread_mb,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
