"""Full-catalog robustness sweep at sf0.1 — a SCALE the driver never
checks (driver: sf0.01; pytest default: sf0.001).

Why this exists (r9 VERDICT #4): a one-off r9 sweep at sf0.1 caught a
REAL latent scale bug — ``mg_heavy_hitters``' fixed MG capacity
satisfied the exactness bound at sf0.01 but silently missed true top
keys at sf0.1.  Fixture-tuned constants (capacities, horizons, bucket
counts) are exactly the class of bug that only a bigger SF exposes, so
the sweep is now a repeatable tool: run it ANY round the catalog grows
(ROUND_NOTES records each run).

Usage::

    python tools_sweep_sf01.py              # all entries at sf0.1
    python tools_sweep_sf01.py name1 name2  # just these entries
    BDT_SWEEP_SF_DIR=/root/testdata/sf0.01 python tools_sweep_sf01.py
    BDT_SWEEP_SHUFFLE_PARTITIONS=5 python tools_sweep_sf01.py
        # adversarial-partitioning arm: results must be bit-identical
        # under ANY shuffle-partition count (prime, < the chunk counts
        # the stores write) — order-dependent float accumulation or a
        # partition-count assumption fails HERE before it fails on a
        # 1000-executor cluster

Equivalent pytest arm (same comparison code)::

    BDT_TEST_SF_DIR=/root/testdata/sf0.1 \
        python -m pytest tests/test_oracle_parity.py -q

This wrapper exists because the pytest arm dies at the FIRST hard error
inside a shared-session fixture; the sweep isolates failures per entry,
keeps going, and prints a machine-readable one-line JSON summary last.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main() -> int:
    sf_dir = os.environ.get("BDT_SWEEP_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    import duckdb

    from big_data_table_spark.catalog import CATALOG
    from big_data_table_spark.session import connect
    from conftest import FIXTURE_TABLES, assert_frames_match

    # the engine's own connect(): 16g driver heap (a raw 1g-default
    # builder OOMs local-mode sf0.1 work), AQE, UTC, shuffle sizing
    spark = connect(
        app_name="bdt-sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(
            os.environ.get("BDT_SWEEP_SHUFFLE_PARTITIONS", "32")
        ),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    unknown = only - set(CATALOG)
    if unknown:
        print(f"unknown entries: {sorted(unknown)}", file=sys.stderr)
        return 2

    passed, failed = [], {}
    t0 = time.time()
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            oracle_pdf = con.execute(spec.oracle).fetchdf()
            assert_frames_match(spark_pdf, oracle_pdf, name)
            passed.append(name)
            print(f"PASS {name} ({len(spark_pdf)} rows)", flush=True)
        except Exception:
            failed[name] = traceback.format_exc(limit=3)
            print(f"FAIL {name}\n{failed[name]}", flush=True)
    spark.stop()
    print(
        json.dumps(
            {
                "sweep": "oracle-parity",
                "sf_dir": sf_dir,
                "passed": len(passed),
                "failed": sorted(failed),
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
