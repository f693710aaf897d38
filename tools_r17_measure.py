"""Round-17 optimization probe: per-query noop timings + formatted-plan
snapshots for every benched entry (headline + tier2).

Usage:
  python tools_r17_measure.py [--plans SUFFIX] [--runs N] [names...]

Writes plans/r17/<bench_key>_<SUFFIX>.txt (default SUFFIX=before) with the
``explain('formatted')`` text of each query, and prints one timing line per
query (min/median over N runs, default 3).  Names filter by bench key.

Methodology matches bench.py exactly: noop sink, same session confs, same
sf_dir/cpus envs — so numbers here are comparable to BENCH artifacts, and
the plan files are the judge-checkable evidence for plan-shape claims.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from bench import HEADLINE, TIER2


def main() -> None:
    args = sys.argv[1:]
    suffix = "before"
    runs = 3
    if "--plans" in args:
        i = args.index("--plans")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    only = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from big_data_table_spark.catalog import CATALOG, register_views
    from big_data_table_spark.session import connect

    spark = connect(
        app_name="bdt-r17-measure",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    register_views(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    def _noop(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_noop, "id long").count()

    os.makedirs("plans/r17", exist_ok=True)
    for name, key in HEADLINE + TIER2:
        if only and key not in only and name not in only:
            continue
        fn = CATALOG[name].fn
        spark.sparkContext.setJobDescription(f"r17-measure: {key}")
        # plan snapshot (one untimed build)
        df = fn(spark, sf_dir)
        with open(f"plans/r17/{key}_{suffix}.txt", "w") as fh:
            fh.write(f"== {name} ({key}) explain(formatted), {suffix} ==\n")
            jvm = spark.sparkContext._jvm
            fh.write(
                jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            d = fn(spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(
            f"{key:14s} min={ts[0]:7.3f} med={statistics.median(ts):7.3f} "
            f"max={ts[-1]:7.3f} runs={runs}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
