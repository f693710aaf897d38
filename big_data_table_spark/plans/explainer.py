"""Plan introspection + query observability.

Two reference capabilities re-expressed:

* ``bdt.eval.log`` per-query row-count/timing audit (reference
  big.data.table.R:156-175; tests-08-logging.R pins 1 client + N node log
  rows) → ``observed()`` (``df.observe`` row metrics) and
  :class:`QueryLog` (a QueryExecutionListener writing one log row per
  query — the "client row"; per-task grain lives in the Spark event log).
* plan-shape assertions used by the test-suite and bench to keep the
  *physical* plans honest at scale: filters pushed into the parquet scan,
  broadcast joins where expected, whole-stage codegen coverage.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries pushed predicates."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def broadcast_join_count(df: DataFrame) -> int:
    """Count of BroadcastHashJoin *nodes* (formatted explain shows each
    node once in the tree and once as a '(n) Node' detail header; count
    the headers)."""
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin", formatted_plan(df), re.M))


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"^\(\d+\) SortMergeJoin", formatted_plan(df), re.M))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the metric to
    minimize; every unit is a full network/disk rewrite of its input.
    Formatted-mode explain names shuffles ``(n) Exchange`` (broadcast
    exchanges are ``BroadcastExchange`` and not counted here)."""
    return len(re.findall(r"\(\d+\) Exchange\s", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count (codegen explain mode reports
    'Found N WholeStageCodegen subtrees')."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def observed(df: DataFrame, name: str = "q") -> tuple[DataFrame, Observation]:
    """Attach row-count metrics to a plan (reference ``out_rows`` audit,
    big.data.table.R:168-171).  ``obs.get`` after an action returns the
    metrics without a second job."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("out_rows")), obs


@dataclass
class QueryLogRow:
    name: str
    started: float
    elapsed: float
    out_rows: int | None


@dataclass
class QueryLog:
    """Client-side transactional query log (reference logR integration,
    tests-08-logging.R:60-71: errors are captured per query, the log keeps
    appending).  One row per logged query."""

    rows: list[QueryLogRow] = field(default_factory=list)

    def run(self, name: str, df: DataFrame) -> list:
        t0 = time.time()
        observed_df, obs = observed(df, name)
        try:
            out = observed_df.collect()
        except Exception:
            self.rows.append(QueryLogRow(name, t0, time.time() - t0, None))
            raise
        self.rows.append(
            QueryLogRow(name, t0, time.time() - t0, obs.get["out_rows"])
        )
        return out


@dataclass
class StageLogRow:
    name: str
    job_id: int
    stage_id: int
    num_tasks: int
    num_completed_tasks: int
    num_failed_tasks: int


@dataclass
class StageLog(QueryLog):
    """Two-grain query log completing reference A17: the reference's
    logR table has 1 *client* row + N *node* rows per query
    (tests-08-logging.R:60-71 pins both grains).  Spark's analogue of the
    node grain is the STAGE (each stage runs as parallel tasks across
    executors): every ``run`` appends one client row (inherited) plus one
    row per executed stage, harvested from the public ``StatusTracker``
    after scoping the query to its own job group — no JVM listener
    plumbing, works identically on a real cluster.

    ``stage_rows`` is the per-stage table; ``as_dataframes(spark)``
    surfaces both grains as DataFrames (the log *is* queryable, as in the
    reference where the log lands in a database table).
    """

    stage_rows: list[StageLogRow] = field(default_factory=list)

    def run(self, name: str, df: DataFrame) -> list:
        sc = df.sparkSession.sparkContext
        group = f"bdt-stagelog-{name}-{time.monotonic_ns()}"
        sc.setJobGroup(group, f"StageLog: {name}")
        try:
            out = super().run(name, df)
        finally:
            sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        for jid in sorted(tracker.getJobIdsForGroup(group)):
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in sorted(jinfo.stageIds):
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None or sinfo.numTasks == 0:
                    continue
                self.stage_rows.append(
                    StageLogRow(
                        name,
                        jid,
                        sid,
                        sinfo.numTasks,
                        sinfo.numCompletedTasks,
                        sinfo.numFailedTasks,
                    )
                )
        return out

    def as_dataframes(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        client = spark.createDataFrame(
            [(r.name, r.started, r.elapsed, r.out_rows) for r in self.rows],
            "name string, started double, elapsed double, out_rows long",
        )
        stages = spark.createDataFrame(
            [
                (r.name, r.job_id, r.stage_id, r.num_tasks,
                 r.num_completed_tasks, r.num_failed_tasks)
                for r in self.stage_rows
            ],
            "name string, job_id int, stage_id int, num_tasks int, "
            "num_completed_tasks int, num_failed_tasks int",
        )
        return client, stages
