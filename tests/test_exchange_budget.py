"""Shuffle-budget regression gate: every core catalog query's physical
plan must stay within its recorded exchange budget.  A new Exchange in
one of these plans is a 100 TB regression even when results stay correct
— this test makes it a visible failure."""

from __future__ import annotations

import pytest

from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.plans import exchange_count

# name -> max shuffle exchanges allowed in the plan
BUDGET = {
    "q1_pricing_summary": 1,     # partial->final agg
    "q6_revenue": 1,             # single global agg
    "grouped_sum_by_year": 1,
    "group_count": 1,
    "multi_key_group": 1,
    "filter_project": 0,         # pure scan+filter+project
    "topk_orders": 0,            # TakeOrderedAndProject
    "lookup_join_nation_region": 0,  # broadcast join only
    "supplier_chain": 1,         # two broadcasts + one agg exchange
    "join3_revenue_by_segment": 4,   # fact-fact SMJ (2) + agg; AQE may add
    "events_tumbling_5min": 1,
    "events_sessionize": 2,      # window shuffle + agg
    "events_asof_purchase": 2,   # union window + (agg-free) output
    "merge_upsert": 3,           # anti join + agg
    "sample_by_hash": 2,       # countDistinct = 2-phase distinct agg
    "train_val_test_split": 1,
}


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_exchange_budget(spark, sf_dir, name):
    df = CATALOG[name].fn(spark, sf_dir)
    n = exchange_count(df)
    assert n <= BUDGET[name], (
        f"{name}: {n} exchanges > budget {BUDGET[name]} — a shuffle crept "
        "into the plan"
    )
