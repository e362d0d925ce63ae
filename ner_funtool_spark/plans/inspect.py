"""Physical-plan shape extraction — the regression surface for "is
this still the plan you'd want at 100x".

``plan_summary`` reduces a DataFrame's executed plan to the counts that
matter at scale: join strategies (broadcast vs sort-merge vs shuffled
hash), shuffles, Arrow/pandas stages (and the row-at-a-time
BatchEvalPython that must NEVER appear), cartesian products, pushed
parquet filters.  tools/plan_snapshot.py writes these per driver query
to BENCH/PLANS.json; tests/test_plans.py recomputes and compares, so a
silent regression to a worse plan (a broadcast join falling back to
sort-merge, a second Python stage sneaking in, a filter no longer
reaching the scan) fails CI instead of only showing up as bench noise.

Counts are taken from the INITIAL physical plan (before AQE runtime
re-optimization), which is deterministic for fixed inputs.

Reading the counts: a subtree referenced through an unmaterialized
cache (InMemoryTableScan) or a reusable exchange prints ONCE PER
REFERENCE in the plan string, so counts are upper bounds on runtime
executions — e.g. embedding_link's blocked self-join references the
persisted entity table several times, and the Arrow tagging stage
under it executes once, not once per textual occurrence.  The counts
are still exact regression tripwires: they only change when the plan
changes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# one row-batch python stage kinds vs the per-row kind we forbid
_ARROW_STAGES = r"MapInArrow|MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython"
_PER_ROW_PYTHON = r"BatchEvalPython"


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tree_depth(line: str) -> int:
    """Depth of a plan-tree line = length of its drawing prefix
    (spaces, ':', '+', '-', '|'); children print strictly deeper."""
    return len(re.match(r"^[\s:+\-|]*", line).group(0))


def join_subtree_exchanges(df: DataFrame) -> int:
    """Number of Exchange nodes WITHIN the subtree of the first
    shuffle join (SortMergeJoin/ShuffledHashJoin) in the executed plan,
    bounded by tree indentation — not by text position, so an Exchange
    printed elsewhere in the plan (above the join, or in another
    branch after it) can neither hide a real shuffle nor fail the
    assertion spuriously.  Returns -1 when the plan has no shuffle
    join (e.g. it broadcast instead)."""
    lines = plan_string(df).splitlines()
    exch = re.compile(
        r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
    )
    for i, ln in enumerate(lines):
        if re.search(r"SortMergeJoin|ShuffledHashJoin", ln):
            depth = _tree_depth(ln)
            n = 0
            for sub in lines[i + 1:]:
                if sub.strip() and _tree_depth(sub) <= depth:
                    break
                if exch.search(sub):
                    n += 1
            return n
    return -1


def plan_summary(df: DataFrame) -> dict:
    """Scale-relevant shape counts of the physical plan."""
    plan = plan_string(df)

    def cnt(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "broadcast_hash_join": cnt(r"BroadcastHashJoin"),
        "sort_merge_join": cnt(r"SortMergeJoin"),
        "shuffled_hash_join": cnt(r"ShuffledHashJoin"),
        "cartesian": cnt(r"CartesianProduct"),
        "broadcast_nested_loop": cnt(r"BroadcastNestedLoopJoin"),
        "exchanges": cnt(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)"),
        "arrow_stages": cnt(_ARROW_STAGES),
        "per_row_python": cnt(_PER_ROW_PYTHON),
        "window_group_limit": cnt(r"WindowGroupLimit"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[A-Za-z]", plan)),
        # non-empty PartitionFilters = the scan prunes partition dirs
        # at plan time (r4: the range-layout read path's regression bit)
        "partition_filters": bool(
            re.search(r"PartitionFilters: \[[^\]]*[A-Za-z]", plan)
        ),
    }
