"""Physical-plan fingerprints: the 100×-scale regression guard.

At sf0.1 the bench can't see a new shuffle — scheduler latency drowns
it — but at 100 TB an extra exchange is the difference between one
pass and re-shuffling the whole table. So the shape of the physical
plan IS the scale contract: count the exchanges (shuffle + broadcast)
in each headline query's plan, commit the counts
(``tests/plan_fingerprints.json``), and fail the build when a count
grows. Shrinking is allowed (plans may improve); growth needs a
deliberate fingerprint update alongside the code that caused it.

The counts come from the *initial* physical plan (inside
AdaptiveSparkPlan, before AQE runtime re-optimization), so they're
deterministic for a fixed session config — regenerate with
``python tools/gen_plan_fingerprints.py``, which uses the same session
config as the test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_exchange_counts"]

# Substrings that identify exchange operators in the plan dump.
# "Exchange hashpartitioning/rangepartitioning/SinglePartition" are
# the shuffle flavors; BroadcastExchange is the build side of a
# broadcast join (cheap, but a flip broadcast->shuffle shows up as a
# shuffle increase, which is the regression that matters).
_SHUFFLE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "Exchange RoundRobinPartitioning",  # df.repartition(n) without keys
)


def plan_exchange_counts(df: DataFrame) -> dict[str, int]:
    """Count shuffle and broadcast exchanges in a DataFrame's physical
    plan (pre-AQE initial plan — deterministic per session config)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_exchanges": sum(plan.count(m) for m in _SHUFFLE_MARKERS),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
    }
