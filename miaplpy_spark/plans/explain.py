"""Physical-plan inspection helpers.

The engine's plan-quality invariants are asserted in tests (not just
eyeballed once): filters reach the parquet scan, dimension joins
broadcast, the tier pipeline contains exactly the one intended
exchange. These helpers read the same strings `.explain("formatted")`
prints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may later
    coalesce partitions inside them, but each Exchange is a full
    network redistribution at scale)."""
    plan = plan_string(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning")


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df, "simple").count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes (empty string if
    nothing was pushed — which for a filtered scan is a plan bug)."""
    plan = plan_string(df, "formatted")
    return "\n".join(l.strip() for l in plan.splitlines()
                     if "PushedFilters" in l)


def read_schema_width(df: DataFrame) -> list[str]:
    """ReadSchema lines — verifies column pruning reached the scan."""
    plan = plan_string(df, "formatted")
    return [l.strip() for l in plan.splitlines() if "ReadSchema" in l]
