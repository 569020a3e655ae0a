"""Broadcast-hash enrich joins against small lookup dimensions.

Reference semantics being reproduced (SURVEY.md §2.3):
  * J1/J2 — indexed left-outer equi join with right-overrides merge
    (join_json_arrays.py:11-52: ``{**left, **right_index.get(key, {})}``;
    merge_request_response.py:10-48).  Unmatched left rows pass through
    unchanged (tests/test_join_json_arrays.py:27-55).
  * J3 — lookup-miss sentinel: on a miss the reference emits an ERROR
    marker record (ngap-logs.py:208-210).  Here that becomes an
    ``enrich_status`` column instead of a divergent row shape.

Every dim is broadcast (`F.broadcast`) — the reference's dict index *is*
a broadcast hash-join build side (SURVEY.md §4.2); at 100 TB the fact table
never shuffles for these joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MISS_SENTINEL = "Failed to locate matching record"  # ngap-logs.py:209 shape


def enrich_join(
    left: DataFrame,
    dim: DataFrame,
    key: str,
    right_overrides: bool = True,
    status_col: str | None = None,
) -> DataFrame:
    """Left-outer broadcast join; shared non-key columns resolve like the
    reference's ``{**left, **right}`` dict merge (right wins when matched,
    left value survives on a miss)."""
    shared = [c for c in dim.columns if c in left.columns and c != key]
    dim2 = dim
    for c in shared:
        dim2 = dim2.withColumnRenamed(c, f"__r_{c}")
    # matched marker that cannot collide with data columns
    dim2 = dim2.withColumn("__matched", F.lit(True))

    out = left.join(F.broadcast(dim2), on=key, how="left")
    for c in shared:
        if right_overrides:
            out = out.withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(c)))
        out = out.drop(f"__r_{c}")
    if status_col is not None:
        out = out.withColumn(
            status_col,
            F.when(F.col("__matched"), F.lit("ok")).otherwise(
                F.concat(F.lit(MISS_SENTINEL + " for "), F.col(key))
            ),
        )
    return out.drop("__matched")


def enrich_roles(turns: DataFrame, roles: DataFrame) -> DataFrame:
    return enrich_join(turns, roles, "role", status_col="role_status")


def enrich_tools(turns: DataFrame, tools: DataFrame) -> DataFrame:
    """Tool enrich — only tool turns (tool != '-') can match; the dim's
    colliding ``role`` column exercises right-overrides semantics."""
    return enrich_join(turns, tools, "tool", status_col="tool_status")
