"""Ordered / windowed operators (SURVEY.md §2.6).

  * W3 — adjacent-row pairing: a timing line pairs with the *next* error
    line, else status 200 (response_times2.py:19-47 ``pending_time`` state →
    ``lead()`` over an explicit ordering; the reference's only genuinely
    order-dependent operator).
  * W4 — stable turn ordering: ``Window.partitionBy(conv_id).orderBy(turn_idx)``
    stabilizes output so per-turn text equality holds (the reference relies
    on dict insertion order, ngap-logs.py:353-366).
  * W1/J8 — sort-within-group + positional pair math
    (HyraxLogAnalysis.jl:195-213).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_WINDOW_COLS = ("conv_id", "turn_idx")


def turn_window() -> Window:
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def with_stable_order(df: DataFrame) -> DataFrame:
    """W4 — global row number under (conv_id, turn_idx); deterministic."""
    w = Window.orderBy("conv_id", "turn_idx")
    return df.withColumn("rn", F.row_number().over(w))


def with_neighbor_class(parsed: DataFrame) -> DataFrame:
    """lag/lead of turn_class inside each conversation."""
    w = turn_window()
    return parsed.withColumn("prev_class", F.lag("turn_class").over(w)).withColumn(
        "next_class", F.lead("turn_class").over(w)
    )


def pair_timing_with_next_error(parsed: DataFrame) -> DataFrame:
    """W3 — for each timing turn, status = http_code of the immediately
    following turn when that turn is an error, else 200
    (response_times2.py:20-47 semantics, set-oriented)."""
    w = turn_window()
    nxt_class = F.lead("turn_class").over(w)
    nxt_code = F.lead("http_code").over(w)
    return (
        parsed.withColumn(
            "status_code",
            F.when(nxt_class == "error", nxt_code).otherwise(F.lit(200)),
        )
        .filter(F.col("turn_class") == "timing")
        .select("conv_id", "turn_idx", "n_responses", "duration_ms", "status_code")
    )


def error_follows_tool_call(parsed: DataFrame) -> DataFrame:
    """Adjacent-pairing analytics: tool-call turns whose next turn errors."""
    w = turn_window()
    return (
        parsed.withColumn("next_class", F.lead("turn_class").over(w))
        .filter((F.col("tool") != "-") & (F.col("next_class") == "error"))
        .select("conv_id", "turn_idx", "tool")
    )


def pair_math(
    parsed: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """W1/J8 — per group sorted by ``order_col``: synthesize
    (first value, last value, span) from the positional extremes
    (HyraxLogAnalysis.jl:201-207)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        parsed.filter(F.col(value_col).isNotNull())
        .withColumn("first_val", F.first(value_col).over(wfull))
        .withColumn("last_val", F.last(value_col).over(wfull))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            *key_cols,
            "first_val",
            "last_val",
            (F.col("last_val") - F.col("first_val")).alias("span"),
        )
    )
