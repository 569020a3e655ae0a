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
    """W4 — global row number under (conv_id, turn_idx), TWO-PHASE:

      rn = (cumulative count of turns in all earlier convs) + per-conv rank

    The per-conv rank is a window partitioned by conv_id (fully parallel);
    the cumulative offsets are computed over the *aggregated* per-conv
    counts — one row per conv — so the only single-partition step handles
    |convs| rows, a ~avg-turns-per-conv reduction vs the round-1
    unpartitioned window that sorted every fact row through one task.  The
    offsets join is keyed on conv_id, the same key as the rank window, so
    the fact side reuses its hash partitioning (no extra fact shuffle); AQE
    broadcasts the conv-level side when it is small.  For corpora where even
    |convs| overwhelms one task, the same two-phase shape nests (range-
    bucket the conv list and offset the buckets)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    local = F.row_number().over(w)
    counts = df.groupBy("conv_id").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("conv_id").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
    ).select(F.col("conv_id").alias("_offs_conv"), "_off")
    # null-safe join key: groupBy produced a NULL-conv group, and a plain
    # equi-join would silently DROP null-conv rows (NULL never equals NULL)
    return (
        df.join(offs, F.col("conv_id").eqNullSafe(F.col("_offs_conv")))
        .withColumn("rn", (F.col("_off") + local).cast("int"))
        .drop("_off", "_offs_conv")
    )


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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    gap_sec: int,
) -> DataFrame:
    """Gap-based sessionization: within each ``key_col`` partition ordered by
    ``order_cols``, a new session starts whenever the gap to the previous row
    exceeds ``gap_sec``.  Adds a 0-based ``sess_id`` column.

    Scale shape: one hash-partitioned window (lag + running sum) on the
    session key — the same per-key window every downstream per-session
    aggregate reuses, so Catalyst schedules a single Exchange for the whole
    sessionize→assemble chain."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    sess = F.sum(F.when(gap > gap_sec, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("sess_id", sess)


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


def transition_counts(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """Markov transition matrix over per-entity ordered state sequences:
    (from_state, to_state, n) for every adjacent pair within a key — the
    generalization of W3's error-follows-tool pairing to ALL transitions
    (which states feed errors? what follows a tool call?).  ONE shuffle on
    the key for the lag window; the count is algebraic."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(F.col(state_col)).over(w)
    return (
        df.select(prev.alias("from_state"), F.col(state_col).alias("to_state"))
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def response_latency(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    role_col: str,
    ts_col: str,
    from_role: str = "user",
    to_role: str = "assistant",
) -> DataFrame:
    """Per-conversation response-latency stats: for every ADJACENT
    ``from_role`` → ``to_role`` turn pair (in ``order_cols`` order within
    ``key``), latency = the to-turn's timestamp minus the from-turn's, in
    exact integer microseconds; aggregated to (key, n_responses,
    max_lat_us, med_lat_us) — the conversational twin of the reference's
    request→response timing pairs (W3 machinery, SURVEY §2.6).

    ONE shuffle on the key for the lag window; the aggregate is algebraic
    except the median, which runs over per-conv response rows (bounded by
    conversation length, never the corpus).  Latencies are integer
    microseconds end to end (``unix_micros``), so only the median's
    interpolated midpoint can be fractional — identical in both engines.
    """
    w = Window.partitionBy(key).orderBy(*order_cols)
    # unix_micros rejects TIMESTAMP_NTZ; the cast is the identity under
    # the pipeline's pinned UTC session timezone
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lagged = df.select(
        key,
        F.col(role_col).alias("_role"),
        us.alias("_us"),
        F.lag(F.col(role_col)).over(w).alias("_prev_role"),
        F.lag(us).over(w).alias("_prev_us"),
    )
    resp = lagged.filter(
        (F.col("_role") == to_role) & (F.col("_prev_role") == from_role)
    ).select(key, (F.col("_us") - F.col("_prev_us")).alias("lat_us"))
    return resp.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.max("lat_us").alias("max_lat_us"),
        F.median("lat_us").alias("med_lat_us"),
    )


def state_path_ngrams(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    state_col: str,
    k: int = 3,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Workflow-motif mining: counts of every CONTIGUOUS k-step state
    sequence within a key's ordered stream — the k-gram deepening of
    ``transition_counts`` (k=2): which 3-step tool chains do agents
    actually run?  ``exclude`` drops sentinel states ('-') BEFORE
    pairing, so the motifs are over the subsequence of real state events
    (consecutive tool invocations, not consecutive turns).

    -> (path, n) with path = 'a -> b -> c'.

    Scale shape: ONE shuffle on the key for the lead window (same
    exchange a groupBy(key) would pay), then a map-side-combinable
    (path) count; the path strings are short and their cardinality is
    the motif vocabulary, not the event volume."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    base = df
    if exclude:
        base = base.filter(~F.col(state_col).isin(list(exclude)))
    w = Window.partitionBy(key).orderBy(*order_cols)
    steps = [F.col(state_col)] + [
        F.lead(F.col(state_col), i).over(w) for i in range(1, k)
    ]
    named = base.select(
        *[s.alias(f"_s{i}") for i, s in enumerate(steps)]
    ).filter(F.col(f"_s{k - 1}").isNotNull())
    path = F.concat_ws(" -> ", *[F.col(f"_s{i}") for i in range(k)])
    return named.select(path.alias("path")).groupBy("path").agg(
        F.count(F.lit(1)).alias("n")
    )
