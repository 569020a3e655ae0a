"""Custom stateful streaming operator: per-conversation running stats via
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.9); this is the rebuild's
forward-path showcase for arbitrary keyed state — the streaming analogue of
the per-request lifecycle accumulation the reference does with dicts
(ngap-logs.py:257-300).

Scale design: state is one tiny tuple per conv_id, partitioned by the
grouping key (state store shards with executors); the per-group update is
vectorized over each micro-batch's Arrow frame — no per-row Python beyond
pandas column ops.  A processing-time timeout evicts idle conversations so
the store stays bounded.

Correctness contract: every emitted stat is monotone non-decreasing per
conv_id, so ``max`` over all update-mode emissions equals the batch
aggregate — giving an exact DuckDB oracle for a stateful streaming op.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from log_analysis_spark.datagen import TRANSCRIPTS_SCHEMA_DDL
from log_analysis_spark.functions.parse import parse_turns_native

OUT_SCHEMA = (
    "conv_id string, n_turns bigint, n_errors bigint, n_tool_calls bigint,"
    " max_turn_idx int"
)
STATE_SCHEMA = "n_turns bigint, n_errors bigint, n_tool_calls bigint, max_turn_idx int"


def _update_conv(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_turns, n_errors, n_tools, max_idx = (
        state.get if state.exists else (0, 0, 0, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        n_errors += int((pdf["turn_class"] == "error").sum())
        n_tools += int((pdf["tool"] != "-").sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_errors, n_tools, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_errors": [n_errors],
            "n_tool_calls": [n_tools],
            "max_turn_idx": [max_idx],
        }
    )


def conv_running_stats(stream: DataFrame) -> DataFrame:
    """Keyed running stats over a stream of transcript turns."""
    parsed = parse_turns_native(stream).select(
        "conv_id", "turn_idx", "turn_class", "tool"
    )
    return parsed.groupBy("conv_id").applyInPandasWithState(
        _update_conv,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        # NoTimeout for the static-dir drive: ProcessingTimeTimeout keeps
        # emitting timeout-only batches under processAllAvailable (endless
        # drain).  A production 24/7 stream would set ProcessingTimeTimeout
        # + state.setTimeoutDuration to evict idle conversations and bound
        # the store.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(
    spark: SparkSession, path: str, query_name: str = "conv_stats"
) -> DataFrame:
    """Drive the stateful query over a static dir; return the final stats
    per conv_id (max over update emissions — exact because every stat is
    monotone per key)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    updates = conv_running_stats(stream)
    q = (
        updates.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"""SELECT conv_id, max(n_turns) AS n_turns, max(n_errors) AS n_errors,
                   max(n_tool_calls) AS n_tool_calls, max(max_turn_idx) AS max_turn_idx
            FROM {query_name} GROUP BY conv_id"""
    )


RL_OUT_SCHEMA = "event_id bigint, key string, hour_id bigint"
RL_STATE_SCHEMA = "admitted bigint"


def rate_limited_events(
    stream: DataFrame,
    limit: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-(key, hour) admission control over an unbounded stream: admit
    at most ``limit`` events per key per hour, dropping the rest — the
    throttle in front of an expensive sink (alert fan-out, external
    webhook, LLM call) that a burst must not be allowed to flood.

    Semantics: arrival-order admission with a deterministic within-batch
    tie-break (each micro-batch's rows are sorted by (ts, id) before the
    quota is applied).  When the stream arrives in event-time order the
    admitted set is exactly the per-(key, hour) rank-by-(ts, id) <= limit
    of the whole history — which is what the batch oracle recomputes.

    State: ONE bigint per active (key, hour) group — bounded by observed
    key x hour cells, never event volume; each admitted event is emitted
    exactly once (update mode), so the drained admitted set is the union
    of emissions."""
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")

    def update(key, pdfs, state):
        admitted = state.get[0] if state.exists else 0
        # a group's micro-batch rows may arrive as several Arrow chunks in
        # shuffle order — concat and sort ONCE so the within-batch quota is
        # taken in (ts, id) order, not chunk order
        chunks = [pdf for pdf in pdfs if len(pdf)]
        sel = None
        if chunks:
            whole = pd.concat(chunks).sort_values([ts_col, id_col])
            sel = whole.iloc[: max(0, limit - admitted)]
            admitted += len(sel)
        state.update((admitted,))
        if sel is not None and len(sel):
            yield pd.DataFrame(
                {
                    "event_id": sel[id_col].astype("int64"),
                    "key": [key[0]] * len(sel),
                    "hour_id": [key[1]] * len(sel),
                }
            )

    hour = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / 3600)
    keyed = stream.select(
        F.col(id_col),
        F.col(key_col).cast("string").alias("key"),
        hour.cast("long").alias("hour_id"),
        F.col(ts_col),
    )
    return keyed.groupBy("key", "hour_id").applyInPandasWithState(
        update,
        outputStructType=RL_OUT_SCHEMA,
        stateStructType=RL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rate_limit_to_memory(
    spark: SparkSession,
    path: str,
    limit: int,
    schema: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "event_id",
    query_name: str = "rate_limited",
) -> DataFrame:
    """Drive the rate limiter over a static dir; return the admitted
    (event_id, key, hour_id) set."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    admitted = rate_limited_events(stream, limit, ts_col, key_col, id_col)
    q = (
        admitted.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"SELECT DISTINCT event_id, key, hour_id FROM {query_name}"
    )
