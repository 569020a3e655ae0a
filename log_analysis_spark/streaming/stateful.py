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
