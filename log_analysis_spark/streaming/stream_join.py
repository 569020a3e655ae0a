"""Stream-stream watermarked interval join — the §2.9 capability class the
batch interval join (J5) maps to under Structured Streaming.

The reference is strictly batch; this is the forward-path twin of
``joins.interval_join``: tool-call turns joined to the error turns that
follow them in the same conversation within ``max_gap`` — but with BOTH
sides unbounded streams.  Spark buffers each side's rows in join state and
uses the two watermarks plus the time-range condition to evict: a left row
can be dropped once the right watermark passes ``l.ts + max_gap``, a right
row once the left watermark passes ``r.ts``.  State per key is therefore
bounded by ``max_gap`` + watermark delay — the knob a 10^12-turn deployment
sizes from its shippers' max arrival skew, NOT from corpus size.

Exactness harness: over a static dir with a watermark exceeding the data's
event-time span nothing is ever evicted, so the streaming result equals the
batch join row-for-row — that equality is the test and the DuckDB-oracle
contract row (`streaming_tool_error_join`).  Production uses a tight
watermark and accepts the documented drop of >watermark-late rows.

Operational gotcha (surfaced by the eviction test): the GLOBAL watermark is
the MIN over every watermark node in the query, and each node's event-time
high-mark only advances on rows that survive ITS side's filters.  When one
side is selective (here: error turns only), a quiet period on that class
stalls the global watermark and join state stops being evicted — even
though wall-clock data keeps flowing.  Deployments should monitor
``lastProgress.eventTime.watermark`` per query; if a side can legitimately
go quiet, watermark BEFORE the selective filter (one shared source) instead
of after the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import parse_turns_native
from log_analysis_spark.streaming.stream_pipeline import stream_transcripts


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Generic watermarked stream-stream inner join: rows match on ``key``
    equality with ``right_ts`` in ``[left_ts, left_ts + max_gap]``.  Both
    sides get the same ``watermark``; the two-sided time bound is what lets
    Spark evict join state (without it, state grows forever and the query
    is rejected in append mode).  Works unchanged on batch frames (the
    watermark is a no-op there) — tests exploit that for the equality
    oracle."""
    lw = left.alias("l")
    rw = right.alias("r")
    if left.isStreaming:
        lw = left.withWatermark(left_ts, watermark).alias("l")
    if right.isStreaming:
        rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return lw.join(rw, cond, "inner")


def _tool_error_sides(parsed_l: DataFrame, parsed_r: DataFrame):
    tools = parsed_l.filter(F.col("tool") != "-").select(
        "conv_id",
        F.col("turn_idx").alias("tool_turn_idx"),
        "tool",
        "ts",
    )
    errs = parsed_r.filter(F.col("turn_class") == "error").select(
        F.col("conv_id").alias("e_conv_id"),
        F.col("turn_idx").alias("err_turn_idx"),
        F.col("ts").alias("e_ts"),
    )
    return tools, errs


def _select_pairs(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("l.conv_id").alias("conv_id"),
        F.col("l.tool_turn_idx").alias("tool_turn_idx"),
        F.col("l.tool").alias("tool"),
        F.col("r.err_turn_idx").alias("err_turn_idx"),
    )


def stream_tool_error_join(
    spark: SparkSession,
    path: str,
    max_gap: str = "30 minutes",
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming (tool call → following error within ``max_gap``, same conv)
    pair stream over a transcript dir.  Two independent readStream sources
    feed the two sides (a self-join over one handle is legal but obscures
    the two-stream state story this documents)."""
    tools_p = parse_turns_native(stream_transcripts(spark, path))
    errs_p = parse_turns_native(stream_transcripts(spark, path))
    tools, errs = _tool_error_sides(tools_p, errs_p)
    joined = streaming_interval_join(
        tools,
        errs.withColumnRenamed("e_conv_id", "conv_id"),
        key="conv_id",
        max_gap=max_gap,
        watermark=watermark,
        left_ts="ts",
        right_ts="e_ts",
    )
    return _select_pairs(joined)


def batch_tool_error_join(
    parsed: DataFrame, max_gap: str = "30 minutes"
) -> DataFrame:
    """Batch twin over an already-parsed frame — the exact oracle the
    streaming result must equal when nothing is watermark-evicted."""
    tools, errs = _tool_error_sides(parsed, parsed)
    joined = streaming_interval_join(
        tools,
        errs.withColumnRenamed("e_conv_id", "conv_id"),
        key="conv_id",
        max_gap=max_gap,
        left_ts="ts",
        right_ts="e_ts",
    )
    return _select_pairs(joined)


def run_stream_tool_error_join(
    spark: SparkSession,
    path: str,
    query_name: str = "stream_ss_join",
    max_gap: str = "30 minutes",
    watermark: str = "90 days",
) -> DataFrame:
    """Drive the stream-stream join to completion over a static dir (memory
    sink, append mode — the only mode stream-stream inner joins support)."""
    out = stream_tool_error_join(spark, path, max_gap, watermark)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
