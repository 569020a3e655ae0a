"""Deterministic synthetic transcripts + lookup dimensions.

The pipeline's input is a table of multi-turn conversation/agent transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.  For tests/oracle checks we derive it *deterministically*
from the driver-provided ``events`` parquet via ``TRANSCRIPTS_SQL`` — a SQL
text written in the common dialect subset of Spark SQL and DuckDB so the
DuckDB oracle computes the byte-identical table.  For benchmarks we
synthesize an arbitrarily large transcripts table with pure column
arithmetic over ``spark.range`` (no shuffle, no Python row loop).

The ``text`` payload embeds the log shapes the reference parses
(reference: tests/test_join_metrics_log_with_application_log.py:37-105,
log_processing.py:71-91, response_times2.py:24, HyraxLogAnalysis.jl:121-135):
  * request-like turns  — ``epoch|&|instance|&|pid|&|request|&|GET path code``
  * timing turns        — ``Profile timing: <Action> - Time to gather N responses: F ms``
  * error turns         — ``ERROR! HttpError: ... HTTP code of <code> attempt: N (File.cc:line)``
  * info turns          — ``BESLog::info() - <Cache> Cache <hit|miss|put>, path: ...``
  * a small % malformed — the ``unknown``/outliers remainder class
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Portable SQL: identical semantics in Spark SQL and DuckDB.
# Rules for portability: no backslash regex escapes, `[0-9]` classes only,
# CAST(x AS STRING) (both dialects), floor() before integer casts (DuckDB
# rounds double→int casts, Spark truncates), row_number for determinism.
# ---------------------------------------------------------------------------

TRANSCRIPTS_SQL = """
WITH base AS (
  SELECT
    event_id,
    ts,
    user_id,
    event_type,
    value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS turn_idx
  FROM events
)
SELECT
  'conv-' || lpad(cast(user_id AS STRING), 6, '0') AS conv_id,
  cast(turn_idx AS INT) AS turn_idx,
  CASE
    WHEN event_id % 97 = 0 THEN 'auditor'
    WHEN event_type = 'error' THEN 'assistant'
    WHEN event_type = 'signup' THEN 'system'
    WHEN event_type = 'purchase' THEN 'tool'
    ELSE 'user'
  END AS role,
  CASE
    WHEN event_id % 97 = 0 THEN
      '### garbled ' || cast(event_id AS STRING) || ' ###'
    WHEN event_type = 'error' THEN
      'ERROR! HttpError: request failed with an HTTP code of '
      || cast(CASE cast(event_id % 4 AS INT) WHEN 0 THEN 404 WHEN 1 THEN 500
              WHEN 2 THEN 401 ELSE 400 END AS STRING)
      || ' attempt: ' || cast((event_id % 3) + 1 AS STRING)
      || ' (BESUtil.cc:' || cast(200 + (event_id % 100) AS STRING) || ')'
    WHEN event_type = 'purchase' THEN
      'Profile timing: '
      || CASE cast(event_id % 3 AS INT) WHEN 0 THEN 'TheBESKeys::TheKeys'
         WHEN 1 THEN 'DmrppArray::read' ELSE 'CurlHandlePool::get' END
      || ' - Time to gather ' || cast((event_id % 20) + 1 AS STRING)
      || ' responses: ' || cast(cast(floor(value * 10) AS BIGINT) AS STRING)
      || '.5 ms'
    WHEN event_type = 'signup' THEN
      'BESLog::info() - Memory Cache '
      || CASE cast(event_id % 3 AS INT) WHEN 0 THEN 'hit'
         WHEN 1 THEN 'miss' ELSE 'put' END
      || ', path: /data/d' || cast(event_id % 50 AS STRING) || '.h5'
    ELSE
      cast(1700000000 + event_id AS STRING)
      || '|&|inst-' || cast(event_id % 4 AS STRING)
      || '|&|' || cast(10000 + (event_id % 8) AS STRING)
      || '|&|request|&|GET /hyrax/ngap/c' || cast(event_id % 30 AS STRING)
      || ' ' || cast(CASE cast(event_id % 5 AS INT) WHEN 0 THEN 404
              WHEN 3 THEN 500 ELSE 200 END AS STRING)
  END AS text,
  CASE WHEN event_type = 'purchase' AND event_id % 97 <> 0
       THEN 'tool-' || cast(event_id % 8 AS STRING) ELSE '-' END AS tool,
  ts
FROM base
"""

TRANSCRIPTS_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz"
)

# Lookup dimensions (broadcast-enrich side; reference: the role/type taxonomy
# in ngap-logs.py:86-90 and the per-type split in HyraxLogAnalysis.jl:91-116).
# `auditor` is intentionally ABSENT from role_taxonomy → unmatched-left
# passthrough (reference: tests/test_join_json_arrays.py:27-55).
# tool_registry carries a `role` column on purpose: it collides with the
# transcript column, pinning down right-overrides merge semantics
# (reference: join_json_arrays.py:45 `{**left, **right}`).

ROLE_TAXONOMY_SQL = """
SELECT * FROM (VALUES
  ('user',      'human',   true),
  ('assistant', 'agent',   false),
  ('system',    'control', false),
  ('tool',      'agent',   false)
) AS t(role, role_class, is_human)
"""

TOOL_REGISTRY_SQL = """
SELECT * FROM (VALUES
  ('tool-0', 'search',  'team-a', 'executor'),
  ('tool-1', 'code',    'team-a', 'executor'),
  ('tool-2', 'search',  'team-b', 'executor'),
  ('tool-3', 'browse',  'team-b', 'executor'),
  ('tool-4', 'code',    'team-c', 'executor'),
  ('tool-5', 'fs',      'team-c', 'executor'),
  ('tool-6', 'fs',      'team-d', 'executor')
) AS t(tool, tool_kind, tool_owner, role)
"""
# note: tool-7 is intentionally missing → enrich-miss sentinel path
# (reference: ngap-logs.py:208-210 "Failed to locate matching record").


def register_events(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical small-scale transcripts table (oracle-comparable)."""
    register_events(spark, sf_dir)
    return spark.sql(TRANSCRIPTS_SQL)


def role_taxonomy(spark: SparkSession) -> DataFrame:
    return spark.sql(ROLE_TAXONOMY_SQL)


def tool_registry(spark: SparkSession) -> DataFrame:
    return spark.sql(TOOL_REGISTRY_SQL)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_convs: int | None = None,
    hot_convs: int = 5,
    hot_fraction: float = 0.10,
    partitions: int | None = None,
) -> DataFrame:
    """Large-scale deterministic transcripts, generated shuffle-free.

    Designed for the bench path: conv assignment is block-arithmetic (dense
    ``turn_idx`` per conv without a window shuffle), with ``hot_fraction`` of
    all turns concentrated into ``hot_convs`` conversations to exercise
    salted-skew handling (SURVEY.md §4.2 "Skew handling").
    """
    if n_convs is None:
        n_convs = max(n_turns // 50, 1)
    n_hot = int(n_turns * hot_fraction)
    tpc = max((n_turns - n_hot) // max(n_convs - hot_convs, 1), 1)

    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    hot = F.col("id") < F.lit(n_hot)
    conv_key = F.when(hot, F.col("id") % hot_convs).otherwise(
        hot_convs + F.floor((F.col("id") - n_hot) / tpc)
    )
    turn_idx = F.when(hot, F.floor(F.col("id") / hot_convs)).otherwise(
        (F.col("id") - n_hot) % tpc
    )
    eid = F.col("id")
    etype = F.when(eid % 5 == 0, "error").when(eid % 5 == 1, "purchase").when(
        eid % 5 == 2, "signup"
    ).otherwise("request")

    err_text = F.concat(
        F.lit("ERROR! HttpError: request failed with an HTTP code of "),
        F.element_at(F.array(F.lit("404"), F.lit("500"), F.lit("401"), F.lit("400")),
                     (eid % 4 + 1).cast("int")),
        F.lit(" attempt: "), (eid % 3 + 1).cast("string"),
        F.lit(" (BESUtil.cc:"), (200 + eid % 100).cast("string"), F.lit(")"),
    )
    timing_text = F.concat(
        F.lit("Profile timing: "),
        F.element_at(F.array(F.lit("TheBESKeys::TheKeys"), F.lit("DmrppArray::read"),
                             F.lit("CurlHandlePool::get")), (eid % 3 + 1).cast("int")),
        F.lit(" - Time to gather "), (eid % 20 + 1).cast("string"),
        F.lit(" responses: "), (eid % 5000).cast("string"), F.lit(".5 ms"),
    )
    info_text = F.concat(
        F.lit("BESLog::info() - Memory Cache "),
        F.element_at(F.array(F.lit("hit"), F.lit("miss"), F.lit("put")),
                     (eid % 3 + 1).cast("int")),
        F.lit(", path: /data/d"), (eid % 50).cast("string"), F.lit(".h5"),
    )
    req_text = F.concat(
        (F.lit(1700000000) + eid).cast("string"),
        F.lit("|&|inst-"), (eid % 4).cast("string"),
        F.lit("|&|"), (10000 + eid % 8).cast("string"),
        F.lit("|&|request|&|GET /hyrax/ngap/c"), (eid % 30).cast("string"),
        F.lit(" "),
        F.element_at(F.array(F.lit("404"), F.lit("200"), F.lit("200"), F.lit("500"),
                             F.lit("200")), (eid % 5 + 1).cast("int")),
    )
    text = (
        F.when(eid % 97 == 0, F.concat(F.lit("### garbled "), eid.cast("string"), F.lit(" ###")))
        .when(etype == "error", err_text)
        .when(etype == "purchase", timing_text)
        .when(etype == "signup", info_text)
        .otherwise(req_text)
    )
    role = (
        F.when(eid % 97 == 0, F.lit("auditor"))
        .when(etype == "error", F.lit("assistant"))
        .when(etype == "signup", F.lit("system"))
        .when(etype == "purchase", F.lit("tool"))
        .otherwise(F.lit("user"))
    )
    return df.select(
        F.concat(F.lit("conv-"), F.lpad(conv_key.cast("string"), 6, "0")).alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when((etype == "purchase") & (eid % 97 != 0),
               F.concat(F.lit("tool-"), (eid % 8).cast("string")))
        .otherwise(F.lit("-")).alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + eid % 86400 * 3 + eid % 7).alias("ts"),
    )
