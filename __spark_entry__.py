"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2); ``oracle_sql()`` gives the
DuckDB-equivalent SQL per query (driver compares row-count + schema +
order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark import oracles
from log_analysis_spark.datagen import transcripts_from_events
from log_analysis_spark.functions.parse import parse_turns


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_turns(transcripts_from_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datagen parity: the derived transcripts table itself."""
    return transcripts_from_events(spark, sf_dir)


def q_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/§2.8 — full grok parse output, every extracted field."""
    return _parsed(spark, sf_dir).drop("text")


def q_logs_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (logs_overview.sh:13-20): counts per (turn_class, http_code)."""
    return (
        _parsed(spark, sf_dir)
        .groupBy("turn_class", "http_code")
        .agg(F.count("*").alias("n"))
    )


def q_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (log_processing.py:57-103): count per turn class."""
    return _parsed(spark, sf_dir).groupBy("turn_class").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_logs_overview(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "parse_fields": q_parse_fields,
        "logs_overview": q_logs_overview,
        "class_counts": q_class_counts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": oracles.on_transcripts("SELECT * FROM transcripts"),
        "parse_fields": oracles.on_parsed(
            "SELECT conv_id, turn_idx, role, tool, ts, turn_class, http_code,"
            " attempt, code_ref, n_responses, duration_ms, action, cache_op,"
            " url_path, http_method, req_epoch, instance_id, pid FROM parsed"
        ),
        "logs_overview": oracles.on_parsed(
            "SELECT turn_class, http_code, count(*) AS n FROM parsed"
            " GROUP BY turn_class, http_code"
        ),
        "class_counts": oracles.on_parsed(
            "SELECT turn_class, count(*) AS n FROM parsed GROUP BY turn_class"
        ),
    }
