"""Source scans (SURVEY.md §2.1).

  * S2 — JSON-array file scan (ngap-logs.py:139-158) → multiLine json
  * S3 — NDJSON scan (ngap-logs.py:98-136) → native json lines
  * S4 — raw '|&|'-delimited text (log_processing.py:64-71)
  * S6 — AWS-envelope unwrap: records arrive as {events:[{message:"<json>"}]}
    (download_logs.py:99-108, HyraxLogAnalysis.jl:93-107) → from_json
  * S7 — malformed-record filter at source (download_logs.py:81-110):
    drop messages not starting '{'; PERMISSIVE parse keeps a corrupt-record
    column for the rest
  * S11 — directory multi-file scan (HyraxLogAnalysis.jl:142-167) → glob path
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_array(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S2 — a whole-file JSON array ``[{...},{...}]``."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S3/S11 — newline-delimited JSON; ``path`` may be a glob over a dir."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_delimited_text(
    spark: SparkSession,
    path: str,
    field_names: list[str],
    delimiter: str = "|&|",
) -> DataFrame:
    """S4 — positional text columns split on a literal delimiter."""
    import re

    parts = F.split(F.col("value"), re.escape(delimiter))
    df = spark.read.text(path)
    return df.select(
        *[F.element_at(parts, i + 1).alias(name) for i, name in enumerate(field_names)]
    )


def unwrap_envelope(
    df: DataFrame, message_col: str, inner_schema: T.StructType, drop_malformed: bool = True
) -> DataFrame:
    """S6+S7 — parse the JSON string carried in ``message_col``; malformed
    messages (not starting '{') are dropped like the reference's writer."""
    out = df
    if drop_malformed:
        out = out.filter(F.ltrim(F.col(message_col)).startswith("{"))
    return out.select(
        F.from_json(F.col(message_col), inner_schema).alias("_rec")
    ).select("_rec.*")


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (vectorized, pushdown-capable — asserted in tests)."""
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every file
    (``mergeSchema``), so a table whose later partitions grew columns reads
    as ONE frame with NULLs where old files lack them — the read-side half
    of additive schema evolution (the write side just writes the wider
    schema).  Columns REMOVED later also survive (NULL in new files);
    a column changing TYPE is a loud AnalysisException, not a coercion."""
    return spark.read.option("mergeSchema", True).parquet(*paths)
