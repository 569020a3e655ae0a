"""Sinks (SURVEY.md §2.1 S8-S10).

  * S8 — JSON sink (ngap-logs.py:327-329 pretty array → json lines here;
    array order inside nested cols is already stabilized by sort_array)
  * S9 — CSV sink with header (response_times2.py:49-55)
  * S10 — partitioned fan-out sink: one directory per distinct key value
    (log_processing.py:14-41 one file per PID → partitionBy)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).format(fmt).partitionBy(*partition_cols).save(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar format warehouses standardize on;
    native in Spark (vectorized reader, predicate pushdown) so the engine
    round-trips either column store without extra packages."""
    df.write.mode(mode).orc(path)
