"""Bucketed (co-located) tables: shuffle-free conv-keyed joins and
aggregations on re-read.

At 100 TB the transcripts fact table is joined and aggregated on
``conv_id`` over and over (enrich joins are broadcast, but conv-level
self-joins, lifecycle merges, and per-conv aggregates all hash-shuffle the
fact table on every query).  Writing the table ONCE bucketed by the join
key amortizes that shuffle: Spark records the hash-partitioning in the
catalog, and any join or groupBy on the bucket key reads the existing
layout — the plan carries NO Exchange on the bucketed side (asserted in
tests and the plan audit, not just claimed).

This is the parquet/catalog sibling of the Iceberg path in
``sources/iceberg.py`` (Iceberg's bucket partition transform expresses the
same contract; the ``bucketBy`` + ``saveAsTable`` form works on the plain
parquet catalog this sandbox ships).  The reference has no analogue — it
re-reads flat JSON per query (SURVEY.md §4: `download_and_merge.sh` writes
plain files); bucketing is a Spark-native scale strategy, not a port.

Bucket-count guidance at scale: pick ``n_buckets`` so one bucket of the
LARGEST co-located table fits an executor core's working memory
(~128-512 MB of parquet per bucket); both sides of a co-located join must
use the SAME bucket count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str = "conv_id",
    n_buckets: int = 16,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed parquet table (catalog-managed —
    ``bucketBy`` requires ``saveAsTable``; a plain path write cannot record
    the layout, which is exactly the metadata that kills the shuffle).

    ``sort_cols`` additionally sorts within each bucket file (e.g. by
    ``turn_idx``), so per-conv window functions read pre-sorted runs.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*s)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its co-location metadata live.

    (`spark.table` — a path-based ``read.parquet`` of the same files would
    silently DROP the bucket layout and reintroduce the shuffle.)"""
    return spark.table(table)
