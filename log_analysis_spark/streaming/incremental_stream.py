"""Streaming near-dup corpus ingestion: the incremental LSH ingest
(operators/incremental.py) driven by Structured Streaming's file source.

The batch job (jobs/run_incremental_dedup.py) ingests one increment per
spark-submit; this is the same state machine running CONTINUOUSLY — new
parquet files landing in a watch directory become micro-batches, each
deduped within itself and against everything previously accepted, with the
signature/band state growing append-only per batch.

Exactly-once story (the streaming analogue of the batch job's manifest):
the checkpoint records the last committed micro-batch id, and every write
for batch ``b`` lands under ``ingest_id=<b>`` subdirectories, so a
replayed batch OVERWRITES its own output instead of double-appending.
The state read inside the batch handler filters to ``ingest_id < b``
(partition pruning) — a replayed batch therefore re-reads exactly the
state its first attempt saw, never its own partial writes: idempotent by
construction, same rule as the batch job's crash recovery.

Restarting the stream with the same checkpoint resumes from unprocessed
files only; the accepted corpus is the union of ``accepted/ingest_id=*``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark.operators import incremental


def run_stream_neardup_ingest(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    doc_schema: str = "doc_id string, text string",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
) -> dict[str, int]:
    """Drain ``src_path`` through the incremental ingest; returns totals.

    Call repeatedly with the same ``state_dir``: the derived checkpoint
    makes each call resume from files not yet processed (the test drives
    two calls with a file landing in between — two micro-batches, one
    cross-batch duplicate rejection).
    """
    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_path)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn(id_col, F.col(id_col).cast("string"))
        sig, band = incremental.load_state(spark, state_dir, batch_id)
        res = incremental.ingest_batch(
            b, sig, band, text_col=text_col, id_col=id_col, threshold=threshold
        )
        accepted = b.join(
            res.accepted.withColumnRenamed("id", id_col), id_col
        ).persist()
        accepted.write.mode("overwrite").parquet(
            f"{state_dir}/accepted/ingest_id={batch_id}"
        )
        res.rejected.write.mode("overwrite").parquet(
            f"{state_dir}/rejects/ingest_id={batch_id}"
        )
        res.new_sig_rows.write.mode("overwrite").parquet(
            f"{state_dir}/sig_store/ingest_id={batch_id}"
        )
        res.new_band_rows.write.mode("overwrite").parquet(
            f"{state_dir}/band_index/ingest_id={batch_id}"
        )
        accepted.unpersist()

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os

    totals = {"n_accepted": 0, "n_rejected": 0}
    if os.path.exists(f"{state_dir}/accepted"):
        totals["n_accepted"] = spark.read.parquet(f"{state_dir}/accepted").count()
    if os.path.exists(f"{state_dir}/rejects"):
        totals["n_rejected"] = spark.read.parquet(f"{state_dir}/rejects").count()
    return totals
