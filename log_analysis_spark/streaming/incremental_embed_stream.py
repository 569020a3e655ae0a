"""Streaming embedding-space near-dup ingestion: the incremental sign-band
ingest (operators/incremental_embed.py) driven by Structured Streaming's
file source — the vector twin of streaming/incremental_stream.py.

New parquet files of (id, embedding) landing in a watch directory become
micro-batches, each deduped within itself and against every previously
accepted vector by EXACT cosine over the persisted unit store, with the
unit/band state growing append-only per batch.

Exactly-once story (same rule as the text twin and the batch jobs'
manifests): the checkpoint records the last committed micro-batch id, and
every write for batch ``b`` lands under ``ingest_id=<b>`` subdirectories,
so a replayed batch OVERWRITES its own output instead of double-appending.
The state read inside the handler filters to ``ingest_id < b`` (partition
pruning) — a replayed batch re-reads exactly the state its first attempt
saw, never its own partial writes: idempotent by construction.

Restarting the stream with the same checkpoint resumes from unprocessed
files only; the accepted corpus is the union of ``accepted/ingest_id=*``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark.operators import incremental_embed


def run_stream_embed_ingest(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    vec_schema: str = "vec_id long, embedding array<float>",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    dim: int | None = None,
    n_planes: int = 64,
    band_bits: int = 8,
    seed: int = 42,
    max_files_per_trigger: int | None = None,
) -> dict[str, int]:
    """Drain ``src_path`` through the incremental embed ingest; returns
    totals.  Call repeatedly with the same ``state_dir``: the derived
    checkpoint makes each call resume from files not yet processed.

    The LSH knobs (n_planes, band_bits, seed, dim) are a pure function of
    the state — pin them per state dir the way the batch job does
    (``incremental_embed.ensure_embed_state_params``)."""
    reader = spark.readStream.schema(vec_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_path)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn(id_col, F.col(id_col).cast("long"))
        unit, band = incremental_embed.load_embed_state(spark, state_dir, batch_id)
        res = incremental_embed.ingest_embedding_batch(
            b, unit, band, threshold=threshold, dim=dim, n_planes=n_planes,
            band_bits=band_bits, seed=seed, id_col=id_col, vec_col=vec_col,
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
        res.new_unit_rows.write.mode("overwrite").parquet(
            f"{state_dir}/unit_store/ingest_id={batch_id}"
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
