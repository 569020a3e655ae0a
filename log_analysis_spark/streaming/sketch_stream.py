"""Streaming sketch maintenance: cardinality (KMV) and per-value counts
(CMS) tracked over an unbounded stream in BOUNDED state.

The point of mergeable sketches at 100 TB is exactly this: each
micro-batch folds into k rows (KMV) / d×w counters (CMS) per group, the
persisted state never grows past that bound however much data flows, and
the maintained sketch is IDENTICAL to sketching the concatenated history
(distributivity — the property the batch tests already pin).

Exactly-once: each micro-batch writes the MERGED state under
``version=<batch_id>`` and the handler reads only the latest version
strictly below the current batch id — a replayed batch overwrites its own
output and re-reads exactly the state its first attempt saw (the same
idempotence rule as the incremental-LSH stream).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark.operators import sketches


def _latest_version(state_dir: str, below: int) -> int | None:
    vs = [
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{state_dir}/version=*")
        if p.rsplit("=", 1)[1].isdigit() and int(p.rsplit("=", 1)[1]) < below
    ]
    return max(vs) if vs else None


def _prune_versions(state_dir: str, keep: int = 2) -> None:
    """Delete all but the newest ``keep`` version dirs.

    Without this every micro-batch leaves its ``version=<batch_id>`` dir
    behind forever — a week-long 1-minute-trigger stream accumulates ~10k
    dirs of dead state.  Keeping the last TWO is exactly what the replay
    protocol needs: only the most recent batch B can replay (Structured
    Streaming's checkpointed batch ids are monotonic), and a replayed B
    overwrites ``version=B`` after re-reading the latest version strictly
    below B — which is the other kept dir.  Anything older is unreachable
    by construction."""
    import shutil

    vs = sorted(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{state_dir}/version=*")
        if p.rsplit("=", 1)[1].isdigit()
    )
    for v in vs[:-keep] if keep else vs:
        shutil.rmtree(f"{state_dir}/version={v}", ignore_errors=True)


def run_stream_kmv(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    col: str,
    schema: str,
    k: int = 64,
    group: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``src_path``, maintaining a per-group KMV sketch under
    ``state_dir``; returns the final distinct-count estimates (the same
    frame ``sketches.kmv_estimate`` gives a batch run over the full
    history).  ``max_files_per_trigger`` caps files per micro-batch —
    production streams set it to bound per-batch memory; tests set it to 1
    to force one micro-batch per dropped file."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(src_path)
    sk_dir = f"{state_dir}/kmv"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = sketches.kmv_sketch(batch_df, col, k=k, group=group)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = sketches.kmv_merge(prev, new, k=k, group=group)
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_kmv")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return sketches.kmv_estimate(final, k=k, group=group)


def run_stream_cms(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    col: str,
    schema: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Same shape for the count-min sketch (counters add across batches);
    returns the final (row, bucket, cnt) counter table."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/cms"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = sketches.cms_sketch(batch_df, col, depth=depth, width=width)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = sketches.cms_merge(prev, new)
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_cms")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    return spark.read.parquet(f"{sk_dir}/version={v}")


def run_stream_hll(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    col: str,
    schema: str,
    p: int = 12,
    group: str | None = None,
) -> DataFrame:
    """Same shape for HyperLogLog (registers max across batches) — the
    cheapest of the three to maintain: state is exactly 2^p small-int
    rows per group forever, and the per-batch fold is one max-aggregate.
    Returns the final distinct-count estimates (identical to
    ``sketches.hll_estimate`` over the concatenated history)."""
    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/hll"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = sketches.hll_sketch(batch_df, col, p=p, group=group)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = sketches.hll_merge(prev, new, group=group)
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_hll")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return sketches.hll_estimate(final, p=p, group=group)


def _run_hourly_count_fold(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    ts_col: str,
    key_col: str,
    schema: str,
    name: str,
) -> DataFrame:
    """Fold a stream's (key, hour, cnt) rows into persisted hourly-count
    state (counts ADD; same exactly-once version protocol as the sketch
    streams; state is bounded by hours observed, not event volume) and
    return the final folded counts table — the shared substrate of every
    hourly-alerting stream (burst z-test, CUSUM drift)."""
    from log_analysis_spark.operators import timeseries

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/{name}"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = timeseries.hourly_counts(batch_df, ts_col, key_col)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = (
                new.unionByName(prev)
                .groupBy("key", "hour_id")
                .agg(F.sum("cnt").alias("cnt"))
            )
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    return spark.read.parquet(f"{sk_dir}/version={v}")


def run_stream_burst_hours(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    ts_col: str,
    key_col: str,
    schema: str,
    n_trail: int = 24,
    z: int = 3,
) -> DataFrame:
    """Streaming burst detection: micro-batches fold into the hourly-count
    state (``_run_hourly_count_fold``), and the final alert table comes
    from the SAME ``burst_from_counts`` the batch operator runs —
    streaming==batch by shared code, not by parallel reimplementation."""
    from log_analysis_spark.operators import timeseries

    final = _run_hourly_count_fold(
        spark, src_path, state_dir, ts_col, key_col, schema, "burst"
    )
    return timeseries.burst_from_counts(final, key_col, n_trail=n_trail, z=z)


def run_stream_cusum_hours(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    ts_col: str,
    key_col: str,
    schema: str,
    k_milli: int = 300,
    h_mult: int = 2,
) -> DataFrame:
    """Streaming CUSUM drift detection: the same hourly-count fold as the
    burst stream, finished by the SAME ``cusum_from_counts`` the batch
    operator runs — a slow leak crossing micro-batch boundaries
    accumulates exactly as if the history had been one batch (counts ADD,
    the CUSUM replays deterministically from the folded counts)."""
    from log_analysis_spark.operators import timeseries

    final = _run_hourly_count_fold(
        spark, src_path, state_dir, ts_col, key_col, schema, "cusum"
    )
    return timeseries.cusum_from_counts(
        final, key_col, k_milli=k_milli, h_mult=h_mult
    )


def run_stream_active_users(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    ts_col: str,
    user_col: str,
    schema: str,
    window_days: int = 7,
) -> DataFrame:
    """Streaming rolling-distinct-actives: micro-batches fold into a
    persisted DISTINCT (user, day) presence set — presence is pure set
    union, so the maintained state is IDENTICAL to batch presence over
    the concatenated history regardless of batch boundaries, and the
    final WAU curve comes from the SAME
    ``timeseries.active_users_from_presence`` the batch operator runs.
    State is bounded by (users × observed days), not event volume; the
    same exactly-once version protocol as the sketch streams."""
    from log_analysis_spark.operators import timeseries

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/presence"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = timeseries.user_day_presence(batch_df, ts_col, user_col)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = new.unionByName(prev).distinct()
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_presence")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return timeseries.active_users_from_presence(final, window_days)


def run_stream_quantiles(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    value_col: str,
    schema: str,
    qs: list[float],
    resolution: float = 0.25,
    group: str | None = None,
) -> DataFrame:
    """Streaming histogram-CDF quantiles: each micro-batch's values
    collapse to (group, cell) counts (``sketches.value_cells``) and ADD
    into the versioned bounded state (state ~ occupied grid cells, never
    value volume; same exactly-once version protocol as the other sketch
    streams).  The final read runs the SAME
    ``sketches.quantiles_from_cells`` finisher as batch — cell counts are
    additive, so streaming == batch EXACTLY regardless of batch
    boundaries (the presence-set argument of ``run_stream_active_users``,
    with counts in place of sets)."""
    from log_analysis_spark.operators import sketches as sk

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/qcells"
    keys = ([group] if group else []) + ["_cell"]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = sk.value_cells(batch_df, value_col, resolution, group)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = (
                new.unionByName(prev)
                .groupBy(*keys)
                .agg(F.sum("_c").alias("_c"))
            )
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_quantiles")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return sk.quantiles_from_cells(final, qs, resolution, group)


def run_stream_forecast_backtest(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    ts_col: str,
    key_col: str,
    schema: str,
    lags: tuple[int, ...] = (1, 24),
) -> DataFrame:
    """Streaming forecastability report: hourly counts fold per
    micro-batch into the shared versioned bounded state
    (``_run_hourly_count_fold`` — verbatim the burst/CUSUM substrate),
    finished by the SAME ``timeseries.backtest_from_counts`` as batch, so
    the drained snapshot's persistence/seasonal MAEs equal the batch
    answer exactly."""
    from log_analysis_spark.operators import timeseries

    final = _run_hourly_count_fold(
        spark, src_path, state_dir, ts_col, key_col, schema, "backtest"
    )
    return timeseries.backtest_from_counts(final, lags)


def run_stream_psi_drift(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    value_col: str,
    schema: str,
    ref_cells: DataFrame,
    width: float = 1.0,
    thr_micro: int = 200_000,
) -> DataFrame:
    """Streaming distribution-drift monitor: the CURRENT sample's PSI
    value cells fold per micro-batch into versioned bounded state (cell
    counts are ADDITIVE — batch-boundary-independent, the quantile-fold
    argument), then the final read PSIs the folded cells against a
    PRE-AGGREGATED reference cell table (``expectations.psi_value_cells``
    over the baseline snapshot) through the SAME
    ``expectations.psi_from_cells`` as batch.  This is the shape a
    production drift alarm runs: reference frozen, current side
    streaming."""
    from log_analysis_spark.operators import expectations as exp_ops

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/psicells"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = exp_ops.psi_value_cells(batch_df, value_col, width, "cb")
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = (
                new.unionByName(prev)
                .groupBy("bin")
                .agg(F.sum("cb").alias("cb"))
            )
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_psi")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return exp_ops.psi_from_cells(ref_cells, final, thr_micro)


def run_stream_seq_integrity(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    schema: str,
    group_col: str = "conv_id",
    idx_col: str = "turn_idx",
    start_at: int = 0,
) -> DataFrame:
    """Streaming turn-sequence integrity: each micro-batch collapses to
    (group, idx, cnt) occurrence cells (``expectations.sequence_cells``)
    that ADD into the versioned bounded state (state ~ distinct (group,
    idx) cells, never event volume — the quantile-cells argument), and
    the audit comes from the SAME
    ``expectations.sequence_integrity_from_cells`` finisher batch runs:
    counts are additive, so streaming == batch EXACTLY at any batch
    boundary — a conversation's gap only closes when the missing turn
    actually arrives, whichever batch carries it."""
    from log_analysis_spark.operators import expectations as exp_ops

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/seqcells"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = exp_ops.sequence_cells(batch_df, group_col, idx_col)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = (
                new.unionByName(prev)
                .groupBy("group", "idx")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_seq")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return exp_ops.sequence_integrity_from_cells(final, start_at)


def run_stream_vocab_drift(
    spark: SparkSession,
    src_path: str,
    state_dir: str,
    schema: str,
    ref_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
    min_total: int = 5,
) -> DataFrame:
    """Streaming vocabulary-drift monitor: the CURRENT corpus's (tok, n)
    token counts (``textstats.token_counts``) fold per micro-batch into
    versioned bounded state (token counts are ADDITIVE, so the folded
    state equals the batch recount at any batch boundary), then the final
    read scores drift against a FROZEN reference snapshot's counts through
    the SAME ``textstats.vocab_drift_from_counts`` finisher batch runs —
    the reference-frozen / current-streaming shape of the PSI monitor, at
    the vocabulary level (which token shifted, not just that the
    distribution moved)."""
    from log_analysis_spark.operators import textstats as ts_ops

    stream = spark.readStream.schema(schema).parquet(src_path)
    sk_dir = f"{state_dir}/vocabcells"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        new = ts_ops.token_counts(batch_df, text_col, id_col)
        prev_v = _latest_version(sk_dir, batch_id)
        if prev_v is not None:
            prev = spark.read.parquet(f"{sk_dir}/version={prev_v}")
            new = (
                new.unionByName(prev)
                .groupBy("tok")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        new.write.mode("overwrite").parquet(f"{sk_dir}/version={batch_id}")
        _prune_versions(sk_dir)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{state_dir}/ckpt_vocab")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    v = _latest_version(sk_dir, 1 << 62)
    if v is None:
        raise RuntimeError("no micro-batch produced state")
    final = spark.read.parquet(f"{sk_dir}/version={v}")
    return ts_ops.vocab_drift_from_counts(ref_counts, final, top_k, min_total)
