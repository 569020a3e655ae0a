"""End-to-end DAG: parse → enrich → route → aggregate.

The Spark rewrite of the reference's flagship `download_and_merge.sh` →
jq-cascade lifecycle (SURVEY.md §3.1): one SparkSession job, a single scan,
broadcast enrich joins, a one-pass router fan-out write, and one aggregation
pass per output — where the reference re-reads its combined file ~25 times.

Stages checkpoint through the manifest (plans/manifest.py) so a killed run
resumes without recomputing or double-writing completed stages.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from log_analysis_spark.datagen import role_taxonomy, tool_registry
from log_analysis_spark.functions.parse import parse_turns
from log_analysis_spark.operators import aggregate as agg
from log_analysis_spark.operators import enrich, router
from log_analysis_spark.plans.manifest import (
    Manifest,
    StageRecord,
    fingerprint_input,
    fingerprint_source,
    run_stage,
)
from log_analysis_spark.sources.iceberg import route_write_resumable


@dataclass
class PipelineResult:
    routed_path: str
    per_sink_counts: dict[str, int]
    hourly_rollup: DataFrame
    conv_counts: DataFrame
    n_turns: int
    wall_sec: float
    stages_skipped: list[str] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    out_dir: str,
    parse_impl: str = "arrow",
    manifest_path: str | None = None,
    input_fingerprint: str | None = None,
    salt_partitions: int = 16,
) -> PipelineResult:
    """Run the full parse→enrich→route→aggregate DAG over ``turns``."""
    t0 = time.monotonic()
    manifest = Manifest(manifest_path or f"{out_dir}/_manifest.jsonl")
    # default fingerprint includes a content hash of the input: two runs
    # into the same out_dir with DIFFERENT input must not share resume state,
    # and the SAME input resubmitted from a new process must still resume
    # (file list + size + mtime; semanticHash fallback for in-memory frames)
    fp = input_fingerprint or fingerprint_input(
        out_dir, parse_impl, fingerprint_source(turns)
    )
    skipped: list[str] = []

    # -- parse + enrich + tag: one fused projection pipeline (no shuffle) --
    parsed = parse_turns(turns, impl=parse_impl)
    enriched = enrich.enrich_tools(
        enrich.enrich_roles(parsed, role_taxonomy(spark)), tool_registry(spark)
    )
    tagged = router.tag_sinks(enriched, router.default_rules())

    # -- route: single fan-out write, hive-partitioned by sink --------------
    # observe() rides stage metrics (rows, error rows, null-class rows) on
    # the write action itself — lineage metrics with zero extra passes
    routed_path = f"{out_dir}/routed"
    obs = Observation("route_metrics")
    observed = tagged.observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.sum((F.col("turn_class") == "error").cast("long")).alias("error_rows"),
        F.sum(F.col("turn_class").isNull().cast("long")).alias("null_class_rows"),
    )

    def _write() -> DataFrame:
        # replace-partition semantics (Iceberg overwritePartitions, or the
        # dynamic-overwrite parquet fallback): a run killed mid-write leaves
        # partial sink partitions, and the rerun replaces exactly those —
        # the manifest skips COMPLETE stages, this makes PARTIAL stages safe.
        #
        # Dynamic overwrite is only sound for SAME-input resume: it replaces
        # just the partitions present in the new data, so running CHANGED
        # input into an existing routed dir would let a sink that had rows
        # before but none now survive on disk and leak stale rows into every
        # downstream aggregate.  An "intent" manifest record (written before
        # the first write attempt for this fingerprint) distinguishes the two
        # cases: same-fp retry → resume partition-by-partition; new/changed
        # fp → clear the dir first.
        import shutil

        if manifest.lookup("route.intent", fp) is None:
            if os.path.exists(routed_path):
                shutil.rmtree(routed_path, ignore_errors=True)
            manifest.record(
                StageRecord(
                    stage="route.intent",
                    input_fingerprint=fp,
                    output_path=routed_path,
                    rows=0,
                    n_partitions=0,
                    partition_rows={},
                    metrics={},
                )
            )
        route_write_resumable(observed, routed_path)
        return spark.read.parquet(routed_path)

    routed, was_skipped = run_stage(
        manifest,
        "route",
        fp,
        routed_path,
        _write,
        lambda: spark.read.parquet(routed_path),
        metrics_fn=lambda: obs.get,
    )
    if was_skipped:
        skipped.append("route")

    # -- aggregate: per-sink counts (one pass), hourly rollup, salted conv --
    per_sink = {
        r["sink"]: r["n"] for r in router.sink_counts(routed).collect()
    }
    total = sum(per_sink.values())
    hourly = agg.hourly_rollup(routed, keys=["sink", "role", "tool"])
    conv_counts = agg.salted_group_count(routed, "conv_id", n_salts=salt_partitions)

    return PipelineResult(
        routed_path=routed_path,
        per_sink_counts=per_sink,
        hourly_rollup=hourly,
        conv_counts=conv_counts,
        n_turns=total,
        wall_sec=time.monotonic() - t0,
        stages_skipped=skipped,
    )
