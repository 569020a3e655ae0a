from __future__ import annotations

import json

from pyspark.sql import functions as F

from log_analysis_spark.plans.pipeline import run_pipeline


def test_pipeline_end_to_end_and_resume(spark, transcripts, tmp_path):
    out = str(tmp_path / "pipe")
    res = run_pipeline(spark, transcripts, out, parse_impl="native")
    total = transcripts.count()
    # routing completeness: per-sink counts sum to total
    assert sum(res.per_sink_counts.values()) == total == res.n_turns
    assert res.per_sink_counts["errors"] > 0
    assert res.stages_skipped == []

    # hourly rollup is complete too
    assert res.hourly_rollup.agg(F.sum("n")).first()[0] == total

    # manifest recorded per-partition lineage
    with open(f"{out}/_manifest.jsonl") as f:
        recs = [json.loads(line) for line in f]
    assert recs and recs[-1]["stage"] == "route"
    assert recs[-1]["rows"] == total
    assert sum(recs[-1]["partition_rows"].values()) == total
    # observe()-riding stage metrics (zero extra passes)
    assert recs[-1]["metrics"]["rows_written"] == total
    assert recs[-1]["metrics"]["error_rows"] == res.per_sink_counts["errors"]
    assert recs[-1]["metrics"]["null_class_rows"] == 0

    # resume: second run skips the route stage, produces identical counts
    res2 = run_pipeline(spark, transcripts, out, parse_impl="native")
    assert res2.stages_skipped == ["route"]
    assert res2.per_sink_counts == res.per_sink_counts

    # idempotence: no double-counted rows after the rerun
    assert spark.read.parquet(res.routed_path).count() == total


def test_pipeline_changed_input_clears_stale_sinks(spark, transcripts, tmp_path):
    """Dynamic partition overwrite is only sound for same-input resume: a
    rerun with CHANGED input into the same routed dir must not keep sinks
    the new input doesn't produce (they'd silently leak stale rows into
    per_sink_counts and every downstream aggregate)."""
    out = str(tmp_path / "pipe")
    res = run_pipeline(spark, transcripts, out, parse_impl="native")
    assert res.per_sink_counts.get("tool_calls", 0) > 0

    changed = transcripts.filter(F.col("tool") == "-")
    res2 = run_pipeline(spark, changed, out, parse_impl="native")
    assert res2.stages_skipped == []  # different input -> no resume
    assert "tool_calls" not in res2.per_sink_counts
    assert sum(res2.per_sink_counts.values()) == changed.count()

    # and same-input rerun after that still resumes cleanly
    res3 = run_pipeline(spark, changed, out, parse_impl="native")
    assert res3.stages_skipped == ["route"]
    assert res3.per_sink_counts == res2.per_sink_counts


def test_pipeline_input_flip_does_not_resume_from_other_input(
    spark, transcripts, tmp_path
):
    """A -> B -> A into the same out_dir: the third run must recompute from
    input A, not skip the route stage on A's historic (now-stale) manifest
    record and silently serve B's routed rows."""
    out = str(tmp_path / "flip")
    res_a1 = run_pipeline(spark, transcripts, out, parse_impl="native")
    changed = transcripts.filter(F.col("tool") == "-")
    run_pipeline(spark, changed, out, parse_impl="native")

    res_a2 = run_pipeline(spark, transcripts, out, parse_impl="native")
    assert res_a2.stages_skipped == []  # stale record must NOT resume
    assert res_a2.per_sink_counts == res_a1.per_sink_counts


def test_pipeline_arrow_parse_same_routing(spark, transcripts, tmp_path):
    out_a = str(tmp_path / "pa")
    out_b = str(tmp_path / "pb")
    ra = run_pipeline(spark, transcripts, out_a, parse_impl="native")
    rb = run_pipeline(spark, transcripts, out_b, parse_impl="arrow")
    assert ra.per_sink_counts == rb.per_sink_counts
