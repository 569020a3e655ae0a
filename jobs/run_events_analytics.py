"""spark-submit entrypoint for the event-stream analytics surface — the
telemetry job next to the corpus jobs: as-of enrichment, hopping-window
counts, funnel, cohort retention, and the sketch-based health report
(approximate distincts, CMS skew scan, quantiles) in one pass over an
events table.

Cluster usage (same --py-files launch shape as jobs/run_pipeline.py):

    spark-submit --py-files log_analysis_spark.zip jobs/run_events_analytics.py \
        --input /path/events --out /path/analytics

Sandbox usage:

    python jobs/run_events_analytics.py --sf-dir /root/testdata/sf0.001 --out /tmp/ea

Outputs (each a parquet dir under --out): ``asof/`` (left events enriched
with the most recent right event), ``sliding/`` (hopping-window counts per
type), ``funnel/`` (per-user steps completed), ``retention/`` (cohort
matrix), ``report/`` (per-type KMV distinct users + value quantiles, plus
HLL estimates under ``--hll-p``), ``alerts/`` (hourly burst/drop
anomalies from ``timeseries.burst_hours``, ``--burst-trail-hours``),
``attribution/`` (multi-touch conversion credit under
``--attr-conv-type``, last/first/linear models in exact integer
micro-units).  The
summary JSON line carries per-output row counts plus the CMS-detected hot
keys — the skew advisory that feeds salting knobs downstream.

Resume: manifest-checkpointed like every job here — a rerun with the same
input fingerprint + knobs reprints the recorded summary without
recomputation.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="events table path (parquet)")
    src.add_argument("--sf-dir", help="testdata dir holding events.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--asof-left-type", default="error")
    ap.add_argument("--asof-right-type", default="purchase")
    ap.add_argument("--asof-tolerance-sec", type=int, default=None)
    ap.add_argument("--window-sec", type=int, default=3600)
    ap.add_argument("--slide-sec", type=int, default=900)
    ap.add_argument(
        "--funnel", default="signup,view,purchase",
        help="comma-separated ordered step event types",
    )
    ap.add_argument("--kmv-k", type=int, default=64)
    ap.add_argument("--quantiles", default="0.5,0.9,0.99")
    ap.add_argument("--quantile-resolution", type=float, default=0.25)
    ap.add_argument(
        "--skew-frac", type=float, default=0.01,
        help="flag keys holding >= this fraction of all events (CMS scan)",
    )
    ap.add_argument(
        "--ohlc-bucket-sec", type=int, default=86400,
        help="OHLC downsampling bucket (0 disables the ohlc/ output)",
    )
    ap.add_argument(
        "--burst-trail-hours", type=int, default=24,
        help="trailing baseline for hourly burst/drop alerting "
        "(0 disables the alerts/ output)",
    )
    ap.add_argument("--burst-z", type=int, default=3)
    ap.add_argument(
        "--cusum-h", type=int, default=0,
        help="enable CUSUM drift alerts at h means of cumulative excess "
        "(0 = off) — catches slow ramps the burst z-test misses",
    )
    ap.add_argument("--cusum-k-milli", type=int, default=300)
    ap.add_argument(
        "--robust-k-milli", type=int, default=0,
        help="enable median/MAD robust outlier annotation of event values "
        "per event_type at k/1000 MADs (0 = off) — flags the wild values "
        "a mean/sigma test hides behind its own inflated sigma",
    )
    ap.add_argument(
        "--attr-conv-type", default="",
        help="enable multi-touch attribution crediting this conversion "
        "event type's trailing-window touches (last/first/linear models)",
    )
    ap.add_argument("--attr-touch-types", default="click,view")
    ap.add_argument("--attr-lookback-hours", type=int, default=24)
    ap.add_argument(
        "--hll-p", type=int, default=0,
        help="also report HLL distinct-user estimates at 2^p registers "
        "(0 = KMV only)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    import os

    from pyspark.sql import functions as F

    from log_analysis_spark.operators import sketches, timeseries
    from log_analysis_spark.plans.manifest import (
        Manifest,
        StageRecord,
        fingerprint_input,
        fingerprint_source,
    )
    from log_analysis_spark.session import get_spark

    spark = get_spark("run_events_analytics", master=args.master)
    path = args.input or f"{args.sf_dir}/events.parquet"
    ev = spark.read.parquet(path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    manifest = Manifest(f"{args.out}/_manifest.jsonl")
    fp = fingerprint_input(
        args.out, args.asof_left_type, args.asof_right_type,
        args.asof_tolerance_sec, args.window_sec, args.slide_sec,
        args.funnel, args.kmv_k, args.quantiles, args.quantile_resolution,
        args.skew_frac, args.ohlc_bucket_sec, args.burst_trail_hours,
        args.burst_z, args.hll_p, args.cusum_h, args.cusum_k_milli,
        args.attr_conv_type, args.attr_touch_types, args.attr_lookback_hours,
        fingerprint_source(ev),
    )
    prior = manifest.lookup("events_analytics", fp)
    if prior is not None and os.path.exists(f"{args.out}/report"):
        print(json.dumps({**prior["metrics"], "resumed": True}))
        return

    counts: dict[str, int] = {}

    asof = timeseries.asof_join(
        ev.filter(F.col("event_type") == args.asof_left_type),
        ev.filter(F.col("event_type") == args.asof_right_type),
        "user_id",
        ["value", "event_id"],
        right_order="event_id",
        tolerance_sec=args.asof_tolerance_sec,
    )
    asof.write.mode("overwrite").parquet(f"{args.out}/asof")
    counts["n_asof"] = spark.read.parquet(f"{args.out}/asof").count()

    sliding = timeseries.sliding_counts(
        ev, "ts", args.window_sec, args.slide_sec, group="event_type"
    )
    sliding.write.mode("overwrite").parquet(f"{args.out}/sliding")
    counts["n_sliding"] = spark.read.parquet(f"{args.out}/sliding").count()

    steps = [s for s in args.funnel.split(",") if s]
    funnel = timeseries.funnel_steps(
        ev, "user_id", "ts", "event_type", steps, "event_id"
    )
    funnel.write.mode("overwrite").parquet(f"{args.out}/funnel")
    fc = {
        int(r["steps_completed"]): r["n"]
        for r in spark.read.parquet(f"{args.out}/funnel")
        .groupBy("steps_completed")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    counts["n_funnel_users"] = sum(fc.values())
    counts["n_funnel_completed"] = fc.get(len(steps), 0)

    retention = timeseries.cohort_retention(ev, "user_id", "ts")
    retention.write.mode("overwrite").parquet(f"{args.out}/retention")
    counts["n_retention_cells"] = spark.read.parquet(
        f"{args.out}/retention"
    ).count()

    qs = [float(x) for x in args.quantiles.split(",") if x]
    report = sketches.kmv_distinct(
        ev, "user_id", k=args.kmv_k, group="event_type"
    ).join(
        sketches.hist_quantiles(
            ev, "value", qs, resolution=args.quantile_resolution,
            group="event_type",
        ),
        "event_type",
    )
    if args.hll_p:
        report = report.join(
            sketches.hll_distinct(
                ev, "user_id", p=args.hll_p, group="event_type"
            ).withColumnRenamed("est_distinct", "est_distinct_hll"),
            "event_type",
        )
    report.write.mode("overwrite").parquet(f"{args.out}/report")
    counts["n_report_rows"] = spark.read.parquet(f"{args.out}/report").count()

    if args.ohlc_bucket_sec:
        ohlc = timeseries.downsample_ohlc(
            ev, "event_type", "ts", "value", "event_id", args.ohlc_bucket_sec
        )
        ohlc.write.mode("overwrite").parquet(f"{args.out}/ohlc")
        counts["n_ohlc_bars"] = spark.read.parquet(f"{args.out}/ohlc").count()

    if args.burst_trail_hours:
        alerts = timeseries.burst_hours(
            ev, "ts", "event_type",
            n_trail=args.burst_trail_hours, z=args.burst_z,
        ).filter(F.col("anomaly").isNotNull())
        alerts.write.mode("overwrite").parquet(f"{args.out}/alerts")
        counts["n_burst_alerts"] = spark.read.parquet(
            f"{args.out}/alerts"
        ).count()

    if args.cusum_h:
        drift = timeseries.cusum_hours(
            ev, "ts", "event_type",
            k_milli=args.cusum_k_milli, h_mult=args.cusum_h,
        ).filter(F.col("drift").isNotNull())
        drift.write.mode("overwrite").parquet(f"{args.out}/drift")
        counts["n_drift_alerts"] = spark.read.parquet(
            f"{args.out}/drift"
        ).count()

    if args.robust_k_milli:
        from log_analysis_spark.operators import sketches as sk_job

        outl = sk_job.robust_outliers(
            ev, "value", k_milli=args.robust_k_milli, group="event_type"
        ).filter("is_outlier").select(
            "event_id", "event_type", "value", "dev_cells", "mad_cells"
        )
        outl.write.mode("overwrite").parquet(f"{args.out}/outliers")
        counts["n_robust_outliers"] = spark.read.parquet(
            f"{args.out}/outliers"
        ).count()

    if args.attr_conv_type:
        attr = timeseries.attribution(
            ev,
            conv_type=args.attr_conv_type,
            touch_types=tuple(
                t for t in args.attr_touch_types.split(",") if t
            ),
            lookback_hours=args.attr_lookback_hours,
        )
        attr.write.mode("overwrite").parquet(f"{args.out}/attribution")
        attr_back = spark.read.parquet(f"{args.out}/attribution")
        counts["n_attribution_rows"] = attr_back.count()
        counts["n_attributed_convs"] = (
            attr_back.filter(F.col("touch_event_id").isNotNull())
            .select("conv_event_id").distinct().count()
        )

    from log_analysis_spark.operators import expectations as expect_ops

    profile = expect_ops.profile_columns(ev, ["value", "user_id"])
    profile.write.mode("overwrite").parquet(f"{args.out}/profile")
    counts["n_profile_rows"] = spark.read.parquet(f"{args.out}/profile").count()

    hot = sketches.skewed_keys(ev, "user_id", threshold_frac=args.skew_frac)
    counts["hot_user_ids"] = sorted(
        int(r["user_id"]) for r in hot.collect()
    )

    summary = {"events_path": path, "n_events": ev.count(), **counts}
    manifest.record(
        StageRecord(
            stage="events_analytics",
            input_fingerprint=fp,
            output_path=args.out,
            rows=summary["n_events"],
            n_partitions=0,
            partition_rows={},
            metrics=summary,
        )
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
