"""Golden-fixture test mirroring the reference's crown jewel
(tests/test_join_metrics_log_with_application_log.py:13-239): a hand-built
metrics record + application records including one DELIBERATELY outside the
join's time window ("This error should not be merged - outside time
boundary", :98-105), asserted against the exact expected nested output.

The rebuild's J5 (composite-equi + interval join) + J4 (one-to-many nest)
must reproduce: equal instance_id AND pid, type != 'request', and
ts within [start, end] inclusive — late rows excluded by the upper bound.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from log_analysis_spark.operators import joins


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_golden_interval_lifecycle(spark):
    # the "metrics" anchor: one request lifecycle on (inst-A, pid 29751)
    metrics = spark.createDataFrame(
        [("req-1", "inst-A", 29751, ts("2025-02-14 06:59:00"), ts("2025-02-14 07:00:12"))],
        "request_id string, instance_id string, pid int, start_ts timestamp, end_ts timestamp",
    )
    # application records: in-window matches, wrong-pid, wrong-instance,
    # anchor-class ('request' — excluded by type), and the outside-boundary one
    app = spark.createDataFrame(
        [
            ("inst-A", 29751, "request", "the request record itself", ts("2025-02-14 06:59:00")),
            ("inst-A", 29751, "info",    "chunk read",                ts("2025-02-14 06:59:10")),
            ("inst-A", 29751, "timing",  "Profile timing: X - 1 ms",  ts("2025-02-14 06:59:30")),
            ("inst-A", 29751, "error",   "HTTP code of 404",          ts("2025-02-14 07:00:12")),  # at upper bound: kept
            ("inst-A", 12345, "info",    "different pid",             ts("2025-02-14 06:59:20")),
            ("inst-B", 29751, "info",    "different instance",        ts("2025-02-14 06:59:20")),
            ("inst-A", 29751, "error",   "outside time boundary",     ts("2025-02-14 07:00:13")),  # late: excluded
            ("inst-A", 29751, "info",    "before window",             ts("2025-02-14 06:58:59")),  # early: excluded
        ],
        "instance_id string, pid int, type string, message string, ts timestamp",
    )
    anchors = metrics
    others = app.filter(F.col("type") != "request")
    out = joins.interval_join(
        anchors,
        others,
        equi_keys=["instance_id", "pid"],
        anchor_start="start_ts",
        anchor_end="end_ts",
        other_ts="ts",
        bucketed=True,
    )
    got = sorted(
        (r["type"], r["message"]) for r in out.select("type", "message").collect()
    )
    assert got == [
        ("error", "HTTP code of 404"),
        ("info", "chunk read"),
        ("timing", "Profile timing: X - 1 ms"),
    ]

    # J4 nesting: the matches embed as a ts-sorted array ("bes": [...])
    nested = joins.nest_one_to_many(
        metrics.select("request_id", "instance_id", "pid"),
        out.select("instance_id", "pid", "ts", "type", "message"),
        "pid",
        ["ts"],
    )
    row = nested.filter(F.col("request_id") == "req-1").first()
    assert [x["message"] for x in row["related"]] == [
        "chunk read",
        "Profile timing: X - 1 ms",
        "HTTP code of 404",
    ]
