"""KMV sketch properties the oracle can't state: mergeability (the 100 TB
reason the sketch exists), exactness below k, estimator accuracy, and the
global TakeOrderedAndProject path."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from log_analysis_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def values(spark):
    # 1000 distinct values, each duplicated twice (duplicates must not
    # affect a distinct-count sketch)
    rows = [Row(g="a" if v % 2 == 0 else "b", v=v) for v in range(1000)] * 2
    return spark.createDataFrame(rows)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([Row(g="x", v=i) for i in range(10)] * 3)
    out = SK.kmv_distinct(df, "v", k=64, group="g").collect()
    assert out == [Row(g="x", est_distinct=10)]


def test_kmv_estimate_accuracy(values):
    [r] = SK.kmv_distinct(values, "v", k=128).collect()
    # std err ~ 1/sqrt(k-2) ≈ 9%; 3 sigma bound
    assert abs(r["est_distinct"] - 1000) / 1000 < 0.27


def test_kmv_grouped_matches_per_group_run(values):
    grouped = {
        r["g"]: r["est_distinct"]
        for r in SK.kmv_distinct(values, "v", k=64, group="g").collect()
    }
    for g in ("a", "b"):
        [solo] = SK.kmv_distinct(
            values.filter(F.col("g") == g), "v", k=64
        ).collect()
        assert grouped[g] == solo["est_distinct"]


def test_kmv_merge_equals_whole(values):
    """Sketching two halves and merging == sketching the whole input —
    the distributivity that lets per-day/per-partition sketches combine
    without rescanning."""
    k = 64
    lo = values.filter(F.col("v") < 300)
    hi = values.filter(F.col("v") >= 300)
    merged = SK.kmv_merge(
        SK.kmv_sketch(lo, "v", k=k, group="g"),
        SK.kmv_sketch(hi, "v", k=k, group="g"),
        k=k,
        group="g",
    )
    whole = SK.kmv_sketch(values, "v", k=k, group="g")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_kmv_global_plan_is_take_ordered(values):
    plan = SK.kmv_sketch(values, "v", k=16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
