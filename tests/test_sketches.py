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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot value (600×), a warm one (60×), 200 cold singletons
    rows = (
        [Row(v="hot")] * 600 + [Row(v="warm")] * 60 + [Row(v=f"c{i}") for i in range(200)]
    )
    return spark.createDataFrame(rows)


def test_cms_never_undercounts_and_is_tight_when_wide(skewed):
    sk = SK.cms_sketch(skewed, "v", depth=4, width=2048)
    probes = skewed.select("v").distinct()
    est = {
        r["v"]: r["est_count"]
        for r in SK.cms_estimate(sk, probes, "v", depth=4, width=2048).collect()
    }
    true = {"hot": 600, "warm": 60}
    for v, n in true.items():
        assert est[v] >= n          # CMS guarantee: never undercounts
        assert est[v] <= n + 5      # wide sketch: overcount ~0 here
    assert all(est[f"c{i}"] >= 1 for i in range(200))


def test_cms_bounded_size_and_merge(spark, skewed):
    d, w = 4, 64
    whole = SK.cms_sketch(skewed, "v", depth=d, width=w)
    assert whole.count() <= d * w
    rows = (
        [Row(v="hot")] * 600 + [Row(v="warm")] * 60 + [Row(v=f"c{i}") for i in range(200)]
    )
    lo = spark.createDataFrame(rows[:300])
    hi = spark.createDataFrame(rows[300:])
    merged = SK.cms_merge(
        SK.cms_sketch(lo, "v", depth=d, width=w),
        SK.cms_sketch(hi, "v", depth=d, width=w),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_skewed_keys_detects_planted_hot_key(skewed):
    hot = SK.skewed_keys(skewed, "v", threshold_frac=0.2, depth=4, width=1024)
    got = {r["v"] for r in hot.collect()}
    assert got == {"hot"}  # 600/860 ≈ 70% ≥ 20%; warm is 7% — below
    # no-false-negative guarantee at a lower threshold: warm must appear too
    both = SK.skewed_keys(skewed, "v", threshold_frac=0.05, depth=4, width=1024)
    assert {"hot", "warm"} <= {r["v"] for r in both.collect()}


# ---------------------------------------------------------------------------
# Histogram-CDF quantiles
# ---------------------------------------------------------------------------


def test_hist_quantiles_exact_at_fine_resolution(spark):
    # values 0.01..10.00 in 0.01 steps — at resolution 0.01 the histogram
    # is lossless, so quantiles equal the exact lower quantile
    df = spark.createDataFrame([Row(g="a", v=i / 100) for i in range(1, 1001)])
    out = {
        r["q"]: r["value"]
        for r in SK.hist_quantiles(df, "v", [0.5, 0.9], resolution=0.01, group="g").collect()
    }
    assert abs(out[0.5] - 5.00) < 1e-9
    assert abs(out[0.9] - 9.00) < 1e-9


def test_hist_quantiles_error_bounded_by_resolution(spark):
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 100) for _ in range(2000)]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    [r] = SK.hist_quantiles(df, "v", [0.5], resolution=0.5, group="g").collect()
    exact = sorted(vals)[999]  # lower median
    assert abs(r["value"] - exact) <= 0.5 + 1e-9


def test_hist_quantiles_rejects_bad_qs(spark):
    df = spark.createDataFrame([Row(g="a", v=1.0)])
    with pytest.raises(ValueError):
        SK.hist_quantiles(df, "v", [0.0, 0.5])
    with pytest.raises(ValueError):
        SK.hist_quantiles(df, "v", [])


def test_kmv_set_estimates_accuracy_and_exact_small(spark):
    A = spark.createDataFrame([Row(v=i) for i in range(0, 2000)])
    B = spark.createDataFrame([Row(v=i) for i in range(1000, 4000)])
    [r] = SK.kmv_set_estimates(A, B, k=256).collect()
    # true: union 4000, intersection 1000, J = 0.25; k=256 → ~6% std err
    assert abs(r["union_est"] - 4000) / 4000 < 0.25
    assert abs(r["intersection_est"] - 1000) / 1000 < 0.35
    assert abs(r["jaccard_micro"] - 250000) < 100000
    # below-k regime: everything exact
    A2 = spark.createDataFrame([Row(v=i) for i in range(10)])
    B2 = spark.createDataFrame([Row(v=i) for i in range(5, 15)])
    [r2] = SK.kmv_set_estimates(A2, B2, k=256).collect()
    assert (r2["union_est"], r2["intersection_est"]) == (15, 5)
    assert r2["jaccard_micro"] == 333333


def test_kmv_estimate_no_overflow_at_large_k(spark):
    # (k-1)*2^56 > BIGINT for k > 128 — the decimal-div path must hold
    df = spark.createDataFrame([Row(v=i) for i in range(5000)])
    [r] = SK.kmv_distinct(df, "v", k=512).collect()
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.2


# ------------------------------------------------------------------ HLL


def _py_hll(vals, p):
    """Pure-Python mirror of hll_sketch + hll_estimate."""
    import hashlib
    import math

    m, w = 1 << p, 56 - p
    regs = [0] * m
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16)
        b, suf = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if suf == 0 else (w + 1 - suf.bit_length())
        regs[b] = max(regs[b], rho)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    r_cap = w + 1
    s = sum(1 << (r_cap - r) for r in regs)
    raw = (round(alpha * 1e6) * m * m * (1 << r_cap)) // (s * 10**6)
    v0 = sum(1 for r in regs if r == 0)
    if v0 > 0 and 2 * raw <= 5 * m:
        return (m * round(math.log(m / v0) * 1e6)) // 10**6
    return raw


def test_hll_matches_python_mirror_both_branches(spark):
    # 10 distinct -> linear-counting branch; 5000 -> raw harmonic branch
    for n in (10, 5000):
        vals = [f"conv{i}" for i in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "x string")
        got = SK.hll_distinct(df, "x", p=6).first()["est_distinct"]
        assert got == _py_hll(vals, 6)


def test_hll_accuracy(spark):
    # std err ~ 1.04/sqrt(m) = 13% at m=64; 3-sigma bound on 5000 distinct
    df = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "x string")
    got = SK.hll_distinct(df, "x", p=6).first()["est_distinct"]
    assert abs(got - 5000) / 5000 < 0.39


def test_hll_small_range_is_near_exact(spark):
    # n << m: linear counting resolves tiny cardinalities almost exactly
    df = spark.createDataFrame([(f"u{i}",) for i in range(5)] * 3, "x string")
    got = SK.hll_distinct(df, "x", p=8).first()["est_distinct"]
    assert abs(got - 5) <= 1


def test_hll_merge_equals_whole(values):
    """Register-wise max of two halves' sketches == the whole sketch, and
    the estimates agree — per-day sketches combine without rescanning."""
    lo = values.filter(F.col("v") < 300)
    hi = values.filter(F.col("v") >= 300)
    merged = SK.hll_merge(
        SK.hll_sketch(lo, "v", p=6, group="g"),
        SK.hll_sketch(hi, "v", p=6, group="g"),
        group="g",
    )
    whole = SK.hll_sketch(values, "v", p=6, group="g")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    e_m = {r["g"]: r["est_distinct"] for r in SK.hll_estimate(merged, p=6, group="g").collect()}
    e_w = {r["g"]: r["est_distinct"] for r in SK.hll_estimate(whole, p=6, group="g").collect()}
    assert e_m == e_w


def test_hll_grouped_plan_has_no_window(values):
    """The grouped sketch is pure aggregation — unlike grouped KMV there
    is no per-group rank window in the plan."""
    plan = (
        SK.hll_sketch(values, "v", p=6, group="g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_hll_p_validation(values):
    with pytest.raises(ValueError, match="p must"):
        SK.hll_sketch(values, "v", p=3)


def test_clip_to_quantiles_closed_form(spark):
    from log_analysis_spark.operators import sketches

    # values 1..20 at resolution 1: p10 cut = cell 2, p90 cut = cell 18
    rows = [(float(i), "g") for i in range(1, 21)] + [(None, "g")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = sketches.clip_to_quantiles(
        df, "v", p_lo=0.1, p_hi=0.9, resolution=1.0, group="g"
    )
    got = {r["v"]: r["v_clipped"] for r in out.collect()}
    assert got[1.0] == 2.0 and got[2.0] == 2.0      # clipped up
    assert got[19.0] == 18.0 and got[20.0] == 18.0  # clipped down
    assert got[10.0] == 10.0                        # interior untouched
    assert got[None] is None                        # NULL passes through


def test_clip_to_quantiles_groupless_and_guard(spark):
    import pytest as _pytest

    from log_analysis_spark.operators import sketches

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    )
    out = sketches.clip_to_quantiles(df, "v", p_lo=0.2, p_hi=0.8,
                                     resolution=1.0)
    vals = {r["v"]: r["v_clipped"] for r in out.collect()}
    assert vals[1.0] == 2.0 and vals[10.0] == 8.0 and vals[5.0] == 5.0
    with _pytest.raises(ValueError):
        sketches.clip_to_quantiles(df, "v", p_lo=0.9, p_hi=0.1)


# ---------------------------------------------------------------------------
# Exact two-pass heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------


def _hh_exact(pairs: list[tuple[str, int]], k: int) -> dict[str, int]:
    """Ground truth: exact multiset counts filtered at count*k > n."""
    n = sum(c for _, c in pairs)
    return {v: c for v, c in pairs if c * k > n}


def _hh_df(spark, pairs, n_parts):
    rows = [(v,) for v, c in pairs for _ in range(c)]
    return spark.createDataFrame(rows, "item string").repartition(n_parts)


def test_heavy_hitters_exact_across_partitionings(spark):
    # long tail of 400 singletons + a head; the head's membership flips
    # around the n/k boundary — exact semantics must hold for EVERY layout
    pairs = [(f"t{i}", 1) for i in range(400)] + [
        ("hot", 120), ("warm", 40), ("edge", 29), ("cool", 11),
    ]
    k = 20  # n = 600 -> threshold: count > 30
    want = _hh_exact(pairs, k)
    assert want == {"hot": 120, "warm": 40}  # edge=29 and cool=11 excluded
    for n_parts in (1, 3, 32):
        got = {
            r["item"]: r["cnt"]
            for r in SK.heavy_hitters(_hh_df(spark, pairs, n_parts), "item", k).collect()
        }
        assert got == want, n_parts


def test_heavy_hitters_strict_threshold(spark):
    # count == n/k exactly must NOT qualify (strictly-greater semantics)
    pairs = [("a", 5), ("b", 5), ("c", 5), ("d", 5)]  # n=20, k=4 -> need >5
    out = SK.heavy_hitters(_hh_df(spark, pairs, 2), "item", 4).collect()
    assert out == []


def test_mg_candidates_bounded_and_superset(spark):
    pairs = [(f"t{i}", 1) for i in range(300)] + [("hot", 90), ("warm", 60)]
    df = _hh_df(spark, pairs, 5)
    k = 10
    summ = SK.mg_candidates(df, "item", k).collect()
    sentinels = [r for r in summ if r["item"] is None]
    survivors = [r["item"] for r in summ if r["item"] is not None]
    n_parts = df.rdd.getNumPartitions()
    # bound: <= k survivors + 1 sentinel per partition
    assert len(summ) <= (k + 1) * n_parts
    assert sum(r["n_part"] for r in sentinels) == 450
    # superset guarantee: every true heavy hitter survives pass 1
    assert {"hot", "warm"} <= set(survivors)


def test_heavy_hitters_ignores_nulls_and_validates_k(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), ("b",)], "item string"
    )
    # n (non-null) = 4; k=2 -> need > 2: only "a" (3)
    got = {r["item"]: r["cnt"] for r in SK.heavy_hitters(df, "item", 2).collect()}
    assert got == {"a": 3}
    with pytest.raises(ValueError):
        SK.heavy_hitters(df, "item", 0)


def test_hist_quantiles_composite_group(spark):
    from log_analysis_spark.operators import sketches

    rows = [("a", 1, float(v)) for v in range(1, 11)] + [
        ("a", 2, 100.0), ("b", 1, 5.0), ("b", 1, 7.0)
    ]
    df = spark.createDataFrame(rows, "k string, h int, v double")
    out = {
        (r["k"], r["h"], r["q"]): r["value"]
        for r in sketches.hist_quantiles(
            df, "v", [0.5, 1.0], resolution=1.0, group=["k", "h"]
        ).collect()
    }
    # (a,1): 10 values 1..10 -> p50 = ceil(0.5*10)=5th cell = 5.0; max 10.0
    assert out[("a", 1, 0.5)] == 5.0 and out[("a", 1, 1.0)] == 10.0
    # (a,2) singleton; (b,1): p50 = 1st of {5,7} -> 5.0
    assert out[("a", 2, 0.5)] == 100.0
    assert out[("b", 1, 0.5)] == 5.0 and out[("b", 1, 1.0)] == 7.0
    # string single-column group keeps working (back-compat)
    single = sketches.hist_quantiles(df, "v", [1.0], resolution=1.0, group="k")
    assert {r["k"] for r in single.collect()} == {"a", "b"}


def test_with_percentile_closed_form_and_nulls(spark):
    from log_analysis_spark.operators import sketches

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 5.0), ("a", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = sketches.with_percentile(df, "v", resolution=1.0, group="k").collect()
    by = {(r["k"], r["v"]): r["pct_micro"] for r in out}
    # group a: value i sits at i/10
    for i in range(1, 11):
        assert by[("a", float(i))] == (1_000_000 * i) // 10
    assert by[("b", 5.0)] == 1_000_000  # singleton group
    assert by[("a", None)] is None      # NULL annotates NULL
    assert len(out) == len(rows)        # nothing dropped


# ------------------------------------------------ join-size pre-flight


def test_join_size_full_sample_is_exact(spark):
    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 9]], "jk long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 3, 3, 4]], "jk long"
    )
    true_size = left.join(right, "jk").count()
    assert true_size == 3 * 1 + 2 * 3 + 1 * 2

    # hh_k=2: no key clears count*2 > 7, so everything rides the tail —
    # and keep == mod samples every key: the "estimate" is the true size
    r = SK.join_size_estimate(left, right, "jk", mod=8, keep=8, hh_k=2).first()
    assert r["n_hot_keys"] == 0 and r["hot_pairs"] == 0
    assert r["est_join_rows"] == r["sample_pairs"] == true_size
    assert r["n_sample_keys"] == 3
    assert (r["max_key_pairs"], r["hot_key"]) == (6, "2")

    # hh_k=64: every key is heavy (count*64 > 7) — the whole mass is exact
    # through the hot arm, whatever the gate samples
    r = SK.join_size_estimate(left, right, "jk", mod=8, keep=1, hh_k=64).first()
    assert r["n_hot_keys"] == 3 and r["hot_pairs"] == true_size
    assert r["est_join_rows"] == true_size
    assert (r["max_key_pairs"], r["hot_key"]) == (6, "2")


def test_join_size_hot_key_never_missed(spark):
    # 1000 uniform keys x3 left x2 right + one hot key x200 x100: the hot
    # key holds 77% of the join mass; plain key-domain sampling misses it
    # with probability 1 - keep/mod, but the exact heavy-hitter arm cannot
    left = spark.range(1000).selectExpr("id % 1000 AS jk").unionAll(
        spark.range(2000).selectExpr("id % 1000 AS jk")
    ).unionAll(spark.range(200).selectExpr("CAST(777777 AS LONG) AS jk"))
    right = spark.range(2000).selectExpr("id % 1000 AS jk").unionAll(
        spark.range(100).selectExpr("CAST(777777 AS LONG) AS jk")
    )
    r = SK.join_size_estimate(left, right, "jk", mod=256, keep=64).first()
    true_size = left.join(right, "jk").count()
    assert true_size == 6000 + 20000
    # the planted hot key is heavy on both sides -> exact arm, exact argmax
    assert r["n_hot_keys"] == 1 and r["hot_pairs"] == 20000
    assert (r["hot_key"], r["max_key_pairs"]) == ("777777", 20000)
    # uniform tail at 1/4 sampling: within 2x of its 6000 true mass
    assert 3000 <= r["est_join_rows"] - 20000 <= 12000


def test_join_size_nulls_and_validation(spark):
    left = spark.createDataFrame([(None,), ("a",)], "jk string")
    right = spark.createDataFrame([(None,), ("a",)], "jk string")
    r = SK.join_size_estimate(left, right, "jk", mod=1, keep=1, hh_k=2).first()
    assert r["est_join_rows"] == 1  # NULL keys never pair
    with pytest.raises(ValueError):
        SK.join_size_estimate(left, right, "jk", mod=4, keep=0)
    with pytest.raises(ValueError):
        SK.join_size_estimate(left, right, "jk", mod=4, keep=8)
    with pytest.raises(ValueError):
        SK.join_size_estimate(left, right, "jk", hh_k=1)


def test_join_size_self_join_fast_path_matches_two_copies(spark):
    ev = spark.range(3000).selectExpr("CAST(id % 37 AS STRING) AS jk").unionAll(
        spark.range(600).selectExpr("'hot' AS jk")
    )
    ev2 = spark.range(3000).selectExpr("CAST(id % 37 AS STRING) AS jk").unionAll(
        spark.range(600).selectExpr("'hot' AS jk")
    )
    a = SK.join_size_estimate(ev, ev, "jk", hh_k=32).first()    # self-join path
    b = SK.join_size_estimate(ev, ev2, "jk", hh_k=32).first()   # general path
    assert tuple(a) == tuple(b)
    assert a["hot_key"] == "hot" and a["max_key_pairs"] == 600 * 600


def test_robust_outliers_planted(spark):
    rows = (
        # group A: bulk at 10.00 with slight jitter + one wild spike;
        # the spike inflates a mean/sigma z-test's sigma, MAD ignores it
        [("A", 10.0 + 0.01 * (i % 3)) for i in range(20)]
        + [("A", 500.0)]
        # group B: exactly constant -> MAD 0 -> ANY deviation flags
        + [("B", 7.0)] * 10
        + [("B", 7.5)]
        # a NULL value rides through unflagged
        + [("A", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = SK.robust_outliers(df, "v", resolution=0.01, k_milli=3500, group="g")
    flagged = [(r["g"], r["v"]) for r in out.filter("is_outlier").collect()]
    assert flagged == [("A", 500.0)] + [("B", 7.5)]
    nulls = out.filter("v IS NULL").collect()
    assert len(nulls) == 1 and not nulls[0]["is_outlier"]
    assert nulls[0]["dev_cells"] is None
    # the jittered bulk stays unflagged (dev <= 2 cells, MAD >= ... )
    bulk = out.filter("g = 'A' AND v < 100 AND v IS NOT NULL")
    assert bulk.filter("is_outlier").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        SK.robust_outliers(df, "v", k_milli=-1)
