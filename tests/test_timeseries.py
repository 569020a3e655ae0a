"""Semantics tests for operators/timeseries.py (as-of join, hopping
windows, funnel, cohort retention) — the properties the DuckDB oracles
can't articulate: tolerance nulls, match atomicity under NULL payload
values, greedy one-step-per-event funnel advance, window conservation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from log_analysis_spark.operators import timeseries as T


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lid=10, ts=_ts(5)),
            Row(k=1, lid=11, ts=_ts(20)),
            Row(k=1, lid=12, ts=_ts(2)),   # before any right row
            Row(k=2, lid=20, ts=_ts(9)),   # key with no right rows at all
            Row(k=3, lid=30, ts=_ts(7)),   # exactly equal ts → inclusive
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rid=100, ts=_ts(4), v="a"),
            Row(k=1, rid=101, ts=_ts(6), v=None),  # NULL payload value
            Row(k=1, rid=102, ts=_ts(6), v="c"),   # same ts → rid tie-break
            Row(k=3, rid=300, ts=_ts(7), v="e"),
        ]
    )
    return left, right


def _asof_map(left, right, **kw):
    out = T.asof_join(left, right, "k", ["v", "rid"], right_order="rid", **kw)
    return {r["lid"]: r.asDict() for r in out.collect()}


def test_asof_basic_tiebreak_inclusive_and_misses(asof_frames):
    left, right = asof_frames
    m = _asof_map(left, right)
    # ts=5: only rid=100 (ts=4) is at-or-before
    assert m[10]["asof_rid"] == 100 and m[10]["asof_v"] == "a"
    # ts=20: rids 101 and 102 share ts=6 → greatest rid wins deterministically
    assert m[11]["asof_rid"] == 102 and m[11]["asof_v"] == "c"
    # ts=2: no right row at-or-before → all-NULL match
    assert m[12]["asof_rid"] is None and m[12]["asof_ts"] is None
    # key 2 has no right rows at all
    assert m[20]["asof_rid"] is None
    # equal timestamps match (inclusive, ASOF JOIN semantics)
    assert m[30]["asof_rid"] == 300


def test_asof_null_payload_is_atomic(spark):
    """A NULL inside a matched right row's payload must NOT make the carry
    fall back to an older right row — the struct packing keeps the match
    atomic (last(ignorenulls) skips whole rows, never single columns)."""
    left = spark.createDataFrame([Row(k=1, lid=1, ts=_ts(10))])
    right = spark.createDataFrame(
        [
            Row(k=1, rid=1, ts=_ts(1), v="old"),
            Row(k=1, rid=2, ts=_ts(9), v=None),  # newest match, NULL value
        ]
    )
    m = _asof_map(left, right)
    assert m[1]["asof_rid"] == 2
    assert m[1]["asof_v"] is None  # the NULL itself, not "old"


def test_asof_tolerance_nulls_stale_matches(asof_frames):
    left, right = asof_frames
    m = _asof_map(left, right, tolerance_sec=120)
    assert m[10]["asof_rid"] == 100        # 60s lag ≤ 120s
    assert m[11]["asof_rid"] is None       # 14min lag > 120s → nulled
    assert m[30]["asof_rid"] == 300        # 0s lag


def test_asof_requires_order_col(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError):
        T.asof_join(left, right, "k", ["v"], right_order=None)


def test_sliding_counts_conservation_and_multiplicity(spark):
    rows = [Row(ts=_ts(m, s), t="x") for m, s in [(0, 1), (14, 59), (15, 0), (59, 59)]]
    df = spark.createDataFrame(rows)
    out = T.sliding_counts(df, "ts", 3600, 900, group="t").collect()
    # each event appears in exactly window/slide = 4 windows
    assert sum(r["n"] for r in out) == len(rows) * 4
    # window bounds are slide-aligned and window-length apart
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600
        assert r["window_start"].minute % 15 == 0


def test_sliding_rejects_non_divisible(spark):
    df = spark.createDataFrame([Row(ts=_ts(0), t="x")])
    with pytest.raises(ValueError):
        T.sliding_counts(df, "ts", 3600, 700)


def _funnel(spark, rows, steps):
    df = spark.createDataFrame(rows)
    out = T.funnel_steps(df, "u", "ts", "t", steps, "eid")
    return {r["u"]: r["steps_completed"] for r in out.collect()}


def test_funnel_requires_order(spark):
    rows = [
        # u=1 completes in order; u=2 has the steps out of order
        Row(u=1, eid=1, ts=_ts(1), t="a"),
        Row(u=1, eid=2, ts=_ts(2), t="b"),
        Row(u=1, eid=3, ts=_ts(3), t="c"),
        Row(u=2, eid=4, ts=_ts(1), t="c"),
        Row(u=2, eid=5, ts=_ts(2), t="b"),
        Row(u=2, eid=6, ts=_ts(3), t="a"),
    ]
    m = _funnel(spark, rows, ["a", "b", "c"])
    assert m == {1: 3, 2: 1}


def test_funnel_greedy_single_advance_per_event(spark):
    """One event advances the funnel at most one step even when its type
    equals several upcoming steps (a-a funnel needs TWO a events)."""
    rows = [
        Row(u=1, eid=1, ts=_ts(1), t="a"),
        Row(u=2, eid=2, ts=_ts(1), t="a"),
        Row(u=2, eid=3, ts=_ts(2), t="a"),
    ]
    m = _funnel(spark, rows, ["a", "a"])
    assert m == {1: 1, 2: 2}


def test_funnel_tie_break_on_order_col(spark):
    """Equal timestamps: scan order is (ts, eid), so the 'b' with the lower
    eid at the same ts as the 'a' does NOT count (it precedes the match)."""
    rows = [
        Row(u=1, eid=5, ts=_ts(1), t="a"),
        Row(u=1, eid=3, ts=_ts(1), t="b"),  # before the a in scan order
        Row(u=1, eid=7, ts=_ts(1), t="b"),  # after the a → matches
    ]
    m = _funnel(spark, rows, ["a", "b"])
    assert m == {1: 2}


def test_cohort_retention_offsets(spark):
    wk = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        Row(u=1, ts=wk),
        Row(u=1, ts=wk + dt.timedelta(days=7, hours=3)),
        Row(u=1, ts=wk + dt.timedelta(days=21)),
        Row(u=2, ts=wk + dt.timedelta(days=2)),  # same cohort week as u=1
        Row(u=3, ts=wk + dt.timedelta(days=8)),  # next cohort
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in T.cohort_retention(df, "u", "ts").collect()
    }
    wk2 = wk + dt.timedelta(days=7)
    assert out == {
        (wk, 0): 2,
        (wk, 1): 1,
        (wk, 3): 1,
        (wk2, 0): 1,
    }


def test_rolling_stats_window_semantics(spark):
    rows = [
        Row(u=1, eid=i, ts=_ts(i), v=float(i)) for i in range(1, 6)
    ] + [Row(u=2, eid=10, ts=_ts(1), v=100.0)]
    df = spark.createDataFrame(rows)
    out = {
        (r["u"], r["eid"]): r.asDict()
        for r in T.rolling_stats(df, "u", "ts", "v", n=3, order_col="eid").collect()
    }
    # u=1, eid=4 → trailing 3 of values [2, 3, 4]
    r = out[(1, 4)]
    assert r["roll_n"] == 3
    assert r["roll_sum_micro"] == 9_000_000
    assert r["roll_min"] == 2.0 and r["roll_max"] == 4.0
    # first event sees only itself
    r1 = out[(1, 1)]
    assert r1["roll_n"] == 1 and r1["roll_sum_micro"] == 1_000_000
    # entities never leak into each other
    assert out[(2, 10)]["roll_n"] == 1


def test_funnel_times_match_points(spark):
    rows = [
        Row(u=1, eid=1, ts=_ts(1), t="a"),
        Row(u=1, eid=2, ts=_ts(2), t="x"),
        Row(u=1, eid=3, ts=_ts(5), t="b"),
        Row(u=2, eid=4, ts=_ts(3), t="b"),  # b before any a → no match
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["u"]: r.asDict()
        for r in T.funnel_times(df, "u", "ts", "t", ["a", "b"], "eid").collect()
    }
    assert out[1]["steps_completed"] == 2
    assert out[1]["t1"] == _ts(1) and out[1]["t2"] == _ts(5)
    assert out[2]["steps_completed"] == 0
    assert out[2]["t1"] is None and out[2]["t2"] is None


def test_transition_counts(spark):
    from log_analysis_spark.operators import windows_ops

    rows = [
        Row(k=1, i=1, s="a"),
        Row(k=1, i=2, s="b"),
        Row(k=1, i=3, s="b"),
        Row(k=2, i=1, s="b"),  # first row of a key is never a to-transition
        Row(k=2, i=2, s="a"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in windows_ops.transition_counts(df, "k", ["i"], "s").collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_asof_forward_direction(asof_frames):
    left, right = asof_frames
    m = _asof_map(left, right, direction="forward")
    # lid=12 at ts=2: nearest at-or-after is rid=100 (ts=4)
    assert m[12]["asof_rid"] == 100
    # lid=10 at ts=5: rids 101/102 share ts=6 → SMALLEST rid wins forward
    assert m[10]["asof_rid"] == 101
    # lid=11 at ts=20: nothing at-or-after
    assert m[11]["asof_rid"] is None
    # equal ts inclusive both directions
    assert m[30]["asof_rid"] == 300
    # forward tolerance: rid=100 is 120s ahead of lid=12 → kept at 120, cut at 60
    t = _asof_map(left, right, direction="forward", tolerance_sec=120)
    assert t[12]["asof_rid"] == 100
    t2 = _asof_map(left, right, direction="forward", tolerance_sec=60)
    assert t2[12]["asof_rid"] is None
    import pytest as _pt

    with _pt.raises(ValueError):
        _asof_map(left, right, direction="sideways")


def test_downsample_ohlc_semantics(spark):
    rows = [
        Row(k="a", eid=1, ts=_ts(0, 10), v=5.0),   # open of bucket 0
        Row(k="a", eid=2, ts=_ts(0, 10), v=9.0),   # same ts → eid orders it
        Row(k="a", eid=3, ts=_ts(10), v=1.0),      # low
        Row(k="a", eid=4, ts=_ts(14, 59), v=7.0),  # close of bucket 0
        Row(k="a", eid=5, ts=_ts(15), v=2.0),      # next 15-min bucket
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["bucket_start"].minute: r.asDict()
        for r in T.downsample_ohlc(df, "k", "ts", "v", "eid", 900).collect()
    }
    b0 = out[0]
    assert (b0["open"], b0["close"]) == (5.0, 7.0)  # scan order, not extrema
    assert (b0["low"], b0["high"]) == (1.0, 9.0)
    assert b0["n"] == 4 and b0["sum_micro"] == 22_000_000
    assert out[15]["open"] == out[15]["close"] == 2.0


def test_quantile_anomalies_flags_only_tail(spark):
    rows = [Row(g="a", eid=i, v=float(i)) for i in range(1, 101)] + [
        Row(g="b", eid=200, v=5.0)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["eid"]
        for r in T.quantile_anomalies(df, "v", "g", q=0.9, resolution=1.0).collect()
    }
    # group a: p90 cell = 90 → values strictly above 90 flagged
    assert got == set(range(91, 101))


# ------------------------------------------------------------- burst_hours


def _burst_events(spark, counts, key="error"):
    """One event row per count unit: hour i gets counts[i] events (0 =
    silent hour, exercising the dense zero-fill spine)."""
    base = dt.datetime(2024, 3, 1)
    rows = [
        Row(key=key, ts=base + dt.timedelta(hours=i, seconds=j))
        for i, c in enumerate(counts)
        for j in range(c)
    ]
    return spark.createDataFrame(rows)


def test_burst_hours_flags_planted_spike_and_outage(spark):
    """26 steady hours at 4/h, a 40-event spike, then — a full window
    later, so the spike no longer inflates the trailing variance — a
    total outage hour (present ONLY via the zero-filled spine): exactly
    the spike and the drop flag, nothing else.  (An outage RIGHT AFTER a
    spike is correctly masked: the spike blows up the baseline's σ.)"""
    counts = [4] * 26 + [40] + [4] * 24 + [0] + [4] * 2
    out = T.burst_hours(_burst_events(spark, counts), "ts", "key",
                        n_trail=24, z=3)
    flagged = {
        (r["hour_id"] - out.agg(F.min("hour_id")).first()[0], r["anomaly"])
        for r in out.filter(F.col("anomaly").isNotNull()).collect()
    }
    assert flagged == {(26, "spike"), (51, "drop")}
    # the outage hour exists on the spine with cnt 0
    assert out.count() == len(counts)


def test_burst_hours_warmup_never_flags(spark):
    """Hours without a full trailing baseline are never flagged, however
    extreme — 10 hours of history can't support a 24h z-test."""
    counts = [4] * 9 + [400]
    out = T.burst_hours(_burst_events(spark, counts), "ts", "key",
                        n_trail=24, z=3)
    assert out.filter(F.col("anomaly").isNotNull()).count() == 0


def test_burst_hours_constant_baseline_flags_any_deviation(spark):
    """var = 0 (perfectly constant baseline): any deviation flags — the
    case a float z-score would divide by zero on."""
    counts = [4] * 24 + [5]
    out = T.burst_hours(_burst_events(spark, counts), "ts", "key",
                        n_trail=24, z=3)
    [r] = out.filter(F.col("anomaly").isNotNull()).collect()
    assert r["anomaly"] == "spike" and r["cnt"] == 5


def test_burst_hours_threshold_is_exact_boundary(spark):
    """The integer test is strict >: a deviation of exactly z·σ does NOT
    flag.  Baseline alternating 3/5 (mean 4, var 1): z=3 ⇒ flag iff
    |c−4| > 3 ⇒ c=7 silent, c=8 flags."""
    for spike, expect in ((7, 0), (8, 1)):
        counts = [3, 5] * 12 + [spike]
        out = T.burst_hours(_burst_events(spark, counts), "ts", "key",
                            n_trail=24, z=3)
        assert out.filter(F.col("anomaly").isNotNull()).count() == expect


def test_incidents_coalesce_consecutive_hours(spark):
    """A 3-hour sustained spike then, after one quiet hour, a drop →
    exactly TWO incidents: the 3-hour spike (peak = max cnt) and the
    1-hour drop; a mixed-side run reports both sides sorted."""
    counts = [4] * 24 + [40, 44, 41] + [4] + [0]
    out = T.burst_hours(_burst_events(spark, counts), "ts", "key",
                        n_trail=24, z=3)
    flagged = out.filter(F.col("anomaly").isNotNull())
    base = out.agg(F.min("hour_id")).first()[0]
    inc = {
        (r["start_hour"] - base, r["end_hour"] - base, r["n_hours"],
         r["peak_cnt"], r["sides"])
        for r in T.incidents(flagged, "key").collect()
    }
    # hours 24-26 spike (44 peak); hour 27 (cnt 4) is back inside the
    # inflated-variance baseline; hour 28's 0 still reads as a drop only
    # if variance allows — recompute expectations from the actual flags
    got_flags = sorted(
        (r["hour_id"] - base, r["anomaly"])
        for r in flagged.collect()
    )
    assert got_flags[0:3] == [(24, "spike"), (25, "spike"), (26, "spike")]
    spike_inc = (24, 26, 3, 44, "spike")
    assert spike_inc in inc
    # every incident's span is consistent
    for s, e, n, _, _ in inc:
        assert e - s + 1 == n


def test_incidents_mixed_sides_in_one_run(spark):
    """Adjacent flagged hours of OPPOSITE sides still form one incident,
    with sides = 'drop,spike' (sorted)."""
    rows = [
        ("k", 100, 40, "spike"),
        ("k", 101, 0, "drop"),
        ("k", 105, 50, "spike"),
    ]
    flagged = spark.createDataFrame(
        rows, "key string, hour_id long, cnt long, anomaly string"
    )
    inc = {
        (r["start_hour"], r["end_hour"], r["n_hours"], r["peak_cnt"], r["sides"])
        for r in T.incidents(flagged, "key").collect()
    }
    assert inc == {(100, 101, 2, 40, "drop,spike"), (105, 105, 1, 50, "spike")}


def _cusum_mirror(counts, k_milli, h_mult):
    """Pure-Python integer mirror of cusum_from_counts over one key's
    dense (hour, cnt) list: the literal max(0, ...) recurrence — the
    Spark path uses the reflection identity instead, so agreement here
    proves the identity, not just the arithmetic."""
    n, s = len(counts), sum(counts)
    up = dn = 0
    out = []
    for c in counts:
        up = max(0, up + (1000 * n * c - (1000 + k_milli) * s))
        dn = max(0, dn + ((1000 - k_milli) * s - 1000 * n * c))
        drift = (
            "up" if up > h_mult * 1000 * s
            else "down" if dn > h_mult * 1000 * s
            else None
        )
        out.append((up // s, dn // s, drift))
    return out


def test_cusum_matches_recurrence_mirror(spark):
    """The reflection-identity windows equal the literal max(0,·)
    recurrence on a deterministic pseudo-random counts series."""
    counts = [(i * 7919 + 13) % 23 for i in range(60)]  # 0..22, seeded
    rows = [("k", 100 + i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "key string, hour_id long, cnt long")
    got = {
        r["hour_id"]: (r["cusum_up_mm"], r["cusum_down_mm"], r["drift"])
        for r in T.cusum_from_counts(df, "key", k_milli=300, h_mult=2).collect()
    }
    want = _cusum_mirror(counts, 300, 2)
    assert got == {100 + i: want[i] for i in range(60)}


def _hourly_events(spark, plan, key="error"):
    """plan = [(hour_id, cnt)] -> events rows (cnt distinct ts inside
    each hour)."""
    import datetime as dt

    rows = []
    for hour_id, cnt in plan:
        for j in range(cnt):
            ts = dt.datetime.utcfromtimestamp(hour_id * 3600 + 7 * j + 1)
            rows.append((ts, key))
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def test_cusum_catches_ramp_burst_misses(spark):
    """A slow ramp (+1 count every 6 hours on an alternating 9/11
    baseline) never clears the 3-sigma per-hour z-test but accumulates
    past the CUSUM threshold — the drift class of incident this operator
    exists for."""
    base = 480000
    plan = [(base + i, 9 if i % 2 else 11) for i in range(48)]
    plan += [(base + 48 + i, 11 + (i // 6)) for i in range(36)]  # 11..16
    ev = _hourly_events(spark, plan)
    burst = T.burst_hours(ev, "ts", "event_type", n_trail=24, z=3)
    assert burst.filter(F.col("anomaly").isNotNull()).count() == 0
    cus = T.cusum_hours(ev, "ts", "event_type", k_milli=100, h_mult=2)
    flagged = [r["hour_id"] for r in
               cus.filter(F.col("drift") == "up").collect()]
    assert flagged, "ramp not detected"
    assert min(flagged) >= base + 48  # only inside the drift period
    # and the detector is two-sided: a mirrored downward ramp flags 'down'
    plan_dn = [(base + i, 9 if i % 2 else 11) for i in range(48)]
    plan_dn += [(base + 48 + i, max(0, 9 - (i // 6))) for i in range(36)]
    cus_dn = T.cusum_hours(
        _hourly_events(spark, plan_dn), "ts", "event_type",
        k_milli=100, h_mult=2,
    )
    dn_flagged = [r["hour_id"] for r in
                  cus_dn.filter(F.col("drift") == "down").collect()]
    assert dn_flagged and min(dn_flagged) >= base + 48


def test_cusum_rejects_bad_slack(spark):
    df = spark.createDataFrame([("k", 1, 1)], "key string, hour_id long, cnt long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.cusum_from_counts(df, "key", k_milli=1000)


def _py_pettitt(counts):
    """Brute-force Pettitt mirror: U_t = sum_{i<=t} sum_{j>t} sgn(c_i - c_j)
    directly from the definition (the operator uses the rank identity)."""
    n = len(counts)
    best = None
    for t in range(1, n):
        u = sum(
            (counts[i] > counts[j]) - (counts[i] < counts[j])
            for i in range(t)
            for j in range(t, n)
        )
        cand = (abs(u), -t)  # max |U|, earliest t on ties
        if best is None or cand > (best[0], -best[1]):
            best = (abs(u), t)
    return best  # (u_abs, t)


def test_pettitt_matches_bruteforce_definition(spark):
    """Rank-identity U equals the O(n^2) sgn double sum, the argmax hour
    localizes the planted shift, and the means flank it."""
    base = 500_000
    plan = [(base + i, 10 + (i % 3)) for i in range(30)]
    plan += [(base + 30 + i, 25 + (i % 3)) for i in range(30)]
    out = T.pettitt_changepoint(
        _hourly_events(spark, plan), "ts", "event_type"
    ).collect()
    assert len(out) == 1
    r = out[0]
    counts = [c for _, c in plan]
    u_abs, t = _py_pettitt(counts)
    assert r["u_abs"] == u_abs
    assert r["cp_hour"] == base + t - 1  # last pre-shift hour (1-based t)
    assert r["n_hours"] == 60
    assert r["mean_before_mc"] == (1000 * sum(counts[:t])) // t
    assert r["mean_after_mc"] == (1000 * sum(counts[t:])) // (60 - t)
    assert bool(r["significant"])  # a 10->25 level shift over 60h is loud


def test_pettitt_no_shift_is_insignificant_and_ties_break_earliest(spark):
    """A flat series never clears alpha; constant counts tie every U_t at
    the same |U| so the earliest t wins deterministically."""
    base = 600_000
    flat = [(base + i, 7) for i in range(40)]
    out = T.pettitt_changepoint(
        _hourly_events(spark, flat), "ts", "event_type"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert not bool(r["significant"])
    assert r["u_abs"] == 0 and r["cp_hour"] == base  # t=1, all U_t = 0


def test_pettitt_fills_spine_gaps_with_zeros(spark):
    """Missing hours count as 0 rows/hour — a key that goes quiet IS a
    level shift, and the spine makes that visible to the rank test."""
    base = 700_000
    plan = [(base + i, 12) for i in range(20)]
    plan += [(base + 20 + i, 12) for i in range(20) if i % 4 == 0]  # sparse
    out = T.pettitt_changepoint(
        _hourly_events(spark, plan), "ts", "event_type"
    ).collect()
    r = out[0]
    # dense spine: 20 + 17 hours (last planted hour = base+36)
    assert r["n_hours"] == 37
    counts = [12] * 20 + [12 if i % 4 == 0 else 0 for i in range(17)]
    u_abs, t = _py_pettitt(counts)
    assert r["u_abs"] == u_abs and r["cp_hour"] == base + t - 1


def test_pettitt_rejects_bad_alpha(spark):
    df = spark.createDataFrame(
        [("k", 1, 1)], "key string, hour_id long, cnt long"
    )
    with pytest.raises(ValueError):
        T.pettitt_from_counts(df, "key", alpha_micro=0)


# ---------------------------------------------------------------------------
# time_weighted_avg / hourly_gauge + gapfill_linear / seasonal anomalies
# ---------------------------------------------------------------------------


def _hts(hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def test_time_weighted_avg_closed_form(spark):
    # key "a": v=10 for 60s, v=30 for 30s, last sample weightless
    #   twa = (10e6*60e6 + 30e6*30e6) / 90e6 = 16_666_666 (truncated)
    rows = [
        ("a", 1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        ("a", 2, dt.datetime(2024, 1, 1, 0, 1, 0), 30.0),
        ("a", 3, dt.datetime(2024, 1, 1, 0, 1, 30), 999.0),
        ("b", 4, dt.datetime(2024, 1, 1, 0, 0, 0), 5.0),  # single sample
    ]
    df = spark.createDataFrame(rows, "k string, eid long, ts timestamp, v double")
    out = {
        r["k"]: r
        for r in T.time_weighted_avg(df, "ts", "k", "v", "eid").collect()
    }
    assert out["a"]["span_us"] == 90_000_000
    assert out["a"]["twa_micro"] == (10_000_000 * 60 + 30_000_000 * 30) // 90
    assert out["a"]["n_events"] == 3
    # a single sample integrates over a zero-length interval: no average
    assert out["b"]["span_us"] == 0 and out["b"]["twa_micro"] is None


def test_time_weighted_avg_ties_carry_no_weight(spark):
    # two samples at the SAME timestamp: the 0-length segment contributes
    # nothing whichever one the tie-break orders first
    rows = [
        ("a", 1, dt.datetime(2024, 1, 1, 0, 0, 0), 100.0),
        ("a", 2, dt.datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", 3, dt.datetime(2024, 1, 1, 0, 0, 10), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, eid long, ts timestamp, v double")
    row = T.time_weighted_avg(df, "ts", "k", "v", "eid").collect()[0]
    # eid=1 holds [0,0) (weight 0), eid=2 holds [0,10s): twa == 0
    assert row["span_us"] == 10_000_000 and row["twa_micro"] == 0


def test_gapfill_linear_interpolates_interior_gaps(spark):
    # observed hours 0 (v=10.0) and 3 (v=40.0); hours 1, 2 interpolate
    rows = [
        ("k", _hts(0), 8.0), ("k", _hts(0, 30), 12.0),   # mean 10.0
        ("k", _hts(3), 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    gauge = T.hourly_gauge(df, "ts", "k", "v")
    out = {r["hour_id"]: r for r in T.gapfill_linear(gauge).collect()}
    base = min(out)
    assert len(out) == 4
    assert out[base]["v_micro"] == 10_000_000 and not out[base]["interpolated"]
    assert out[base + 1]["v_micro"] == 20_000_000 and out[base + 1]["interpolated"]
    assert out[base + 2]["v_micro"] == 30_000_000 and out[base + 2]["interpolated"]
    assert out[base + 3]["v_micro"] == 40_000_000 and not out[base + 3]["interpolated"]


def test_gapfill_linear_truncates_like_div(spark):
    # gap of 3 between 0 and 10 micro-units: fills are (10*1)div3, (10*2)div3
    rows = [("k", _hts(0), 0.000000), ("k", _hts(3), 0.000010)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["hour_id"]: r["v_micro"] for r in
           T.gapfill_linear(T.hourly_gauge(df, "ts", "k", "v")).collect()}
    base = min(out)
    assert [out[base + i] for i in range(4)] == [0, 3, 6, 10]


def test_gapfill_dense_series_has_no_interpolation(spark):
    rows = [("k", _hts(h), float(h)) for h in range(4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = T.gapfill_linear(T.hourly_gauge(df, "ts", "k", "v")).collect()
    assert len(out) == 4 and not any(r["interpolated"] for r in out)


def test_seasonal_anomalies_planted_spike(spark):
    # 10 full days, period=2: even hours always carry 4 events, odd hours
    # always 2 — except one even hour on day 7 spikes to 12.  Every spine
    # cell is observed, so the slot history is constant and MAD = 0: any
    # deviation flags, and only the spike deviates.
    rows = []
    for day in range(10):
        for h in range(24):
            n = 4 if h % 2 == 0 else 2
            if day == 7 and h == 6:
                n = 12
            for i in range(n):
                rows.append(("k", dt.datetime(2024, 1, 1 + day, h, i + 1)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = T.seasonal_anomalies(df, "ts", "k", n_mad=3, period=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["slot"] == 0 and r["cnt"] == 12 and r["med2"] == 8 and r["mad4"] == 0


def test_seasonal_anomalies_respects_mad_scale(spark):
    # alternating 10/20 within the slot -> MAD 5: a 24 is NOT anomalous at
    # n_mad=3 (|24-15|=9 <= 15) but a 40 is (25 > 15)
    rows = []
    for day in range(8):
        n = 10 if day % 2 == 0 else 20
        if day == 7:
            n = 40
        for i in range(n):
            rows.append(("k", dt.datetime(2024, 1, 1 + day, 0, i + 1)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = T.seasonal_anomalies(df, "ts", "k", n_mad=3, period=24)
    flagged = [r for r in out.collect() if r["slot"] == 0]
    assert [r["cnt"] for r in flagged] == [40]


# ---------------------------------------------------------------------------
# Mann-Kendall + Theil-Sen trend test
# ---------------------------------------------------------------------------


def _mk_mirror(xs, z_milli=1960):
    """Pure-Python Mann-Kendall + Theil-Sen over one dense hourly series."""
    n = len(xs)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            dy, dx = xs[j] - xs[i], j - i
            s += (dy > 0) - (dy < 0)
            q, r = divmod(abs(dy) * 1_000_000, dx)
            slopes.append(q if dy >= 0 else -q)
    slopes.sort()
    m = len(slopes)
    med2 = slopes[(m - 1) // 2] + slopes[m // 2]
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_d = n * (n - 1) * (2 * n + 5) - tie_term
    sig = s != 0 and 18 * 10**6 * (abs(s) - 1) ** 2 > z_milli**2 * var_d
    return s, var_d, med2, sig


def _trend_df(spark, xs, key="k"):
    rows = []
    for h, c in enumerate(xs):
        for i in range(c):
            rows.append((key, dt.datetime(2024, 1, 1, 0, 0, 0)
                         + dt.timedelta(hours=h, seconds=i + 1)))
    return spark.createDataFrame(rows, "k string, ts timestamp")


def test_trend_matches_bruteforce_mirror(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]  # ties + wobble
    row = T.trend_test(_trend_df(spark, xs), "ts", "k").collect()[0]
    s, var_d, med2, sig = _mk_mirror(xs)
    assert (row["s_stat"], row["var_d"], row["slope_med2"],
            row["significant"]) == (s, var_d, med2, sig)
    assert row["n_hours"] == len(xs)


def test_trend_planted_ramp_is_significant_up(spark):
    xs = [2 + 3 * h for h in range(30)]  # strict ramp, slope 3/hour
    row = T.trend_test(_trend_df(spark, xs), "ts", "k").collect()[0]
    n = len(xs)
    assert row["s_stat"] == n * (n - 1) // 2  # every pair concordant
    assert row["direction"] == "up" and row["significant"]
    assert row["slope_med2"] == 2 * 3_000_000  # exactly 3e6 micro/hour


def test_trend_flat_and_single_hour(spark):
    row = T.trend_test(_trend_df(spark, [5] * 12), "ts", "k").collect()[0]
    assert (row["s_stat"], row["slope_med2"], row["direction"],
            row["significant"]) == (0, 0, "flat", False)
    one = T.trend_test(_trend_df(spark, [7]), "ts", "k").collect()[0]
    assert one["n_hours"] == 1 and one["slope_med2"] is None
    assert one["direction"] == "flat" and not one["significant"]


def test_trend_slope_truncates_toward_zero(spark):
    # hours 0..2 with counts 4,4,3: the (0,2) pair slope is -1e6/2 =
    # -500000; the (0,1)/(1,2) pairs are 0 and -1e6.  med2 must use
    # trunc-toward-zero division for the negative slope: pairs sorted are
    # [-1000000, -500000, 0] -> med2 = 2 * -500000.
    row = T.trend_test(_trend_df(spark, [4, 4, 3]), "ts", "k").collect()[0]
    assert row["slope_med2"] == -1_000_000
    # and a non-exact negative: counts 3,1 over a 2-hour gap via dense
    # spine zero-fill: xs [3, 0, 1] -> pair (0,2): dy=-2 dx=2 -> -1000000;
    # (0,1): -3000000; (1,2): +1000000 -> med2 = 2 * -1000000
    row2 = T.trend_test(_trend_df(spark, [3, 0, 1]), "ts", "k").collect()[0]
    assert row2["slope_med2"] == -2_000_000
    s, var_d, med2, _ = _mk_mirror([3, 0, 1])
    assert (row2["s_stat"], row2["var_d"], row2["slope_med2"]) == (s, var_d, med2)


def test_trend_guards(spark):
    df = _trend_df(spark, [1, 2, 3, 4, 5])
    with pytest.raises(ValueError):
        T.trend_test(df, "ts", "k", z_milli=-1)
    with pytest.raises(ValueError):
        T.trend_test(df, "ts", "k", max_hours=1)
    with pytest.raises(Exception, match="max_hours"):
        T.trend_test(df, "ts", "k", max_hours=3).collect()


# ---------------------------------------------------------------------------
# Lag-k autocorrelation
# ---------------------------------------------------------------------------


def _acf_mirror(xs, k):
    n, S = len(xs), sum(xs)
    SS = sum(x * x for x in xs)
    P = sum(xs[t] * xs[t + k] for t in range(n - k))
    A = sum(xs[: n - k])
    B = sum(xs[k:])
    num = n * n * P - n * S * (A + B) + (n - k) * S * S
    den = n * n * SS - n * S * S
    if den <= 0 or n <= k:
        return None
    q, r = divmod(1_000_000 * abs(num), den)
    return q if num >= 0 else -q  # trunc toward zero


def _hourly_unit_events(spark, counts, key="k"):
    """One event row per unit of each hourly count, hours are contiguous."""
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((key, dt.datetime(2024, 1, 1, tzinfo=None)
                         + dt.timedelta(hours=h, minutes=1), eid))
            eid += 1
    return spark.createDataFrame(rows, "key string, ts timestamp, i long")


def test_autocorrelation_matches_bruteforce(spark):
    from log_analysis_spark.operators import timeseries as TS

    # period-3 sawtooth plus a gap hour (zero-filled by the spine)
    counts = [5, 1, 0, 5, 1, 0, 5, 1, 0, 5, 1, 0]
    df = _hourly_unit_events(spark, counts)
    out = {
        r["lag"]: (r["n_hours"], r["acf_micro"])
        for r in TS.autocorrelation(df, "ts", "key", lags=(1, 3)).collect()
    }
    # NOTE the spine runs first-event-hour .. last-event-hour: trailing
    # zero hours have no events, so the observed series drops them
    obs = counts[: max(i for i, c in enumerate(counts) if c) + 1]
    assert out[1] == (len(obs), _acf_mirror(obs, 1))
    assert out[3] == (len(obs), _acf_mirror(obs, 3))
    assert out[3][1] > 700_000       # strong period-3 self-similarity
    assert out[1][1] < 0             # sawtooth anti-correlates at lag 1


def test_autocorrelation_constant_and_guards(spark):
    from log_analysis_spark.operators import timeseries as TS

    df = _hourly_unit_events(spark, [4, 4, 4, 4])
    rows = TS.autocorrelation(df, "ts", "key", lags=(1,)).collect()
    assert rows[0]["acf_micro"] is None   # zero variance
    with pytest.raises(ValueError):
        TS.autocorrelation(df, "ts", "key", lags=())
    with pytest.raises(ValueError):
        TS.autocorrelation(df, "ts", "key", lags=(0,))


# ---------------------------------------------------------------------------
# Rolling distinct active users
# ---------------------------------------------------------------------------


def test_rolling_active_users_matches_bruteforce(spark):
    from log_analysis_spark.operators import timeseries as TS

    base = dt.datetime(2024, 3, 1)
    # (user, day) presence: u1 daily, u2 every 3rd day, u3 once
    ev = []
    for d in range(10):
        ev.append((1, base + dt.timedelta(days=d, hours=2)))
        ev.append((1, base + dt.timedelta(days=d, hours=5)))  # dup presence
        if d % 3 == 0:
            ev.append((2, base + dt.timedelta(days=d)))
    ev.append((3, base + dt.timedelta(days=4)))
    df = spark.createDataFrame(ev, "user_id long, ts timestamp")
    out = {
        r["day_id"]: r["active_users"]
        for r in TS.rolling_active_users(df, "ts", "user_id", 7).collect()
    }
    presence = {(u, (t - dt.datetime(1970, 1, 1)).days) for u, t in ev}
    days = sorted({d for _, d in presence})
    lo, hi = min(days), max(days)
    want = {
        d: len({u for (u, pd) in presence if d - 6 <= pd <= d})
        for d in range(lo, hi + 1)
    }
    assert out == want
    assert max(out.values()) == 3      # day 4..6 window catches all three
    with pytest.raises(ValueError):
        TS.rolling_active_users(df, "ts", "user_id", 0)


# ---------------------------------------------------------------------------
# SLO burn-rate alerts
# ---------------------------------------------------------------------------


def test_burn_rate_alerts_multiwindow(spark):
    from log_analysis_spark.operators import timeseries as TS

    base = dt.datetime(2024, 1, 1)
    rows = []

    def hour(h, tot, err):
        for i in range(tot):
            rows.append((base + dt.timedelta(hours=h, minutes=i % 50),
                         i < err))

    # hours 0-5 healthy (1/100), hour 6-7 a sustained burn (40/100),
    # hour 8 recovered (0/100), hour 9 a one-hour blip (40/100) whose
    # LONG window stays under threshold -> no page
    for h in range(6):
        hour(h, 100, 1)
    hour(6, 100, 40)
    hour(7, 100, 40)
    for h in range(8, 9):
        hour(h, 100, 0)
    df = spark.createDataFrame(rows, "ts timestamp, is_err boolean")
    # slo 99% -> budget 10 milli; thr 3000 -> page when burn > 3x budget
    out = {
        r["hour_id"]: r
        for r in TS.burn_rate_alerts(
            df, "ts", "is_err", slo_milli=990, thr_milli=3000,
            long_h=6, short_h=1,
        ).collect()
    }
    h0 = int(base.timestamp()) // 3600
    # hour 6: long window errs = 1*5+40 = 45/600 = 7.5% = 7.5x budget > 3x
    #          short = 40% = 40x budget -> page
    assert h0 + 6 in out and h0 + 7 in out
    assert out[h0 + 6]["burn_short_milli"] == 40_000
    assert out[h0 + 6]["err_long"] == 45
    assert out[h0 + 6]["burn_long_milli"] == (10**6 * 45) // (600 * 10)
    # healthy hours never page; hour 8's short window is clean
    assert all(h not in out for h in (h0, h0 + 1, h0 + 5, h0 + 8))
    # exact-integer replay of the engine's gate on hour 7
    r7 = out[h0 + 7]
    assert 10**6 * r7["err_short"] > 3000 * r7["tot_short"] * 10
    with pytest.raises(ValueError):
        TS.burn_rate_alerts(df, "ts", "is_err", slo_milli=1000)
    with pytest.raises(ValueError):
        TS.burn_rate_alerts(df, "ts", "is_err", long_h=1, short_h=2)


def test_burn_rate_blip_vs_sustained(spark):
    from log_analysis_spark.operators import timeseries as TS

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(12):
        err = 30 if h == 9 else 0          # a single-hour blip
        for i in range(100):
            rows.append((base + dt.timedelta(hours=h, minutes=i % 50),
                         i < err))
    df = spark.createDataFrame(rows, "ts timestamp, is_err boolean")
    # long window 6h: blip dilutes to 30/600 = 5% = 5x budget of 1%
    # -> with thr 6x the long window gate holds the page back
    out = TS.burn_rate_alerts(
        df, "ts", "is_err", slo_milli=990, thr_milli=6000,
        long_h=6, short_h=1,
    ).collect()
    assert out == []
    # but a lower threshold pages exactly the blip hour
    out2 = TS.burn_rate_alerts(
        df, "ts", "is_err", slo_milli=990, thr_milli=3000,
        long_h=6, short_h=1,
    ).collect()
    assert [r["hour_id"] for r in out2] == [int(base.timestamp()) // 3600 + 9]


# ------------------------------------------------------------ attribution


def _attr_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _h(hour, minute=0):
    return dt.datetime(2024, 3, 1, hour, minute)


def test_attribution_models_and_window_boundary(spark):
    ev = _attr_events(
        spark,
        [
            (1, _h(1), 7, "click"),    # earliest in window
            (2, _h(5), 7, "view"),
            (3, _h(10), 7, "click"),   # latest -> last-touch credit
            (4, _h(10, 30), 7, "purchase"),
            (5, _h(12), 9, "purchase"),  # no touches at all
        ],
    )
    out = T.attribution(ev, lookback_hours=24)
    rows = {(r["conv_event_id"], r["touch_event_id"]): r for r in out.collect()}
    assert rows[(4, 3)]["credit_last_micro"] == 1_000_000
    assert rows[(4, 1)]["credit_first_micro"] == 1_000_000
    assert all(rows[(4, t)]["credit_linear_micro"] == 333_333 for t in (1, 2, 3))
    assert rows[(4, 2)]["credit_last_micro"] == 0
    assert rows[(4, 1)]["n_touches"] == 3
    # zero-touch conversion still emitted with empty credits
    r9 = rows[(5, None)]
    assert (r9["n_touches"], r9["credit_linear_micro"]) == (0, 0)
    assert r9["touch_type"] is None


def test_attribution_lookback_excludes_old_and_future_touches(spark):
    ev = _attr_events(
        spark,
        [
            (1, _h(0), 7, "click"),        # exactly 24h before: INSIDE
            (2, dt.datetime(2024, 2, 28, 23, 59), 7, "click"),  # outside
            (3, dt.datetime(2024, 3, 2, 1), 7, "click"),        # after conv
            (4, dt.datetime(2024, 3, 2, 0), 7, "purchase"),
        ],
    )
    out = T.attribution(ev, lookback_hours=24).collect()
    assert {(r["conv_event_id"], r["touch_event_id"]) for r in out} == {(4, 1)}
    assert out[0]["credit_last_micro"] == out[0]["credit_first_micro"] == 1_000_000


def test_attribution_same_ts_tie_rules(spark):
    ev = _attr_events(
        spark,
        [
            (10, _h(3), 7, "click"),
            (11, _h(3), 7, "view"),   # same ts: higher id wins LAST,
            (12, _h(4), 7, "purchase"),  # lower id wins FIRST
        ],
    )
    rows = {r["touch_event_id"]: r
            for r in T.attribution(ev, lookback_hours=24).collect()}
    assert rows[11]["credit_last_micro"] == 1_000_000
    assert rows[10]["credit_first_micro"] == 1_000_000
    assert rows[10]["credit_last_micro"] == rows[11]["credit_first_micro"] == 0


def test_attribution_credit_conservation_on_real_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = T.attribution(ev).cache()
    per_conv = out.groupBy("conv_event_id").agg(
        F.sum("credit_last_micro").alias("l"),
        F.sum("credit_first_micro").alias("f"),
        F.sum("credit_linear_micro").alias("lin"),
        F.max("n_touches").alias("n"),
    )
    # touched conversions: last/first each sum to exactly 1e6; linear to
    # n*(1e6 div n); untouched: all zero
    bad = per_conv.filter(
        ((F.col("n") > 0) & ((F.col("l") != 1_000_000)
                             | (F.col("f") != 1_000_000)
                             | (F.col("lin") != F.col("n") * F.expr(
                                 "CAST(1000000 DIV n AS BIGINT)"))))
        | ((F.col("n") == 0) & ((F.col("l") != 0) | (F.col("f") != 0)
                                | (F.col("lin") != 0)))
    ).count()
    assert bad == 0
    # every purchase appears
    n_conv = ev.filter(F.col("event_type") == "purchase").count()
    assert per_conv.count() == n_conv
    out.unpersist()


def test_attribution_validates(spark):
    ev = _attr_events(spark, [(1, _h(0), 7, "click")])
    with pytest.raises(ValueError):
        T.attribution(ev, lookback_hours=0)
    with pytest.raises(ValueError):
        T.attribution(ev, touch_types=())


# ----------------------------------------------------------- concurrency


def test_concurrency_timeline_closed_form(spark):
    iv = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 10)),
            (2, dt.datetime(2024, 1, 1, 0, 5), dt.datetime(2024, 1, 1, 0, 20)),
            # touches interval 2's end exactly: closed intervals overlap
            (3, dt.datetime(2024, 1, 1, 0, 20), dt.datetime(2024, 1, 1, 0, 30)),
        ],
        "i long, start_ts timestamp, end_ts timestamp",
    )
    rows = [
        (r["ts"].minute, r["delta"], r["concurrency"])
        for r in T.concurrency_timeline(iv)
        .orderBy("ts", F.col("delta").desc())
        .collect()
    ]
    # sweep: +1@0 (c=1), +1@5 (2), -1@10 (1), +1@20 before -1@20 (2 then 1),
    # -1@30 (0)
    assert rows == [
        (0, 1, 1), (5, 1, 2), (10, -1, 1),
        (20, 1, 2), (20, -1, 1), (30, -1, 0),
    ]
    assert max(r[2] for r in rows) == 2  # peak concurrency


def test_concurrency_per_key_and_zero_length_intervals(spark):
    iv = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 0)),
            ("a", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 1, 0)),
            ("b", dt.datetime(2024, 1, 1, 0, 30), dt.datetime(2024, 1, 1, 0, 40)),
        ],
        "k string, start_ts timestamp, end_ts timestamp",
    )
    out = T.concurrency_timeline(iv, key_col="k").collect()
    by_k = {}
    for r in out:
        by_k.setdefault(r["k"], []).append(r["concurrency"])
    # a: two starts at the same instant both count before the zero-length
    # interval's end -> peak 2; b independent, peak 1
    assert max(by_k["a"]) == 2 and max(by_k["b"]) == 1
    # every timeline ends at zero open intervals
    ends = {
        r["k"]: r["concurrency"]
        for r in T.concurrency_timeline(iv, key_col="k")
        .orderBy("ts", F.col("delta").desc())
        .collect()
    }
    assert ends == {"a": 0, "b": 0}


def test_session_intervals_collapse(spark):
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), 7, "click"),
            (2, dt.datetime(2024, 1, 1, 0, 10), 7, "view"),
            (3, dt.datetime(2024, 1, 1, 2, 0), 7, "click"),  # new session
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        r["sess_id"]: (r["start_ts"].hour, r["end_ts"].minute, r["n_events"])
        for r in T.session_intervals(ev, gap_sec=1800).collect()
    }
    assert out == {0: (0, 10, 2), 1: (2, 0, 1)}


# ------------------------------------------------- seasonal naive backtest


def test_seasonal_naive_backtest_periodic_series(spark):
    # 3 days of a perfect 24h-periodic profile: seasonal lag-24 MAE = 0,
    # persistence lag-1 MAE > 0
    plan = [(1000 + h, 5 + (h % 24 == 3) * 10) for h in range(72)]
    ev = _hourly_events(spark, plan, key="k")
    out = {r["lag"]: (r["n_eval"], r["sum_abs_err"], r["mae_milli"])
           for r in T.seasonal_naive_backtest(ev, "ts", "event_type",
                                              lags=(1, 24)).collect()}
    assert out[24] == (48, 0, 0)           # perfectly seasonal
    n1, s1, m1 = out[1]
    assert n1 == 71 and s1 > 0 and m1 == (1000 * s1) // 71


def test_seasonal_naive_backtest_gap_hours_count_as_error(spark):
    # hours 0,1,3 with count 4 — hour 2 is a spine zero, so lag-1 errors
    # are |4-4|, |0-4|, |4-0| = 0,4,4
    plan = [(2000, 4), (2001, 4), (2003, 4)]
    ev = _hourly_events(spark, plan, key="k")
    out = {r["lag"]: (r["n_eval"], r["sum_abs_err"])
           for r in T.seasonal_naive_backtest(ev, "ts", "event_type",
                                              lags=(1,)).collect()}
    assert out[1] == (3, 8)
    with pytest.raises(ValueError):
        T.seasonal_naive_backtest(ev, "ts", "event_type", lags=())
    with pytest.raises(ValueError):
        T.seasonal_naive_backtest(ev, "ts", "event_type", lags=(0,))
