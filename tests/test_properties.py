"""Property-based tests (hypothesis) for the operators whose correctness
lives in tie-break and boundary semantics — randomized inputs crosschecked
against pure-Python brute-force mirrors.  The reference repo has no
property testing (SURVEY §5); these close that class of gap for the ops
where a hand-picked example can silently miss an ordering rule.

Spark round-trips dominate runtime, so example counts are deliberately
small (8) with no deadline — each example is a full job."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from log_analysis_spark.operators import sketches as SK
from log_analysis_spark.operators import timeseries as T

BASE = dt.datetime(2024, 1, 1)


def _t(sec: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


# -- as-of join vs brute force ------------------------------------------------

asof_inputs = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=1,
        max_size=8,
    ),
    st.lists(  # right: (key, ts, value-or-None)
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 30),
            st.one_of(st.none(), st.integers(0, 5)),
        ),
        min_size=0,
        max_size=8,
    ),
)


@settings(max_examples=8, deadline=None)
@given(asof_inputs)
def test_asof_join_matches_bruteforce(spark, data):
    lrows, rrows = data
    left = spark.createDataFrame(
        [Row(k=k, lid=i, ts=_t(s)) for i, (k, s) in enumerate(lrows)]
    )
    right_py = [(k, s, rid, v) for rid, (k, s, v) in enumerate(rrows)]
    right = spark.createDataFrame(
        [(k, _t(s), rid, v) for k, s, rid, v in right_py],
        "k bigint, ts timestamp, rid bigint, v bigint",
    )
    got = {
        r["lid"]: (r["asof_rid"], r["asof_v"])
        for r in T.asof_join(left, right, "k", ["v", "rid"], right_order="rid").collect()
    }
    for i, (k, s) in enumerate(lrows):
        cands = [(rs, rid, v) for rk, rs, rid, v in right_py if rk == k and rs <= s]
        want = (None, None)
        if cands:
            rs, rid, v = max(cands, key=lambda c: (c[0], c[1]))
            want = (rid, v)
        assert got[i] == want, f"left {i} (k={k}, s={s}): {got[i]} != {want}"


# -- funnel vs greedy mirror ---------------------------------------------------

funnel_inputs = st.lists(  # per-user event soup: (user, sec, type in a..c)
    st.tuples(st.integers(0, 2), st.integers(0, 10), st.sampled_from("abc")),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None)
@given(funnel_inputs)
def test_funnel_matches_greedy_mirror(spark, rows):
    steps = ["a", "b", "a"]
    df = spark.createDataFrame(
        [Row(u=u, eid=i, ts=_t(s), t=t) for i, (u, s, t) in enumerate(rows)]
    )
    got = {
        r["u"]: r["steps_completed"]
        for r in T.funnel_steps(df, "u", "ts", "t", steps, "eid").collect()
    }
    want: dict[int, int] = {}
    by_user: dict[int, list] = {}
    for i, (u, s, t) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, t))
    for u, evs in by_user.items():
        n = 0
        for _s, _i, t in sorted(evs):
            if n < len(steps) and t == steps[n]:
                n += 1
        want[u] = n
    assert got == want


# -- KMV merge distributivity --------------------------------------------------

kmv_inputs = st.tuples(
    st.lists(st.integers(0, 500), min_size=1, max_size=60),
    st.integers(1, 59),
)


@settings(max_examples=8, deadline=None)
@given(kmv_inputs)
def test_kmv_merge_distributive(spark, data):
    vals, cut = data
    cut = min(cut, len(vals))
    whole = spark.createDataFrame([Row(v=v) for v in vals])
    lo = spark.createDataFrame([Row(v=v) for v in vals[:cut]] or [Row(v=vals[0])])
    hi = spark.createDataFrame([Row(v=v) for v in vals[cut:]] or [Row(v=vals[-1])])
    if not vals[:cut] or not vals[cut:]:
        return  # degenerate split duplicates a value; distributivity still
        # holds but the mirror below would need multiset care — skip
    k = 16
    merged = SK.kmv_merge(
        SK.kmv_sketch(lo, "v", k=k), SK.kmv_sketch(hi, "v", k=k), k=k
    )
    whole_sk = SK.kmv_sketch(whole, "v", k=k)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in whole_sk.collect()
    )


# -- histogram quantiles: error bounded by resolution --------------------------


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(0, 100, allow_nan=False), min_size=5, max_size=60))
def test_hist_quantile_error_bound(spark, vals):
    df = spark.createDataFrame([Row(g="a", v=float(v)) for v in vals])
    res = 0.5
    [r] = SK.hist_quantiles(df, "v", [0.5], resolution=res, group="g").collect()
    exact = sorted(vals)[-(-len(vals) // 2) - 1]  # lower median, ceil(n/2)th
    assert abs(r["value"] - exact) <= res + 1e-9
