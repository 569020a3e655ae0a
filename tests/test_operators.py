from __future__ import annotations

from log_analysis_spark.operators.project import (
    canonical_rename,
    get_with_default,
    reorder_priority,
)


def test_projection_ops(spark):
    df = spark.createDataFrame(
        [("r1", None, 1)], "`hyrax-type` string, `hyrax-message` string, n int"
    )
    renamed = canonical_rename(df)
    assert renamed.columns == ["type", "message", "n"]
    reordered = reorder_priority(renamed, ["n", "missing_col", "type"])
    assert reordered.columns == ["n", "type", "message"]
    row = renamed.select(get_with_default("message", "-").alias("m")).first()
    assert row["m"] == "-"

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.datagen import role_taxonomy, tool_registry
from log_analysis_spark.functions.parse import parse_turns
from log_analysis_spark.operators import aggregate as agg
from log_analysis_spark.operators import enrich, joins, router, windows_ops


@pytest.fixture(scope="module")
def parsed(transcripts):
    df = parse_turns(transcripts).cache()
    df.count()
    return df


# --------------------------------------------------------------------- enrich


def test_enrich_roles_passthrough_and_status(spark, parsed):
    out = enrich.enrich_roles(parsed, role_taxonomy(spark))
    # matched rows get taxonomy columns; unmatched ('auditor') pass through
    # with the miss sentinel (reference: tests/test_join_json_arrays.py:27-55)
    auditor = out.filter(F.col("role") == "auditor").first()
    assert auditor["role_class"] is None
    assert auditor["role_status"].startswith(enrich.MISS_SENTINEL)
    user = out.filter(F.col("role") == "user").first()
    assert user["role_class"] == "human" and user["role_status"] == "ok"
    assert out.count() == parsed.count()  # left join never drops/dups


def test_enrich_right_overrides_collision(spark, parsed):
    # tool_registry carries a colliding `role` column: right wins when
    # matched (join_json_arrays.py:45), left survives on miss
    out = enrich.enrich_tools(parsed, tool_registry(spark))
    matched = out.filter(F.col("tool") == "tool-0").first()
    assert matched["role"] == "executor"
    miss = out.filter(F.col("tool") == "tool-7").first()
    assert miss["role"] in ("user", "assistant", "system", "tool", "auditor")
    assert miss["tool_status"].startswith(enrich.MISS_SENTINEL)


def test_enrich_is_broadcast(spark, parsed):
    plan = (
        enrich.enrich_roles(parsed, role_taxonomy(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- router


def test_router_disjoint_and_complete(spark, parsed):
    tagged = router.tag_sinks(parsed, router.default_rules())
    per_sink = router.check_routing_completeness(tagged)
    assert sum(per_sink.values()) == parsed.count()
    assert set(per_sink) <= {"errors", "tool_calls", "requests", "info", "human", "other"}
    assert per_sink["errors"] > 0 and per_sink["other"] > 0


def test_router_fanout_write(spark, parsed, tmp_path):
    tagged = router.tag_sinks(parsed, router.default_rules())
    out = str(tmp_path / "routed")
    router.route_write(tagged.select("conv_id", "turn_idx", "turn_class", "tool", "role", "sink"), out)
    back = spark.read.parquet(out)
    assert back.count() == parsed.count()
    # per-sink counts of the written data match the in-memory tagging
    a = {r["sink"]: r["n"] for r in router.sink_counts(tagged).collect()}
    b = {r["sink"]: r["n"] for r in back.groupBy("sink").agg(F.count("*").alias("n")).collect()}
    assert a == b


# ------------------------------------------------------------------ aggregate


def test_salted_count_equals_plain(spark, parsed):
    plain = {r["conv_id"]: r["n"] for r in parsed.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    salted = {r["conv_id"]: r["n"] for r in agg.salted_group_count(parsed, "conv_id").collect()}
    assert plain == salted


def test_grouped_stats_and_histogram(spark, parsed):
    stats = {r["action"]: r for r in agg.grouped_stats(parsed, "action", "duration_ms").collect()}
    assert set(stats) == {"TheBESKeys::TheKeys", "DmrppArray::read", "CurlHandlePool::get"}
    for r in stats.values():
        assert r["max_val"] >= r["med_val"] > 0
    hist = agg.histogram(parsed, "duration_ms", 500.0, group="action")
    total = hist.agg(F.sum("n")).first()[0]
    assert total == parsed.filter(F.col("duration_ms").isNotNull()).count()


def test_hourly_rollup_buckets(spark, parsed):
    roll = agg.hourly_rollup(parsed)
    assert roll.agg(F.sum("n")).first()[0] == parsed.count()
    hours = roll.select("hour").distinct().count()
    assert hours >= 3  # spans multiple hour buckets


# -------------------------------------------------------------------- windows


def test_adjacent_pairing(spark, parsed):
    out = windows_ops.pair_timing_with_next_error(parsed)
    n_timing = parsed.filter(F.col("turn_class") == "timing").count()
    assert out.count() == n_timing
    codes = {r["status_code"] for r in out.collect()}
    assert 200 in codes and any(c != 200 for c in codes)


def test_pair_math_span(spark, parsed):
    out = windows_ops.pair_math(parsed, ["conv_id"], "turn_idx", "duration_ms")
    row = out.first()
    assert row["span"] == row["last_val"] - row["first_val"]


# ---------------------------------------------------------------------- joins


@pytest.fixture(scope="module")
def req_resp(parsed):
    return joins.derive_request_log(parsed), joins.derive_response_log(parsed)


def test_merge_right_overrides_row_preserving(spark, req_resp):
    req, resp = req_resp
    out = joins.merge_right_overrides(req, resp, "request_id")
    assert out.count() == req.count()
    # at least one matched (has response code) and one unmatched (null)
    assert out.filter(F.col("http_response_code").isNotNull()).count() > 0
    assert out.filter(F.col("http_response_code").isNull()).count() > 0


def test_lookup_with_sentinel(spark, req_resp):
    req, resp = req_resp
    out = joins.lookup_with_sentinel(req, resp, "request_id", "resp_ts")
    missed = out.filter(F.col("error").isNotNull())
    assert missed.count() == joins.unmatched_anti(req, resp, "request_id").count()
    assert missed.first()["error"].startswith(joins.MISS_SENTINEL)
    assert out.count() == req.count()  # dedup keeps join row-preserving


def test_nest_one_to_many_sorted(spark, parsed, req_resp):
    req, _ = req_resp
    errors = parsed.filter(F.col("turn_class") == "error").select(
        "conv_id", F.col("turn_idx").alias("err_turn_idx"), "http_code"
    )
    out = joins.nest_one_to_many(req, errors, "conv_id", ["err_turn_idx"])
    row = out.filter(F.size("related") > 1).first()
    idxs = [x["err_turn_idx"] for x in row["related"]]
    assert idxs == sorted(idxs)
    # unmatched → empty array, not null (reference keeps "bes": [])
    assert out.filter(F.col("related").isNull()).count() == 0


def test_full_outer_merge(spark, req_resp):
    req, resp = req_resp
    out = joins.full_outer_merge(req, resp, "request_id")
    n_match = req.join(resp, "request_id").count()
    assert out.count() == req.count() + resp.count() - n_match


def test_interval_join_bucketed_equals_naive(spark, parsed):
    anchors = (
        parsed.filter(F.col("turn_class") == "request")
        .select(
            "conv_id",
            F.col("turn_idx").alias("anchor_idx"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
        )
    )
    others = parsed.filter(F.col("turn_class") != "request").select(
        "conv_id", F.col("turn_idx").alias("other_idx"), "ts"
    )
    kwargs = dict(
        equi_keys=["conv_id"], anchor_start="start_ts", anchor_end="end_ts", other_ts="ts"
    )
    naive = joins.interval_join(anchors, others, bucketed=False, **kwargs)
    fast = joins.interval_join(anchors, others, bucketed=True, **kwargs)
    key = ["conv_id", "anchor_idx", "other_idx"]
    assert naive.count() == fast.count() > 0
    assert naive.select(key).exceptAll(fast.select(key)).count() == 0


def test_interval_join_salted_hot_conv(spark):
    """One conversation holding ~50% of all rows in a single hour — the hot
    (conv, hour) cell a real skew incident produces.  The salted join must
    (a) return exactly the unsalted/naive result and (b) split the hot
    cell's fan-in ~n_salts× (the per-task bound that keeps one reducer from
    straggling at scale)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    n, n_salts = 20_000, 8
    others = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "hot")
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 97).cast("string")))
        .alias("conv_id"),
        F.col("id").alias("other_idx"),
        # hot rows all inside hour 0; cold rows spread over ~50 hours
        F.when(
            F.col("id") % 2 == 0,
            F.lit(t0) + F.make_interval(secs=F.col("id") % 3600),
        )
        .otherwise(F.lit(t0) + F.make_interval(secs=F.col("id") % 180_000))
        .alias("ts"),
    )
    convs = others.select("conv_id").distinct()
    anchors = convs.select(
        "conv_id",
        F.lit(0).alias("anchor_idx"),
        F.lit(t0).alias("start_ts"),
        (F.lit(t0) + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    kwargs = dict(
        equi_keys=["conv_id"], anchor_start="start_ts", anchor_end="end_ts", other_ts="ts"
    )
    key = ["conv_id", "anchor_idx", "other_idx"]
    plain = joins.interval_join(anchors, others, bucketed=True, **kwargs)
    salted = joins.interval_join(
        anchors, others, bucketed=True, n_salts=n_salts, **kwargs
    )
    naive = joins.interval_join(anchors, others, bucketed=False, **kwargs)
    assert salted.count() == plain.count() == naive.count() > 0
    assert naive.select(key).exceptAll(salted.select(key)).count() == 0

    # spread evidence: the max (conv, hour[, salt]) cell size drops ~n_salts×
    bucketed_o = others.withColumn("_b", F.date_trunc("hour", "ts"))
    hot_max = (
        bucketed_o.groupBy("conv_id", "_b").count().agg(F.max("count")).first()[0]
    )
    salted_max = (
        bucketed_o.withColumn(
            "_s", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
        )
        .groupBy("conv_id", "_b", "_s")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert hot_max >= n // 2  # the cell really is pathological
    assert salted_max <= hot_max / n_salts * 1.5  # and salting splits it


# ---------------------------------------------------------------------------
# bloom_prefiltered_join
# ---------------------------------------------------------------------------


def test_bloom_join_prunes_and_preserves(spark):
    """The pre-filter must (a) change nothing — Bloom has no false
    negatives — and (b) actually PRUNE: with a selective dim the surviving
    fact fraction approaches the true match rate plus the FP bound."""
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    facts = spark.createDataFrame([Row(k=i % 1000, v=i) for i in range(5000)])
    dims = spark.createDataFrame([Row(k=i, tag=f"t{i}") for i in range(0, 1000, 50)])  # 2%
    plain = sorted(map(tuple, facts.join(dims, "k").collect()))
    bloomed = J.bloom_prefiltered_join(facts, dims, "k", m_bits=1 << 14)
    assert sorted(map(tuple, bloomed.collect())) == plain

    # measure the prefilter alone: re-run with a sentinel right side that
    # matches nothing at the join but shares the bitmap — simplest proxy:
    # tiny m_bits forces false positives yet equality must still hold
    tiny = J.bloom_prefiltered_join(facts, dims, "k", m_bits=64, n_hashes=2)
    assert sorted(map(tuple, tiny.collect())) == plain


def test_bloom_join_semi_and_validation(spark):
    import pytest
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    facts = spark.createDataFrame([Row(k=i % 20, v=i) for i in range(200)])
    dims = spark.createDataFrame([Row(k=3), Row(k=7)])
    want = sorted(map(tuple, facts.join(dims, "k", "left_semi").collect()))
    got = sorted(
        map(
            tuple,
            J.bloom_prefiltered_join(facts, dims, "k", m_bits=1 << 12, how="left_semi").collect(),
        )
    )
    assert got == want
    with pytest.raises(ValueError):
        J.bloom_prefiltered_join(facts, dims, "k", how="left_outer")


def test_bloom_join_plan_is_jvm_broadcast(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    facts = spark.createDataFrame([Row(k=i, v=i) for i in range(100)])
    dims = spark.createDataFrame([Row(k=1), Row(k=2)])
    plan = (
        J.bloom_prefiltered_join(facts, dims, "k", m_bits=1 << 12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------


def test_expectations_each_kind(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators import expectations as E

    df = spark.createDataFrame(
        [
            Row(id=1, t="a", v=5.0),
            Row(id=2, t="a", v=None),     # not_null violation
            Row(id=2, t="z", v=200.0),    # dup id + bad enum + out of range
            Row(id=3, t="b", v=-1.0),     # out of range
            Row(id=3, t="b", v=1.0),      # dup id
            Row(id=3, t="b", v=2.0),      # triple: unique counts n-1 = 2
        ]
    )
    ref = spark.createDataFrame([Row(k=1), Row(k=2)])
    rules = [
        E.not_null("v"),
        E.accepted_values("t", ["a", "b"]),
        E.in_range("v", 0.0, 100.0),
        E.unique("id"),
        E.min_rows(10),
        E.referential("id", "ids"),
    ]
    got = {
        r["rule"]: (r["violations"], r["passed"])
        for r in E.check_expectations(df, rules, refs={"ids": ref}).collect()
    }
    assert got["not_null(v)"] == (1, False)
    assert got["accepted_values(t)"] == (1, False)
    # in_range counts NULL as violation too: 200.0, -1.0 and the NULL
    assert got["in_range(v)"] == (3, False)
    # dup groups: id=2 (2 rows -> 1), id=3 (3 rows -> 2)
    assert got["unique(id)"] == (3, False)
    assert got["min_rows(10)"] == (4, False)  # shortfall 10-6
    assert got["referential(id->ids)"] == (3, False)  # the three id=3 rows


def test_expectations_all_green_and_validation(spark):
    import pytest
    from pyspark.sql import Row

    from log_analysis_spark.operators import expectations as E

    df = spark.createDataFrame([Row(id=1, v=1.0), Row(id=2, v=2.0)])
    rep = E.check_expectations(
        df, [E.not_null("v"), E.unique("id"), E.min_rows(2)]
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)
    with pytest.raises(ValueError):
        E.check_expectations(df, [E.referential("id", "missing")])
    with pytest.raises(ValueError):
        E.check_expectations(df, [E.Expect("x", "bogus_kind")])


def test_skew_aware_join_equals_plain_under_planted_skew(spark):
    """One key holds 60% of the left side: the skew-aware plan must split
    it to the broadcast path and still EQUAL the plain join for inner,
    left_outer (incl. unmatched rows) and left_semi."""
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    left = spark.createDataFrame(
        [Row(k=0, v=i) for i in range(600)]
        + [Row(k=i % 50 + 1, v=i) for i in range(400)]
        + [Row(k=999, v=-1)]  # key with no right match
    )
    right = spark.createDataFrame(
        [Row(k=i, tag=f"t{i}") for i in range(0, 51)]
    )
    for how in ("inner", "left_outer", "left_semi"):
        plain = sorted(map(tuple, left.join(right, "k", how).collect()))
        skewed = sorted(
            map(
                tuple,
                J.skew_aware_join(
                    left, right, "k", how=how, threshold_frac=0.2
                ).collect(),
            )
        )
        assert skewed == plain, how
    # and the hot key actually took the broadcast path: the plan of the
    # hot half contains a BroadcastHashJoin keyed on k
    out = J.skew_aware_join(left, right, "k", threshold_frac=0.2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Union" in plan


def test_skew_aware_join_no_hot_keys_is_plain(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    left = spark.createDataFrame([Row(k=i, v=i) for i in range(200)])
    right = spark.createDataFrame([Row(k=i, tag="t") for i in range(0, 200, 3)])
    out = J.skew_aware_join(left, right, "k", threshold_frac=0.1)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, left.join(right, "k").collect())
    )
    import pytest

    with pytest.raises(ValueError):
        J.skew_aware_join(left, right, "k", how="full_outer")


def test_profile_columns_null_handling(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators import expectations as E

    df = spark.createDataFrame(
        [Row(a=1.0, b=10), Row(a=None, b=20), Row(a=3.0, b=20)]
    )
    got = {r["column"]: r.asDict() for r in E.profile_columns(df, ["a", "b"]).collect()}
    assert got["a"]["n"] == 3 and got["a"]["n_null"] == 1
    assert got["a"]["est_distinct"] == 2  # nulls excluded, below k → exact
    assert (got["a"]["min"], got["a"]["max"]) == (1.0, 3.0)
    assert got["b"]["est_distinct"] == 2 and got["b"]["n_null"] == 0
    assert got["b"]["p50"] == 20.0  # ceil(n/2)th of [10, 20, 20]


def test_bloom_and_skew_joins_empty_right(spark):
    """Empty dim side: bloom's bitmap is all zeros (every fact row pruned
    pre-join) and the skew split degrades to the plain join — both must
    equal the plain join's empty result, not error."""
    from pyspark.sql import Row

    from log_analysis_spark.operators import joins as J

    facts = spark.createDataFrame([Row(k=i, v=i) for i in range(50)])
    empty = spark.createDataFrame([], "k bigint, tag string")
    assert J.bloom_prefiltered_join(facts, empty, "k", m_bits=1 << 10).count() == 0
    assert J.skew_aware_join(facts, empty, "k", threshold_frac=0.01).count() == 0
    # left_outer through the skew path keeps every left row
    lo = J.skew_aware_join(facts, empty, "k", how="left_outer", threshold_frac=0.01)
    assert lo.count() == 50 and all(r["tag"] is None for r in lo.collect())


def test_broadcast_interval_lookup_semantics(spark):
    """[start, end) containment, latest-start wins on overlap, NULL on no
    match — validated against a brute-force join mirror."""
    import datetime as dt

    from log_analysis_spark.operators.joins import broadcast_interval_lookup

    t = lambda h, m=0: dt.datetime(2025, 3, 1, h, m)  # noqa: E731
    intervals = [
        (t(0), t(12), "morning-maint"),
        (t(10), t(11), "release-42"),   # nested: starts later, wins inside
        (t(12), t(18), "steady"),
    ]
    rows = [
        (1, t(5)),    # morning-maint only
        (2, t(10)),   # overlap: release-42 (later start)
        (3, t(11)),   # release window closed ([s, e)): morning-maint
        (4, t(12)),   # boundary: morning ends (exclusive), steady begins
        (5, t(20)),   # no interval -> NULL
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["event_id"]: r["interval_label"]
        for r in broadcast_interval_lookup(df, intervals).collect()
    }
    assert got == {
        1: "morning-maint",
        2: "release-42",
        3: "morning-maint",
        4: "steady",
        5: None,
    }


def test_broadcast_interval_lookup_plan_is_pure_projection(spark):
    import datetime as dt

    from log_analysis_spark.operators.joins import broadcast_interval_lookup

    df = spark.createDataFrame(
        [(1, dt.datetime(2025, 3, 1))], "event_id long, ts timestamp"
    )
    out = broadcast_interval_lookup(df, [(dt.datetime(2025, 1, 1),
                                          dt.datetime(2026, 1, 1), "y2025")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "EvalPython", "InPandas"):
        assert bad not in plan, f"{bad} in plan"


def test_broadcast_interval_lookup_validation(spark):
    import pytest as _pytest

    from log_analysis_spark.operators.joins import broadcast_interval_lookup

    df = spark.createDataFrame([(1,)], "event_id long")
    with _pytest.raises(ValueError, match="non-empty"):
        broadcast_interval_lookup(df, [])


def test_response_latency_adjacent_pairs_only(spark):
    """Latency counts ONLY adjacent user→assistant pairs: interposed
    system/tool turns break the pair; stats are exact integer micros with
    an interpolated median on even counts."""
    import datetime as dt

    from log_analysis_spark.operators import windows_ops as W

    t0 = dt.datetime(2024, 5, 1)

    def turn(conv, idx, role, offset_us):
        return (conv, idx, role, t0 + dt.timedelta(microseconds=offset_us))

    rows = [
        # c1: two clean pairs with latencies 1_000_000 and 3_000_000
        turn("c1", 0, "user", 0),
        turn("c1", 1, "assistant", 1_000_000),
        turn("c1", 2, "user", 5_000_000),
        turn("c1", 3, "assistant", 8_000_000),
        # c2: user → TOOL → assistant — no adjacent pair, no row
        turn("c2", 0, "user", 0),
        turn("c2", 1, "tool", 500),
        turn("c2", 2, "assistant", 1_000),
        # c3: single pair, latency 42 µs
        turn("c3", 0, "user", 0),
        turn("c3", 1, "assistant", 42),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {
        r["conv_id"]: (r["n_responses"], r["max_lat_us"], r["med_lat_us"])
        for r in W.response_latency(
            df, "conv_id", ["turn_idx"], "role", "ts"
        ).collect()
    }
    assert got == {
        "c1": (2, 3_000_000, 2_000_000.0),  # even count -> midpoint
        "c3": (1, 42, 42.0),
    }


def test_fuzzy_match_scoring_threshold_and_tiebreak(spark):
    from log_analysis_spark.operators import joins as J

    left = spark.createDataFrame(
        [(1, "jon smith", "A"), (2, "mary jones", "A"), (3, "zed", "B")],
        "lid long, name string, blk string",
    )
    right = spark.createDataFrame(
        [
            (10, "john smith", "A"),   # lev 1 / len 10 -> sim 900000
            (11, "jon smith", "A"),    # exact -> 1000000 (wins for lid=1)
            (12, "mary jonez", "A"),   # lev 1 / len 10 -> 900000
            (13, "zed", "A"),          # exact but WRONG BLOCK: never a candidate
            (14, None, "B"),           # null field scores 0
        ],
        "rid long, name string, blk string",
    )
    out = J.fuzzy_match(
        left, right, ["blk"], [("name", "name", 1_000_000)],
        "lid", "rid", threshold_micro=850_000,
    )
    got = {(r["lid"], r["rid"], r["score_micro"]) for r in out.collect()}
    # lid=1: exact 11 beats 900k 10; lid=2: 12 at 900k; lid=3: 13 blocked
    # out, 14 nulls to 0 -> no match at all
    assert got == {(1, 11, 1_000_000), (2, 12, 900_000)}
    # all-pairs variant keeps both of lid=1's above-threshold candidates
    allp = J.fuzzy_match(
        left, right, ["blk"], [("name", "name", 1_000_000)],
        "lid", "rid", threshold_micro=850_000, best_per_left=False,
    )
    assert {(r["lid"], r["rid"]) for r in allp.collect()} == {
        (1, 10), (1, 11), (2, 12),
    }
    # equal scores break to the lowest right id
    tie = J.fuzzy_match(
        left.filter("lid = 1"),
        spark.createDataFrame(
            [(21, "jon smith", "A"), (20, "jon smith", "A")],
            "rid long, name string, blk string",
        ),
        ["blk"], [("name", "name", 1_000_000)],
        "lid", "rid", threshold_micro=850_000,
    )
    assert [(r["lid"], r["rid"]) for r in tie.collect()] == [(1, 20)]
    # weight-sum guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1,000,000"):
        J.fuzzy_match(left, right, ["blk"], [("name", "name", 5)],
                      "lid", "rid", 1)


def test_fuzzy_match_candidates_are_blocked(spark):
    """The plan joins on the block key — no cross product anywhere."""
    from log_analysis_spark.operators import joins as J

    left = spark.createDataFrame(
        [(i, f"n{i}", str(i % 3)) for i in range(30)],
        "lid long, name string, blk string",
    )
    right = spark.createDataFrame(
        [(i + 100, f"n{i}x", str(i % 3)) for i in range(30)],
        "rid long, name string, blk string",
    )
    out = J.fuzzy_match(
        left, right, ["blk"], [("name", "name", 1_000_000)],
        "lid", "rid", threshold_micro=1,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_state_path_ngrams(spark):
    from log_analysis_spark.operators import windows_ops

    rows = [
        ("c1", 1, "a"), ("c1", 2, "-"), ("c1", 3, "b"), ("c1", 4, "c"),
        ("c1", 5, "d"),
        ("c2", 1, "b"), ("c2", 2, "c"), ("c2", 3, "d"),
        ("c3", 1, "x"), ("c3", 2, "y"),  # too short for k=3
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = {
        r["path"]: r["n"]
        for r in windows_ops.state_path_ngrams(
            df, "conv_id", ["turn_idx"], "tool", k=3, exclude=["-"]
        ).collect()
    }
    # '-' removed BEFORE pairing, so c1's motif chain is a,b,c,d;
    # windows never cross conversations
    assert got == {"a -> b -> c": 1, "b -> c -> d": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        windows_ops.state_path_ngrams(df, "conv_id", ["turn_idx"], "tool", k=1)


def test_column_entropy_closed_forms(spark):
    import math

    from log_analysis_spark.operators import expectations as E

    rows = [("a", 1, None), ("b", 1, None), ("c", 1, "x"), ("d", 1, "x")]
    df = spark.createDataFrame(rows, "u string, k int, v string")
    got = {r["column"]: r for r in E.column_entropy(df, ["u", "k", "v"]).collect()}
    # uniform over 4 values: H = ln 4; constant: H = 0; NULL is a category
    ln = lambda x: round(math.log(x) * 1_000_000)  # noqa: E731
    assert got["u"]["entropy_micro_nats"] == ln(4) - (4 * ln(1)) // 4
    assert got["u"]["n_distinct"] == 4
    assert got["k"]["entropy_micro_nats"] == ln(4) - (4 * ln(4)) // 4 == 0
    assert got["v"]["n_distinct"] == 2  # NULL + 'x'
    assert got["v"]["entropy_micro_nats"] == ln(4) - (2 * ln(2) * 2) // 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        E.column_entropy(df, [])


def test_column_correlation_closed_forms(spark):
    from log_analysis_spark.operators import expectations as E

    lin = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (None, 9.0), (4.0, None)],
        "x double, y double",
    )
    row = E.column_correlation(lin, "x", "y").collect()[0]
    assert (row["n"], row["r_micro"]) == (3, 1_000_000)  # nulls pairwise-dropped
    anti = spark.createDataFrame(
        [(1.0, 3.0), (2.0, 2.0), (3.0, 1.0)], "x double, y double"
    )
    assert E.column_correlation(anti, "x", "y").collect()[0]["r_micro"] == -1_000_000
    flat = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
    )
    assert E.column_correlation(flat, "x", "y").collect()[0]["r_micro"] is None


def test_table_fingerprint_properties(spark):
    from log_analysis_spark.operators import expectations as E

    rows = [(1, "a"), (2, None), (3, "x:y")]
    df = spark.createDataFrame(rows, "id long, v string")
    base = E.table_fingerprint(df).collect()[0]
    # order/partitioning independent
    shuffled = spark.createDataFrame(list(reversed(rows)), "id long, v string")
    assert E.table_fingerprint(shuffled.repartition(5)).collect()[0] == base
    # duplicate rows change the digest (multiset semantics)
    doubled = df.unionByName(df.limit(1))
    got = E.table_fingerprint(doubled).collect()[0]
    assert got["n_rows"] == 4 and got["fingerprint"] != base["fingerprint"]
    # NULL vs the string 'None'/'N' never collide; separator can't forge
    a = spark.createDataFrame([(None, "a")], "x string, y string")
    b = spark.createDataFrame([("a", None)], "x string, y string")
    assert (
        E.table_fingerprint(a).collect()[0]["fingerprint"]
        != E.table_fingerprint(b).collect()[0]["fingerprint"]
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        E.table_fingerprint(df, cols=[])


# ---------------------------------------------------------------------------
# Mann-Whitney U rank comparison
# ---------------------------------------------------------------------------


def _mw_mirror(a_vals, b_vals, z_milli=1960):
    """Brute-force doubled Mann-Whitney over micro-quantized values."""
    am = [round(v * 1_000_000) for v in a_vals]
    bm = [round(v * 1_000_000) for v in b_vals]
    u2 = 0
    for x in am:
        for y in bm:
            u2 += 2 * (x > y) + (x == y)
    na, nb, n = len(am), len(bm), len(am) + len(bm)
    ties = {}
    for v in am + bm:
        ties[v] = ties.get(v, 0) + 1
    tcube = sum(t**3 - t for t in ties.values())
    d2 = u2 - na * nb
    sig = (3_000_000 * d2 * d2 * n * (n - 1)
           > z_milli**2 * na * nb * (n * (n - 1) * (n + 1) - tcube))
    higher = "a" if d2 > 0 else ("b" if d2 < 0 else "tie")
    return u2, sig, higher


def _two_group_df(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "g string, v double")


def test_rank_compare_matches_bruteforce_with_ties(spark):
    from log_analysis_spark.operators import expectations as E

    a = [1.5, 2.0, 2.0, 3.25, 9.0, 2.5]
    b = [2.0, 1.0, 3.25, 0.5, 2.5, 2.5, 4.0]
    row = E.rank_compare(_two_group_df(spark, a, b), "v", "g", "a", "b").collect()[0]
    u2, sig, higher = _mw_mirror(a, b)
    assert (row["u2_a"], row["significant"], row["higher"]) == (u2, sig, higher)
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    # doubled rank-sum identity: u2 = r2_a - 2 * na*(na+1)/2
    assert row["u2_a"] == row["r2_a"] - len(a) * (len(a) + 1)


def test_rank_compare_shifted_sample_is_significant(spark):
    from log_analysis_spark.operators import expectations as E

    a = [10.0 + i * 0.1 for i in range(40)]      # clearly larger
    b = [1.0 + i * 0.1 for i in range(40)]
    row = E.rank_compare(_two_group_df(spark, a, b), "v", "g", "a", "b").collect()[0]
    assert row["significant"] and row["higher"] == "a"
    assert row["u2_a"] == 2 * 40 * 40            # every a beats every b
    # and symmetric: identical samples tie, insignificant
    row2 = E.rank_compare(_two_group_df(spark, a, a + []), "v", "g", "a", "b").collect()[0]
    assert not row2["significant"] and row2["higher"] == "tie"


def test_rank_compare_guards(spark):
    from log_analysis_spark.operators import expectations as E

    df = _two_group_df(spark, [1.0], [2.0])
    with pytest.raises(ValueError):
        E.rank_compare(df, "v", "g", "a", "a")
    with pytest.raises(ValueError):
        E.rank_compare(df, "v", "g", "a", "b", z_milli=-5)


# ---------------------------------------------------------------------------
# Two-sample KS drift test
# ---------------------------------------------------------------------------


def _ks_mirror(a_vals, b_vals, c_micro=1_358_000):
    am = sorted(round(v * 1_000_000) for v in a_vals)
    bm = sorted(round(v * 1_000_000) for v in b_vals)
    na, nb = len(am), len(bm)
    best, at_v = -1, None
    for v in sorted(set(am + bm)):
        A = sum(1 for x in am if x <= v)
        B = sum(1 for x in bm if x <= v)
        g = abs(A * nb - B * na)
        if g > best:
            best, at_v = g, v
    sig = 10**12 * best * best > c_micro**2 * (na + nb) * na * nb
    return best, at_v, sig


def test_ks_test_matches_bruteforce(spark):
    from log_analysis_spark.operators import expectations as E

    a = [0.1, 0.2, 0.2, 0.9, 1.4, 2.0, 2.2]
    b = [0.15, 0.2, 1.0, 1.4, 1.4, 3.0]
    da = spark.createDataFrame([(float(v),) for v in a], "v double")
    db = spark.createDataFrame([(float(v),) for v in b], "v double")
    row = E.ks_test(da, db, "v").collect()[0]
    d_num, at_v, sig = _ks_mirror(a, b)
    assert (row["d_num"], row["at_v_micro"], row["significant"]) == (d_num, at_v, sig)
    assert row["d_micro"] == (1_000_000 * d_num) // (len(a) * len(b))


def test_ks_test_disjoint_supports_max_drift(spark):
    from log_analysis_spark.operators import expectations as E

    da = spark.createDataFrame([(float(i),) for i in range(30)], "v double")
    db = spark.createDataFrame([(100.0 + i,) for i in range(30)], "v double")
    row = E.ks_test(da, db, "v").collect()[0]
    assert row["d_num"] == 30 * 30 and row["d_micro"] == 1_000_000
    assert row["significant"] and row["at_v_micro"] == 29_000_000
    # identical tables: zero drift, never significant
    row2 = E.ks_test(da, da, "v").collect()[0]
    assert row2["d_num"] == 0 and not row2["significant"]
    with pytest.raises(ValueError):
        E.ks_test(da, db, "v", c_micro=0)


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------


def test_k_anonymity_violations_and_summary(spark):
    from log_analysis_spark.operators import expectations as E

    rows = (
        [("90210", 30, i) for i in range(12)]      # safe class (12 >= 10)
        + [("90210", 31, i) for i in range(3)]     # violating (3)
        + [("10001", 30, i) for i in range(1)]     # violating (1)
        + [(None, 30, i) for i in range(2)]        # NULL zip is a class (2)
    )
    df = spark.createDataFrame(rows, "zip string, age int, i int")
    viol = {
        (r["zip"], r["age"]): r["group_n"]
        for r in E.k_anonymity_violations(df, ["zip", "age"], 10).collect()
    }
    assert viol == {("90210", 31): 3, ("10001", 30): 1, (None, 30): 2}
    s = E.k_anonymity_summary(df, ["zip", "age"], 10).collect()[0]
    assert (s["n_rows"], s["n_groups"], s["n_violating"],
            s["rows_at_risk"], s["actual_k"]) == (18, 4, 3, 6, 1)
    with pytest.raises(ValueError):
        E.k_anonymity_violations(df, [], 10)
    with pytest.raises(ValueError):
        E.k_anonymity_summary(df, ["zip"], 1)


# ---------------------------------------------------------------------------
# l-diversity audit
# ---------------------------------------------------------------------------


def test_l_diversity_violations_semantics(spark):
    from log_analysis_spark.operators import expectations as E

    rows = (
        [("90210", "flu", i) for i in range(5)]        # 1 distinct -> viol
        + [("10001", "flu", 0), ("10001", "cold", 1),
           ("10001", "cut", 2)]                        # 3 distinct -> safe
        + [("60601", "flu", 0), ("60601", None, 1)]    # NULL adds NO diversity
        + [(None, "flu", 0), (None, "cold", 1)]        # NULL QI is a class
    )
    df = spark.createDataFrame(rows, "zip string, dx string, i int")
    viol = {
        r["zip"]: (r["group_n"], r["n_sensitive"])
        for r in E.l_diversity_violations(df, ["zip"], "dx", 3).collect()
    }
    # 90210: 5 rows, 1 value; 60601: 2 rows but only 1 non-null value;
    # NULL zip: 2 rows, 2 values -> violating at l=3
    assert viol == {"90210": (5, 1), "60601": (2, 1), None: (2, 2)}
    # 10001 is l-diverse at 3 and absent
    with pytest.raises(ValueError):
        E.l_diversity_violations(df, [], "dx", 3)
    with pytest.raises(ValueError):
        E.l_diversity_violations(df, ["zip"], "dx", 1)


# ---------------------------------------------------------------------------
# Chi-square independence, ranking AUC, Gini concentration
# ---------------------------------------------------------------------------


def _chi2_mirror(pairs):
    """Brute-force chi2 via the classic sum over ALL structural cells of
    (O-E)^2/E — a DIFFERENT formula from the engine's O^2*N/(R*C) - N
    identity; agreement (within per-cell truncation) verifies the algebra."""
    from collections import Counter

    o = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    n = len(pairs)
    # engine-exact replay: per observed cell trunc((o^2*n*1e6)/(r*c)), - n*1e6
    s = sum((o[(a, b)] ** 2 * n * 10**6) // (ra[a] * cb[b]) for a, b in o)
    chi2_micro = s - n * 10**6
    # float cross-check over all structural cells
    chi2_f = sum(
        (o.get((a, b), 0) - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )
    return chi2_micro, chi2_f, len(o), (len(ra) - 1) * (len(cb) - 1)


def test_chi2_independence_matches_bruteforce(spark):
    from log_analysis_spark.operators import expectations as E

    pairs = (
        [("err", "am")] * 12 + [("err", "pm")] * 3
        + [("ok", "am")] * 5 + [("ok", "pm")] * 20
        + [("warn", "am")] * 4 + [("warn", "pm")] * 4
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    row = E.chi2_independence(df, "a", "b", crit_micro=5_991_000).collect()[0]
    chi2_micro, chi2_f, n_cells, dof = _chi2_mirror(pairs)
    assert row["chi2_micro"] == chi2_micro
    assert abs(row["chi2_micro"] / 1e6 - chi2_f) < n_cells / 1e6 + 1e-6
    assert (row["n"], row["n_cells"], row["dof"]) == (len(pairs), n_cells, dof)
    assert row["significant"]  # strong association planted
    assert row["v2_micro"] == chi2_micro // (len(pairs) * 1)


def test_chi2_independence_independent_and_guards(spark):
    from log_analysis_spark.operators import expectations as E

    # perfectly proportional table: chi2 == 0 (up to truncation), never sig
    pairs = [(a, b) for a in ("x", "y") for b in ("p", "q", "r")] * 10
    df = spark.createDataFrame(pairs, "a string, b string")
    row = E.chi2_independence(df, "a", "b", crit_micro=5_991_000).collect()[0]
    assert abs(row["chi2_micro"]) <= row["n_cells"]  # pure truncation bias
    assert not row["significant"]
    # NULL is a category
    pairs2 = [("x", None)] * 5 + [("x", "p")] * 5 + [("y", None)] * 5
    df2 = spark.createDataFrame(pairs2, "a string, b string")
    assert E.chi2_independence(df2, "a", "b", 1).collect()[0]["n"] == 15
    with pytest.raises(ValueError):
        E.chi2_independence(df, "a", "a", 100)
    with pytest.raises(ValueError):
        E.chi2_independence(df, "a", "b", 0)


def _auc_mirror(pos, neg):
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_ranking_auc_matches_bruteforce(spark):
    from log_analysis_spark.operators import expectations as E

    pos = [3.2, 4.0, 4.0, 9.9, 2.0]
    neg = [1.0, 4.0, 2.5, 2.0, 0.5, 3.2, 1.1]
    rows = [(float(v), True) for v in pos] + [(float(v), False) for v in neg]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = E.ranking_auc(df, "s", "y").collect()[0]
    want = _auc_mirror(pos, neg)
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc_micro"] == int(want * 2 * len(pos) * len(neg) * 10**6) // (
        2 * len(pos) * len(neg)
    )
    assert abs(r["auc_micro"] / 1e6 - want) < 1e-6
    # perfect separation -> AUC exactly 1; reversed -> 0
    hi = [(10.0 + i, True) for i in range(4)] + [(float(i), False) for i in range(4)]
    assert E.ranking_auc(
        spark.createDataFrame(hi, "s double, y boolean"), "s", "y"
    ).collect()[0]["auc_micro"] == 1_000_000
    lo = [(float(i), True) for i in range(4)] + [(10.0 + i, False) for i in range(4)]
    assert E.ranking_auc(
        spark.createDataFrame(lo, "s double, y boolean"), "s", "y"
    ).collect()[0]["auc_micro"] == 0
    # degenerate: no negatives -> NULL auc
    only_pos = spark.createDataFrame([(1.0, True)], "s double, y boolean")
    assert E.ranking_auc(only_pos, "s", "y").collect()[0]["auc_micro"] is None


def _gini_mirror(counts):
    xs = sorted(counts)
    n, tot = len(xs), sum(xs)
    g = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    return (10**6 * g) // (n * tot)


def test_gini_concentration_matches_bruteforce(spark):
    from log_analysis_spark.operators import expectations as E

    # keys with counts 1,1,2,5,11  (ties exercise the cell fold)
    rows = (
        [("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 5 + [("e",)] * 11
    )
    df = spark.createDataFrame(rows, "k string")
    r = E.gini_concentration(df, "k").collect()[0]
    assert (r["n_keys"], r["total"]) == (5, 20)
    assert r["gini_micro"] == _gini_mirror([1, 1, 2, 5, 11])
    # perfectly even: gini == 0
    even = spark.createDataFrame([(f"k{i}",) for i in range(6)] * 3, "k string")
    assert E.gini_concentration(even, "k").collect()[0]["gini_micro"] == 0
    # extreme concentration approaches (n-1)/n
    skew = spark.createDataFrame([("big",)] * 96 + [("s1",), ("s2",), ("s3",), ("s4",)], "k string")
    g = E.gini_concentration(skew, "k").collect()[0]["gini_micro"]
    assert g == _gini_mirror([96, 1, 1, 1, 1])
    assert g > 700_000


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def _psi_mirror(a_vals, b_vals, width=1.0, thr_micro=200_000):
    import math
    from collections import Counter

    wm = round(width * 1_000_000)
    ba = Counter(round(v * 1_000_000) // wm for v in a_vals)
    bb = Counter(round(v * 1_000_000) // wm for v in b_vals)
    bins = set(ba) | set(bb)
    B = len(bins)
    na, nb = len(a_vals) + B, len(b_vals) + B
    L = lambda x: round(math.log(x) * 1_000_000)  # noqa: E731
    s = 0
    for bn in bins:
        x = (ba.get(bn, 0) + 1) * nb
        y = (bb.get(bn, 0) + 1) * na
        s += (x - y) * (L(x) - L(y))
    psi = s // (na * nb)
    return psi, B, psi > thr_micro


def test_psi_drift_matches_mirror_and_detects_shift(spark):
    from log_analysis_spark.operators import expectations as E

    a = [0.1, 0.4, 1.2, 1.3, 2.9, 3.3, 3.4, 0.2, 1.1, 2.2]
    b = [0.3, 0.5, 1.1, 1.9, 2.1, 3.1, 9.5]        # one far-out bin
    da = spark.createDataFrame([(float(v),) for v in a], "v double")
    db = spark.createDataFrame([(float(v),) for v in b], "v double")
    r = E.psi_drift(da, db, "v", width=1.0).collect()[0]
    psi, B, drifted = _psi_mirror(a, b)
    assert (r["psi_micro"], r["n_bins"], r["drifted"]) == (psi, B, drifted)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    # identical samples: psi == 0, never drifted
    r2 = E.psi_drift(da, da, "v", width=1.0).collect()[0]
    assert r2["psi_micro"] == 0 and not r2["drifted"]
    # a gross shift drifts
    dc = spark.createDataFrame([(float(v + 50),) for v in a], "v double")
    r3 = E.psi_drift(da, dc, "v", width=1.0).collect()[0]
    assert r3["drifted"] and r3["psi_micro"] > 1_000_000
    with pytest.raises(ValueError):
        E.psi_drift(da, db, "v", width=0.0)
    with pytest.raises(ValueError):
        E.psi_drift(da, db, "v", thr_micro=0)


def test_psi_drift_negative_values_bin_by_floor(spark):
    from log_analysis_spark.operators import expectations as E

    a = [-2.5, -1.2, -0.1, 0.1, 1.2]
    b = [-2.6, -0.9, 0.4, 0.2, 1.9, 2.4]
    da = spark.createDataFrame([(float(v),) for v in a], "v double")
    db = spark.createDataFrame([(float(v),) for v in b], "v double")
    r = E.psi_drift(da, db, "v", width=1.0).collect()[0]
    psi, B, drifted = _psi_mirror(a, b)
    assert (r["psi_micro"], r["n_bins"], r["drifted"]) == (psi, B, drifted)


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


def test_benford_digit_extraction_and_shares(spark):
    from log_analysis_spark.operators import expectations as E

    # values chosen so the micro-quantized integers lead with known
    # digits: 1.5->1500000 (1), -0.25->250000 (2), 0.9->900000 (9),
    # 30->3e7 (3), 0 and NULL excluded
    rows = [(1.5,), (-0.25,), (0.9,), (30.0,), (0.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in E.benford_deviation(df, "v").collect()}
    assert set(out) == set(range(1, 10))  # always 9 rows
    n = {d: out[d]["n"] for d in out}
    assert n == {1: 1, 2: 1, 3: 1, 9: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0}
    for d in (1, 2, 3, 9):
        assert out[d]["observed_micro"] == 1_000_000 // 4
        assert (
            out[d]["dev_micro"]
            == out[d]["observed_micro"] - E.BENFORD_EXPECTED_MICRO[d]
        )
    assert out[5]["observed_micro"] == 0


def test_benford_conforming_sample_small_deviation(spark):
    import math

    from log_analysis_spark.operators import expectations as E

    # deterministic Benford-conforming magnitudes: v = 10^(u) for a low-
    # discrepancy u grid in [0, 3) — first-digit mass converges to Benford
    vals = [(10 ** ((i * 0.001) % 3.0),) for i in range(3000)]
    df = spark.createDataFrame(vals, "v double")
    out = E.benford_deviation(df, "v").collect()
    assert sum(r["n"] for r in out) == 3000
    for r in out:
        assert abs(r["dev_micro"]) < 25_000, (r["digit"], r["dev_micro"])
    # and a uniform sample is grossly non-Benford at digit 1
    uni = spark.createDataFrame([(float(i),) for i in range(1, 1001)], "v double")
    d1 = {r["digit"]: r["dev_micro"] for r in E.benford_deviation(uni, "v").collect()}
    assert d1[1] < -180_000  # uniform puts ~11.1% at digit 1 vs 30.1%
    _ = math  # quiet linters: math used via expression above


# ---------------------------------------------------------------------------
# interval x interval overlap join
# ---------------------------------------------------------------------------


def test_interval_overlap_join_closed_form(spark):
    import datetime as dt

    from log_analysis_spark.operators import joins as J

    def t(h, m=0, s=0):
        return dt.datetime(2024, 1, 1, h, m, s)

    left = spark.createDataFrame(
        [(1, t(0), t(2)), (2, t(5), t(6)), (3, t(10), t(10, 30))],
        "lid long, start_ts timestamp, end_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(1), t(3)),          # overlaps lid 1 on [1, 2]
            (11, t(6), t(7)),          # touches lid 2 at exactly t(6)
            (12, t(11), t(12)),        # no overlap with anything
            (13, t(0, 30), t(1, 30)),  # nested inside lid 1
        ],
        "rid long, r_start_ts timestamp, r_end_ts timestamp",
    )
    out = {
        (r["lid"], r["rid"]): (r["overlap_start"], r["overlap_end"],
                               r["overlap_us"])
        for r in J.interval_overlap_join(left, right, "lid", "rid").collect()
    }
    assert set(out) == {(1, 10), (2, 11), (1, 13)}
    assert out[(1, 10)] == (t(1), t(2), 3600 * 10**6)
    assert out[(2, 11)] == (t(6), t(6), 0)          # closed-boundary touch
    assert out[(1, 13)] == (t(0, 30), t(1, 30), 3600 * 10**6)
    # multi-bucket spans dedup to one pair row (lid 1 x rid 10 share
    # buckets at hours 1 and 2)
    assert len(out) == 3


def test_interval_overlap_join_equi_keys_partition(spark):
    import datetime as dt

    from log_analysis_spark.operators import joins as J

    t0, t1 = dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 1, 1)
    left = spark.createDataFrame(
        [(1, "a", t0, t1), (2, "b", t0, t1)],
        "lid long, k string, start_ts timestamp, end_ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "a", t0, t1)],
        "rid long, k string, r_start_ts timestamp, r_end_ts timestamp",
    )
    out = J.interval_overlap_join(
        left, right, "lid", "rid", equi_keys=["k"]
    ).collect()
    # only the same-key pair joins despite identical time spans
    assert [(r["lid"], r["rid"], r["k"]) for r in out] == [(1, 10, "a")]


def test_sequence_integrity_statuses(spark):
    from log_analysis_spark.operators import expectations as E

    rows = [
        # clean 0..3
        *[("clean", i) for i in range(4)],
        # gap: 0,1,3 (missing 2)
        ("gap", 0), ("gap", 1), ("gap", 3),
        # dup: 0,1,1,2
        ("dup", 0), ("dup", 1), ("dup", 1), ("dup", 2),
        # shifted start: 2,3,4 (contiguous span but min != 0)
        ("shift", 2), ("shift", 3), ("shift", 4),
        # all-null indexes
        ("nulls", None), ("nulls", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = {r["group"]: r for r in E.sequence_integrity(df).collect()}

    assert out["clean"]["is_contiguous"]
    assert out["clean"]["n_missing"] == 0 and out["clean"]["n_dup_rows"] == 0

    assert not out["gap"]["is_contiguous"]
    assert out["gap"]["n_missing"] == 1 and out["gap"]["n_dup_rows"] == 0

    assert not out["dup"]["is_contiguous"]
    assert out["dup"]["n_missing"] == 0 and out["dup"]["n_dup_rows"] == 1

    assert not out["shift"]["is_contiguous"]  # min_idx=2, start_at=0
    assert out["shift"]["n_missing"] == 0 and out["shift"]["min_idx"] == 2
    # but with start_at=2 the same group is contiguous
    out2 = {
        r["group"]: r
        for r in E.sequence_integrity(df, start_at=2).collect()
    }
    assert out2["shift"]["is_contiguous"] and not out2["clean"]["is_contiguous"]

    r = out["nulls"]
    assert not r["is_contiguous"]
    assert r["n_rows"] == 2 and r["n_distinct_idx"] == 0
    assert r["min_idx"] is None and r["n_missing"] == 0 and r["n_dup_rows"] == 2


def test_dimensional_rollup_cube_and_null_disambiguation(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("a", None)]
    df = spark.createDataFrame(rows, "d1 string, d2 string")
    out = {
        (r["d1"], r["d2"], r["grouping_id"]): r["n"]
        for r in agg.dimensional_rollup(df, ["d1", "d2"]).collect()
    }
    # full detail: the DATA null keeps grouping_id 0
    assert out[("a", "x", 0)] == 1 and out[("a", None, 0)] == 1
    # d2 rolled up (bit 0 set): counts fold over d2 INCLUDING the null row
    assert out[("a", None, 1)] == 3 and out[("b", None, 1)] == 1
    # d1 rolled up (bit 1 set)
    assert out[(None, "x", 2)] == 2
    # grand total
    assert out[(None, None, 3)] == 4
    # one row per (set, key) combination — nothing duplicated
    assert len(out) == 4 + 2 + 3 + 1  # detail, d1-level, d2-level, total
    with pytest.raises(ValueError):
        agg.dimensional_rollup(df, [])


def test_pivot_matrix_counts_and_schema(spark):
    rows = [("r1", "a"), ("r1", "a"), ("r1", "b"), ("r2", "b"), ("r2", "zz")]
    df = spark.createDataFrame(rows, "k string, c string")
    out = {
        r["k"]: (r["n_a"], r["n_b"])
        for r in agg.pivot_matrix(df, "k", "c", ["a", "b"]).collect()
    }
    # absent cells are 0, values outside the explicit list are dropped
    assert out == {"r1": (2, 1), "r2": (0, 1)}
    with pytest.raises(ValueError):
        agg.pivot_matrix(df, "k", "c", [])
