"""Join operators (SURVEY.md §2.3 — the heart of the reference).

The reference's request/response/BES logs are re-derived here from the
transcripts table itself so every join has a deterministic, oracle-checkable
input:

  * ``request_log``  — request-class turns; ``request_id = conv_id:turn_idx``
  * ``response_log`` — error-class turns, each answering the immediately
    preceding turn (``request_id = conv_id:(turn_idx-1)``) — so some
    requests lack responses and some responses lack requests, exercising
    unmatched-passthrough / miss-sentinel / anti-join paths.

Operators:
  * J1/J2 — left-outer equi join, right-overrides merge
    (join_json_arrays.py:11-52; merge_request_response.py:10-48)
  * J3 — first-match lookup with miss sentinel (ngap-logs.py:188-213; the
    reference's docstring/first-vs-last ambiguity is resolved here with an
    explicit row_number ordering)
  * J4/J6 — one-to-many join nested as a sorted array
    (ngap-logs.py:216-242,257-300)
  * J5 — composite-equi + time-interval join with an hour-bucket
    prepartitioning variant for scale
    (join_metrics_log_with_application_log.py:61-175)
  * J7 — full-outer merge via per-column coalesce (merge_request_response.sh:17)
  * anti — "unmatched records" (combined_analysis.sh:5-9) as a left_anti join
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MISS_SENTINEL = "Failed to locate matching record"  # ngap-logs.py:209


def derive_request_log(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("turn_class") == "request").select(
        F.concat_ws(":", "conv_id", "turn_idx").alias("request_id"),
        "conv_id",
        F.col("turn_idx").alias("req_turn_idx"),
        "url_path",
        "http_method",
        F.col("http_code").alias("req_code"),
        "instance_id",
        "pid",
        F.col("ts").alias("req_ts"),
    )


def derive_response_log(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("turn_class") == "error").select(
        F.concat_ws(":", F.col("conv_id"), (F.col("turn_idx") - 1)).alias("request_id"),
        F.col("http_code").alias("http_response_code"),
        F.col("attempt"),
        F.col("code_ref"),
        F.col("ts").alias("resp_ts"),
    )


def merge_right_overrides(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J1/J2 — ``{**left, **right_index.get(key, {})}``: left-outer join;
    shared columns take the right value when matched, keep left on a miss."""
    shared = [c for c in right.columns if c in left.columns and c != key]
    r = right
    for c in shared:
        r = r.withColumnRenamed(c, f"__r_{c}")
    out = left.join(r, on=key, how="left")
    for c in shared:
        out = out.withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(c))).drop(f"__r_{c}")
    return out


def lookup_with_sentinel(
    left: DataFrame,
    right: DataFrame,
    key: str,
    order_col: str,
    error_col: str = "error",
) -> DataFrame:
    """J3 — lookup join keeping exactly one right match (first by
    ``order_col`` — deterministic, unlike the reference's last-match
    dict-comprehension at ngap-logs.py:202-206); misses get the reference's
    ERROR sentinel (ngap-logs.py:208-210) in ``error_col``."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order_col)
    r1 = (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_hit", F.lit(True))
    )
    out = left.join(r1, on=key, how="left")
    return out.withColumn(
        error_col,
        F.when(F.col("_hit").isNull(), F.concat(F.lit(MISS_SENTINEL + " for "), F.col(key))),
    ).drop("_hit")


def nest_one_to_many(
    left: DataFrame, right: DataFrame, key: str, order_cols: list[str]
) -> DataFrame:
    """J4 — embed all right matches as a sorted array-of-struct column
    (``"bes": [...]`` in ngap-logs.py:291-295; sorted for determinism,
    SURVEY.md W4)."""
    rcols = [c for c in right.columns if c != key]
    nested = right.groupBy(key).agg(
        F.sort_array(F.collect_list(F.struct(*order_cols, *[c for c in rcols if c not in order_cols]))).alias(
            "related"
        )
    )
    out = left.join(nested, on=key, how="left")
    return out.withColumn("related", F.coalesce(F.col("related"), F.array()))


def full_outer_merge(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """J7 — jq group_by(key)|map(add): full-outer join with per-column
    coalesce (right wins on conflict, matching dict-add order)."""
    shared = [c for c in right.columns if c in left.columns and c != key]
    r = right
    for c in shared:
        r = r.withColumnRenamed(c, f"__r_{c}")
    out = left.join(r, on=key, how="full_outer")
    for c in shared:
        out = out.withColumn(c, F.coalesce(F.col(f"__r_{c}"), F.col(c))).drop(f"__r_{c}")
    return out


def unmatched_anti(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Anti-join — the reference's "unmatched records" (records lacking a
    ``bes`` key after the merge, combined_analysis.sh:5-9)."""
    return left.join(right, on=key, how="left_anti")


def interval_join(
    anchors: DataFrame,
    others: DataFrame,
    equi_keys: list[str],
    anchor_start: str,
    anchor_end: str,
    other_ts: str,
    bucketed: bool = True,
    bucket: str = "1 hour",
    n_salts: int = 1,
) -> DataFrame:
    """J5 — equi keys AND ``other_ts BETWEEN anchor_start AND anchor_end``
    (join_metrics_log_with_application_log.py:144-150; the golden test's
    outside-time-boundary record is excluded by the BETWEEN upper bound).

    ``bucketed=True`` adds an hour-bucket equi key: the anchor side explodes
    its interval into covered hour buckets (`sequence` + `explode`), the
    other side joins on its own hour bucket — turning a per-conv range scan
    into a hash join keyed on (equi_keys, hour). At 100 TB this bounds the
    join fan-out to per-hour cells instead of per-conv cross products.

    ``n_salts > 1`` additionally salts a HOT (equi_keys, hour) cell across
    ``n_salts`` reducers: the big (others) side gets a uniform salt, the
    small (anchors) side replicates across all salts — per-task fan-in for
    the hottest cell drops ~n_salts× at the cost of an n_salts× anchor
    replication (anchors ≪ others by construction).  Results are identical
    for any salt assignment (the salt only routes rows).  AQE's skew-join
    split (on in session.py) handles moderate skew without help; explicit
    salting is the knob for a pathological key — e.g. one conversation
    carrying >5% of all rows — where the split still leaves one stage
    straggling.  Equality + spread are asserted in tests/test_operators.py.
    """
    cond_range = (F.col(other_ts) >= F.col(anchor_start)) & (
        F.col(other_ts) <= F.col(anchor_end)
    )
    # rename the other side's equi keys to avoid ambiguous column names
    o = others
    for k in equi_keys:
        o = o.withColumnRenamed(k, f"__o_{k}")
    eq = [F.col(k) == F.col(f"__o_{k}") for k in equi_keys]

    if bucketed:
        a = anchors.withColumn(
            "_abucket",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col(anchor_start)),
                    F.date_trunc("hour", F.col(anchor_end)),
                    F.expr(f"INTERVAL {bucket}"),
                )
            ),
        )
        o = o.withColumn("_obucket", F.date_trunc("hour", F.col(other_ts)))
        cond = eq + [F.col("_abucket") == F.col("_obucket")]
        drop_cols = ["_abucket", "_obucket"]
        if n_salts > 1:
            # uniform per-row salt: content hash over the row's columns.
            # Must be DETERMINISTIC per row — a positional salt (e.g.
            # monotonically_increasing_id) changes under task retry or
            # speculative execution, and a shuffle key that moves between
            # attempts drops or duplicates join rows.  Content hashing is
            # stable across attempts; rows that are exact duplicates share
            # a salt, which only concentrates spread if the hot cell is
            # made of identical rows (then no partitioner can split them
            # anyway without a distinct).  Any assignment yields the same
            # join result.
            o = o.withColumn(
                "_osalt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in o.columns]), F.lit(n_salts)
                ).cast("int"),
            )
            a = a.withColumn(
                "_asalt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
            )
            cond = cond + [F.col("_asalt") == F.col("_osalt")]
            drop_cols += ["_asalt", "_osalt"]
        joined = a.join(o, on=cond, how="inner")
        joined = joined.filter(cond_range).drop(*drop_cols)
    else:
        joined = anchors.join(o, on=eq, how="inner").filter(cond_range)
    return joined.drop(*[f"__o_{k}" for k in equi_keys])


def bloom_prefiltered_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Inner/semi equi-join with a Bloom pre-filter on the BIG (left) side:
    the right side's join keys fold into an m_bits bitmap PACKED INTO
    m_bits/64 longs (one broadcast row), and left rows whose key misses any
    bit are dropped BEFORE the shuffle — at 100 TB this is the difference
    between shuffling the whole fact table and shuffling only the
    ~matching fraction when the join is selective (the manual form of
    AQE's runtime bloom pruning, available on any plan shape).

    Scale shape: the bitmap build is one narrow aggregate over the right
    keys (bit_or per 64-bit word, ≤ m_bits/64 rows collected — bounded by
    the m_bits KNOB, not by data); the probe is a broadcast crossJoin of
    that single row plus pure JVM bit arithmetic per left row — zero
    Python, no explode, no regroup, the left table is touched exactly
    once.  No false negatives (a Bloom never drops a real match), so the
    result EQUALS the plain join — that identity is the correctness gate.
    False positives only cost shuffle bytes; the join re-verifies the key.

    Bit positions are ``corpus.bloom_positions``' engine-portable md5-u32
    draw, so the filter is deterministic and oracle-checkable.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner or left_semi, got {how!r}")
    from functools import reduce

    from .corpus import bloom_bitmap

    key_str = F.col(key).cast("string")
    bdf = bloom_bitmap(right, key, m_bits, n_hashes)
    probe = left.crossJoin(F.broadcast(bdf))
    pos_cols = []
    for i in range(n_hashes):
        pc = f"_bp{i}"
        probe = probe.withColumn(
            pc,
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), key_str)), 1, 8),
                16,
                10,
            ).cast("long")
            % F.lit(int(m_bits)),
        )
        pos_cols.append(pc)
    tests = [
        F.expr(
            f"(element_at(_bloom, CAST({pc} div 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pc} % 64 AS INT))) != 0"
        )
        for pc in pos_cols
    ]
    pruned = probe.filter(reduce(lambda a, b: a & b, tests)).drop(
        "_bloom", *pos_cols
    )
    return pruned.join(right, key, how)


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    threshold_frac: float = 0.01,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Equi-join with DIFFERENTIAL hot-key handling: keys holding ≥
    ``threshold_frac`` of the left side (found by the bounded-state CMS
    scan, ``sketches.skewed_keys``) are joined via a BROADCAST of their
    right-side rows, everything else takes the ordinary shuffle join; the
    two halves union.  This is AQE's skew-join split done explicitly — it
    works on any plan shape, survives disabled AQE, and the decision is
    deterministic (md5 CMS), not a runtime size sample.

    Why it's safe: at most ``1/threshold_frac`` keys can exceed the
    threshold (plus CMS false positives, which only over-broadcast a cold
    key harmlessly), so the driver-side hot-key list and the broadcast are
    bounded by the KNOB; CMS never undercounts, so no truly hot key ever
    reaches the shuffle side to straggle.  Output EQUALS the plain join —
    that identity is the correctness gate.
    """
    if how not in ("inner", "left_outer", "left_semi"):
        raise ValueError(f"unsupported how: {how!r}")
    from .sketches import skewed_keys

    hot_rows = skewed_keys(
        left, key, threshold_frac=threshold_frac, depth=depth, width=width
    ).collect()
    hot = [r[key] for r in hot_rows]
    if not hot:
        return left.join(right, key, how)
    cold = left.filter(~F.col(key).isin(hot)).join(right, key, how)
    hot_j = left.filter(F.col(key).isin(hot)).join(
        F.broadcast(right.filter(F.col(key).isin(hot))), key, how
    )
    return cold.unionByName(hot_j)


def broadcast_interval_lookup(
    fact: DataFrame,
    intervals: list[tuple],
    ts_col: str = "ts",
    out: str = "interval_label",
) -> DataFrame:
    """Interval-dimension lookup WITHOUT a join node: label each fact row
    with the (start, end, label) interval containing its timestamp — the
    calendar/maintenance-window/release-train enrichment that, written as a
    non-equi join, Spark can only plan as a BroadcastNestedLoopJoin (every
    row × every interval through a join operator).  Here the dimension
    rides as a LITERAL sorted struct array inside one projection:
    ``filter(dim, i -> start <= ts < end)`` then take the LAST match —
    the latest-starting (most specific) interval when they overlap.  Plan
    is scan → project: zero shuffles, zero Python, codegen-friendly;
    cost O(|dim|) per row, the right trade for the ≤10³ intervals a
    calendar dim holds (bigger dims deserve the bucketed interval_join).

    ``intervals``: (start, end, label) with [start, end) semantics; start/
    end as datetime or ISO strings (parsed by ``F.lit`` casting).  No
    match → NULL label.  Overlap tie-break: max start, then max label
    (fully deterministic).
    """
    if not intervals:
        raise ValueError("intervals must be non-empty")
    dim = F.array(
        *[
            F.struct(
                F.lit(s).cast("timestamp").alias("s"),
                F.lit(e).cast("timestamp").alias("e"),
                F.lit(lab).alias("lab"),
            )
            for s, e, lab in intervals
        ]
    )
    ts = F.col(ts_col)
    hits = F.filter(dim, lambda iv: (iv["s"] <= ts) & (ts < iv["e"]))
    best = F.array_max(
        F.transform(hits, lambda iv: F.struct(iv["s"].alias("s"),
                                              iv["lab"].alias("lab")))
    )
    return fact.withColumn(out, best["lab"])


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    fields: list[tuple[str, str, int]],
    left_id: str,
    right_id: str,
    threshold_micro: int,
    best_per_left: bool = True,
) -> DataFrame:
    """Record linkage (entity resolution): match ``left`` rows to ``right``
    rows by a weighted multi-field string-similarity score — the dedup
    problem for STRUCTURED records (customers, suppliers, users) where
    near-dup text machinery doesn't apply.

    ``fields`` is [(left_col, right_col, weight_micro)] with weights
    summing to 1,000,000.  Per-field similarity is length-normalized
    Levenshtein as an exact integer:

        sim_micro = 1e6 − (lev(a, b) · 1e6) div max(len(a), len(b), 1)

    (NULL on either side ⇒ 0), and the record score is
    Σ wᵢ·simᵢ div 1e6 — integer end to end, so a DuckDB oracle replays it
    bit-for-bit.  Matches below ``threshold_micro`` are dropped; with
    ``best_per_left`` each left record keeps only its best match
    (score desc, right id asc — deterministic).

    Scale shape: candidates form ONLY inside a block (equi-join on
    ``block_cols`` — the standard blocking step of record linkage; pick
    keys that bound block size), the Levenshtein DP runs JVM-side on the
    candidate pairs, and the argmax is one struct-min aggregate — no
    window, no cross join (plan guards candidates to the block product).
    """
    if sum(w for _, _, w in fields) != 1_000_000:
        raise ValueError("field weights must sum to 1,000,000 micro")
    l = left.select(
        F.col(left_id).alias("_lid"),
        *[F.col(c).alias(f"_l{i}") for i, (c, _, _) in enumerate(fields)],
        *[F.col(c).alias(f"_bk{j}") for j, c in enumerate(block_cols)],
    )
    r = right.select(
        F.col(right_id).alias("_rid"),
        *[F.col(c).alias(f"_r{i}") for i, (_, c, _) in enumerate(fields)],
        *[F.col(c).alias(f"_bk{j}") for j, c in enumerate(block_cols)],
    )
    cand = l.join(r, [f"_bk{j}" for j in range(len(block_cols))])
    sims = []
    for i, (_, _, w) in enumerate(fields):
        a, b = F.col(f"_l{i}"), F.col(f"_r{i}")
        sim = F.expr(
            f"1000000 - CAST(levenshtein(_l{i}, _r{i}) AS BIGINT) * 1000000 "
            f"div greatest(length(_l{i}), length(_r{i}), 1)"
        )
        sims.append(
            F.when(a.isNull() | b.isNull(), F.lit(0)).otherwise(sim) * w
        )
    total = sims[0]
    for s in sims[1:]:
        total = total + s
    scored = cand.withColumn("_raw", total).select(
        "_lid", "_rid", F.expr("_raw div 1000000").alias("score_micro")
    )
    hits = scored.filter(F.col("score_micro") >= threshold_micro)
    if not best_per_left:
        return hits.select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "score_micro",
        )
    best = (
        hits.groupBy("_lid")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("ns"),
                    F.col("_rid").alias("rid"),
                )
            ).alias("w")
        )
        .select(
            F.col("_lid").alias(left_id),
            F.col("w.rid").alias(right_id),
            (-F.col("w.ns")).cast("long").alias("score_micro"),
        )
    )
    return best


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_start: str = "start_ts",
    left_end: str = "end_ts",
    right_start: str = "r_start_ts",
    right_end: str = "r_end_ts",
    equi_keys: list[str] | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — "which sessions overlapped an
    incident window", "which deploys intersected an alert span": two
    tables of CLOSED [start, end] intervals, joined where they share any
    instant (``l.start <= r.end AND r.start <= l.end``).  The missing
    sibling of ``interval_join`` (point-in-interval): here BOTH sides
    have extent.

    Returns one row per overlapping (left_id, right_id) pair with the
    exact intersection: ``overlap_start = greatest(starts)``,
    ``overlap_end = least(ends)`` and integer ``overlap_us``.

    Scale shape: BOTH sides explode into their covered time buckets and
    hash-join on (equi_keys, bucket) — fan-out bounded by interval
    length / bucket, never a per-row range scan; the overlap predicate
    filters inside the join and pairs dedup AFTER projecting the
    bucket away (duplicate bucket hits collapse).  Pick ``bucket`` near
    the typical interval length: too fine multiplies the explode, too
    coarse fattens the candidate cells."""
    eq = list(equi_keys or [])

    def bucketed(df, s, e):
        return df.withColumn(
            "_ob",
            F.explode(
                F.sequence(
                    F.date_trunc("hour", F.col(s)),
                    F.date_trunc("hour", F.col(e)),
                    F.expr(f"INTERVAL {bucket}"),
                )
            ),
        )

    l = bucketed(
        left.select(left_id, *eq, left_start, left_end), left_start, left_end
    )
    r = bucketed(
        right.select(right_id, *eq, right_start, right_end),
        right_start,
        right_end,
    )
    for k in eq:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = [F.col("_ob") == F.col("_rob")] + [
        F.col(k) == F.col(f"__r_{k}") for k in eq
    ]
    r = r.withColumnRenamed("_ob", "_rob")
    j = (
        l.join(r, on=cond)
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
        )
        .select(
            left_id,
            right_id,
            *eq,
            F.greatest(F.col(left_start), F.col(right_start)).alias(
                "overlap_start"
            ),
            F.least(F.col(left_end), F.col(right_end)).alias("overlap_end"),
        )
        .dropDuplicates([left_id, right_id])
    )
    return j.withColumn(
        "overlap_us",
        (
            F.unix_micros(F.col("overlap_end"))
            - F.unix_micros(F.col("overlap_start"))
        ).cast("long"),
    )
