"""Time-series / product-analytics operators over event streams.

The reference analyzes request logs as point events (timing pairs,
sessionization, interval joins — SURVEY.md §2.3 J5, §2.6 W3); this module
adds the event-stream operators a telemetry pipeline needs that Spark has
no built-in for:

  * ``asof_join`` — for every left event, the most recent right event at or
    before it (per key), the enrichment join Pandas calls ``merge_asof`` and
    DuckDB calls ``ASOF JOIN``.  Spark-first shape: NO range join and no
    per-left-row probe — both sides are union-tagged and a single window
    scan per key carries the latest right payload forward, so the whole
    operator is ONE shuffle on the key (the same shuffle a plain equi-join
    would pay) regardless of how many right rows precede each left row.
  * ``sliding_counts`` — overlapping (hopping) time-window aggregates via
    ``F.window(ts, length, slide)``; each event lands in length/slide
    buckets map-side, the aggregate is algebraic (partial agg free).
  * ``funnel_steps`` — ordered-step funnel matching (signup→view→purchase):
    per user, the events are assembled once (one shuffle) and the greedy
    sequential match runs as a JVM ``aggregate`` lambda over the sorted
    struct array — zero Python, zero extra shuffles.
  * ``cohort_retention`` — classic weekly cohort/retention matrix in ONE
    shuffle: per-user distinct activity weeks are collected in the same
    aggregate that determines the cohort week (``array_min``), then
    exploded to (cohort, offset) counts.

Scale notes: every operator here shuffles at most once, keyed by the
entity key (user), never by time — so hot time ranges don't straggle; a
hot *user* in asof_join is bounded by that user's own history length (the
window is a linear scan, not a join fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    value_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    tolerance_sec: int | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the ``value_cols`` of the NEAREST
    right row at-or-before it (``direction="backward"``, the default —
    greatest ``(right_ts, right_order)`` with ``right_ts <= left_ts``,
    DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics) or at-or-after
    it (``direction="forward"`` — smallest ``(right_ts, right_order)``
    with ``right_ts >= left_ts``); NULLs when no such row exists or it is
    further away than ``tolerance_sec``.

    Implementation: union-tag the two streams, one window per key ordered
    by ``(ts, side, order)`` with right rows (side=0) sorting before left
    rows (side=1) at equal timestamps, and carry the right payload forward
    with ``last(..., ignorenulls=True)``.  The payload is packed into ONE
    struct so a NULL inside a right value column can never make the carry
    skip back to an older row — the match is atomic.

    ``right_order`` must be a unique-per-row right column (e.g. an event
    id); it makes the tie-break among equal right timestamps deterministic,
    which the oracle (LATERAL ... ORDER BY ts DESC, ord DESC LIMIT 1)
    mirrors exactly.

    One shuffle on ``key``; no range explosion; a left row's cost is O(1)
    beyond the per-key sort a plain windowed dedup would already pay.
    """
    if right_order is None:
        raise ValueError("right_order is required for a deterministic tie-break")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    lcols = left.columns
    payload = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c) for c in value_cols]
    )
    rtag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ats"),
        F.col(right_order).cast("long").alias("_aord"),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    ltag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast("long").alias("_aord"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtag.schema["_rv"].dataType).alias("_rv"),
        *lcols,
    )
    # forward = the same scan run in reverse time: right rows still sort
    # before left rows at equal timestamps (inclusive), and the DESC order
    # on _aord makes the carried match the SMALLEST (ts, order) at-or-after
    if direction == "backward":
        order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_aord").asc()]
    else:
        order = [F.col("_ats").desc(), F.col("_side").asc(), F.col("_aord").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ltag.unionByName(rtag).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        gap = F.unix_timestamp(F.col("_ats")) - F.unix_timestamp(
            F.col("_match._mts")
        )
        if direction == "forward":
            gap = -gap
        in_tol = gap <= F.lit(tolerance_sec)
        out = out.withColumn(
            "_match", F.when(in_tol, F.col("_match")).otherwise(F.lit(None))
        )
    sel = [F.col(c) for c in lcols]
    sel.append(F.col("_match._mts").alias(f"{prefix}ts"))
    sel.extend(F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols)
    return out.select(*sel)


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    window_sec: int,
    slide_sec: int,
    group: str | None = None,
) -> DataFrame:
    """Hopping-window counts: every event is counted in each of the
    ``window_sec / slide_sec`` overlapping windows covering it (windows
    aligned to the epoch, Spark ``F.window`` semantics).  The explode is
    map-side and the count is algebraic, so partial aggregation absorbs the
    ×(L/S) row multiplication before the shuffle."""
    if window_sec % slide_sec != 0:
        raise ValueError("window_sec must be a multiple of slide_sec")
    win = F.window(
        F.col(ts_col), f"{window_sec} seconds", f"{slide_sec} seconds"
    )
    keys = [win.alias("w")] + ([F.col(group)] if group else [])
    out = df.groupBy(*keys).agg(F.count("*").alias("n"))
    sel = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
    ] + ([F.col(group)] if group else []) + [F.col("n")]
    return out.select(*sel)


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    order_col: str,
) -> DataFrame:
    """Ordered-step funnel: per user, greedily scan events in
    ``(ts, order_col)`` order and advance one step whenever the current
    event's type equals the next unmatched step.  Returns one row per user
    with ``steps_completed`` (0..len(steps)).

    One shuffle (the per-user collect); the sequential match is a JVM
    ``aggregate`` higher-order lambda over the sorted struct array — the
    per-user cost is linear in that user's event count and no Python runs.
    """
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(order_col).alias("ord"),
                F.col(type_col).alias("t"),
            )
        )
    )
    matched = F.aggregate(
        F.col("_events"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(len(steps)))
            & (e["t"] == F.element_at(steps_lit, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        df.groupBy(user_col)
        .agg(ev.alias("_events"))
        .select(
            user_col, matched.cast("int").alias("steps_completed")
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: cohort = the Monday-truncated week of a
    user's first event; one output row per (cohort_week, week_offset) with
    the number of cohort users active in that offset week.

    ONE shuffle: per-user distinct activity weeks are a ``collect_set`` in
    the same aggregate that yields the cohort week (``array_min``); the
    (cohort, offset) explode and final count are map-side + algebraic.
    """
    week = F.date_trunc("week", F.col(ts_col))
    per_user = df.groupBy(user_col).agg(
        F.collect_set(week).alias("_weeks")
    )
    cohort = F.array_min("_weeks")
    exploded = per_user.select(
        cohort.alias("cohort_week"), F.explode("_weeks").alias("_w")
    )
    offset = (F.datediff(F.col("_w"), F.col("cohort_week")) / 7).cast("int")
    return (
        exploded.select("cohort_week", offset.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def rolling_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    n: int,
    order_col: str,
) -> DataFrame:
    """Per-entity trailing-window statistics: for every event, the count /
    sum / min / max of ``value_col`` over that entity's last ``n`` events
    (inclusive), in ``(ts, order_col)`` order — the per-user moving
    aggregate behind rate limiting, anomaly baselines and burst detection.

    ONE shuffle on the key; the frame is ROWS BETWEEN n-1 PRECEDING AND
    CURRENT ROW, so per-row cost is O(1) amortized and a hot entity costs
    its own history length, never a join fan-out.  The sum is computed over
    integer micro-units (round(value·1e6)) so the trailing sum is exact
    cross-engine — a float running sum would accumulate order-dependent
    error.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    micro = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return df.select(
        key,
        ts_col,
        order_col,
        F.count(micro).over(w).alias("roll_n"),
        F.sum(micro).over(w).alias("roll_sum_micro"),
        F.min(F.col(value_col)).over(w).alias("roll_min"),
        F.max(F.col(value_col)).over(w).alias("roll_max"),
    )


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    order_col: str,
) -> DataFrame:
    """``funnel_steps`` plus WHEN: one row per user with steps_completed
    and ``t1..tn`` — the timestamp at which each step was greedily matched
    (NULL beyond the reached step) — the input to time-to-convert and
    drop-off-latency analyses.  Same single-shuffle shape: the accumulator
    struct carries (n, matched timestamps) through one JVM aggregate fold."""
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(order_col).alias("ord"),
                F.col(type_col).alias("t"),
            )
        )
    )
    init = F.struct(
        F.lit(0).alias("n"), F.array().cast("array<timestamp>").alias("hits")
    )
    acc = F.aggregate(
        F.col("_events"),
        init,
        lambda a, e: F.when(
            (a["n"] < F.lit(len(steps)))
            & (e["t"] == F.element_at(steps_lit, a["n"] + 1)),
            F.struct(
                (a["n"] + 1).alias("n"),
                F.concat(a["hits"], F.array(e["ts"])).alias("hits"),
            ),
        ).otherwise(a),
    )
    sel = [
        F.col(user_col),
        F.col("_acc.n").cast("int").alias("steps_completed"),
    ] + [
        # try_: ANSI mode throws on out-of-range element_at, and hits is
        # legitimately shorter than steps for users who dropped off
        F.try_element_at(F.col("_acc.hits"), F.lit(i + 1)).alias(f"t{i + 1}")
        for i in range(len(steps))
    ]
    return (
        df.groupBy(user_col)
        .agg(ev.alias("_events"))
        .withColumn("_acc", acc)
        .select(*sel)
    )


def downsample_ohlc(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    bucket_sec: int,
) -> DataFrame:
    """Time-series downsampling to per-(key, bucket) OHLC bars — the
    metrics-store resolution reducer (Gorilla/TSDB style): open/close are
    the first/last values in ``(ts, order)`` scan order, high/low the
    extrema, plus count and an integer-micro sum for exact means.

    ONE algebraic aggregate (map-side combine absorbs the bucket fan-in):
    open/close ride ``min``/``max`` over a (ts, order, value) struct —
    lexicographic struct comparison IS the scan order, so no window and no
    second pass."""
    bucket = F.window(F.col(ts_col), f"{bucket_sec} seconds")
    probe = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(order_col).alias("ord"),
        F.col(value_col).alias("v"),
    )
    micro = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    out = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key), bucket.alias("w"))
        .agg(
            F.min(probe).alias("_first"),
            F.max(probe).alias("_last"),
            F.min(value_col).alias("low"),
            F.max(value_col).alias("high"),
            F.count(F.lit(1)).alias("n"),
            F.sum(micro).alias("sum_micro"),
        )
    )
    return out.select(
        key,
        F.col("w.start").alias("bucket_start"),
        F.col("_first.v").alias("open"),
        F.col("high"),
        F.col("low"),
        F.col("_last.v").alias("close"),
        "n",
        "sum_micro",
    )


def quantile_anomalies(
    df: DataFrame,
    value_col: str,
    group: str,
    q: float = 0.99,
    resolution: float = 0.25,
) -> DataFrame:
    """Rows whose value exceeds their group's q-quantile (histogram-CDF —
    fixed-state, resolution-bounded): the per-type p99 spike filter.  The
    k-row quantile table broadcasts; detection is a pure filter over the
    scan — no window touches the event stream."""
    from .sketches import hist_quantiles

    thr = hist_quantiles(
        df, value_col, [q], resolution=resolution, group=group
    ).select(group, F.col("value").alias("_thr"))
    return (
        df.join(F.broadcast(thr), group)
        .filter(F.col(value_col) > F.col("_thr"))
        .drop("_thr")
    )


def burst_hours(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    n_trail: int = 24,
    z: int = 3,
) -> DataFrame:
    """Temporal anomaly (burst/drop) detection on hourly event counts per
    key — the alerting primitive a log pipeline runs on error rates: an
    hour is anomalous when its count deviates from the trailing
    ``n_trail`` hours' mean by more than ``z`` standard deviations.

    Counts live on a DENSE hour spine (per key, every hour from its first
    to its last event, absent hours = 0) — without zero-fill a total
    outage is invisible to a row-based window and a spike after a quiet
    gap compares against the wrong baseline.

    Exact cross-engine by construction: the z-test is the cross-multiplied
    INTEGER comparison

        (n·c − Σ)²  >  z²·(n·Σc² − Σ²)      [n = n_trail]

    (both sides DECIMAL(38,0); dividing both by n² gives the usual
    (c−mean)² > z²·var with var = (n·Σc²−Σ²)/n²) — no float, no division,
    so the DuckDB oracle replays it bit-for-bit.  Hours with fewer than
    ``n_trail`` trailing hours are never flagged (no baseline yet); a
    constant baseline (var = 0) flags ANY deviation — where a float
    z-score would divide by zero.

    Scale shape: one (key, hour) count aggregate; the spine is built from
    the per-key (min, max) hour aggregate via sequence+explode (narrow);
    the rolling sums are ONE ordered window per key over hour-count rows
    (≤ 8760 rows per key-year, whatever the event volume) — the raw
    stream is never windowed.
    """
    counts = hourly_counts(df, ts_col, key_col)
    return burst_from_counts(counts, key_col, n_trail=n_trail, z=z)


def hourly_counts(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """(key, hour_id, cnt) hourly counts — the mergeable state the
    streaming twin folds per micro-batch (counts ADD across batches)."""
    hour = F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    return (
        df.select(F.col(key_col).alias("key"), hour.alias("hour_id"))
        .groupBy("key", "hour_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def burst_from_counts(
    counts: DataFrame, key_col: str, n_trail: int = 24, z: int = 3
) -> DataFrame:
    """The spine + trailing-window + integer z-test over a (key, hour_id,
    cnt) table — shared verbatim by the batch and streaming paths so the
    two can never drift."""
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("hour_id")
        .rowsBetween(-n_trail, -1)
    )
    trailed = dense.select(
        "key",
        "hour_id",
        "cnt",
        F.count(F.lit(1)).over(w).alias("_m"),
        F.sum("cnt").over(w).alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("_ss"),
    )
    n = n_trail
    dev = F.expr(f"CAST({n} AS DECIMAL(38,0)) * cnt - _s")
    lhs = dev * dev
    rhs = F.expr(f"CAST({z * z} AS DECIMAL(38,0))") * F.expr(
        f"CAST({n} AS DECIMAL(38,0)) * _ss - CAST(_s AS DECIMAL(38,0)) * _s"
    )
    flagged = F.when(
        (F.col("_m") == n) & (lhs > rhs),
        F.when(dev > 0, F.lit("spike")).otherwise(F.lit("drop")),
    )
    return trailed.select(
        F.col("key").alias(key_col),
        "hour_id",
        "cnt",
        flagged.alias("anomaly"),
    )


def incidents(
    flagged: DataFrame, key_col: str = "key"
) -> DataFrame:
    """Coalesce consecutive anomalous hours into INCIDENTS — the alert
    stream an on-call actually wants (one page per outage, not one per
    hour).  Input is ``burst_hours`` output filtered to flagged rows;
    consecutive hour_ids per key merge via the islands trick
    (hour_id − row_number() is constant within a run), yielding
    (key, start_hour, end_hour, n_hours, peak_cnt, sides) with sides the
    sorted distinct anomaly labels the incident spanned.

    One key shuffle for the rank window over FLAGGED hours only (alert
    volume, not event volume), one aggregate."""
    w = Window.partitionBy(key_col).orderBy("hour_id")
    grouped = flagged.select(
        key_col,
        "hour_id",
        "cnt",
        "anomaly",
        (F.col("hour_id") - F.row_number().over(w)).alias("_island"),
    )
    return (
        grouped.groupBy(key_col, "_island")
        .agg(
            F.min("hour_id").alias("start_hour"),
            F.max("hour_id").alias("end_hour"),
            F.count(F.lit(1)).alias("n_hours"),
            F.max("cnt").alias("peak_cnt"),
            F.concat_ws(
                ",", F.array_sort(F.collect_set("anomaly"))
            ).alias("sides"),
        )
        .drop("_island")
    )


def cusum_hours(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    k_milli: int = 300,
    h_mult: int = 12,
) -> DataFrame:
    """Slow-drift detection on hourly event counts per key — the CUSUM
    (Page 1954) complement of ``burst_hours``: a sustained +10% shift
    never clears a per-hour z-test but accumulates linearly in a CUSUM,
    so the leak/regression class of incident (error rate creeping up,
    traffic bleeding away) is caught hours-to-days sooner.

    Semantics (offline, two-sided, exact): with per-key full-window mean
    mu = S/n over the dense hour spine,

        up_t   = max(0, up_{t-1}   + (c_t - mu - k*mu))
        down_t = max(0, down_{t-1} + (mu - c_t - k*mu))
        drift  = 'up'   when up_t   > h*mu
               = 'down' when down_t > h*mu

    k (slack, ``k_milli``/1000 of the mean) absorbs noise; h
    (``h_mult`` means of cumulative excess) sets the alert level.

    Exact cross-engine by construction: scaling by 1000*n clears every
    division —

        X_t  = 1000*n*c_t - (1000 + k_milli)*S        [up side]
        X'_t = (1000 - k_milli)*S - 1000*n*c_t        [down side]

    and the max(0, ...) recurrence has the closed reflection form
    ``cusum_t = P_t - least(0, min_{j<=t} P_j)`` with P the running
    prefix sum — two window functions (running sum + running min), no
    recursion, no float, identical in Spark and DuckDB.  Emitted CUSUM
    levels are integer milli-means (``X div S``).

    Scale shape: identical to ``burst_hours`` — one (key, hour) count
    aggregate, a narrow spine, then ONE ordered window per key over
    hour-count rows (bounded by hours observed, never event volume).
    The full-window mean needs the per-key total: that is the same
    aggregate that builds the spine, so no extra shuffle.
    """
    counts = hourly_counts(df, ts_col, key_col)
    return cusum_from_counts(counts, key_col, k_milli=k_milli, h_mult=h_mult)


def cusum_from_counts(
    counts: DataFrame, key_col: str, k_milli: int = 300, h_mult: int = 12
) -> DataFrame:
    """CUSUM over a (key, hour_id, cnt) table — shared by the batch path
    and any streaming twin folding hourly counts (counts ADD across
    micro-batches, and the CUSUM replays deterministically from the
    folded counts)."""
    if not (0 <= k_milli < 1000):  # down-side weight must stay positive
        raise ValueError(f"k_milli must be in [0, 1000): {k_milli}")
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    # per-key totals ride the same rows via an unbounded window (one key
    # shuffle serves the totals, the prefix sums and the prefix mins)
    wall = Window.partitionBy("key")
    word = Window.partitionBy("key").orderBy("hour_id")
    wrun = word.rowsBetween(Window.unboundedPreceding, 0)
    dec = "CAST({} AS DECIMAL(38,0))"
    based = dense.select(
        "key",
        "hour_id",
        "cnt",
        F.expr(dec.format("count(*) OVER (PARTITION BY key)")).alias("_n"),
        F.expr(dec.format("sum(cnt) OVER (PARTITION BY key)")).alias("_s"),
    )
    x_up = F.expr("1000 * _n * cnt - (1000 + {k}) * _s".format(k=k_milli))
    x_dn = F.expr("(1000 - {k}) * _s - 1000 * _n * cnt".format(k=k_milli))
    pref = based.select(
        "key",
        "hour_id",
        "cnt",
        "_s",
        F.sum(x_up).over(wrun).alias("_pu"),
        F.sum(x_dn).over(wrun).alias("_pd"),
    ).select(
        "key",
        "hour_id",
        "cnt",
        "_s",
        (F.col("_pu") - F.least(F.lit(0), F.min("_pu").over(wrun))).alias("_cu"),
        (F.col("_pd") - F.least(F.lit(0), F.min("_pd").over(wrun))).alias("_cd"),
    )
    thresh = F.expr(f"CAST({h_mult} AS DECIMAL(38,0)) * 1000 * _s")
    drift = (
        F.when(F.col("_cu") > thresh, F.lit("up"))
        .when(F.col("_cd") > thresh, F.lit("down"))
    )
    return pref.select(
        F.col("key").alias(key_col),
        "hour_id",
        "cnt",
        F.expr("CAST(_cu div _s AS BIGINT)").alias("cusum_up_mm"),
        F.expr("CAST(_cd div _s AS BIGINT)").alias("cusum_down_mm"),
        drift.alias("drift"),
    )


# ln(2/alpha) in micro-nats for alpha = 0.05 — a LITERAL both engines
# compare as an integer, so significance never depends on a float ln.
PETTITT_ALPHA_MICRO_05 = 3_688_879


def pettitt_changepoint(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    alpha_micro: int = PETTITT_ALPHA_MICRO_05,
) -> DataFrame:
    """Nonparametric single-changepoint detection (Pettitt 1979) on hourly
    event counts per key — the "WHEN did the level shift" complement of
    ``burst_hours`` (point anomalies) and ``cusum_hours`` (drift alarms,
    which need a slack/threshold tuned to the shift size): Pettitt is
    rank-based, so it needs NO distributional assumption and no magnitude
    knob, and it localizes the shift hour.

    Semantics (exact): over each key's dense hour spine (n hours, counts
    c_t), the Mann-Whitney-type statistic

        U_t = sum_{i<=t} sum_{j>t} sgn(c_i - c_j),   t = 1..n-1

    has the rank form  U_t = W2_t - t*(n+1)  with W2_t the running sum of
    DOUBLED mid-ranks (2r = 2*#less + #ties + 1 — integer even under
    ties), so every U_t is an exact integer.  The changepoint is argmax
    |U_t| (earliest t on ties — deterministic); significance uses the
    standard approximation p ~ 2*exp(-6*K^2/(n^3+n^2)) cross-multiplied to
    the INTEGER comparison

        6 * 10^6 * K^2  >  alpha_micro * (n^3 + n^2)

    (both sides DECIMAL(38,0); ``alpha_micro`` = ln(2/alpha) in micro-nats
    as a literal) — no float, no exp, no division, so the DuckDB oracle
    replays it bit-for-bit.

    Returns one row per key with >= 2 spine hours: (key, cp_hour = last
    hour of the pre-shift segment, n_hours, u_abs = K, mean_before_mc /
    mean_after_mc in exact milli-counts/hour, significant).

    Scale shape: one (key, hour) count aggregate; then everything runs on
    the spine (<= 8760 rows per key-year, whatever the event volume) —
    one value-ordered window (ranks), one hour-ordered window (prefix
    sums), one struct-min argmax aggregate per key.  The raw stream is
    never windowed or re-shuffled.
    """
    counts = hourly_counts(df, ts_col, key_col)
    return pettitt_from_counts(counts, key_col, alpha_micro=alpha_micro)


def pettitt_from_counts(
    counts: DataFrame, key_col: str, alpha_micro: int = PETTITT_ALPHA_MICRO_05
) -> DataFrame:
    """Pettitt over a (key, hour_id, cnt) table — shares the mergeable
    hourly-count state with the burst/CUSUM paths, so a streaming fold of
    counts replays the test deterministically."""
    if alpha_micro <= 0:
        raise ValueError(f"alpha_micro must be positive: {alpha_micro}")
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    # doubled mid-rank: rank() gives #less+1 for every tie member; the
    # per-(key, value) count gives the tie size — 2r = 2*rank + ties - 1.
    wval = Window.partitionBy("key").orderBy("cnt")
    wtie = Window.partitionBy("key", "cnt")
    wkey = Window.partitionBy("key")
    word = Window.partitionBy("key").orderBy("hour_id")
    wrun = word.rowsBetween(Window.unboundedPreceding, 0)
    ranked = dense.select(
        "key",
        "hour_id",
        "cnt",
        (2 * F.rank().over(wval) + F.count(F.lit(1)).over(wtie) - 1).alias("_r2"),
        F.count(F.lit(1)).over(wkey).alias("_n"),
        F.sum("cnt").over(wkey).alias("_stot"),
    )
    pref = ranked.select(
        "key",
        "hour_id",
        "_n",
        "_stot",
        F.row_number().over(word).alias("_t"),
        F.sum("_r2").over(wrun).alias("_w2"),
        F.sum("cnt").over(wrun).alias("_sc"),
    ).filter(F.col("_t") < F.col("_n"))
    scored = pref.select(
        "key",
        "_n",
        "_stot",
        "_t",
        "_sc",
        "hour_id",
        F.abs(F.col("_w2") - F.col("_t") * (F.col("_n") + 1)).alias("_u"),
    )
    best = scored.groupBy("key").agg(
        F.min(F.struct(
            (-F.col("_u")).alias("_negu"),
            F.col("_t").alias("_t"),
            F.col("hour_id").alias("_h"),
            F.col("_sc").alias("_sc"),
            F.col("_n").alias("_n"),
            F.col("_stot").alias("_stot"),
        )).alias("b")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    sig = F.expr(
        "6 * 1000000 * {u} * {u} > CAST({a} AS DECIMAL(38,0)) * ({n} * {n} * {n} + {n} * {n})".format(
            u=dec.format("-b._negu"), a=alpha_micro, n=dec.format("b._n")
        )
    )
    return best.select(
        F.col("key").alias(key_col),
        F.col("b._h").alias("cp_hour"),
        F.col("b._n").cast("long").alias("n_hours"),
        (-F.col("b._negu")).cast("long").alias("u_abs"),
        F.expr("CAST((1000 * b._sc) div b._t AS BIGINT)").alias("mean_before_mc"),
        F.expr(
            "CAST((1000 * (b._stot - b._sc)) div (b._n - b._t) AS BIGINT)"
        ).alias("mean_after_mc"),
        sig.alias("significant"),
    )


# ---------------------------------------------------------------------------
# Gauge-series operators: time-weighted averages, gap-fill interpolation,
# seasonal (hour-of-day) robust anomaly detection.
# ---------------------------------------------------------------------------


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    val_col: str,
    order_col: str,
) -> DataFrame:
    """Time-weighted mean of a sampled gauge per key — the TSDB aggregate
    for irregularly-sampled values, where a plain ``avg`` over-weights
    bursts of closely-spaced samples: each sample holds its value until
    the NEXT sample (last-observation-carried-forward), so its weight is
    the microseconds until that successor; the final sample carries no
    weight (the series is integrated over [first_ts, last_ts]).

    Exact integer math end to end: values quantize to micro-units
    (round(v * 1e6) — exact for telemetry with fixed decimals), weights
    are ``unix_micros`` differences, and the products accumulate in
    DECIMAL(38,0) (a long would overflow at ~1e18: 1e8 micro-value x
    hour-long gaps does that in a few thousand samples).  The returned
    ``twa_micro`` is the integral division num div den — bit-replayable
    by a DuckDB oracle (``//`` and ``div`` both truncate toward zero).

    ``order_col`` (a unique-per-row column, e.g. the event id) breaks ties
    among equal timestamps deterministically; zero-length segments weigh 0
    whatever the order, so ties can't change the result — the tie-break
    only pins WHICH row is "last" (weightless) for n_events accounting.

    Scale shape: ONE shuffle on the key (the window sort), then a plain
    algebraic aggregate; no self-join, no range join, a hot key costs its
    own history length, never a fan-out.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    v_micro = F.round(F.col(val_col) * 1_000_000).cast("long")
    seg = df.select(
        F.col(key_col).alias("key"),
        v_micro.alias("_v"),
        (
            F.lead(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        ).alias("_dt"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = seg.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("_dt"), F.lit(0))).alias("span_us"),
        F.sum(
            dec(F.col("_v")) * dec(F.coalesce(F.col("_dt"), F.lit(0)))
        ).alias("_num"),
    )
    return agg.select(
        F.col("key").alias(key_col),
        "n_events",
        F.col("span_us").cast("long").alias("span_us"),
        F.when(
            F.col("span_us") > 0,
            F.expr("CAST(_num div CAST(span_us AS DECIMAL(38,0)) AS BIGINT)"),
        ).alias("twa_micro"),
    )


def hourly_gauge(
    df: DataFrame, ts_col: str, key_col: str, val_col: str
) -> DataFrame:
    """(key, hour_id, sum_micro, cnt) hourly gauge state — mergeable like
    ``hourly_counts`` (sums and counts ADD across batches), so a streaming
    fold maintains it incrementally; the hour's gauge value derives as
    sum_micro div cnt at read time (``gapfill_linear``)."""
    hour = F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    v_micro = F.round(F.col(val_col) * 1_000_000).cast("long")
    return (
        df.select(
            F.col(key_col).alias("key"), hour.alias("hour_id"),
            v_micro.alias("_v"),
        )
        .groupBy("key", "hour_id")
        .agg(F.sum("_v").alias("sum_micro"), F.count(F.lit(1)).alias("cnt"))
    )


def gapfill_linear(gauge: DataFrame) -> DataFrame:
    """Dense hourly gauge series with LINEAR interpolation across gaps —
    the TSDB ``gap_fill + interpolate`` read path: every hour from each
    key's first to last observed hour appears exactly once; observed hours
    carry their mean (sum_micro div cnt, exact integral micro-units),
    missing hours carry

        v_prev + ((v_next - v_prev) * (h - h_prev)) div (h_next - h_prev)

    — integral division (truncation toward zero, identical in Spark and
    DuckDB), so the fill is deterministic exact integers, no float drift.
    Interior gaps always have both neighbors (the spine spans observed
    min..max), so no row is left NULL.

    Input: a (key, hour_id, sum_micro, cnt) table from ``hourly_gauge``.
    Output: (key, hour_id, v_micro, interpolated).

    Scale shape: the raw stream is aggregated ONCE map-side-combinably;
    everything after runs on the spine (<= 8760 rows per key-year): one
    spine join + two mirrored windows over the same key partitioning —
    Spark plans one Exchange, the sorts reuse it.
    """
    spine = (
        gauge.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(gauge, ["key", "hour_id"], "left").select(
        "key",
        "hour_id",
        F.expr("CAST(sum_micro div cnt AS BIGINT)").alias("_obs"),
    )
    wb = (
        Window.partitionBy("key")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("key")
        .orderBy("hour_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("_obs").isNotNull(), F.col("hour_id"))
    carried = dense.select(
        "key",
        "hour_id",
        "_obs",
        F.last("_obs", ignorenulls=True).over(wb).alias("_pv"),
        F.last(obs_h, ignorenulls=True).over(wb).alias("_ph"),
        F.first("_obs", ignorenulls=True).over(wf).alias("_nv"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("_nh"),
    )
    fill = F.expr(
        "CAST(_pv + ((_nv - _pv) * (hour_id - _ph)) div (_nh - _ph) AS BIGINT)"
    )
    return carried.select(
        "key",
        "hour_id",
        F.coalesce(F.col("_obs"), fill).alias("v_micro"),
        F.col("_obs").isNull().alias("interpolated"),
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    n_mad: int = 4,
    period: int = 24,
) -> DataFrame:
    """Seasonal robust anomaly detection on hourly counts: an hour is
    anomalous relative to ITS OWN slot-of-day (hour_id mod ``period``) —
    the complement of ``burst_hours`` (trailing z-test, which pages on
    every diurnal peak unless the threshold is detuned) for workloads with
    a daily rhythm: 3am traffic is judged against 3am history.

    Robust + exact: per (key, slot) the center is the MEDIAN and the scale
    is the MAD (median absolute deviation) — outliers can't drag their own
    baseline the way a mean/stddev z-test allows.  Medians of integers are
    half-integers, so everything doubles to stay integral: med2 = 2x
    median(cnt), dev2 = |2*cnt - med2|, mad4 = 2 x median(dev2) = 4 x MAD,
    and the flag is the pure-integer comparison

        2 * dev2 > n_mad * mad4     (i.e. |cnt - med| > n_mad * MAD).

    Returns the anomalous cells only: (key, hour_id, slot, cnt, med2,
    mad4).  A slot whose history is constant (mad4 = 0) flags ANY
    deviation — the right behavior for a dead-quiet slot waking up.

    Scale shape: one (key, hour) count aggregate off the raw stream, then
    spine-sized work only — two grouped exact medians over (key, slot)
    (percentile on <= 8760 rows per key-year) re-attached by spine-sized
    joins; the raw events are never re-shuffled.
    """
    counts = hourly_counts(df, ts_col, key_col)
    return seasonal_from_counts(counts, key_col, n_mad=n_mad, period=period)


def seasonal_from_counts(
    counts: DataFrame, key_col: str, n_mad: int = 4, period: int = 24
) -> DataFrame:
    """Seasonal median/MAD test over a (key, hour_id, cnt) table — shares
    the mergeable hourly-count state with burst/CUSUM/Pettitt, so the
    streaming fold replays it deterministically."""
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    if n_mad < 0:
        raise ValueError(f"n_mad must be >= 0, got {n_mad}")
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key",
        "hour_id",
        F.pmod(F.col("hour_id"), F.lit(period)).cast("int").alias("slot"),
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
    )
    med = dense.groupBy("key", "slot").agg(
        F.round(2 * F.expr("percentile(cnt, 0.5)")).cast("long").alias("med2")
    )
    dev = dense.join(med, ["key", "slot"]).withColumn(
        "_dev2", F.abs(2 * F.col("cnt") - F.col("med2"))
    )
    mad = dev.groupBy("key", "slot").agg(
        F.round(2 * F.expr("percentile(_dev2, 0.5)"))
        .cast("long")
        .alias("mad4")
    )
    return (
        dev.join(mad, ["key", "slot"])
        .filter(2 * F.col("_dev2") > F.lit(n_mad) * F.col("mad4"))
        .select(
            F.col("key").alias(key_col),
            "hour_id",
            "slot",
            "cnt",
            "med2",
            "mad4",
        )
    )


# ---------------------------------------------------------------------------
# Monotonic trend detection: Mann-Kendall test + Theil-Sen slope.
# ---------------------------------------------------------------------------


def trend_test(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    z_milli: int = 1960,
    max_hours: int = 8784,
) -> DataFrame:
    """Per-key monotonic trend over hourly counts — Mann-Kendall S test
    (Mann 1945, Kendall 1975) with tie-corrected variance and continuity
    correction, plus the Theil-Sen slope (median of pairwise slopes, the
    robust trend magnitude a least-squares fit lets one outage distort).
    The sustained-drift complement of ``cusum_hours``: CUSUM needs a
    reference level and a slack knob; Mann-Kendall is distribution-free
    and knob-free — "is this series going UP?" with a significance bound.

    See ``trend_from_counts`` for semantics, exactness, and scale shape.
    """
    counts = hourly_counts(df, ts_col, key_col)
    return trend_from_counts(counts, key_col, z_milli=z_milli,
                             max_hours=max_hours)


def trend_from_counts(
    counts: DataFrame,
    key_col: str,
    z_milli: int = 1960,
    max_hours: int = 8784,
) -> DataFrame:
    """Mann-Kendall + Theil-Sen over a (key, hour_id, cnt) table — shares
    the mergeable hourly-count state with burst/CUSUM/Pettitt/seasonal, so
    a streaming fold replays the test deterministically.

    Exact integer math end to end:
      * S = sum over hour pairs i<j of sgn(cnt_j - cnt_i) — an integer;
      * var_d = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)  (= 18 * Var(S), the
        tie-corrected Mann-Kendall variance, all integer);
      * significant iff S != 0 and 18e6 * (|S|-1)^2 > z_milli^2 * var_d
        (the squared continuity-corrected z test, cross-multiplied — no
        float, no sqrt, no division; Python ints, so no overflow at any n);
      * slope_med2 = DOUBLED median of the n(n-1)/2 pairwise slopes, each
        slope quantized first as trunc((dy * 1e6) / dx) — truncation
        toward zero spelled sign(dy) * (|dy| * 1e6 div dx) so Spark and a
        DuckDB replay agree on negative slopes.

    Scale shape: the raw stream is aggregated ONCE (map-side-combined
    hourly counts); the quadratic pair work runs per key over the DENSE
    SPINE ONLY (<= 8784 rows per key-year), whole-batch numpy inside one
    ``applyInPandas`` — blocked at 512 rows so peak memory is
    block x spine, never spine^2 for S; the slope array is the one
    genuinely quadratic artifact (n(n-1)/2 longs, ~308 MB at one year of
    hours), which is why ``max_hours`` guards LOUDLY instead of spilling:
    longer horizons should re-bucket to days before calling this.
    """
    if z_milli < 0:
        raise ValueError(f"z_milli must be >= 0, got {z_milli}")
    if max_hours < 2:
        raise ValueError(f"max_hours must be >= 2, got {max_hours}")
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    key_t = dense.schema["key"].dataType.simpleString()
    out_schema = (
        f"key {key_t}, n_hours long, s_stat long, var_d long, "
        "slope_med2 long, significant boolean, direction string"
    )
    zm, mh = int(z_milli), int(max_hours)

    def fold(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("hour_id")
        x = pdf["cnt"].to_numpy(np.int64)
        h = pdf["hour_id"].to_numpy(np.int64)
        n = len(x)
        key = pdf["key"].iloc[0]
        if n > mh:
            raise ValueError(
                f"trend_test: key {key!r} spans {n} hours > max_hours={mh}; "
                "re-bucket to a coarser grain before trend-testing"
            )
        if n < 2:
            return pd.DataFrame(
                {"key": [key], "n_hours": [n], "s_stat": [0], "var_d": [0],
                 "slope_med2": [None], "significant": [False],
                 "direction": ["flat"]}
            )
        s_stat = 0
        slope_blocks = []
        B = 512
        for i0 in range(0, n - 1, B):
            i1 = min(i0 + B, n - 1)
            # pairs (i, j) with i in [i0, i1), j > i
            dy = x[None, i0 + 1:] - x[i0:i1, None]
            dx = h[None, i0 + 1:] - h[i0:i1, None]
            mask = dx > 0  # upper triangle of this block-strip
            s_stat += int(np.sign(dy[mask]).sum())
            dyv, dxv = dy[mask], dx[mask]
            slope_blocks.append(
                np.sign(dyv) * ((np.abs(dyv) * 1_000_000) // dxv)
            )
        slopes = np.concatenate(slope_blocks)
        m = len(slopes)
        lo = int(np.partition(slopes, (m - 1) // 2)[(m - 1) // 2])
        hi = int(np.partition(slopes, m // 2)[m // 2])
        _, tie_sizes = np.unique(x, return_counts=True)
        t = tie_sizes.astype(object)  # Python ints: no overflow
        tie_term = int((t * (t - 1) * (2 * t + 5)).sum())
        var_d = n * (n - 1) * (2 * n + 5) - tie_term
        sig = (
            s_stat != 0
            and 18 * 10**6 * (abs(s_stat) - 1) ** 2 > zm * zm * var_d
        )
        direction = "up" if s_stat > 0 else ("down" if s_stat < 0 else "flat")
        return pd.DataFrame(
            {"key": [key], "n_hours": [n], "s_stat": [s_stat],
             "var_d": [var_d], "slope_med2": [lo + hi],
             "significant": [sig], "direction": [direction]}
        )

    out = dense.groupBy("key").applyInPandas(fold, schema=out_schema)
    return out.withColumnRenamed("key", key_col)


# ---------------------------------------------------------------------------
# Lag-k autocorrelation, rolling active users, SLO burn-rate alerts
# ---------------------------------------------------------------------------


def autocorrelation(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    lags: tuple[int, ...] = (1, 24),
) -> DataFrame:
    """Sample autocorrelation of the hourly count series at chosen lags,
    per key -> (key, lag, n_hours, acf_micro): lag 1 answers "is load
    momentum real?", lag 24 answers "is there a daily cycle?" — the
    diagnostic that tells you whether `seasonal_anomalies`' period=24
    assumption actually holds for this key.

    Exact integers: with spine counts x_1..x_n (dense, zeros filled),
    S = Σx, SS = Σx², and per lag k the pair sums P = Σ x_t·x_{t+k},
    A = Σ_{t≤n-k} x_t, B = Σ_{t>k} x_t, the textbook ACF r_k
    multiplies out to

        num·n² = n²·P − n·S·(A+B) + (n−k)·S²
        den·n² = n²·SS − n·S²

    so acf_micro = (1e6·num) div den over DECIMAL(38,0) — one integral
    division per (key, lag), truncation TOWARD ZERO (Spark `div`; the
    oracle spells the same with CASE/abs since `//` floors).  A constant
    series (den = 0) yields NULL.

    Scale shape: one (key, hour) count aggregate; ONE ordered window per
    key over spine CELLS computes every lag's lead column in a single
    pass (≤ 8760 rows per key-year); a per-key aggregate finishes.  The
    raw stream never re-shuffles."""
    if not lags or any(int(k) <= 0 for k in lags):
        raise ValueError(f"lags must be positive, got {lags!r}")
    lags = tuple(int(k) for k in lags)
    counts = hourly_counts(df, ts_col, key_col)
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("key").orderBy("hour_id")
    led = dense.select(
        "key",
        "cnt",
        *[F.lead("cnt", k).over(w).alias(f"_l{k}") for k in lags],
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.expr(dec.format("cnt") + " * cnt")).alias("ss"),
    ]
    for k in lags:
        aggs += [
            F.sum(F.expr(dec.format("cnt") + f" * _l{k}")).alias(f"p{k}"),
            F.sum(F.when(F.col(f"_l{k}").isNotNull(), F.col("cnt"))).alias(
                f"a{k}"
            ),
            F.sum(F.col(f"_l{k}")).alias(f"b{k}"),
        ]
    per_key = led.groupBy("key").agg(*aggs)
    lag_structs = []
    for k in lags:
        num = (
            f"(CAST(n AS DECIMAL(38,0)) * n * p{k}"
            f" - CAST(n AS DECIMAL(38,0)) * s * (a{k} + b{k})"
            f" + CAST(n - {k} AS DECIMAL(38,0)) * s * s)"
        )
        den = (
            "(CAST(n AS DECIMAL(38,0)) * n * ss"
            " - CAST(n AS DECIMAL(38,0)) * s * s)"
        )
        lag_structs.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.expr(
                    f"CASE WHEN {den} > 0 AND n > {k} THEN "
                    f"CAST((1000000 * {num}) div {den} AS BIGINT) END"
                ).alias("acf_micro"),
            )
        )
    return per_key.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n_hours"),
        F.explode(F.array(*lag_structs)).alias("_x"),
    ).select(key_col, F.col("_x.lag").alias("lag"), "n_hours", "_x.acf_micro")


def rolling_active_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct actives per day (the WAU/MAU curve) ->
    (day_id, active_users): for each observed day, how many distinct
    users had >= 1 event in the ``window_days`` days ending on it.

    Exact by construction — no sketch: the raw stream first compresses
    to DISTINCT (user, day) presence (one narrow shuffle), each presence
    row then contributes to ``window_days`` output days via a bounded
    sequence-explode (fan-out is on the COMPRESSED table — a user with
    10^4 events a day still explodes x7, not x70000), and one
    count-distinct per day finishes.  Output days clip to the observed
    [min_day, max_day] (no phantom trailing days); leading days carry
    partial windows by definition (there is nothing earlier to count).

    Scale shape: shuffles carry (user, day) pairs and (day, user)
    expansion cells only; a rolling DISTINCT is not window-expressible
    without holding per-day user sets — this shape is the exact
    distributed form."""
    if window_days <= 0:
        raise ValueError(f"window_days must be positive, got {window_days}")
    return active_users_from_presence(
        user_day_presence(df, ts_col, user_col), window_days
    )


def user_day_presence(
    df: DataFrame, ts_col: str, user_col: str
) -> DataFrame:
    """DISTINCT (user, day) presence — the mergeable state the streaming
    twin folds per micro-batch (presence is a SET: union-distinct across
    batches is order-independent, so streaming == batch exactly)."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long")
    return (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), day.alias("_d"))
        .distinct()
    )


def active_users_from_presence(
    presence: DataFrame, window_days: int = 7
) -> DataFrame:
    """The expand + count-distinct finisher over a (_u, _d) presence
    table — shared verbatim by the batch and streaming paths so the two
    can never drift."""
    if window_days <= 0:
        raise ValueError(f"window_days must be positive, got {window_days}")
    bounds = presence.groupBy().agg(
        F.max("_d").alias("_mx")
    )
    expanded = presence.select(
        "_u",
        F.explode(
            F.sequence(F.col("_d"), F.col("_d") + (window_days - 1))
        ).alias("day_id"),
    ).join(F.broadcast(bounds), F.col("day_id") <= F.col("_mx"), "inner")
    return (
        expanded.groupBy("day_id")
        .agg(F.count_distinct("_u").alias("active_users"))
    )


def burn_rate_alerts(
    df: DataFrame,
    ts_col: str,
    error_col: str,
    slo_milli: int = 999,
    thr_milli: int = 1000,
    long_h: int = 6,
    short_h: int = 1,
) -> DataFrame:
    """Multi-window SLO error-budget burn-rate alerting (the Google SRE
    workbook rule): page when the error rate, expressed as a multiple of
    the SLO's error budget, exceeds ``thr_milli``/1000 over BOTH a long
    window (is it sustained?) and a short window (is it still
    happening?).  The long window alone pages an hour late; the short
    alone pages on blips — the AND is the point.

    Exact integers, cross-multiplied (budget = (1000−slo_milli)/1000):

        burn > thr  ⟺  10^6·err > thr_milli·tot·(1000−slo_milli)

    evaluated on trailing ROWS windows over the DENSE hour spine (zeros
    filled — an outage with zero traffic must not freeze the window);
    burn_*_milli = (10^6·err) div (tot·(1000−slo_milli)) is reported for
    the pager.  Hours with an empty window (tot = 0) never alert.

    Scale shape: one hourly (tot, err) conditional-count aggregate; both
    rolling windows come from ONE ordered window pass over spine cells;
    output is alert hours only."""
    if not 0 < slo_milli < 1000:
        raise ValueError(f"slo_milli must be in (0,1000), got {slo_milli}")
    if thr_milli <= 0 or long_h <= 0 or short_h <= 0 or short_h > long_h:
        raise ValueError("need thr_milli>0 and 0 < short_h <= long_h")
    hour = F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).cast("long")
    hourly = (
        df.select(hour.alias("hour_id"), F.col(error_col).cast("int").alias("_e"))
        .groupBy("hour_id")
        .agg(
            F.count(F.lit(1)).alias("tot"),
            F.sum(F.coalesce("_e", F.lit(0))).alias("err"),
        )
    )
    spine = hourly.groupBy().agg(
        F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx")
    ).select(F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    dense = spine.join(hourly, ["hour_id"], "left").select(
        "hour_id",
        F.coalesce("tot", F.lit(0)).cast("long").alias("tot"),
        F.coalesce("err", F.lit(0)).cast("long").alias("err"),
    )
    w = Window.orderBy("hour_id")
    rolled = dense.select(
        "hour_id",
        F.sum("tot").over(w.rowsBetween(-(long_h - 1), 0)).alias("tot_long"),
        F.sum("err").over(w.rowsBetween(-(long_h - 1), 0)).alias("err_long"),
        F.sum("tot").over(w.rowsBetween(-(short_h - 1), 0)).alias("tot_short"),
        F.sum("err").over(w.rowsBetween(-(short_h - 1), 0)).alias("err_short"),
    )
    budget = 1000 - int(slo_milli)
    exceeds = lambda e, t: (  # noqa: E731
        F.expr(f"CAST(1000000 AS DECIMAL(38,0)) * {e}")
        > F.expr(f"CAST({int(thr_milli)} AS DECIMAL(38,0)) * {t} * {budget}")
    ) & (F.col(t) > 0)
    burn = lambda e, t: F.expr(  # noqa: E731
        f"CAST((CAST(1000000 AS DECIMAL(38,0)) * {e})"
        f" div (CAST({t} AS DECIMAL(38,0)) * {budget}) AS BIGINT)"
    )
    return rolled.filter(
        exceeds("err_long", "tot_long") & exceeds("err_short", "tot_short")
    ).select(
        "hour_id",
        F.col("tot_long").cast("long").alias("tot_long"),
        F.col("err_long").cast("long").alias("err_long"),
        burn("err_long", "tot_long").alias("burn_long_milli"),
        F.col("tot_short").cast("long").alias("tot_short"),
        F.col("err_short").cast("long").alias("err_short"),
        burn("err_short", "tot_short").alias("burn_short_milli"),
    )


def attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 24,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution — for every conversion event,
    find the user's touch events in the trailing ``lookback_hours`` window
    and emit all three classic credit models in one pass:

    * ``credit_last_micro``   — 1_000_000 to the LATEST touch
      (ties → highest touch event id);
    * ``credit_first_micro``  — 1_000_000 to the EARLIEST touch
      (ties → lowest touch event id);
    * ``credit_linear_micro`` — 1_000_000 div n to every touch.

    Window semantics: ``touch_ts ∈ [conv_ts − lookback, conv_ts]``
    (inclusive both ends).  Conversions with NO touch in the window are
    still emitted (``touch_event_id`` NULL, ``n_touches`` 0, all credits
    0) so credit mass is auditable.  All credit is exact integer
    micro-units — the oracle replays every division and tie rule.

    Scale shape: candidate (conversion, touch) pairs come from the
    hour-bucketed equi interval join (``joins.interval_join`` — hash join
    on (user, hour), never a per-user range scan); the single n/rank
    window partitions by conversion id over its bounded touch set, and
    first-touch falls out of the SAME descending ordering (rank == n ⇔
    minimal (ts, id) — reversing a total order flips ranks), so there is
    exactly ONE window pass.  The zero-touch completion is a broadcast-able
    anti join on conversion ids."""
    if lookback_hours < 1:
        raise ValueError(f"lookback_hours must be >= 1, got {lookback_hours}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    from log_analysis_spark.operators.joins import interval_join

    conv = events.filter(F.col(type_col) == conv_type).select(
        F.col(user_col),
        F.col(id_col).alias("conv_event_id"),
        F.col(ts_col).alias("_cts"),
        (F.col(ts_col) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")).alias(
            "_wstart"
        ),
    )
    tch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col),
        F.col(id_col).alias("touch_event_id"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("_tts"),
    )
    j = interval_join(conv, tch, [user_col], "_wstart", "_cts", "_tts")
    # n_touches rides the SAME ordered window as row_number (explicit full
    # frame) so the plan has ONE Window node over one conv-keyed exchange
    wr = Window.partitionBy("conv_event_id").orderBy(
        F.col("_tts").desc(), F.col("touch_event_id").desc()
    )
    wn = wr.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    attributed = (
        j.withColumn("n_touches", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn("_rk", F.row_number().over(wr))
        .select(
            user_col,
            "conv_event_id",
            "touch_event_id",
            "touch_type",
            "n_touches",
            F.when(F.col("_rk") == 1, F.lit(1_000_000))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("credit_last_micro"),
            F.when(F.col("_rk") == F.col("n_touches"), F.lit(1_000_000))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("credit_first_micro"),
            F.expr("CAST(1000000 DIV n_touches AS BIGINT)").alias(
                "credit_linear_micro"
            ),
        )
    )
    untouched = (
        conv.join(
            attributed.select("conv_event_id").distinct(),
            "conv_event_id",
            "left_anti",
        )
        .select(
            user_col,
            "conv_event_id",
            F.lit(None).cast(tch.schema["touch_event_id"].dataType).alias(
                "touch_event_id"
            ),
            F.lit(None).cast("string").alias("touch_type"),
            F.lit(0).cast("long").alias("n_touches"),
            F.lit(0).cast("long").alias("credit_last_micro"),
            F.lit(0).cast("long").alias("credit_first_micro"),
            F.lit(0).cast("long").alias("credit_linear_micro"),
        )
    )
    return attributed.unionByName(untouched)


def concurrency_timeline(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    key_col: str | None = None,
) -> DataFrame:
    """Sweep-line concurrency over a table of [start, end] INTERVALS
    (sessions, requests in flight, active incidents): the exact
    step-function of how many intervals are simultaneously open — the
    "peak concurrent sessions" number capacity planning runs on, which
    no per-hour count aggregate can produce (a count of session STARTS
    per hour says nothing about overlap).

    Each interval contributes (+1 at start, −1 at end); events sort by
    ``(ts, delta DESC, …)`` so a start at the same instant counts before
    an end — intervals are CLOSED ([s, e]), two sessions touching at a
    boundary instant overlap there.  Returns one row per endpoint:
    ``(…key, ts, delta, concurrency)`` with ``concurrency`` the running
    open-interval count AFTER the endpoint, exact integers end to end.

    Scale shape: the sweep runs over interval ENDPOINTS (2 rows per
    interval — session tables are orders of magnitude smaller than their
    event streams), one ordered window per key partition.  With
    ``key_col=None`` the single global ordering is a deliberate
    SinglePartition over the endpoint table only (the W4 precedent:
    global order on the compressed aggregate, never on raw events); pass
    a key to shard the sweep."""
    keys = [key_col] if key_col else []
    starts = intervals.select(
        *keys, F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        *keys, F.col(end_col).alias("ts"), F.lit(-1).alias("delta")
    )
    pts = starts.unionByName(ends)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pts.withColumn(
        "concurrency", F.sum("delta").over(w).cast("long")
    ).select(*keys, "ts", F.col("delta").cast("int").alias("delta"), "concurrency")


def session_intervals(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_sec: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessions as INTERVALS: ``windows_ops.sessionize`` (the
    shared session machinery) collapsed to one ``(key, sess_id, start_ts,
    end_ts, n_events)`` row per session — the input shape
    ``concurrency_timeline`` and any session-duration analytics need.
    One key-partitioned window + one (key, sess_id) aggregate, both on
    the same exchange."""
    from log_analysis_spark.operators.windows_ops import sessionize

    oc = order_cols if order_cols is not None else [ts_col]
    s = sessionize(events, key_col, ts_col, oc, gap_sec)
    return s.groupBy(key_col, "sess_id").agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def seasonal_naive_backtest(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    lags: tuple[int, ...] = (1, 24),
) -> DataFrame:
    """Forecastability report: backtest the two classic no-model
    predictors over the dense hourly spine — persistence (forecast(h) =
    cnt(h−1)) and seasonal naive (cnt(h−lag), e.g. lag 24 = "same hour
    yesterday") — and report each lag's mean absolute error.  The number
    that says WHICH keys are predictable (and at what period) before
    anyone reaches for a heavier model; a seasonal MAE well under the
    persistence MAE is the capacity-planning green light the ACF hints
    at.

    Per (key, lag): ``n_eval`` = spine hours with an h−lag reference,
    ``sum_abs_err`` = Σ|cnt(h) − cnt(h−lag)| and
    ``mae_milli = 1000·sum_abs_err div n_eval`` — exact integers (the
    dense spine zero-fills gaps, so outage hours count as real error).

    Scale shape: the raw stream aggregates ONCE to hourly counts
    (map-side combined, the shared fold family); ALL lags come from one
    ordered window pass per key over spine CELLS; one final (key, lag)
    aggregate."""
    counts = hourly_counts(events, ts_col, key_col)
    return backtest_from_counts(counts, lags)


def backtest_from_counts(
    counts: DataFrame, lags: tuple[int, ...] = (1, 24)
) -> DataFrame:
    """Finisher of ``seasonal_naive_backtest`` over a (key, hour_id, cnt)
    table — shared verbatim with the streaming fold
    (``sketch_stream.run_stream_forecast_backtest``), so batch and stream
    cannot drift."""
    if not lags or any(l < 1 for l in lags):
        raise ValueError(f"lags must be >= 1, got {lags}")
    spine = (
        counts.groupBy("key")
        .agg(F.min("hour_id").alias("_mn"), F.max("hour_id").alias("_mx"))
        .select("key", F.explode(F.sequence("_mn", "_mx")).alias("hour_id"))
    )
    dense = spine.join(counts, ["key", "hour_id"], "left").select(
        "key", "hour_id", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("key").orderBy("hour_id")
    errs = dense.select(
        "key",
        *[
            F.abs(F.col("cnt") - F.lag("cnt", l).over(w)).alias(f"_e{l}")
            for l in lags
        ],
    )
    stacked = errs.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(l)).alias("lag"), F.col(f"_e{l}").alias("e")
                    )
                    for l in lags
                ]
            )
        ).alias("kv"),
    ).select("key", "kv.lag", "kv.e")
    agg = (
        stacked.filter(F.col("e").isNotNull())
        .groupBy("key", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum("e").cast("long").alias("sum_abs_err"),
        )
    )
    return agg.select(
        "key",
        "lag",
        "n_eval",
        "sum_abs_err",
        F.expr("CAST((1000 * sum_abs_err) DIV n_eval AS BIGINT)").alias(
            "mae_milli"
        ),
    )
