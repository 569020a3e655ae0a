"""Mergeable sketches for approximate distinct counting (KMV / bottom-k).

At 100 TB, exact ``count(DISTINCT x)`` per group is one full-width shuffle
of every distinct value; cardinality *estimates* answer the same telemetry
questions ("how many distinct users hit this path today?") from a sketch
of k fixed-size hashes per group.  KMV (k-minimum-values, the bottom-k
sketch of Bar-Yossef et al. 2002) is chosen over HLL here deliberately:

  * it is MERGEABLE (union of two sketches' rows → bottom-k again), so
    per-partition / per-day sketches combine without rescanning — proven
    by ``test_kmv_merge_equals_whole``;
  * its estimator is pure integer arithmetic over a deterministic md5
    hash, so a DuckDB oracle reproduces it BIT-EXACTLY — no
    engine-specific register layout to take on faith (Spark's own
    ``approx_count_distinct`` HLL± can't be oracle-checked).

A from-scratch HyperLogLog (``hll_sketch`` / ``hll_merge`` /
``hll_estimate``, bottom of this module) complements KMV where its trade
wins — constant 2^p-register state per group and a plain max-aggregate
grouped path (no per-group rank window) — while KEEPING oracle-exactness
by construction: integer bit-length rho, power-of-two DECIMAL register
sums, micro-unit alpha, and a literal micro-nat ln-table for the
small-range branch, so no engine ever evaluates a float.

Hash: the leading 56 bits of md5(value) as a BIGINT (14 hex nibbles —
56 so that ``(k-1) * 2^56`` stays inside a signed 64-bit long for any
practical k).  Estimator: with m = |sketch| and kth = max(sketch),

    est = m                          if m < k   (sketch is exact)
        = (k-1) * 2^56 div kth       otherwise  (integral division)

Scale shape: the only corpus-sized shuffle carries (group, 8-byte hash)
after a distinct — the value itself never shuffles.  The ungrouped path
is ``TakeOrderedAndProject`` (per-partition bottom-k, merged at the
driver: k rows, not the corpus).  The grouped path pays one rank window
per group over distinct hashes; its payload is 8 B per distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 56
_HASH_SPACE = 1 << HASH_BITS


def h56(col: F.Column) -> F.Column:
    """Leading 56 bits of md5(value) as BIGINT — the KMV hash."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 14), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, col: str, k: int = 64, group: str | None = None
) -> DataFrame:
    """Bottom-k distinct 56-bit hashes of ``col`` (per ``group`` if given):
    rows of (group?, h).  This IS the sketch — k rows per group, mergeable
    by unioning sketch rows and re-applying ``kmv_sketch`` on ``h``."""
    keys = [group] if group else []
    hashes = df.select(*keys, h56(F.col(col)).alias("h")).distinct()
    if group:
        w = Window.partitionBy(group).orderBy("h")
        return (
            hashes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    # global: orderBy+limit plans as TakeOrderedAndProject — per-partition
    # bottom-k then a k-row merge, never a single-partition sort
    return hashes.orderBy("h").limit(k)


def kmv_merge(*sketches: DataFrame, k: int, group: str | None = None) -> DataFrame:
    """Union sketches (same col/k/group) into one — bottom-k of the union
    of their hash rows.  Distributive: merging partial sketches equals
    sketching the concatenated input."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    hashes = out.distinct()  # h is already the KMV hash — never re-hash
    if group:
        w = Window.partitionBy(group).orderBy("h")
        return (
            hashes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
        )
    return hashes.orderBy("h").limit(k)


def kmv_estimate(
    sketch: DataFrame, k: int, group: str | None = None
) -> DataFrame:
    """Distinct-count estimate from a ``kmv_sketch`` output.  Integer-exact
    cross-engine: ``(k-1) * 2^56 div kth`` (BIGINT integral division), or
    the exact size when the sketch never filled."""
    keys = [group] if group else []
    aggd = sketch.groupBy(*keys).agg(
        F.count("*").alias("_m"), F.max("h").alias("_kth")
    )
    # (k-1)·2^56 exceeds BIGINT for k > 128 — integral-divide as
    # DECIMAL(38,0) (exact; DuckDB mirrors with native HUGEINT //)
    numer = (k - 1) * _HASH_SPACE
    est = F.when(F.col("_m") < k, F.col("_m")).otherwise(
        F.expr(f"CAST(CAST({numer} AS DECIMAL(38,0)) div _kth AS BIGINT)")
    )
    return aggd.select(*keys, est.cast("long").alias("est_distinct"))


def kmv_distinct(
    df: DataFrame, col: str, k: int = 64, group: str | None = None
) -> DataFrame:
    """Sketch + estimate in one call: (group?, est_distinct)."""
    return kmv_estimate(kmv_sketch(df, col, k=k, group=group), k=k, group=group)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable approximate
# per-value counts in d × w integers, whatever the value cardinality.
# ---------------------------------------------------------------------------


def _cms_bucket(col: F.Column, row: int, width: int) -> F.Column:
    """Row-salted md5-u32 mod width — the same domain-separated md5 trick
    as every deterministic draw in this repo, so DuckDB replays it."""
    salted = F.concat(F.lit(f"cms{row}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
        % width
    ).cast("int")


def cms_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the multiset ``col``: rows of
    (row, bucket, cnt) — at most depth × width rows BY CONSTRUCTION,
    whatever the input cardinality, and mergeable by summing counters
    (``cms_merge``).  The aggregate is algebraic, so map-side combine
    bounds the shuffle at depth × width rows per partition."""
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return exploded.groupBy("rb.row", "rb.bucket").agg(
        F.count("*").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with the same (depth, width): counters add.
    Distributive — merging per-split sketches equals sketching the whole."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe value: est = min over the d
    rows of the probed counter (never undercounts; overcount bounded by
    2n/width with prob. 1-2^-d).  The sketch side is ≤ depth × width rows
    and BROADCASTS — probing never shuffles the probe stream."""
    probe_rb = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, "rb.row", "rb.bucket")
    joined = probe_rb.join(F.broadcast(sketch), ["row", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(col).agg(F.min("cnt").cast("long").alias("est_count"))


def skewed_keys(
    df: DataFrame,
    col: str,
    threshold_frac: float = 0.01,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Skew detection for join/groupBy planning: the distinct values of
    ``col`` whose CMS-estimated multiplicity is ≥ ``threshold_frac`` of the
    total row count — the keys that deserve salting (joins.interval_join
    ``n_salts``) or a two-phase aggregate (aggregate.salted_group_count).

    CMS never undercounts, so NO truly hot key is ever missed (the
    guarantee that matters: a false positive salts a cold key harmlessly,
    a false negative leaves a straggler).  Cost: one bounded-state sketch
    pass + one distinct-values pass probed against the broadcast sketch —
    the threshold count rides a 1-row cross join, nothing shuffles wide."""
    sk = cms_sketch(df, col, depth=depth, width=width)
    total = df.groupBy().agg(F.count("*").alias("_n"))
    probes = df.select(col).distinct()
    est = cms_estimate(sk, probes, col, depth=depth, width=width)
    return (
        est.crossJoin(F.broadcast(total))
        .filter(
            F.col("est_count").cast("double")
            >= F.lit(threshold_frac) * F.col("_n").cast("double")
        )
        .select(col, "est_count")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    mod: int = 256,
    keep: int = 32,
    hh_k: int = 64,
) -> DataFrame:
    """Pre-flight shuffle-join planner: estimate ``|left ⋈ right|`` on
    ``key_col`` equality — and surface the hottest key — WITHOUT running
    the join.  ``|A ⋈ B| = Σ_v f_A(v)·f_B(v)``, split END-BIASED (the
    Estan & Naughton 2006 idea, reduced to a deterministic md5 core so a
    DuckDB oracle replays every intermediate):

    * HEAVY keys — any key with count > n/``hh_k`` on EITHER side
      (``heavy_hitters``: exact, two passes, tail never shuffles) — are
      counted exactly on both sides and contribute their TRUE pair
      products.  This is the part plain key sampling gets catastrophically
      wrong: one unsampled hot key can hold most of the join's mass.
    * TAIL keys are sampled by key DOMAIN — a key participates iff
      ``md5-u32('jse:' || key) mod mod < keep`` — so each sampled key's
      contribution is exact (both sides agree on the gate) and the tail
      estimator is the sampled product sum scaled by ``mod / keep``, with
      no f_A·f_B bias correction (row sampling would need one).

    Returns ONE row: ``(n_hot_keys, hot_pairs, n_sample_keys,
    sample_pairs, est_join_rows, max_key_pairs, hot_key)`` where
    ``est_join_rows = hot_pairs + (sample_pairs · mod) div keep`` (sums in
    DECIMAL(38,0), emitted as BIGINT — a join OUTPUT above 2^63 rows is
    not a plannable join), and ``(max_key_pairs, hot_key)`` is the exact
    argmax product over heavy ∪ sampled keys (ties → greatest key string)
    — any key heavy on either side is guaranteed inspected, so the
    straggler that needs ``joins.skew_aware_join`` or salting is named
    BEFORE paying for the shuffle.

    Scale shape: per side, the heavy-hitter pass is bounded-state with no
    shuffle + a broadcast-candidate recount; the tail gate filters AT THE
    SCAN (~keep/mod of rows survive to a sample-sized count aggregate);
    hot membership tests are broadcasts of a ≤ 2·hh_k key set; the final
    fold is a 1-row aggregate.  NULL keys are excluded (equi-join
    semantics: NULL matches nothing).  Passing the SAME DataFrame object
    as both sides (self-join planning, the Σ n_v² blast-radius case) is
    detected and computes each pass once — the estimate is identical by
    symmetry."""
    if not (0 < keep <= mod):
        raise ValueError(f"need 0 < keep <= mod, got keep={keep} mod={mod}")
    if hh_k < 2:
        raise ValueError(f"hh_k must be >= 2, got {hh_k}")

    def keyed(df: DataFrame) -> DataFrame:
        kc = F.col(key_col).cast("string")
        return df.filter(kc.isNotNull()).select(kc.alias("k"))

    # self-join planning (left IS right — the Σ n_v² blast-radius case)
    # is symmetric: one heavy-hitter pass, one count table per arm,
    # na == nb — half the scans of the general case
    self_join = left is right
    la = keyed(left)
    rb = la if self_join else keyed(right)
    hot = heavy_hitters(la, "k", hh_k).select(F.col("item").alias("k"))
    if not self_join:
        hot = hot.unionByName(
            heavy_hitters(rb, "k", hh_k).select(F.col("item").alias("k"))
        ).distinct()

    def hot_counts(side: DataFrame, cnt: str) -> DataFrame:
        return (
            side.join(F.broadcast(hot), "k", "left_semi")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    def tail_counts(side: DataFrame, cnt: str) -> DataFrame:
        gate = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("jse:"), F.col("k"))), 1, 8),
                16,
                10,
            ).cast("long")
            % F.lit(int(mod))
            < F.lit(int(keep))
        )
        return (
            side.filter(gate)
            .join(F.broadcast(hot), "k", "left_anti")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    def products(j: DataFrame, is_hot: bool) -> DataFrame:
        # multiply in DECIMAL, not LONG — two per-key counts can overflow
        # a 64-bit product long before either count is itself suspicious
        p = (
            F.col("na").cast("decimal(18,0)") * F.col("nb").cast("decimal(18,0)")
        ).cast("decimal(38,0)")
        return j.select("k", p.alias("p"), F.lit(is_hot).alias("_exact"))

    if self_join:
        hc = hot_counts(la, "na").withColumn("nb", F.col("na"))
        tc = tail_counts(la, "na").withColumn("nb", F.col("na"))
        allp = products(hc, True).unionByName(products(tc, False))
    else:
        allp = products(
            hot_counts(la, "na").join(hot_counts(rb, "nb"), "k"), True
        ).unionByName(
            products(
                tail_counts(la, "na").join(tail_counts(rb, "nb"), "k"), False
            )
        )
    folded = allp.agg(
        F.count_if(F.col("_exact")).cast("long").alias("n_hot_keys"),
        F.coalesce(
            F.sum(F.when(F.col("_exact"), F.col("p"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("hot_pairs"),
        F.count_if(~F.col("_exact")).cast("long").alias("n_sample_keys"),
        F.coalesce(
            F.sum(F.when(~F.col("_exact"), F.col("p"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sample_pairs"),
        # Clamp before the long cast: a per-key pair product > 2^63-1
        # would cast to NULL (non-ANSI) and coalesce to 0 downstream —
        # silently hiding the hot key in exactly the blast-radius case.
        F.max(
            F.least(
                F.col("p"), F.lit(2**63 - 1).cast("decimal(38,0)")
            ).cast("long")
        ).alias("max_key_pairs"),
        F.max(F.struct(F.col("p"), F.col("k"))).alias("_argmax"),
    )
    return folded.select(
        "n_hot_keys",
        F.col("hot_pairs").cast("long").alias("hot_pairs"),
        "n_sample_keys",
        F.col("sample_pairs").cast("long").alias("sample_pairs"),
        F.expr(
            f"CAST(hot_pairs + (sample_pairs * {int(mod)}) DIV {int(keep)}"
            " AS BIGINT)"
        ).alias("est_join_rows"),
        F.coalesce("max_key_pairs", F.lit(0).cast("long")).alias(
            "max_key_pairs"
        ),
        F.col("_argmax.k").alias("hot_key"),
    )


# ---------------------------------------------------------------------------
# Histogram-CDF quantiles — fixed-size-state distributed quantiles with an
# EXACT cross-engine definition (no t-digest/KLL register layouts).
# ---------------------------------------------------------------------------


def _group_keys(group: str | list[str] | None) -> list[str]:
    """Normalize the ``group`` knob of the quantile family: None, a single
    column, or a COMPOSITE key list (e.g. (route, hour) latency bands)."""
    if group is None:
        return []
    return [group] if isinstance(group, str) else list(group)


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    resolution: float = 0.01,
    group: str | list[str] | None = None,
) -> DataFrame:
    """Quantiles without a global sort: quantize values to a fixed
    ``resolution`` grid (floor), histogram the grid cells (algebraic —
    map-side combine bounds the shuffle at the number of occupied cells),
    and read each quantile q as the smallest cell whose cumulative count
    reaches ``ceil(q·n)`` (the classic lower-quantile definition).  Answer
    error is bounded by ``resolution`` — a knob, not a property of opaque
    sketch registers, which is what makes the DuckDB oracle EXACT.

    The CDF window runs over occupied CELLS per group (≤ range/resolution
    rows), not over data rows — the same trick as textstats.
    perplexity_buckets' equal-mass cut."""
    return quantiles_from_cells(
        value_cells(df, value_col, resolution, group), qs, resolution, group
    )


def value_cells(
    df: DataFrame,
    value_col: str,
    resolution: float = 0.01,
    group: str | list[str] | None = None,
) -> DataFrame:
    """The mergeable half of ``hist_quantiles``: per-(group, cell) counts
    on the fixed resolution grid.  Cell counts ADD, so two cell tables
    (two partitions, two micro-batches, two days) union+sum into one with
    no loss — the property the streaming quantile fold
    (`streaming.sketch_stream.run_stream_quantiles`) is built on."""
    inv = 1.0 / resolution
    cell = F.floor(F.col(value_col) * F.lit(inv)).cast("long")
    keys = _group_keys(group)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, cell.alias("_cell"))
        .groupBy(*keys, "_cell")
        .agg(F.count("*").alias("_c"))
    )


def quantiles_from_cells(
    hist: DataFrame,
    qs: list[float],
    resolution: float = 0.01,
    group: str | list[str] | None = None,
    emit_cells: bool = False,
) -> DataFrame:
    """CDF finisher over a (group, _cell, _c) table — shared verbatim by
    the batch ``hist_quantiles`` and the streaming fold, so the two can't
    drift.  ``emit_cells=True`` adds the raw INTEGER quantile cell as a
    ``qcell`` column so integer-domain consumers (``robust_outliers``)
    never round-trip through ``value * resolution`` floats."""
    q_lits = sorted(set(qs))
    if not q_lits or not all(0 < q <= 1 for q in q_lits):
        raise ValueError("qs must be in (0, 1]")
    keys = _group_keys(group)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*keys)
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(wn)
    )
    out = None
    for q in q_lits:
        need = F.ceil(F.lit(q) * F.col("_n"))
        cols = [
            F.lit(q).alias("q"),
            (F.col("_qcell") * F.lit(resolution)).alias("value"),
        ]
        if emit_cells:
            cols.append(F.col("_qcell").alias("qcell"))
        hit = (
            cum.filter(F.col("_cum") >= need)
            .groupBy(*keys)
            .agg(F.min("_cell").alias("_qcell"))
            .select(*keys, *cols)
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def robust_outliers(
    df: DataFrame,
    value_col: str,
    resolution: float = 0.01,
    k_milli: int = 3500,
    group: str | list[str] | None = None,
) -> DataFrame:
    """Median/MAD outlier annotation — the ROBUST complement of the
    mean/σ z-test family (``timeseries.burst_hours`` etc.): a single
    extreme value inflates both the mean and σ enough to hide itself,
    while the median and the median-absolute-deviation ignore up to half
    the data being wild.  Flags rows where ``|x − median| > (k_milli /
    1000) · MAD``, per ``group`` if given.

    Everything happens on the fixed resolution grid, in INTEGER cell
    units: ``dev_cells = |floor(x/res) − median_cell|``, MAD = the median
    of those integer deviations, and the flag is the cross-multiplied
    comparison ``1000·dev_cells > k_milli·mad_cells`` — no float past the
    shared grid quantizer, so a DuckDB oracle replays row for row.
    ``MAD = 0`` (at least half the group sits in one cell) flags ANY
    deviation — the degenerate-scale behavior the burst z-test's var=0
    rule also chose, and the robust-statistics convention for "the bulk
    is constant, anything else is anomalous".

    Scale shape: two bounded cell aggregates (the ``hist_quantiles``
    machinery — state ~ occupied cells, never rows) and two broadcast
    med/MAD attach joins; the data rows are NEVER re-shuffled — the
    ``clip_to_quantiles`` class.  Output: the input columns +
    ``dev_cells`` (long; NULL for NULL values) + ``mad_cells`` (long) +
    ``is_outlier`` (bool, false for NULL values)."""
    if k_milli < 0:
        raise ValueError(f"k_milli must be >= 0, got {k_milli}")
    keys = _group_keys(group)
    inv = 1.0 / resolution
    xc = F.floor(F.col(value_col) * F.lit(inv)).cast("long")

    med = quantiles_from_cells(
        value_cells(df, value_col, resolution, group),
        [0.5],
        resolution,
        group,
        emit_cells=True,
    ).select(*keys, F.col("qcell").alias("_medc"))
    with_dev = (
        df.join(F.broadcast(med), keys)
        if keys
        else df.crossJoin(F.broadcast(med))
    ).withColumn(
        "dev_cells",
        F.when(
            F.col(value_col).isNotNull(), F.abs(xc - F.col("_medc"))
        ),
    )
    mad = quantiles_from_cells(
        value_cells(
            with_dev.withColumn("_devd", F.col("dev_cells").cast("double")),
            "_devd",
            1.0,
            group,
        ),
        [0.5],
        1.0,
        group,
        emit_cells=True,
    ).select(*keys, F.col("qcell").alias("mad_cells"))
    out = (
        with_dev.join(F.broadcast(mad), keys)
        if keys
        else with_dev.crossJoin(F.broadcast(mad))
    )
    return out.withColumn(
        "is_outlier",
        F.when(
            F.col("dev_cells").isNotNull(),
            F.lit(1000) * F.col("dev_cells") > F.lit(int(k_milli)) * F.col("mad_cells"),
        ).otherwise(F.lit(False)),
    ).drop("_medc")


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """Set-relationship estimates between two LARGE sets from their KMV
    sketches alone (Beyer et al. 2007): given the bottom-k hashes of A and
    of B,

      * take K = the k smallest hashes of A ∪ B (merge of the sketches);
      * m = |K ∩ A_sketch ∩ B_sketch| estimates the Jaccard as m / k;
      * union_est = the plain KMV estimator over K;
      * intersection_est = round(jaccard · union_est).

    Everything after the two sketch builds is driver-free DataFrame algebra
    over ≤ 3k rows of 8-byte hashes, and every number is integer / exact —
    the oracle replays it bit-for-bit.  This is how "how many users did
    BOTH X and Y" is answered at 100 TB without ever joining the raw sets.

    Inputs are one-column frames of values (e.g. user ids); returns one row
    (union_est, intersection_est, jaccard_micro) with jaccard quantized to
    integer micro-units (m * 1e6 div k — exact cross-engine).
    """
    sa = kmv_sketch(a, a.columns[0], k=k)
    sb = kmv_sketch(b, b.columns[0], k=k)
    union_k = kmv_merge(sa, sb, k=k)
    both = union_k.join(sa, "h", "left_semi").join(sb, "h", "left_semi")
    m = both.agg(F.count("*").alias("m"))
    kk = union_k.agg(F.count("*").alias("kk"))  # < k when |A∪B| < k (then exact)
    u = kmv_estimate(union_k, k=k).select(
        F.col("est_distinct").alias("union_est")
    )
    out = u.crossJoin(m).crossJoin(kk)
    jac_micro = F.expr("CAST(m * 1000000 AS BIGINT) div kk")
    inter = F.round(
        (F.col("m").cast("double") / F.col("kk").cast("double"))
        * F.col("union_est").cast("double")
    ).cast("long")
    return out.select(
        "union_est",
        inter.alias("intersection_est"),
        jac_micro.alias("jaccard_micro"),
    )

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — the CONSTANT-SIZE complement of KMV:
# state is exactly m = 2^p small integers per group whatever the
# cardinality, merge is a register-wise max (cheaper than KMV's re-rank),
# and — the property KMV was chosen for — the estimator here is STILL
# oracle-exact: rho comes from integer bit-length of a deterministic md5
# suffix, the register sum uses exact powers of two in DECIMAL(38,0), the
# bias constant is an integer micro-unit literal, and the small-range
# linear-counting branch looks ln(m/V) up from a PRECOMPUTED integer
# micro-nat table (V has only m possible values), so no engine ever
# evaluates a float.  Grouped sketching is ONE groupBy((group, bucket))
# max — no per-group window at all, a strictly better shuffle shape than
# grouped KMV when groups are many.
# ---------------------------------------------------------------------------


def _hll_alpha_micro(m: int) -> int:
    """Standard HLL bias correction, quantized to integer micro-units."""
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return round(alpha * 1_000_000)


def hll_sketch(
    df: DataFrame, col: str, p: int = 12, group: str | None = None
) -> DataFrame:
    """HLL registers of ``col`` (per ``group`` if given) as SPARSE rows
    (group?, bucket, rho): bucket = top p bits of the 56-bit md5 hash,
    rho = leading-zero count of the remaining w = 56-p bits + 1, max'd
    per bucket.  Absent buckets mean register 0.  Mergeable by unioning
    rows and re-maxing (``hll_merge``)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    w = HASH_BITS - p
    keys = [group] if group else []
    h = h56(F.col(col))
    bucket = F.shiftrightunsigned(h, w).cast("int")
    suffix = h.bitwiseAND(F.lit((1 << w) - 1))
    # bin() renders the suffix unpadded, so its length is the bit length:
    # rho = (w - bitlen) + 1; an all-zero suffix has rho = w + 1
    rho = (
        F.when(suffix == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(suffix)))
        .cast("int")
    )
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame, group: str | None = None) -> DataFrame:
    """Register-wise max of sketches built with the same (col, p, group).
    Distributive: merging partial sketches equals sketching the whole."""
    keys = ([group] if group else []) + ["bucket"]
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, p: int, group: str | None = None
) -> DataFrame:
    """Distinct-count estimate from ``hll_sketch`` rows — every step
    integer-exact cross-engine.  S = Σ_j 2^(R - reg_j) over all m
    registers (R = w+1 caps rho, so each term is an exact long; absent
    buckets contribute 2^R), summed as DECIMAL(38,0):

        raw = alpha_micro · m² · 2^R  div  (S · 10^6)

    Small-range branch (V = zero registers > 0 and 2·raw ≤ 5·m): linear
    counting m·ln(m/V) with ln(m/V) looked up from an integer micro-nat
    literal table over V ∈ [1, m] — no float in either engine."""
    m = 1 << p
    w = HASH_BITS - p
    r_cap = w + 1
    alpha_micro = _hll_alpha_micro(m)
    numer = alpha_micro * m * m * (1 << r_cap)
    # micro-nat table for ln(m/V), V = 1..m (index via element_at, 1-based)
    import math

    ln_micro = [round(math.log(m / v) * 1_000_000) for v in range(1, m + 1)]
    keys = [group] if group else []
    aggd = sketch.groupBy(*keys).agg(
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {r_cap} - rho) "
                "AS DECIMAL(38,0))"
            )
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    zero_term = F.expr(
        f"CAST({1 << r_cap} AS DECIMAL(38,0)) * ({m} - _n_present)"
    )
    s_all = (F.col("_s_present") + zero_term).alias("_s")
    scored = aggd.select(*keys, s_all, (F.lit(m) - F.col("_n_present")).alias("_v"))
    raw = F.expr(f"CAST(CAST({numer} AS DECIMAL(38,0)) div (_s * 1000000) AS BIGINT)")
    lc = F.expr(
        f"CAST(CAST({m} AS BIGINT) * element_at(array({','.join(map(str, ln_micro))}), "
        f"CAST(_v AS INT)) div 1000000 AS BIGINT)"
    )
    est = F.when((F.col("_v") > 0) & (raw * 2 <= 5 * m), lc).otherwise(raw)
    return scored.select(*keys, est.alias("est_distinct"))


def hll_distinct(
    df: DataFrame, col: str, p: int = 12, group: str | None = None
) -> DataFrame:
    """Sketch + estimate in one call: (group?, est_distinct)."""
    return hll_estimate(hll_sketch(df, col, p=p, group=group), p=p, group=group)


def clip_to_quantiles(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    resolution: float = 0.01,
    group: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization without a global sort: clip ``value_col`` to its own
    per-group [p_lo, p_hi] quantile band — the robust-stats preprocessing
    step before means/regressions on heavy-tailed telemetry (one 10^6 ms
    straggler should not own the mean latency).

    The cuts come from ``hist_quantiles`` (floor-quantized histogram CDF
    — no per-row window, cut error bounded by ``resolution``), so the
    clipped value is deterministic and the DuckDB oracle exact.  NULLs
    pass through unclipped; adds ``out_col`` (default
    ``{value}_clipped``), original column retained.

    Scale shape: the histogram aggregate is the only corpus-sized
    shuffle (occupied CELLS after map-side combine); the per-group
    (lo, hi) cut table is |groups| rows and BROADCASTS back — the data
    itself is never re-shuffled for the clip."""
    if not (0 < p_lo < p_hi <= 1):
        raise ValueError(f"need 0 < p_lo < p_hi <= 1: ({p_lo}, {p_hi})")
    out_col = out_col or f"{value_col}_clipped"
    keys = [group] if group else []
    cuts = hist_quantiles(
        df, value_col, [p_lo, p_hi], resolution=resolution, group=group
    )
    band = cuts.groupBy(*keys).agg(
        F.min(F.when(F.col("q") == p_lo, F.col("value"))).alias("_lo"),
        F.min(F.when(F.col("q") == p_hi, F.col("value"))).alias("_hi"),
    )
    joined = (
        df.join(F.broadcast(band), keys)
        if keys
        else df.crossJoin(F.broadcast(band))
    )
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")),
    )
    return joined.withColumn(out_col, clipped).drop("_lo", "_hi")


# ---------------------------------------------------------------------------
# Exact heavy hitters in two passes — Misra-Gries candidate generation, so
# the long tail NEVER shuffles.
# ---------------------------------------------------------------------------


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Pass 1 of ``heavy_hitters``: one Misra-Gries summary (Misra & Gries
    1982, "Finding repeated elements") with ``k`` counters PER PARTITION,
    via ``mapInPandas`` (whole-batch ``value_counts`` folded into the
    bounded counter dict; when it overflows, the (k+1)-th largest count is
    subtracted from every counter and non-positive ones drop — the batched
    form of the classic all-decrement step).

    Guarantee chain (why no true heavy hitter can be missed):
      * MG with k counters on a stream of n_p items keeps every item whose
        partition count exceeds n_p/(k+1);
      * pigeonhole over partitions: if an item's GLOBAL count exceeds n/k,
        some partition holds more than n_p/k > n_p/(k+1) of it.
    So the union of per-partition survivors is a superset of every item
    with global count > n/k, whatever the partitioning.

    Output: survivor rows (item, NULL) plus one sentinel row per partition
    (NULL, n_p) carrying the partition's non-null row count — at most
    k+1 rows per partition BY CONSTRUCTION, so the candidate table is
    collect/broadcast-safe at any input size.  Only ``col`` crosses into
    Python (Arrow-batched, one pass)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    item_t = df.schema[col].dataType.simpleString()
    name = col

    def part(batches):
        import pandas as pd

        counters: dict = {}
        n_part = 0
        for pdf in batches:
            vals = pdf[name].dropna()
            n_part += len(vals)
            for item, c in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - cut for i, c in counters.items() if c > cut
                }
        yield pd.DataFrame(
            {
                "item": list(counters) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )

    return df.select(F.col(col)).mapInPandas(
        part, schema=f"item {item_t}, n_part long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT phi-heavy hitters: every value of ``col`` whose multiset count
    strictly exceeds n/k (n = non-null rows), with its exact count — and
    nothing else.  Deterministic regardless of partitioning: the output is
    defined purely by the multiset.

    The 100 TB point (vs ``textstats.vocabulary``'s full groupBy): a token
    stream's distinct tail is corpus-sized, so even a narrow (token, count)
    shuffle is wide.  Here the tail never shuffles at all —
      pass 1  ``mg_candidates``: <= k+1 rows per partition, no shuffle;
      pass 2  exact recount restricted to the BROADCAST candidate set: the
              left-semi filter drops tail rows at the scan, and the groupBy
              that follows holds <= |candidates| groups per partition after
              map-side combine.
    The threshold count n rides a broadcast 1-row cross join.  Two scans of
    ``col`` total; no stage's state exceeds candidates x partitions rows.
    """
    summ = mg_candidates(df, col, k)
    cands = (
        summ.filter(F.col("item").isNotNull()).select("item").distinct()
    )
    total = summ.groupBy().agg(F.sum("n_part").alias("_n"))
    counted = (
        df.join(F.broadcast(cands), df[col] == cands["item"], "left_semi")
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("_n"))
        .select("item", "cnt")
    )


def with_percentile(
    df: DataFrame,
    value_col: str,
    resolution: float = 0.01,
    group: str | list[str] | None = None,
    out_col: str = "pct_micro",
) -> DataFrame:
    """Annotate every row with its value's percentile WITHIN its group —
    "this request sits at p98 of its route" — from the same histogram-CDF
    machinery as ``hist_quantiles`` (resolution-bounded, no global sort,
    no per-row rank window over data rows).

    ``pct_micro = 1e6·(rows in cells <= this value's cell) div n`` —
    exact integers given the cell grid; NULL values annotate NULL.

    Scale shape: the cell-CDF table is bounded (occupied cells per
    group) and BROADCASTS back onto the data — the data itself is never
    re-shuffled for the annotation."""
    keys = _group_keys(group)
    inv = 1.0 / resolution
    cell = F.floor(F.col(value_col) * F.lit(inv)).cast("long")
    cells = value_cells(df, value_col, resolution, group)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*keys)
    cdf = (
        cells.withColumn("_cum", F.sum("_c").over(w))
        .withColumn("_n", F.sum("_c").over(wn))
        .select(
            *keys,
            "_cell",
            F.expr("CAST((1000000 * _cum) DIV _n AS BIGINT)").alias("_pct"),
        )
    )
    joined = df.withColumn("_cell", cell).join(
        F.broadcast(cdf), keys + ["_cell"], "left"
    )
    return joined.withColumn(out_col, F.col("_pct")).drop("_cell", "_pct")
