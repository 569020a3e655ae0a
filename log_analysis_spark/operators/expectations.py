"""Declarative data-quality expectations — the deequ/Great-Expectations
shape as plain DataFrame algebra: a rule list in, a (rule, violations,
passed) report out.  The gate every production table write should run
BEFORE downstream jobs read garbage (schema drifted, an enum grew a value,
a dedup key stopped being unique).

Scale shape: every row-local rule (not_null / accepted_values / in_range /
min_rows) folds into ONE conditional-count aggregate — a single scan, one
1-row result, no shuffle of data rows.  ``unique`` pays one narrow shuffle
on its key columns (count>1 groups); ``referential`` is a left-anti probe
against the (usually broadcastable) distinct reference keys.  The report
is a driver-sized union of 1-row frames.

Every violation count is an exact integer — a DuckDB oracle replays the
whole report bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One expectation.  ``kind`` ∈ not_null | accepted_values | in_range |
    unique | min_rows | referential.  ``passed`` is violations == 0 (for
    min_rows: rows >= n)."""

    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    n: int | None = None


def not_null(col: str) -> Expect:
    return Expect(f"not_null({col})", "not_null", col=col)


def accepted_values(col: str, values: list) -> Expect:
    return Expect(
        f"accepted_values({col})", "accepted_values", col=col, values=tuple(values)
    )


def in_range(col: str, lo: float, hi: float) -> Expect:
    return Expect(f"in_range({col})", "in_range", col=col, lo=lo, hi=hi)


def unique(*cols: str) -> Expect:
    return Expect(f"unique({','.join(cols)})", "unique", cols=tuple(cols))


def min_rows(n: int) -> Expect:
    return Expect(f"min_rows({n})", "min_rows", n=n)


def referential(col: str, ref_name: str) -> Expect:
    """Violations = rows whose ``col`` is absent from the reference keys
    (pass the reference frame via ``refs={ref_name: df_of_keys}``)."""
    return Expect(f"referential({col}->{ref_name})", "referential", col=col,
                  cols=(ref_name,))


def check_expectations(
    df: DataFrame,
    rules: list[Expect],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate every rule; returns (rule, violations, passed) — violations
    is rows breaking the rule (for min_rows: the shortfall)."""
    refs = refs or {}
    spark = df.sparkSession
    scan_aggs, scan_rules = [], []
    reports: list[DataFrame] = []
    for r in rules:
        if r.kind == "not_null":
            scan_aggs.append(
                F.count_if(F.col(r.col).isNull()).alias(r.name)
            )
            scan_rules.append(r)
        elif r.kind == "accepted_values":
            ok = F.col(r.col).isin(list(r.values))
            scan_aggs.append(
                F.count_if(F.col(r.col).isNull() | ~ok).alias(r.name)
            )
            scan_rules.append(r)
        elif r.kind == "in_range":
            c = F.col(r.col)
            bad = c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
            scan_aggs.append(F.count_if(bad).alias(r.name))
            scan_rules.append(r)
        elif r.kind == "min_rows":
            scan_aggs.append(
                F.greatest(F.lit(0), F.lit(r.n) - F.count(F.lit(1)))
                .cast("long")
                .alias(r.name)
            )
            scan_rules.append(r)
        elif r.kind == "unique":
            dup = (
                df.groupBy(*[F.col(c) for c in r.cols])
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            reports.append(dup)
        elif r.kind == "referential":
            ref_name = r.cols[0]
            if ref_name not in refs:
                raise ValueError(f"missing reference frame {ref_name!r}")
            keys = refs[ref_name].toDF("_refk").distinct()
            miss = (
                df.join(
                    F.broadcast(keys),
                    df[r.col] == F.col("_refk"),
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
                .select(F.lit(r.name).alias("rule"), "violations")
            )
            reports.append(miss)
        else:
            raise ValueError(f"unknown expectation kind {r.kind!r}")
    if scan_aggs:
        one = df.agg(*scan_aggs)
        melted = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.col(r.name).cast("long").alias("violations"),
                        )
                        for r in scan_rules
                    ]
                )
            ).alias("kv")
        ).select("kv.rule", "kv.violations")
        reports.append(melted)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule", "violations", (F.col("violations") == 0).alias("passed")
    )


def profile_columns(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """Column profiling report (the deequ-profile analog): one row per
    column with n / n_null / est_distinct (KMV, k=64) / min / max / p50
    (histogram-CDF, resolution 0.25) — the first look every new table
    gets, composed entirely from this repo's exact-oracle sketch family.

    Cost: ONE conditional-count scan for n/null/min/max of every column
    (single aggregate), plus per column the KMV distinct (narrow) and the
    quantile histogram — all bounded-state."""
    from .sketches import hist_quantiles, kmv_distinct

    aggs = []
    for c in numeric_cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.count_if(F.col(c).isNull()).alias(f"_nn_{c}"),
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    scan = df.agg(*aggs)
    base = scan.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_n_{c}").cast("long").alias("n"),
                        F.col(f"_nn_{c}").cast("long").alias("n_null"),
                        F.col(f"_min_{c}").alias("min"),
                        F.col(f"_max_{c}").alias("max"),
                    )
                    for c in numeric_cols
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    out = base
    parts = []
    for c in numeric_cols:
        d = kmv_distinct(df.filter(F.col(c).isNotNull()), c, k=64).select(
            F.lit(c).alias("column"), "est_distinct"
        )
        q = hist_quantiles(
            df.select(F.col(c).cast("double").alias("_v")), "_v", [0.5],
            resolution=0.25,
        ).select(F.lit(c).alias("column"), F.col("value").alias("p50"))
        parts.append(d.join(q, "column"))
    extras = parts[0]
    for p in parts[1:]:
        extras = extras.unionByName(p)
    return out.join(extras, "column")


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column Shannon entropy profile -> (column, n, n_distinct,
    entropy_micro_nats): the data-quality signal `profile_columns`'
    count/distinct rows can't see — a 'status' column whose distinct
    count is healthy but whose mass collapsed onto one value (entropy
    ~ 0) is a broken upstream, and a supposedly-categorical column with
    entropy ~ ln(n) is a leaked identifier.

    Exact cross-engine by construction: per-value ln() is quantized to
    integer micro-nats immediately (L(x) = round(ln(x)*1e6) — the
    accepted 1-ulp risk class), then

        H_micro = L(n) - (sum over values of c*L(c)) div n

    is pure integer arithmetic (floor bias <= 1 micro-nat, identical in
    both engines).  NULL counts as its own category, in both engines.

    Scale shape: ONE stacked (column, value) explode (bounded fan-out =
    len(cols)), one map-side-combinable (column, value) count, one
    |distinct-values|-sized (column) aggregate.  Values enter the
    exchange as strings — by definition of the operator (it profiles
    value mass); pre-hash wide columns upstream if value bytes matter."""
    if not cols:
        raise ValueError("cols must be non-empty")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("_cv")
    ).select("_cv.column", "_cv.val")
    counts = stacked.groupBy("column", "val").agg(
        F.count(F.lit(1)).alias("c")
    )
    l_of = lambda col: F.round(F.log(col) * 1_000_000).cast("long")  # noqa: E731
    per_col = counts.groupBy("column").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        # c*L(c) can exceed int64 at web scale (1e12 rows * 28e6
        # micro-nats); DECIMAL(38,0) keeps the sum exact, ANSI raises on
        # genuine overflow instead of wrapping
        F.sum(
            (F.col("c") * l_of(F.col("c"))).cast("decimal(38,0)")
        ).alias("_sclc"),
    )
    h = l_of(F.col("n")) - F.expr(
        "_sclc div CAST(n AS DECIMAL(38,0))"
    ).cast("long")
    return per_col.select(
        "column", "n", "n_distinct", h.cast("long").alias("entropy_micro_nats")
    )


def column_correlation(
    df: DataFrame, x_col: str, y_col: str, unit: int = 1_000_000
) -> DataFrame:
    """Pearson correlation between two numeric columns ->
    (n, r_micro): the bivariate deepening of the univariate profile
    (is duration actually driven by response count?).

    Exact-integer discipline: both columns are quantized to
    ``round(x*unit)`` integers first, every sum (n, Σx, Σy, Σx², Σy²,
    Σxy) accumulates in DECIMAL(38,0) — overflow raises loudly under
    ANSI instead of corrupting silently (bound: n·max²·unit² < 1e38;
    lower ``unit`` for huge corpora of large values) — and only the
    final ratio touches floating point:

        r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx²−Σx²) · sqrt(n·Σy²−Σy²))

    with r_micro = round(r*1e6) (two sqrt + one divide over EXACT
    integers — the accepted 1-ulp class).  Rows where either side is
    NULL are excluded (pairwise deletion); a zero-variance side yields
    r_micro NULL.

    Scale shape: ONE algebraic aggregate — map-side partials, a
    one-row result, no window, no join."""
    # promote to DOUBLE before scaling so an int input can't overflow its
    # own type mid-expression under ANSI, and both engines round the same
    # double
    dec = 'CAST(round(CAST({} AS DOUBLE) * {}) AS DECIMAL(38,0))'
    xq = F.expr(dec.format(x_col, int(unit)))
    yq = F.expr(dec.format(y_col, int(unit)))
    both = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(xq.alias("_x"), yq.alias("_y"))
    sums = both.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.expr("_x * _x")).alias("sxx"),
        F.sum(F.expr("_y * _y")).alias("syy"),
        F.sum(F.expr("_x * _y")).alias("sxy"),
    )
    cov = F.expr("n * sxy - sx * sy")
    vx = F.expr("n * sxx - sx * sx")
    vy = F.expr("n * syy - sy * sy")
    r = cov.cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    r_micro = F.when(
        (vx > 0) & (vy > 0), F.round(r * 1_000_000).cast("long")
    )
    return sums.select(F.col("n").cast("long").alias("n"), r_micro.alias("r_micro"))


def table_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent table digest -> one row (n_rows, fingerprint):
    two runs routed the same rows iff their (n_rows, fingerprint) pairs
    match — the O(1)-output form of the pipeline's routed-row-equality
    check (comparing sinks without re-reading either side).

    Per row: md5 over the length-prefixed, null-marked field join (the
    snapshot_diff fingerprint discipline — (NULL,'a') never collides
    with ('a',NULL), a separator inside a value cannot forge a
    boundary); the table digest is the SUM of each row's leading 56
    md5 bits in DECIMAL(38,0) — commutative, so partition and row order
    cannot change it, and 1e12 rows of 56-bit terms stay far below the
    38-digit ceiling.  Exact cross-engine (md5 + integer sum only).

    Duplicate rows each contribute their term (multiset semantics: a
    doubled row CHANGES the digest — what an equality check wants).

    Scale shape: ONE algebraic aggregate, map-side partials; no shuffle
    wider than the one-row merge."""
    use = sorted(df.columns if cols is None else cols)
    if not use:
        raise ValueError("no columns to fingerprint")
    parts = []
    for c in use:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("\x00N")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    term = F.conv(
        F.substring(F.md5(F.concat_ws("\x1e", *parts)), 1, 14), 16, 10
    ).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(term).cast("decimal(38,0)").cast("string").alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Two-sample comparison tests: Mann-Whitney U (ranks) and Kolmogorov-
# Smirnov (distribution shape) — exact integer algebra over VALUE CELLS.
# ---------------------------------------------------------------------------


def rank_compare(
    df: DataFrame,
    val_col: str,
    group_col: str,
    group_a,
    group_b,
    z_milli: int = 1960,
) -> DataFrame:
    """Mann-Whitney U test (Mann & Whitney 1947): do values of ``val_col``
    in group_a tend to be LARGER than in group_b?  The rank-based answer a
    mean comparison gets wrong on heavy-tailed telemetry (one 10^6 ms
    straggler owns any t-test) — same robustness family as Pettitt, for
    two labelled samples instead of a time split.

    Exact integer algebra end to end:
      * values quantize to micro-units (round(v*1e6), the shared rule);
      * doubled mid-ranks come from VALUE CELLS, not rows: per distinct
        value, 2r = 2*(count below) + tie_size + 1, so the doubled rank
        sum of group a is sum(c_a(v) * (2*below(v) + t(v) + 1)) — integer;
      * u2 = 2*U_a = r2_a - 2 * n_a*(n_a+1)/2; its deviation from the null
        mean is d2 = u2 - n_a*n_b (doubled);
      * tie-corrected significance, cross-multiplied (no float, no sqrt):
        3e6 * d2^2 * n(n-1) > z_milli^2 * n_a*n_b * (n(n-1)(n+1) - sum(t^3-t))
        in DECIMAL(38,0) — ANSI mode makes any overflow loud (bound holds
        comfortably to n ~ 3e5 per comparison; beyond that a rank test on
        the full population is statistical overkill anyway — sample).

    Scale shape: ONE map-side-combined aggregate builds the value cells
    (conditional counts per group in the same pass); the rank window runs
    over CELLS (distinct values), not rows — the same discipline as
    ``sketches.hist_quantiles`` / ``perplexity_buckets``; the finish is a
    1-row aggregate.
    """
    from pyspark.sql import Window

    if z_milli < 0:
        raise ValueError(f"z_milli must be >= 0, got {z_milli}")
    if group_a == group_b:
        raise ValueError("group_a and group_b must differ")
    v = F.round(F.col(val_col) * 1_000_000).cast("long")
    cells = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .filter(F.col(val_col).isNotNull())
        .select(
            v.alias("v"),
            F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("_ia"),
        )
        .groupBy("v")
        .agg(
            F.sum("_ia").alias("ca"),
            F.sum(1 - F.col("_ia")).alias("cb"),
        )
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    ranked = cells.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(wv), F.lit(0)).alias(
            "_below"
        ),
        (F.col("ca") + F.col("cb")).alias("_t"),
    )
    agg = ranked.groupBy().agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            dec("ca") * (2 * dec("_below") + dec("_t") + 1)
        ).alias("_r2a"),
        F.sum(dec("_t") * dec("_t") * dec("_t") - dec("_t")).alias("_tcube"),
    )
    n = F.col("na") + F.col("nb")
    u2 = F.col("_r2a") - dec("na") * (dec("na") + 1)
    d2 = u2 - dec("na") * dec("nb")
    var_term = n.cast("decimal(38,0)") * (n - 1) * (n + 1) - F.col("_tcube")
    sig = (
        F.lit(3_000_000).cast("decimal(38,0)") * d2 * d2 * n * (n - 1)
        > F.lit(int(z_milli) * int(z_milli)).cast("decimal(38,0)")
        * dec("na") * dec("nb") * var_term
    )
    return agg.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("_r2a").cast("long").alias("r2_a"),
        u2.cast("long").alias("u2_a"),
        sig.alias("significant"),
        F.when(d2 > 0, "a").when(d2 < 0, "b").otherwise("tie").alias("higher"),
    )


def ks_test(
    df_a: DataFrame,
    df_b: DataFrame,
    val_col: str,
    c_micro: int = 1_358_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test: did the DISTRIBUTION of
    ``val_col`` change between two tables (two curation runs, two sources,
    last week vs this week)?  Location tests (rank_compare) miss a
    variance blow-up with an unmoved center; KS is sup|F_a - F_b|, which
    catches any shape change.

    Exact integers: values micro-quantized; per distinct value the two
    cumulative counts A(v), B(v) come from one window over VALUE CELLS;
    the statistic is d_num = max|A(v)*n_b - B(v)*n_a| (the sup is attained
    at sample points, so cells suffice), reported alongside
    d_micro = 1e6*d_num div (n_a*n_b).  Significance is the classic
    large-sample rejection D > c(alpha)*sqrt((n_a+n_b)/(n_a*n_b)),
    cross-multiplied: 1e12 * d_num^2 > c_micro^2 * (n_a+n_b) * n_a * n_b
    in DECIMAL(38,0) (c_micro = 1.358e6 is alpha=0.05).  ``at_v_micro``
    is the smallest value attaining the sup — where the CDFs pull apart.

    Scale shape: one conditional-count cell aggregate over the union
    (map-side combined), one cell-level cumulative window, a 1-row finish.
    """
    from pyspark.sql import Window

    if c_micro <= 0:
        raise ValueError(f"c_micro must be positive, got {c_micro}")
    v = F.round(F.col(val_col) * 1_000_000).cast("long")
    tagged = df_a.select(v.alias("v"), F.lit(1).alias("_ia")).unionAll(
        df_b.select(v.alias("v"), F.lit(0).alias("_ia"))
    )
    cells = (
        tagged.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.sum("_ia").alias("ca"), F.sum(1 - F.col("_ia")).alias("cb"))
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cum = cells.select(
        "v",
        F.sum("ca").over(wv).alias("_A"),
        F.sum("cb").over(wv).alias("_B"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    gap = cum.select(
        "v",
        "na",
        "nb",
        F.abs(dec("_A") * dec("nb") - dec("_B") * dec("na")).alias("_g"),
    )
    best = gap.groupBy().agg(
        F.min(
            F.struct(
                (-F.col("_g")).alias("_ng"),
                F.col("v").alias("_v"),
                F.col("na").alias("_na"),
                F.col("nb").alias("_nb"),
            )
        ).alias("b")
    )
    d_num = -F.col("b._ng")
    na, nb = F.col("b._na"), F.col("b._nb")
    sig = (
        F.lit(10**12).cast("decimal(38,0)") * d_num * d_num
        > F.lit(int(c_micro) * int(c_micro)).cast("decimal(38,0)")
        * (na + nb).cast("decimal(38,0)") * na * nb
    )
    return best.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        d_num.cast("long").alias("d_num"),
        F.expr(
            "CAST((1000000 * (-b._ng)) div (CAST(b._na AS DECIMAL(38,0)) "
            "* b._nb) AS BIGINT)"
        ).alias("d_micro"),
        F.col("b._v").alias("at_v_micro"),
        sig.alias("significant"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — the privacy complement of the PII scrub.
# ---------------------------------------------------------------------------


def k_anonymity_violations(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """Quasi-identifier combinations held by FEWER than ``k`` rows — the
    groups whose members a linkage attack can single out (Sweeney 2002).
    The scrub removes direct identifiers; this audits whether the
    remaining columns still isolate individuals.

    Returns the violating groups themselves: (*qi_cols, group_n) with
    0 < group_n < k.  One map-side-combined aggregate + a filter; NULL is
    a quasi-identifier value like any other (two rows with NULL zip are
    the same equivalence class — Spark and SQL GROUP BY agree on that).

    Scale shape: one narrow (qi...) count shuffle; the output is bounded
    by the number of small groups, which is what the audit is FOR."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_n"))
        .filter(F.col("group_n") < k)
    )


def k_anonymity_summary(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """One-row k-anonymity report: total rows, equivalence classes,
    violating classes, rows at re-identification risk, and the table's
    actual k (the smallest class size) — the number to put on a release
    checklist.  Same single-aggregate scale shape as the violations
    table, finished by a 1-row fold."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    groups = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("group_n"))
    return groups.groupBy().agg(
        F.sum("group_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("group_n") < k).cast("long")).alias("n_violating"),
        F.sum(
            F.when(F.col("group_n") < k, F.col("group_n")).otherwise(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("group_n").cast("long").alias("actual_k"),
    )


def l_diversity_violations(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """Quasi-identifier classes whose SENSITIVE attribute takes fewer than
    ``l`` distinct values (Machanavajjhala et al. 2007) — the
    homogeneity-attack complement of ``k_anonymity_violations``: a
    10-member class is k-safe, but if all 10 share one sensitive value the
    attacker learns it WITHOUT re-identifying anyone.

    Returns the violating classes: (*qi_cols, group_n, n_sensitive) with
    ``n_sensitive < l``.  NULL quasi-identifier values form equivalence
    classes like any other value (GROUP BY semantics, as in k-anonymity);
    NULL sensitive values contribute NO diversity (count-distinct ignores
    NULL identically in both engines — an unknown diagnosis doesn't
    protect the known ones).

    Scale shape: count-distinct expands to the standard two-phase
    aggregate keyed (qi…, sensitive) then (qi…) — both narrow,
    map-side-combined; output bounded by the violating classes, which is
    what the audit is for."""
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_n"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


# ---------------------------------------------------------------------------
# Chi-square independence, ranking AUC, Gini concentration — the same
# exact-integer discipline as rank_compare/ks_test: values fold into
# bounded CELLS, cross-multiplied DECIMAL(38,0) algebra, one final
# integral division.
# ---------------------------------------------------------------------------


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str, crit_micro: int
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (Pearson 1900): is the event mix actually different across
    day parts / sources / routes, or is the contingency table just what
    the margins predict?  The categorical complement of
    ``column_correlation`` (numeric×numeric) and ``rank_compare``
    (numeric×2-group).

    Exact integers via the empty-cell-free identity

        chi2 = sum_cells O^2 * N / (R_i * C_j)  -  N

    (unobserved cells contribute 0 to the sum — the classic
    sum((O-E)^2/E) needs every structural cell, this form doesn't).
    Each cell's term is truncated to micro units independently
    (``(O^2*N*1e6) div (R*C)`` in DECIMAL(38,0)), so the oracle replays
    the statistic bit-for-bit; the accumulated floor bias is < n_cells
    micro — noise at test scale.  Significance is
    ``chi2_micro > crit_micro`` with the caller supplying the critical
    value for THEIR dof/alpha (dof is emitted for the lookup);
    ``v2_micro`` is Cramer's V^2 in micro (effect size the sample-size-
    inflated chi2 isn't).

    NULL is a category like any other (both engines GROUP BY agree).

    Scale shape: ONE map-side-combined (a, b) cell count; margins come
    from cell-level windows (cells are bounded by the category-product,
    not the row count); a 1-row finish.  No row ever re-shuffles."""
    from pyspark.sql import Window

    if crit_micro <= 0:
        raise ValueError(f"crit_micro must be positive, got {crit_micro}")
    if col_a == col_b:
        raise ValueError("col_a and col_b must differ")
    cells = df.groupBy(
        F.col(col_a).cast("string").alias("_a"),
        F.col(col_b).cast("string").alias("_b"),
    ).agg(F.count(F.lit(1)).alias("o"))
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    wall = Window.partitionBy()
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = cells.select(
        "o",
        F.sum("o").over(wa).alias("r"),
        F.sum("o").over(wb).alias("c"),
        F.sum("o").over(wall).alias("n"),
        F.size(F.collect_set("_a").over(wall)).alias("ka"),
        F.size(F.collect_set("_b").over(wall)).alias("kb"),
    )
    term = F.expr(
        "(CAST(o AS DECIMAL(38,0)) * o * n * 1000000)"
        " div (CAST(r AS DECIMAL(38,0)) * c)"
    )
    agg = m.groupBy().agg(
        F.sum(term).alias("_s"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("ka").alias("_ka"),
        F.max("kb").alias("_kb"),
    )
    chi2 = F.col("_s") - dec(F.col("n")) * 1_000_000
    dof = (F.col("_ka") - 1) * (F.col("_kb") - 1)
    mindim = F.least(F.col("_ka"), F.col("_kb")) - 1
    v2 = F.when(
        mindim > 0,
        F.expr(
            "(_s - CAST(n AS DECIMAL(38,0)) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * (least(_ka, _kb) - 1))"
        ).cast("long"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_cells").cast("long").alias("n_cells"),
        dof.cast("long").alias("dof"),
        chi2.cast("long").alias("chi2_micro"),
        v2.alias("v2_micro"),
        (chi2 > F.lit(int(crit_micro)).cast("decimal(38,0)")).alias(
            "significant"
        ),
    )


def ranking_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC AUC of a score against a boolean label — the evaluation
    op for the quality classifier / DSIR weights: AUC is
    P(score_pos > score_neg) + P(tie)/2, which is the Mann-Whitney U
    identity (Hanley & McNeil 1982), so the whole computation reuses the
    rank_compare cell algebra: doubled mid-ranks from VALUE CELLS, then

        auc_micro = (1e6 * u2) div (2 * n_pos * n_neg)

    with u2 = 2*U_pos exact.  NULL scores and NULL labels are excluded.

    Scale shape: one conditional-count cell aggregate (map-side
    combined), one window over CELLS (distinct score values), a 1-row
    finish — rows never re-shuffle, exactly rank_compare's plan."""
    from pyspark.sql import Window

    v = F.round(F.col(score_col) * 1_000_000).cast("long")
    cells = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            v.alias("v"),
            F.col(label_col).cast("boolean").cast("int").alias("_ia"),
        )
        .groupBy("v")
        .agg(F.sum("_ia").alias("ca"), F.sum(1 - F.col("_ia")).alias("cb"))
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    ranked = cells.select(
        "ca",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(wv), F.lit(0)).alias(
            "_below"
        ),
        (F.col("ca") + F.col("cb")).alias("_t"),
    )
    agg = ranked.groupBy().agg(
        F.sum("ca").alias("np"),
        F.sum(F.col("_t") - F.col("ca")).alias("nn"),
        F.sum(dec("ca") * (2 * dec("_below") + dec("_t") + 1)).alias("_r2"),
    )
    u2 = F.col("_r2") - dec("np") * (dec("np") + 1)
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0))"
            " * (_r2 - CAST(np AS DECIMAL(38,0)) * (np + 1)))"
            " div (2 * CAST(np AS DECIMAL(38,0)) * nn)"
        ).cast("long"),
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        u2.cast("long").alias("u2_pos"),
        auc.alias("auc_micro"),
    )


def gini_concentration(
    df: DataFrame, key_col: str
) -> DataFrame:
    """Gini coefficient of activity concentration: how unequally are the
    rows spread over ``key_col`` holders (events per user, docs per
    domain)?  0 = perfectly even, ->1 = one key owns everything — the
    one-number skew audit to run BEFORE a groupBy melts an executor.

    Exact integers without a global row_number: with per-key counts
    folded into VALUE CELLS (distinct count value x, multiplicity m,
    cumulative keys below), the sorted-index identity
    sum_i (2i - n_keys - 1) * x_i collapses per cell to

        x * m * (2*below + m - n_keys)

    (the inner arithmetic series — tie order provably cancels), so

        gini_micro = (1e6 * g_num) div (n_keys * total).

    Scale shape: one narrow key-count shuffle, then CELLS (distinct
    count values — tiny, counts concentrate), one cell window, a 1-row
    finish.  No global sort, no row-level window."""
    from pyspark.sql import Window

    per_key = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("x")
    )
    cells = per_key.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    staged = cells.select(
        "x",
        "m",
        F.coalesce(F.sum("m").over(wv), F.lit(0)).alias("_below"),
        F.sum("m").over(wall).alias("_nk"),
    )
    agg = staged.groupBy().agg(
        F.max("_nk").alias("n_keys"),
        F.sum(dec("x") * dec("m")).alias("_tot"),
        F.sum(
            dec("x")
            * dec("m")
            * (2 * dec("_below") + dec("m") - dec("_nk"))
        ).alias("_g"),
    )
    gini = F.when(
        (F.col("n_keys") > 0) & (F.col("_tot") > 0),
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * _g)"
            " div (CAST(n_keys AS DECIMAL(38,0)) * _tot)"
        ).cast("long"),
    )
    return agg.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("_tot").cast("long").alias("total"),
        gini.alias("gini_micro"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    val_col: str,
    width: float = 1.0,
    thr_micro: int = 200_000,
) -> DataFrame:
    """Population Stability Index between two samples of ``val_col``
    (the scorecard-monitoring classic): PSI = Σ (p_a−p_b)·ln(p_a/p_b)
    over value bins.  KS answers "did the distribution change
    anywhere?"; PSI weights every bin's change and is the number teams
    alert on (>0.2 = investigate — the default ``thr_micro``).

    Deterministic binning: micro-quantized values fall into fixed-width
    bins (``floor(v_micro / width_micro)``) — no data-dependent quantile
    edges, so two engines and two runs agree bit-for-bit.  Bins observed
    in EITHER sample get +1 Laplace smoothing on BOTH sides (the
    standard empty-bin fix, documented rather than an arbitrary
    epsilon), so with B bins the smoothed totals are n+B.

    Exact integers: with smoothed cell counts ca', cb' and totals na',
    nb', each bin's term is

        (p_a−p_b)·ln(p_a/p_b)
          = [(ca'·nb' − cb'·na') · (L(ca'·nb') − L(cb'·na'))] / (na'·nb')

    with L(x) = round(ln(x)·1e6) micro-nats (the column_entropy rule).
    Both factors always share a sign, so every term is ≥ 0 and the one
    final integral division has no floor/trunc ambiguity:
    psi_micro = Σ terms div (na'·nb') in DECIMAL(38,0).

    Scale shape: one (bin) cell count per side (map-side combined), a
    full-outer join of two BIN tables (bounded by value range / width,
    not rows), a 1-row finish."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if thr_micro <= 0:
        raise ValueError(f"thr_micro must be positive, got {thr_micro}")
    return psi_from_cells(
        psi_value_cells(df_a, val_col, width, "ca"),
        psi_value_cells(df_b, val_col, width, "cb"),
        thr_micro,
    )


def psi_value_cells(
    df: DataFrame, val_col: str, width: float = 1.0, out: str = "ca"
) -> DataFrame:
    """The mergeable half of ``psi_drift``: (bin, count) cells on the
    fixed micro-quantized grid.  Counts ADD, so per-partition /
    per-micro-batch cells union+sum losslessly — the property
    ``sketch_stream.run_stream_psi_drift`` folds on."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    width_micro = round(width * 1_000_000)
    v = F.round(F.col(val_col) * 1_000_000).cast("long")
    bin_of = F.floor(v / F.lit(width_micro)).cast("long")
    return (
        df.filter(F.col(val_col).isNotNull())
        .select(bin_of.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(out))
    )


def psi_from_cells(
    cells_a: DataFrame, cells_b: DataFrame, thr_micro: int = 200_000
) -> DataFrame:
    """PSI finisher over two pre-aggregated (bin, count) cell tables —
    the shared core of ``psi_drift`` (fixed-width value bins) and
    ``similarity.cluster_histogram_psi`` (centroid-id bins).  Inputs:
    ``cells_a`` with columns (bin, ca), ``cells_b`` with (bin, cb); the
    smoothing, integer micro-nat term algebra and the single integral
    division are exactly as documented on ``psi_drift``."""
    if thr_micro <= 0:
        raise ValueError(f"thr_micro must be positive, got {thr_micro}")
    joined = cells_a.join(cells_b, ["bin"], "full_outer")
    sm = joined.select(
        (F.coalesce("ca", F.lit(0)) + 1).alias("ca"),
        (F.coalesce("cb", F.lit(0)) + 1).alias("cb"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = sm.groupBy().agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    # one-row totals broadcast back onto the bounded bin table
    staged = sm.crossJoin(F.broadcast(tot))
    l_of = lambda c: F.round(F.log(c) * 1_000_000).cast("long")  # noqa: E731
    x = dec("ca") * dec("nb")
    y = dec("cb") * dec("na")
    term = (x - y) * (l_of(x.cast("double")) - l_of(y.cast("double"))).cast(
        "decimal(38,0)"
    )
    agg = staged.groupBy().agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("n_bins").alias("n_bins"),
        F.sum(term).alias("_s"),
    )
    psi = F.expr("_s div (CAST(na AS DECIMAL(38,0)) * nb)").cast("long")
    return agg.select(
        (F.col("na") - F.col("n_bins")).cast("long").alias("n_a"),
        (F.col("nb") - F.col("n_bins")).cast("long").alias("n_b"),
        F.col("n_bins").cast("long").alias("n_bins"),
        psi.alias("psi_micro"),
        (psi > F.lit(int(thr_micro))).alias("drifted"),
    )


# Benford's-law expected first-digit mass, micro units:
# round(log10(1 + 1/d) * 1e6) for d = 1..9 — literals so both engines
# compare against the identical integers.
BENFORD_EXPECTED_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_deviation(df: DataFrame, val_col: str) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938) —
    the classic fabricated-or-truncated-data smell test for naturally
    occurring magnitudes (transaction amounts, durations, file sizes):
    real multi-scale data puts ~30.1% of first digits at 1; uniform or
    invented numbers don't.

    Digit extraction is engine-portable by construction: values
    micro-quantize to integers FIRST (``round(v·1e6)``), and the first
    digit is the leading character of the absolute integer's decimal
    string — integer-to-string is identical everywhere, sidestepping the
    float ``log10`` boundary wobble at powers of ten.  Zero and NULL
    values are excluded (no first significant digit).

    Returns one row per digit 1-9: ``(digit, n, observed_micro,
    expected_micro, dev_micro)`` with ``observed_micro = 1e6·n_d div n``
    and ``dev_micro = observed − expected`` — all exact integers.
    Unobserved digits still emit (n=0), so the output is always 9 rows.

    Scale shape: one narrow (digit) map-side-combined count + a 9-row
    literal join; the total rides a 1-row broadcast; zero Python."""
    i = F.abs(F.round(F.col(val_col) * 1_000_000).cast("long"))
    digit = F.substring(i.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(val_col).isNotNull() & (i > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        sorted(BENFORD_EXPECTED_MICRO.items()), "digit int, expected_micro long"
    )
    tot = counts.groupBy().agg(F.coalesce(F.sum("n"), F.lit(0)).alias("_tot"))
    out = (
        F.broadcast(expected)
        .join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.when(
                F.col("_tot") > 0,
                F.expr("CAST(1000000 * COALESCE(n, 0) DIV _tot AS BIGINT)"),
            ).otherwise(F.lit(0)).alias("observed_micro"),
            "expected_micro",
        )
    )
    return out.withColumn(
        "dev_micro", (F.col("observed_micro") - F.col("expected_micro")).cast("long")
    )


def sequence_integrity(
    df: DataFrame,
    group_col: str = "conv_id",
    idx_col: str = "turn_idx",
    start_at: int = 0,
) -> DataFrame:
    """Per-group sequence-integrity audit over an ordinal index column —
    the transcript-pipeline question "is every conversation's turn stream
    whole?" asked BEFORE training consumes it: a dropped producer batch
    leaves index GAPS, a replayed one leaves DUPLICATE indexes, and a
    mis-keyed ingest shifts the FIRST index off ``start_at`` — three
    defects per-turn text equality checks can't see (they compare the rows
    that exist, not the ones that don't).

    One row per group: ``(group, n_rows, n_distinct_idx, min_idx, max_idx,
    n_missing, n_dup_rows, is_contiguous)`` where

    * ``n_missing = (max_idx - min_idx + 1) - n_distinct_idx`` — indexes
      absent INSIDE the observed span (leading truncation shows up via
      ``min_idx > start_at`` instead, folded into ``is_contiguous``);
    * ``n_dup_rows = n_rows - n_distinct_idx`` — replayed rows;
    * ``is_contiguous`` ⇔ no gaps, no dups, and ``min_idx = start_at``.

    NULL indexes count into ``n_rows`` but not the distinct/extrema math
    (they make the group non-contiguous via the dup term).  Scale shape:
    ONE group-keyed shuffle carrying (group, idx) ints — the classic
    sort-based alternative (lag window over every row) pays the same
    shuffle plus a per-group sort; this is pure counting, and every output
    is an exact integer any engine replays.

    Factored through ``sequence_cells`` + ``sequence_integrity_from_cells``
    so the streaming twin (cell counts are ADDITIVE — fold per micro-batch,
    audit from the folded state) runs the identical finisher and cannot
    drift from batch."""
    return sequence_integrity_from_cells(
        sequence_cells(df, group_col, idx_col), start_at
    )


def sequence_cells(
    df: DataFrame, group_col: str = "conv_id", idx_col: str = "turn_idx"
) -> DataFrame:
    """(group, idx, cnt) occurrence cells — the additive state the
    sequence-integrity audit folds from (NULL idx kept as its own cell so
    null rows survive into ``n_rows``)."""
    return df.groupBy(
        F.col(group_col).alias("group"), F.col(idx_col).alias("idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def sequence_integrity_from_cells(
    cells: DataFrame, start_at: int = 0
) -> DataFrame:
    """The audit finisher over (group, idx, cnt) cells — shared verbatim by
    the batch operator and the streaming fold (see sequence_integrity)."""
    g = cells.groupBy("group").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count_if(F.col("idx").isNotNull()).cast("long").alias(
            "n_distinct_idx"
        ),
        F.min("idx").cast("long").alias("min_idx"),
        F.max("idx").cast("long").alias("max_idx"),
    )
    n_missing = F.col("max_idx") - F.col("min_idx") + 1 - F.col("n_distinct_idx")
    n_dup = F.col("n_rows") - F.col("n_distinct_idx")
    return g.select(
        "group",
        "n_rows",
        "n_distinct_idx",
        "min_idx",
        "max_idx",
        F.coalesce(n_missing, F.lit(0)).cast("long").alias("n_missing"),
        n_dup.cast("long").alias("n_dup_rows"),
        (
            F.col("min_idx").isNotNull()
            & (F.col("min_idx") == F.lit(int(start_at)))
            & (n_missing == 0)
            & (n_dup == 0)
        ).alias("is_contiguous"),
    )
