"""Aggregate stage — per-sink counts, grouped stats, distincts, histograms.

Reference operators reproduced (SURVEY.md §2.5):
  * A1/A2 — per-class / conditional counts (log_processing.py:57-103,
    logs_overview.sh:13-20, combined_analysis.sh)
  * A3/A4 — distinct values / count-distinct (combined_analysis.sh:73,91;
    HyraxLogAnalysis.jl:299,307)
  * A5 — grouped count+median+max (HyraxLogAnalysis.jl:310-313)
  * A6 — extrema (HyraxLogAnalysis.jl:56-58)
  * A7 — group-size HAVING + set equality (HyraxLogAnalysis.jl:196-200)
  * A8 — histogram binning (HyraxLogAnalysis.jl:27-35)

Scale notes: all aggregates are algebraic (map-side partial agg is free);
the salted two-phase count exists for hot-key groupBys where a single
reducer would bottleneck — it re-merges exactly (counts only, no floats in
the equality surface, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """North-star aggregate: counts by (role, tool, hour-bucketed ts)."""
    keys = keys or ["role", "tool"]
    return (
        df.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy(*keys, "hour")
        .agg(F.count("*").alias("n"))
    )


def salted_group_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: partial agg on (key, salt) spreads a
    hot key over ``n_salts`` reducers, final agg re-merges exactly.

    Output is identical to ``df.groupBy(key).count()`` — that identity is
    the correctness gate (oracle = the plain SQL count).
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_pn"))
    )
    return partial.groupBy(key).agg(F.sum("_pn").cast("long").alias("n"))


def grouped_stats(df: DataFrame, group: str, value: str) -> DataFrame:
    """A5 — count / median / max per group (HyraxLogAnalysis.jl:310-313)."""
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            F.median(value).alias("med_val"),
            F.max(value).alias("max_val"),
        )
    )


def distinct_sorted(df: DataFrame, col: str) -> DataFrame:
    """A3 — `jq ... | sort -u` equivalent."""
    return df.select(col).filter(F.col(col).isNotNull()).distinct().orderBy(col)


def extrema(df: DataFrame, col: str) -> DataFrame:
    """A6 — min/max over a column (the log date range)."""
    return df.agg(F.min(col).alias("min_val"), F.max(col).alias("max_val"))


def histogram(df: DataFrame, value: str, width: float, group: str | None = None) -> DataFrame:
    """A8 — fixed-width binning; bin = floor(value/width)."""
    bin_col = F.floor(F.col(value) / F.lit(width)).cast("long").alias("bin")
    keys = ([group] if group else []) + [bin_col]
    return (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
    )


def groups_with_exact_pair(
    df: DataFrame,
    key: str,
    item: str,
    expected: list[str],
    expected_count: int | None = None,
) -> DataFrame:
    """A7/U4 — exact item-set equality per group, optionally HAVING an exact
    row count too (HyraxLogAnalysis.jl:196-200 `issetequal` + nrow==2)."""
    out = (
        df.filter(F.col(item).isNotNull())
        .groupBy(key)
        .agg(
            F.count("*").alias("n"),
            F.array_sort(F.collect_set(item)).alias("items"),
        )
        .filter(F.col("items") == F.array(*[F.lit(x) for x in sorted(expected)]))
    )
    if expected_count is not None:
        out = out.filter(F.col("n") == expected_count)
    return out.select(key, "n")


def dimensional_rollup(
    df: DataFrame, dims: list[str], count_col: str = "n"
) -> DataFrame:
    """Every grouping combination of ``dims`` in ONE pass — the
    dashboard-cube version of the per-sink sanity totals: counts for each
    subset of the dimensions (full detail, every partial rollup, grand total)
    via GROUPING SETS, so the scan and the aggregate run once instead of
    2^|dims| times.  Output: the dim columns (NULL where rolled up),
    ``grouping_id`` (Spark's bit mask — bit set ⇔ that dim is rolled up,
    leftmost dim = highest bit), and the count.  NULLs in the DATA are
    disambiguated from rollup NULLs by the mask — the reason grouping_id
    exists at all.

    Scale shape: Spark's Expand node replicates each input row once per
    grouping set BEFORE the exchange — shuffle volume is 2^|dims| × rows
    of narrow (dims, id, count) tuples with map-side partial aggregation
    collapsing them per partition first, exactly how a hand-written
    union-of-rollups would shuffle, minus the repeated scans."""
    if not dims:
        raise ValueError("dims must be non-empty")
    # grouping_id() is only resolvable INSIDE the grouping-sets Aggregate —
    # it must be an agg expression, not a post-hoc projection
    return df.cube(*dims).agg(
        F.grouping_id(*dims).cast("long").alias("grouping_id"),
        F.count(F.lit(1)).cast("long").alias(count_col),
    ).select(*dims, "grouping_id", count_col)


def pivot_matrix(
    df: DataFrame,
    row_key: str,
    col_key: str,
    col_values: list[str],
    count_col_prefix: str = "n_",
) -> DataFrame:
    """Long→wide count matrix: one row per ``row_key``, one
    ``{prefix}{value}`` LONG column per EXPLICIT ``col_values`` entry
    (0 where absent) — the role × hour / tool × class dashboard table.

    ``col_values`` is REQUIRED: letting Spark infer pivot columns costs an
    extra distinct-collect job AND makes the output schema data-dependent
    — a moving target no downstream table contract (or cross-engine
    oracle) can pin.  Values outside the list are DROPPED, matching SQL
    PIVOT ... IN (...).  Scale shape: Spark compiles the explicit-values
    pivot TWO-PHASE — a partial (row_key, col_key) count exchange, then
    the row_key-keyed pivot aggregate — both narrow (key + count
    columns); the partial pre-aggregation means a hot row_key's rows
    combine map-side before the final pivot, the skew-safer shape
    (plan-audited in EXPLAIN.md)."""
    if not col_values:
        raise ValueError("col_values must be non-empty (explicit schema)")
    out = (
        df.groupBy(row_key)
        .pivot(col_key, col_values)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        row_key,
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0))
            .cast("long")
            .alias(f"{count_col_prefix}{v}")
            for v in col_values
        ],
    )
