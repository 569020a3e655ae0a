"""Multi-dimensional file layout (Z-order clustering) for data skipping.

At 100 TB the cheapest predicate is the one that never reads the file:
parquet footers carry per-column min/max, and engines (Spark, Trino,
DuckDB) skip files/row-groups whose ranges miss the filter.  A layout
clustered on ONE column gives skipping on that column only; Z-ORDERING
interleaves the bits of several columns' normalized ranks so every file
covers a small HYPER-RECTANGLE of the key space — box predicates on any
subset of the z-columns skip most files.

Shape: one tiny min/max aggregate per column (1 broadcast row), a pure
JVM bit-interleave projection (no Python), then
``repartitionByRange(_z)`` + ``sortWithinPartitions(_z)`` — exactly one
range shuffle, the same cost any clustered write already pays.

Normalization here is min-max to a ``bits``-bit grid (right for roughly
uniform columns like ids and timestamps); heavily skewed columns should
be rank-normalized first (the histogram-CDF machinery in
``operators.sketches.hist_quantiles`` provides the cuts) — documented
rather than hidden, since a wrong normalization silently degrades to
one-column clustering.

The win is MEASURED, not asserted from theory: tests/test_layout.py
computes the per-file bounding boxes of both a z-ordered and a
single-column layout from the written files and asserts the z-order's
total box area is a fraction of the control's.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(col: F.Column, lo: float, hi: float, bits: int) -> F.Column:
    """min-max rank of ``col`` quantized to [0, 2^bits): constant-span
    columns map to 0."""
    grid = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    q = F.floor(scaled * F.lit(float(grid))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(grid), q))


def zorder_key(norm_cols: list[F.Column], bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of each (already normalized)
    column: result bit (i*len + j) = bit i of column j — pure JVM
    shift/or expressions, 2^bits grid per dimension."""
    n = len(norm_cols)
    terms = []
    for j, c in enumerate(norm_cols):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet z-ordered on ``cols``: one min/max
    aggregate, one bit-interleave projection, one range shuffle."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (use a plain sort for 1)")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    stats = df.agg(*aggs).first()
    norm = [
        _normalized(F.col(c), stats[f"_lo_{c}"], stats[f"_hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("_z", zorder_key(norm, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_range_clustered(
    df: DataFrame, path: str, col: str, n_files: int = 8
) -> None:
    """Single-column range clustering (the control / the right layout when
    only one column is ever filtered)."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_files: int,
    sort_within: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet dir as ``target_files``
    files (optionally re-sorted within files to restore clustering) — the
    maintenance pass every append-accumulating table needs before its file
    count, not its byte count, becomes the read bottleneck (each file is a
    task + a footer fetch at plan time).

    Returns {n_files_before, n_files_after, rows} and verifies row
    preservation itself — a compaction that loses rows must never return.
    """
    import glob as _glob

    df = spark.read.parquet(path)
    n_before = len(_glob.glob(f"{path}/*.parquet"))
    rows_before = df.count()
    out = df.repartition(target_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").parquet(out_path)
    back = spark.read.parquet(out_path)
    rows_after = back.count()
    if rows_after != rows_before:
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}"
        )
    return {
        "n_files_before": n_before,
        "n_files_after": len(_glob.glob(f"{out_path}/*.parquet")),
        "rows": rows_after,
    }


def _rank_bucket_table(
    df: DataFrame, col: str, bits: int, resolution: float
) -> DataFrame:
    """(cell → rank bucket) map for one column: quantize to a fine grid,
    histogram, cumulative-below CDF over CELLS, bucket = (cum_below · 2^bits)
    div n — the perplexity_buckets integer math generalized to numerics.
    Bounded by occupied cells, so it BROADCASTS."""
    from pyspark.sql import Window

    inv = 1.0 / resolution
    cell = F.floor(F.col(col).cast("double") * F.lit(inv)).cast("long")
    hist = (
        df.filter(F.col(col).isNotNull())
        .select(cell.alias("_cell"))
        .groupBy("_cell")
        .agg(F.count("*").alias("_c"))
    )
    wn = Window.partitionBy()
    grid = 1 << bits
    return hist.select(
        "_cell",
        F.expr(
            f"CAST({grid} AS BIGINT) * "
            "COALESCE(sum(_c) OVER (ORDER BY _cell ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING), 0)"
        ).alias("_below"),
        F.sum("_c").over(wn).alias("_n"),
    ).select(
        "_cell",
        F.least(
            F.lit(grid - 1), F.expr("_below div _n").cast("long")
        ).alias("_bucket"),
    )


def write_zordered_ranked(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    resolution: float | dict[str, float] = 0.01,
) -> None:
    """Z-ordered write with RANK normalization — the skew-proof variant the
    min-max docstring points to: each column's coordinate is its equal-mass
    CDF bucket (broadcast cell→bucket map per column), so a heavy-tailed
    column still spreads across the full grid and the per-file
    hyper-rectangles stay small in QUANTILE space (what box predicates over
    observed data actually hit).  Costs one histogram aggregate + one
    broadcast join per column on top of the min-max path's range shuffle.

    The CDF window runs over occupied CELLS (≤ range/resolution rows), the
    same trick as hist_quantiles — no data-row rank window anywhere."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    out = df
    norm_cols = []
    res = (
        resolution
        if isinstance(resolution, dict)
        else {c: float(resolution) for c in cols}
    )
    missing = [c for c in cols if c not in res]
    if missing:
        raise ValueError(f"no resolution for columns {missing} — a single "
                         "float applies to all, or pass a per-column dict "
                         "(one grid cannot fit columns of different scales)")
    for c in cols:
        table = _rank_bucket_table(df, c, bits, res[c])
        bname = f"_zb_{c}"
        cell = F.floor(F.col(c).cast("double") * F.lit(1.0 / res[c])).cast("long")
        out = (
            out.withColumn("_cell", cell)
            .join(F.broadcast(table), "_cell", "left")
            .na.fill({"_bucket": 0})
            .withColumnRenamed("_bucket", bname)
            .drop("_cell")
        )
        norm_cols.append(F.col(bname))
    z = zorder_key(norm_cols, bits)
    (
        out.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_zb_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
