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
    numer = (k - 1) * _HASH_SPACE
    est = F.when(F.col("_m") < k, F.col("_m")).otherwise(
        F.expr(f"CAST({numer} AS BIGINT) div _kth")
    )
    return aggd.select(*keys, est.cast("long").alias("est_distinct"))


def kmv_distinct(
    df: DataFrame, col: str, k: int = 64, group: str | None = None
) -> DataFrame:
    """Sketch + estimate in one call: (group?, est_distinct)."""
    return kmv_estimate(kmv_sketch(df, col, k=k, group=group), k=k, group=group)
