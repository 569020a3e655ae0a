"""Similarity search over an embedding column (``array<float>``).

* Brute-force cosine top-k — the correctness baseline: broadcast the query
  set, JVM-side dot products via ``zip_with`` + ``aggregate`` (no Python in
  the scoring loop), window top-k.
* IVF (inverted-file) top-k — the scale path: corpus vectors are assigned
  to their nearest of K centroids once; a query probes only its ``n_probe``
  nearest centroid buckets, cutting scored pairs by ~K/n_probe.  At 100 TB
  the assignment is a narrow map + one small broadcast join; no cross join
  ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vec(df: DataFrame, vec_col: str = "embedding", out: str = "unit") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(out, F.when(n > 0, F.transform(v, lambda x: x / n)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: score = dot(unit_q, unit_c); ranking uses
    the score rounded to 1e-6 with id tiebreak so ordering is reproducible
    across engines/float orders."""
    from pyspark.sql import Window

    c = with_unit_vec(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col("unit").alias("cvec")
    )
    q = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .withColumn("score", F.round(_dot(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "corpus_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def assign_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF build: centroids = the ``n_centroids`` lowest-id vectors
    (deterministic seed choice, no iterative k-means needed for a bucketing
    structure); every corpus vector is assigned to its nearest centroid.

    Returns (assigned corpus with ``centroid_id``, centroids).
    """
    from pyspark.sql import Window

    cu = with_unit_vec(corpus, vec_col)
    w = Window.orderBy(id_col)
    cents = (
        cu.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_centroids)
        .select(F.col("_rn").alias("centroid_id"), F.col("unit").alias("centvec"))
    )
    scored = cu.select(F.col(id_col), F.col("unit")).join(F.broadcast(cents)).withColumn(
        "sim", F.round(_dot(F.col("unit"), F.col("centvec")), 6)
    )
    wbest = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("_r", F.row_number().over(wbest))
        .filter(F.col("_r") == 1)
        .select(id_col, "centroid_id", "unit")
    )
    return assigned, cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed ANN top-k: probe only the ``n_probe`` nearest centroid
    buckets per query.  Approximate (recall < 1 possible) — benchmarked
    against cosine_topk for recall in tests."""
    from pyspark.sql import Window

    assigned, cents = assign_centroids(corpus, n_centroids, id_col, vec_col)
    q = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qvec")
    )
    qprobe = (
        q.join(F.broadcast(cents))
        .withColumn("sim", F.round(_dot(F.col("qvec"), F.col("centvec")), 6))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qvec", "centroid_id")
    )
    scored = (
        qprobe.join(assigned, on="centroid_id")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("score", F.round(_dot(F.col("qvec"), F.col("unit")), 6))
        .select("query_id", F.col(id_col).alias("corpus_id"), "score")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-band LSH, components
    rounded to 6 decimals so the exact same values can be embedded as
    literals in both the Spark expressions and the DuckDB oracle SQL."""
    import numpy as np

    rng = np.random.RandomState(seed)
    h = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in h]


def _sign_bit(unit: F.Column, plane: list[float]) -> F.Column:
    """1 iff the unit vector lies on the non-negative side of the plane.
    The dot is rounded to 1e-6 before the sign test so the bit is identical
    across engines/float-fold orders (same trick as the top-k scores)."""
    p = F.array(*[F.lit(c) for c in plane])
    return F.when(F.round(_dot(unit, p), 6) >= 0, F.lit(1)).otherwise(F.lit(0))


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    dim: int = 64,
    n_planes: int = 64,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane sign-band LSH —
    CONTENT-BASED candidates (unlike the round-1 ``id % n_blocks`` sampling):
    a pair's collision probability per bit is ``1 - θ/π``, so high-cosine
    pairs collide in some band with probability → 1 while far pairs rarely
    do.  Exact cosine verify on candidates.

    Banding: ``n_planes`` sign bits split into bands of ``band_bits``; two
    vectors are candidates iff some band matches exactly.  Scale: the band
    join carries only (id, band, bkey); ``band_bits`` sets bucket
    granularity — raise it as the corpus grows (buckets ~ N/2^band_bits per
    band).  At near-dup thresholds (cos >= 0.99, θ <= 8°) recall with 8×8-bit
    bands is > 0.999; the contract query's lower threshold trades recall for
    a non-trivial result on the synthetic corpus and the oracle mirrors the
    same candidate rule, so the cross-engine check stays exact."""
    planes = hyperplanes(dim, n_planes, seed)
    n_bands = n_planes // band_bits
    u = (
        with_unit_vec(df, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("id"), "unit")
        .withColumn("bits", F.array(*[_sign_bit(F.col("unit"), p) for p in planes]))
    )
    banded = u.select(
        "id",
        "unit",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sum(
                            (
                                F.element_at("bits", b * band_bits + j + 1)
                                * F.lit(1 << (band_bits - 1 - j))
                            )
                            for j in range(band_bits)
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "unit", "bb.band", "bb.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bkey") == F.col("b.bkey"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.unit").alias("ua"),
            F.col("b.unit").alias("ub"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cosine", F.round(_dot(F.col("ua"), F.col("ub")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
