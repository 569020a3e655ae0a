"""Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

MinHash/SimHash/n-gram dedup catch *lexical* duplicates; SemDeDup prunes
*semantic* ones — documents whose embeddings are nearly parallel even when
their surface text differs (boilerplate rewrites, templated articles,
translations of the same page).  The published recipe, re-expressed
Spark-first:

1. cluster the embedding space with k-means (here: the repo's existing
   deterministic centroid machinery from ``operators/similarity.py`` —
   ``md5_seed_centroids`` for the engine-portable oracle-able index,
   ``build_centroids`` (xxhash64 seeds + Lloyd rounds) for production);
2. within each cluster, any pair with cosine >= ``threshold`` is a
   semantic-duplicate candidate (cross-cluster pairs are ignored by
   construction — that is the approximation that makes the op scale);
3. resolve pairs into groups (connected components,
   ``dedup.neardup_groups`` — min-label propagation + pointer jumping,
   O(log diameter) rounds) and keep ONE representative per group (lowest
   id, the same keep-first convention as every other dedup family here).

Scale shape (the 100 TB question):

* assignment is a pure projection over broadcast centroid literals —
  zero corpus shuffle (``similarity.assign_to_centroids``);
* the within-cluster self-join shuffles each vector exactly ONCE, keyed
  by its single ``centroid_id`` (contrast the sign-band LSH join, where a
  vector explodes into ``n_bands`` rows — there the narrow-join/re-attach
  discipline is mandatory; here the cluster join IS the minimal shape);
* per-cluster work is quadratic in cluster size, so ``n_centroids`` must
  grow with the corpus (the paper uses ~N/1000 clusters; at that ratio
  each task's pair block is ~1e6 cosines, trivially in-memory).  The
  ``max_cluster`` guard makes the failure mode loud, not silent: an
  over-full cluster raises with the observed histogram instead of letting
  one straggler task own the job.

Spiritual reference: the reference repo deduplicates nothing below
whole-record granularity; this operator family is part of the
LLM-training-data surface the engine adds (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dedup
from .similarity import (
    _centroid_sims,
    _dot,
    assign_to_centroids,
    build_centroids,
    md5_seed_centroids,
    with_unit_vec,
)

__all__ = [
    "semdedup_pairs",
    "semdedup",
    "prototype_scores",
    "d4_prune",
    "cluster_balanced_sample",
]


def _check_cluster_sizes(assigned: DataFrame, max_cluster: int) -> None:
    """Loud guard against quadratic blow-up: if any cluster exceeds
    ``max_cluster`` members the within-cluster pair block no longer fits a
    task, so fail with the evidence (top clusters) instead of hanging.
    One tiny aggregate (rows out = n_centroids) — not a corpus scan extra:
    the assigned frame is about to be scanned by the join anyway."""
    sizes = (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_cluster)
        .orderBy(F.desc("n"))
        .limit(5)
        .collect()
    )
    if sizes:
        worst = ", ".join(f"cid={r['centroid_id']}:{r['n']}" for r in sizes)
        raise ValueError(
            f"semdedup cluster(s) exceed max_cluster={max_cluster} ({worst}); "
            "raise n_centroids (paper ratio ~N/1000) or max_cluster"
        )


def semdedup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    cents: list[list[float]] | None = None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 100_000,
) -> DataFrame:
    """Within-cluster semantic-duplicate pairs:
    (id_a, id_b, cosine, centroid_id) with id_a < id_b and round-6 cosine
    >= ``threshold``.  ``cents`` supplies a prebuilt index (e.g.
    ``md5_seed_centroids`` for determinism); otherwise the production
    k-means index is built here.

    The join carries ``unit`` on both sides deliberately: each vector has
    exactly one cluster, so this is the single cheapest way to get vectors
    adjacent for the cosine — a narrow join + re-attach would shuffle the
    same vectors once more.  Zero-norm vectors are excluded (no unit
    direction => no semantic duplicate claim), matching
    ``assign_to_centroids``."""
    if cents is None:
        cents = build_centroids(emb, n_centroids, id_col, vec_col)
    assigned = assign_to_centroids(emb, cents, id_col, vec_col)
    if max_cluster is not None:
        _check_cluster_sizes(assigned, max_cluster)
    a = assigned.select(
        F.col(id_col).alias("id_a"), "centroid_id", F.col("unit").alias("_ua")
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), "centroid_id", F.col("unit").alias("_ub")
    )
    cos = F.round(_dot(F.col("_ua"), F.col("_ub")), 6)
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"), "centroid_id")
        .filter(F.col("cosine") >= float(threshold))
    )


def _cluster_local_removed(pairs: DataFrame, id_type) -> DataFrame:
    """Non-representative members of each within-cluster duplicate
    component, via per-cluster union-find (whole-batch pandas, one group =
    one cluster's edge list).  Valid because semdedup edges NEVER cross
    clusters — every connected component lives inside one centroid_id — so
    the global CC decomposes exactly into per-cluster CCs, and the
    ``max_cluster`` guard already bounds a cluster's edges to task size.
    One (centroid_id)-keyed shuffle of id pairs replaces the distributed
    CC's O(log diameter) join rounds."""
    import pandas as pd

    out_schema = T.StructType([T.StructField("id", id_type)])

    def uf(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["id_a"], pdf["id_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN so every root is its component's lowest id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = set(pdf["id_a"]).union(pdf["id_b"])
        removed = [x for x in nodes if find(x) != x]
        return pd.DataFrame({"id": removed}, dtype=pdf["id_a"].dtype)

    return pairs.select("centroid_id", "id_a", "id_b").groupBy(
        "centroid_id"
    ).applyInPandas(uf, out_schema)


def semdedup(
    emb: DataFrame,
    threshold: float = 0.3,
    cents: list[list[float]] | None = None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 100_000,
    cc: str = "local",
) -> DataFrame:
    """Full SemDeDup: returns the KEPT corpus — one representative (lowest
    id) per semantic-duplicate group, singletons pass through.  Output:
    (id_col, centroid_id); join back to the source table by id for the
    payload columns (ids-only here so the grouping and the final join
    never move vectors or text).

    ``cc='local'`` (default) resolves components with ONE per-cluster
    union-find pass (see ``_cluster_local_removed`` — exact, because the
    pair graph never crosses clusters); ``cc='distributed'`` uses the
    generic iterative ``dedup.neardup_groups``, kept as the
    equality-tested fallback and for pathological cluster sizes."""
    if cc not in ("local", "distributed"):
        raise ValueError(f"cc must be 'local' or 'distributed', got {cc!r}")
    if cents is None:
        cents = build_centroids(emb, n_centroids, id_col, vec_col)
    assigned = assign_to_centroids(emb, cents, id_col, vec_col)
    if max_cluster is not None:
        _check_cluster_sizes(assigned, max_cluster)
    pairs = semdedup_pairs(
        emb, threshold, cents, n_centroids, id_col, vec_col, max_cluster=None
    )
    ids_only = assigned.select(id_col, "centroid_id")
    if cc == "local":
        removed = _cluster_local_removed(
            pairs, assigned.schema[id_col].dataType
        ).withColumnRenamed("id", id_col)
        return ids_only.join(removed, id_col, "left_anti")
    groups = dedup.neardup_groups(
        assigned.select(F.col(id_col).alias("id")),
        pairs.select("id_a", "id_b"),
    )
    keep = groups.filter(F.col("id") == F.col("rep_id")).select(
        F.col("id").alias(id_col)
    )
    return ids_only.join(keep, id_col)


def prototype_scores(
    emb: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, proto) where ``proto`` is the round-6 cosine of
    each vector to its ASSIGNED centroid — the SSL-prototypes signal
    (Sorscher et al. 2022, arXiv:2206.14486): high proto = the cluster's
    most typical (hence most redundant) members.  Pure projection over
    broadcast centroid literals, zero corpus shuffle — the same shape as
    ``assign_to_centroids`` (ties break to the lowest centroid id there and
    the max sim IS the assigned sim, so one ``array_max`` reads it off)."""
    cu = with_unit_vec(emb, vec_col).filter(F.col("unit").isNotNull())
    sims = _centroid_sims(F.col("unit"), cents)
    return cu.select(
        F.col(id_col),
        F.array_position(sims, F.array_max(sims)).cast("int").alias(
            "centroid_id"
        ),
        F.array_max(sims).alias("proto"),
    )


def d4_prune(
    emb: DataFrame,
    threshold: float = 0.3,
    keep_fraction: float = 0.5,
    cents: list[list[float]] | None = None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = 100_000,
    cc: str = "local",
) -> DataFrame:
    """D4 (Tirumala et al. 2023, arXiv:2308.12284): SemDeDup, then
    SSL-prototypes diversification over the survivors — per cluster, drop
    the ``floor((1 - keep_fraction) * n)`` members MOST similar to their
    centroid (ties on proto break to dropping the higher id, so the result
    is a deterministic total order both engines can replay).  Returns the
    kept corpus as (id_col, centroid_id, proto).

    Scale shape: the semdedup stage is the audited one (projection
    assignment + cluster-keyed pair join + per-cluster CC); the prune stage
    adds ONE window over ids-and-scores keyed by centroid_id — 20 B rows,
    bounded per-cluster by ``max_cluster``, no global sort, vectors and
    text untouched."""
    if not (0.0 <= keep_fraction <= 1.0):
        raise ValueError(
            f"keep_fraction must be in [0, 1], got {keep_fraction}"
        )
    if cents is None:
        cents = build_centroids(emb, n_centroids, id_col, vec_col)
    kept = semdedup(
        emb, threshold, cents, n_centroids, id_col, vec_col, max_cluster, cc
    )
    scored = kept.join(
        prototype_scores(emb, cents, id_col, vec_col).select(id_col, "proto"),
        id_col,
    )
    w = Window.partitionBy("centroid_id")
    rn = F.row_number().over(w.orderBy(F.desc("proto"), F.asc(id_col)))
    n = F.count(F.lit(1)).over(w)
    n_drop = F.floor((1.0 - F.lit(float(keep_fraction))) * n)
    return (
        scored.withColumn("_rn", rn)
        .withColumn("_drop", n_drop)
        .filter(F.col("_rn") > F.col("_drop"))
        .select(id_col, "centroid_id", "proto")
    )


def cluster_balanced_sample(
    emb: DataFrame,
    cap_per_cluster: int,
    cents: list[list[float]] | None = None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced downsampling: assign every vector to its nearest
    centroid, then sample each cluster at ``rate_c = min(1, cap / n_c)`` so
    the expected kept size per cluster is flattened toward ``cap`` — the
    embedding-space counterpart of ``corpus.temperature_mix`` (T -> inf),
    used to keep a pretraining mix from being dominated by one dense
    semantic region.  Returns kept rows as (id_col, centroid_id).

    Determinism/exactness: the per-row draw is the md5-u16 uniform under a
    ``'cbal:'`` domain prefix (decorrelated from the sampling / split /
    pareto draws); the per-cluster rate is quantized through the
    ``floor(round6(rate) * 65536)`` integer threshold, the
    temperature_mix discipline.

    Scale shape: assignment is a pure projection over broadcast centroid
    literals (zero corpus shuffle); per-cluster counts are one map-side-
    combinable aggregate (rows out = n_centroids); the rate table joins
    back by broadcast; the keep decision is a pure filter.  Vectors never
    enter an exchange."""
    if cap_per_cluster < 1:
        raise ValueError(
            f"cap_per_cluster must be >= 1, got {cap_per_cluster}"
        )
    if cents is None:
        cents = md5_seed_centroids(emb, n_centroids, id_col, vec_col)
    assigned = assign_to_centroids(emb, cents, id_col, vec_col).select(
        id_col, "centroid_id"
    )
    counts = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(cap_per_cluster)) / F.col("_n")
    )
    thr = counts.select(
        "centroid_id",
        F.floor(F.round(rate, 6) * F.lit(65536.0)).cast("long").alias("_thr"),
    )
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cbal:"), F.col(id_col).cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    return (
        assigned.join(F.broadcast(thr), "centroid_id")
        .filter(u16 < F.col("_thr"))
        .select(id_col, "centroid_id")
    )
