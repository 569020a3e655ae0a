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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import dedup
from .similarity import (
    _dot,
    assign_to_centroids,
    build_centroids,
    md5_seed_centroids,
)

__all__ = ["semdedup_pairs", "semdedup"]


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
