"""SemDeDup (within-cluster semantic dedup) and leakage-safe split semantics
on hand-built frames — the contract-level oracle exactness is covered by
test_retired_contract.py; these tests pin the behavioral corners."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import dedup, semdedup
from log_analysis_spark.operators.corpus import leakage_safe_split


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# two tight direction bundles (near cos=1 within, ~0 across) + one loner
_BUNDLES = [
    (1, [1.0, 0.01, 0.0]),
    (2, [1.0, 0.02, 0.0]),
    (3, [0.99, 0.0, 0.01]),
    (10, [0.0, 1.0, 0.01]),
    (11, [0.01, 1.0, 0.0]),
    (20, [0.0, 0.01, 1.0]),
]


def test_semdedup_pairs_match_within_cluster_bruteforce(spark):
    emb = _emb(spark, _BUNDLES)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup.semdedup_pairs(emb, threshold=0.9, cents=cents).collect()
    }
    # brute force: unit-normalize, assign to nearest centroid, pair in-cluster
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def cid(v):
        u = unit(v)
        sims = [round(sum(a * b for a, b in zip(u, c)), 6) for c in cents]
        return sims.index(max(sims))

    expect = set()
    for i, (ia, va) in enumerate(_BUNDLES):
        for ib, vb in _BUNDLES[i + 1 :]:
            if cid(va) != cid(vb):
                continue
            cos = round(sum(a * b for a, b in zip(unit(va), unit(vb))), 6)
            if cos >= 0.9:
                expect.add((min(ia, ib), max(ia, ib)))
    assert got == expect and got  # non-trivial: bundle pairs present


def test_semdedup_keeps_one_rep_per_group_and_singletons(spark):
    emb = _emb(spark, _BUNDLES)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    kept = sorted(
        r["vec_id"]
        for r in semdedup.semdedup(emb, threshold=0.9, cents=cents).collect()
    )
    # bundle A {1,2,3} -> keep 1; bundle B {10,11} -> keep 10; loner 20 kept
    assert kept == [1, 10, 20]


def test_semdedup_zero_norm_vectors_are_excluded(spark):
    emb = _emb(spark, _BUNDLES + [(99, [0.0, 0.0, 0.0])])
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    kept = {r["vec_id"] for r in semdedup.semdedup(emb, 0.9, cents).collect()}
    assert 99 not in kept and kept == {1, 10, 20}


def test_semdedup_local_cc_equals_distributed(spark, sf_dir):
    """The per-cluster union-find (cc='local', default) and the generic
    iterative CC (cc='distributed') must keep identical corpora — the
    decomposition claim (_cluster_local_removed docstring) made testable
    on real data where clusters hold multi-edge components."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from log_analysis_spark.operators.similarity import md5_seed_centroids

    cents = md5_seed_centroids(emb, n_centroids=8)
    local = semdedup.semdedup(emb, threshold=0.3, cents=cents, cc="local")
    dist = semdedup.semdedup(emb, threshold=0.3, cents=cents, cc="distributed")
    assert local.exceptAll(dist).count() == 0
    assert dist.exceptAll(local).count() == 0
    assert local.count() > 0
    with pytest.raises(ValueError, match="cc must be"):
        semdedup.semdedup(emb, 0.3, cents, cc="bogus")


def test_semdedup_max_cluster_guard_raises_loudly(spark):
    emb = _emb(spark, _BUNDLES)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    with pytest.raises(ValueError, match="max_cluster"):
        semdedup.semdedup_pairs(emb, 0.9, cents, max_cluster=2)


def test_leakage_split_groups_are_atomic_and_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(docs, k=2, threshold=0.2)
    groups = dedup.neardup_groups(
        docs.select(F.col("doc_id").alias("id")), pairs
    )
    out = leakage_safe_split(docs, groups, eval_fraction=0.25).cache()
    try:
        # atomicity: every group maps to exactly one split
        mixed = (
            out.groupBy("rep_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert mixed == 0
        # both splits populated at 25% and the op preserved the row count
        sizes = dict(
            (r["split"], r["n"])
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        )
        assert set(sizes) == {"train", "eval"} and out.count() == docs.count()
        # deterministic re-run
        again = leakage_safe_split(docs, groups, eval_fraction=0.25)
        assert (
            out.select("doc_id", "split")
            .exceptAll(again.select("doc_id", "split"))
            .count()
            == 0
        )
    finally:
        out.unpersist()


def test_leakage_split_edges_and_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    groups = docs.select(
        F.col("doc_id").alias("id"), F.col("doc_id").alias("rep_id")
    )
    assert (
        leakage_safe_split(docs, groups, 0.0).filter(F.col("split") == "eval").count()
        == 0
    )
    assert (
        leakage_safe_split(docs, groups, 1.0).filter(F.col("split") == "train").count()
        == 0
    )
    with pytest.raises(ValueError, match="eval_fraction"):
        leakage_safe_split(docs, groups, 1.5)


def test_cluster_balanced_sample_flattens_skewed_clusters(spark):
    """A 60-vector dense bundle vs a 3-vector sparse one at cap 10: the
    sparse cluster keeps everything (rate 1.0 is an exact 65536 threshold,
    no draw can lose), the dense one lands near 10, and the kept set is the
    exact pure-Python replay of the 'cbal:' md5-u16 rule."""
    import hashlib

    dense = [(i, [1.0, i * 1e-4, 0.0]) for i in range(60)]
    sparse = [(100 + i, [0.0, 1.0, i * 1e-4]) for i in range(3)]
    emb = _emb(spark, dense + sparse)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    kept = {
        r["vec_id"]: r["centroid_id"]
        for r in semdedup.cluster_balanced_sample(
            emb, cap_per_cluster=10, cents=cents
        ).collect()
    }
    assert {v for v in kept if v >= 100} == {100, 101, 102}
    thr = math.floor(round(10.0 / 60.0, 6) * 65536.0)
    expect_dense = {
        i
        for i in range(60)
        if int(hashlib.md5(f"cbal:{i}".encode()).hexdigest()[:4], 16) < thr
    }
    assert {v for v in kept if v < 100} == expect_dense
    assert set(kept.values()) == {1, 2}


def test_cluster_balanced_sample_validation(spark):
    emb = _emb(spark, _BUNDLES)
    with pytest.raises(ValueError, match="cap_per_cluster"):
        semdedup.cluster_balanced_sample(emb, cap_per_cluster=0)


def test_hard_negatives_matmul_equals_expr_and_label_mismatch(spark, sf_dir):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    expr = similarity.hard_negatives(emb, queries, k=3)
    prod = similarity.hard_negatives_matmul(emb, queries, k=3)
    e = sorted(map(tuple, expr.collect()))
    p = sorted(map(tuple, prod.collect()))
    assert e == p and len(e) > 0
    # every mined negative has a different label from its anchor
    lab = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for qid, cid, _score, _rank in e:
        assert lab[qid] != lab[cid]


# --------------------------------------------------- cluster-histogram PSI


def _psi_vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


_PSI_CENTS = [[1.0, 0.0], [0.0, 1.0]]


def test_cluster_psi_identical_snapshots_is_zero(spark):
    from log_analysis_spark.operators import similarity

    vs = _psi_vecs(spark, [(1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, [0.8, 0.3])])
    r = similarity.cluster_histogram_psi(vs, vs, _PSI_CENTS).first()
    # identical histograms: every term has ca'=cb' and na'=nb' -> psi 0
    assert r["psi_micro"] == 0 and not r["drifted"]
    assert r["n_a"] == r["n_b"] == 3


def test_cluster_psi_planted_drift_fires(spark):
    from log_analysis_spark.operators import similarity

    # A balanced across both clusters; B collapsed entirely into cluster 1
    a = _psi_vecs(
        spark,
        [(i, [1.0, 0.0]) for i in range(10)]
        + [(i + 10, [0.0, 1.0]) for i in range(10)],
    )
    b = _psi_vecs(spark, [(i + 100, [1.0, 0.0]) for i in range(20)])
    r = similarity.cluster_histogram_psi(a, b, _PSI_CENTS).first()
    assert r["drifted"] and r["psi_micro"] > 200_000
    # mirror the integer algebra in python
    import math

    ca, cb = [11, 11], [21, 1]  # +1 smoothing on {bin1, bin2}
    na, nb = sum(ca), sum(cb)
    L = lambda x: round(math.log(x) * 1_000_000)  # noqa: E731
    sm = sum(
        (x * nb - y * na) * (L(x * nb) - L(y * na)) for x, y in zip(ca, cb)
    )
    assert r["psi_micro"] == sm // (na * nb)


def test_cluster_psi_validates_threshold(spark):
    from log_analysis_spark.operators import similarity

    vs = _psi_vecs(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ValueError):
        similarity.cluster_histogram_psi(vs, vs, _PSI_CENTS, thr_micro=0)
