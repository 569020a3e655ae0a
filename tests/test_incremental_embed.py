"""Incremental embedding-space near-dup ingestion vs the persisted
sign-band index — the vector twin of tests/test_incremental.py.

Invariant: splitting a corpus into increments and ingesting them admits the
same vector set as the batch dedup over the whole corpus (the cross-corpus
verify here is EXACT cosine — unlike text's signature-agreement estimator —
so the equivalence holds with no noise caveat, given identical LSH recall:
band keys derive from the same hyperplanes either way)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import dedup, incremental_embed, similarity

ND_KW = dict(threshold=0.3, n_planes=64, band_bits=4)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


def _copies(df, offset, n):
    """n verbatim vector copies with ids shifted up by ``offset`` (copies
    sort AFTER originals, so batch min-id CC and incremental first-seen
    resolve to the same representative)."""
    return (
        df.orderBy("vec_id").limit(n)
        .select((F.col("vec_id") + offset).alias("vec_id"), "embedding")
    )


def test_first_ingest_dedups_within_batch(spark, emb):
    base = emb.limit(40).select("vec_id", "embedding")
    batch = base.unionByName(_copies(base, 1_000_000, 10))
    us, bi = incremental_embed.empty_embed_state(spark)
    res = incremental_embed.ingest_embedding_batch(batch, us, bi, **ND_KW)
    accepted = {r["id"] for r in res.accepted.collect()}
    rej = {r["id"]: r for r in res.rejected.collect()}
    # every planted copy lost to its (lower-id) original or a near-dup of it
    for r in _copies(base, 1_000_000, 10).collect():
        assert r["vec_id"] in rej or r["vec_id"] in accepted
    exact = {i for i, r in rej.items() if r["cosine"] == 1.0}
    assert len(exact) >= 8  # copies reject at cosine exactly 1.0
    assert all(rej[i]["why"] == "within_batch" for i in rej)
    # state covers exactly the accepted vectors
    assert {r["id"] for r in res.new_unit_rows.collect()} == accepted
    assert {r["id"] for r in res.new_band_rows.collect()} == accepted


def test_cross_corpus_duplicate_rejected_exact(spark, emb):
    inc1 = emb.limit(40).select("vec_id", "embedding")
    us, bi = incremental_embed.empty_embed_state(spark)
    r1 = incremental_embed.ingest_embedding_batch(inc1, us, bi, **ND_KW)
    us1 = r1.new_unit_rows.cache()
    bi1 = r1.new_band_rows.cache()

    inc2 = _copies(inc1, 2_000_000, 5)
    r2 = incremental_embed.ingest_embedding_batch(inc2, us1, bi1, **ND_KW)
    assert r2.accepted.count() == 0
    rej = {r["id"]: r for r in r2.rejected.collect()}
    assert len(rej) == 5
    for i, r in rej.items():
        assert r["why"] == "cross_corpus"
        assert r["cosine"] == 1.0           # exact verify, not an estimator
        assert r["matched_id"] == i - 2_000_000 or r["cosine"] == 1.0
    # rejected vectors never enter the state
    assert r2.new_unit_rows.count() == 0 and r2.new_band_rows.count() == 0


def test_incremental_equals_batch(spark, emb):
    """Union of accepted ids over two ingests == the batch near-dup dedup's
    kept set over the whole corpus.

    The increment duplicates vectors that SURVIVED ingest 1 (copies get
    higher ids, so batch min-id CC and incremental first-seen agree).
    Copying a within-batch-REJECTED vector would instead expose the
    documented semantic difference — incremental admission is
    direct-match-vs-accepted-reps, batch is transitive closure over the
    whole pair graph — so such a copy can be accepted incrementally while
    batch CC chains it away; that's a property of any first-seen
    incremental dedup (text twin included), not a bug."""
    base = emb.limit(150).select("vec_id", "embedding")
    inc1 = base
    us, bi = incremental_embed.empty_embed_state(spark)
    r1 = incremental_embed.ingest_embedding_batch(inc1, us, bi, **ND_KW)
    us1, bi1 = r1.new_unit_rows.cache(), r1.new_band_rows.cache()
    survived = base.join(
        r1.accepted.withColumnRenamed("id", "vec_id"), "vec_id"
    )
    inc2 = _copies(survived, 5_000_000, 30)
    r2 = incremental_embed.ingest_embedding_batch(inc2, us1, bi1, **ND_KW)
    got = {r["id"] for r in r1.accepted.collect()} | {
        r["id"] for r in r2.accepted.collect()
    }

    full = inc1.unionByName(inc2)
    pairs = similarity.embedding_neardup_pairs_matmul(full, **ND_KW)
    groups = dedup.neardup_groups(
        full.select(F.col("vec_id").alias("id")),
        pairs.select("id_a", "id_b"),
    )
    want = {
        r["vec_id"]
        for r in dedup.drop_near_duplicates(full, groups, "vec_id").collect()
    }
    assert got == want


def test_reingest_is_idempotent_by_content(spark, emb):
    b = emb.limit(25).select("vec_id", "embedding")
    us, bi = incremental_embed.empty_embed_state(spark)
    r1 = incremental_embed.ingest_embedding_batch(b, us, bi, **ND_KW)
    us1, bi1 = r1.new_unit_rows.cache(), r1.new_band_rows.cache()
    again = b.select((F.col("vec_id") + 9_000_000).alias("vec_id"), "embedding")
    r2 = incremental_embed.ingest_embedding_batch(again, us1, bi1, **ND_KW)
    assert r2.accepted.count() == 0
    rej = r2.rejected.collect()
    # every copy rejected: intra near-dups among the copies lose within
    # batch (the originals had near-dup pairs too); each surviving rep then
    # matches its original cross-corpus at cosine exactly 1.0
    assert len(rej) == 25
    assert {r["why"] for r in rej} <= {"cross_corpus", "within_batch"}
    assert all(
        r["cosine"] == 1.0 for r in rej if r["why"] == "cross_corpus"
    )


def test_distributed_cc_fallback_matches_local(spark, emb):
    batch = emb.limit(80).select("vec_id", "embedding")
    us, bi = incremental_embed.empty_embed_state(spark)
    r_local = incremental_embed.ingest_embedding_batch(batch, us, bi, **ND_KW)
    r_dist = incremental_embed.ingest_embedding_batch(
        batch, us, bi, local_pairs_cap=0, **ND_KW
    )
    assert {r["id"] for r in r_local.accepted.collect()} == {
        r["id"] for r in r_dist.accepted.collect()
    }


# ---------------------------------------------------------------------------
# persisted state: compaction, params sidecar, kind guard
# ---------------------------------------------------------------------------


def _write_embed_partition(res, state_dir, ingest_id):
    res.new_unit_rows.write.mode("overwrite").parquet(
        f"{state_dir}/unit_store/ingest_id={ingest_id}"
    )
    res.new_band_rows.write.mode("overwrite").parquet(
        f"{state_dir}/band_index/ingest_id={ingest_id}"
    )


def test_embed_compaction_preserves_ingest_results(spark, emb, tmp_path):
    """Ingest results over the compacted bucketed embed state are IDENTICAL
    to results over the plain per-ingest partitions (compaction is layout,
    not semantics), and the probe plan over compacted state reads the
    catalog bucket layout."""
    import os

    state = str(tmp_path / "estate")
    base = emb.limit(120).select("vec_id", "embedding")
    inc1 = base.filter(F.xxhash64(F.col("vec_id").cast("string")) % 3 == 0)
    inc2 = base.filter(F.xxhash64(F.col("vec_id").cast("string")) % 3 == 1)
    inc3 = base.filter(F.xxhash64(F.col("vec_id").cast("string")) % 3 == 2)

    us, bi = incremental_embed.empty_embed_state(spark)
    r1 = incremental_embed.ingest_embedding_batch(inc1, us, bi, **ND_KW)
    _write_embed_partition(r1, state, 0)
    u1, b1 = incremental_embed.load_embed_state(spark, state, 1)
    r2 = incremental_embed.ingest_embedding_batch(inc2, u1, b1, **ND_KW)
    _write_embed_partition(r2, state, 1)
    # materialize BEFORE compaction prunes the partitions these lazy frames read
    n_r1, n_r2 = r1.new_unit_rows.count(), r2.new_unit_rows.count()

    u2, b2 = incremental_embed.load_embed_state(spark, state, 2)
    r3_plain = incremental_embed.ingest_embedding_batch(inc3, u2, b2, **ND_KW)
    plain_accepted = {r["id"] for r in r3_plain.accepted.collect()}
    plain_rejected = {
        (r["id"], r["matched_id"]) for r in r3_plain.rejected.collect()
    }

    marker = incremental_embed.compact_embed_state(spark, state, 2, n_buckets=8)
    assert marker["upto"] == 2 and marker["kind"] == "embed"
    assert not os.path.exists(f"{state}/unit_store/ingest_id=0")
    assert not os.path.exists(f"{state}/unit_store/ingest_id=1")

    u2c, b2c = incremental_embed.load_embed_state(spark, state, 2)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r3_comp = incremental_embed.ingest_embedding_batch(inc3, u2c, b2c, **ND_KW)
        plan = r3_comp.accepted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    assert {r["id"] for r in r3_comp.accepted.collect()} == plain_accepted
    assert {
        (r["id"], r["matched_id"]) for r in r3_comp.rejected.collect()
    } == plain_rejected
    assert "Bucketed: true" in plan

    # no-op re-compact; tail unions on top of the compacted layout
    assert incremental_embed.compact_embed_state(spark, state, 2, n_buckets=8) == marker
    _write_embed_partition(r3_comp, state, 2)
    u3, b3 = incremental_embed.load_embed_state(spark, state, 3)
    assert u3.count() == n_r1 + n_r2 + r3_comp.new_unit_rows.count()

    from log_analysis_spark.operators import incremental

    db = incremental._state_db(state)
    spark.sql(f"DROP TABLE IF EXISTS {db}.unit_store_c2")
    spark.sql(f"DROP TABLE IF EXISTS {db}.band_index_c2")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_embed_state_params_sidecar(tmp_path):
    state = str(tmp_path / "estate")
    p = dict(n_planes=64, band_bits=8, seed=42, dim=64)
    assert incremental_embed.ensure_embed_state_params(state, **p) == p
    assert incremental_embed.ensure_embed_state_params(state, **p) == p
    with pytest.raises(ValueError, match="n_planes"):
        incremental_embed.ensure_embed_state_params(state, **{**p, "n_planes": 32})
    with pytest.raises(ValueError, match="dim"):
        incremental_embed.ensure_embed_state_params(state, **{**p, "dim": 128})


def test_load_embed_state_refuses_text_marker(spark, tmp_path):
    """A text-minhash compaction marker in the state dir means the dir holds
    the OTHER state kind — re-registering its tables under the embed DDL
    would silently misread them."""
    import json

    state = str(tmp_path / "estate")
    import os

    os.makedirs(state)
    with open(f"{state}/_compaction.json", "w") as f:
        json.dump({"upto": 1, "version": 1, "n_buckets": 8,
                   "hash_impl": "xxhash64"}, f)
    with pytest.raises(ValueError, match="not an embedding state"):
        incremental_embed.load_embed_state(spark, state, 1)
