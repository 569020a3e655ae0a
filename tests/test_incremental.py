"""Incremental near-dup ingestion vs the persisted LSH index.

The invariant under test: splitting a corpus into increments and ingesting
them through ``incremental.ingest_batch`` admits the same document set as
the BATCH dedup over the whole corpus would — up to the documented
estimator substitution (cross-corpus verify uses signature agreement, not
exact shingle Jaccard).  Exact copies make both verifies agree exactly
(identical signatures ⇒ agreement 1.0), so the planted tests are
noise-free; the estimator's calibration is tested separately against true
Jaccard on real docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import dedup, incremental

SIG_SCHEMA = "id string, sig array<bigint>"
BAND_SCHEMA = "id string, band int, bkey bigint"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
        .cache()
    )
    df.count()
    return df


def _empty_state(spark):
    return (
        spark.createDataFrame([], SIG_SCHEMA),
        spark.createDataFrame([], BAND_SCHEMA),
    )


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


LOREM = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts debate the merits of reusable launch vehicles in low "
    "earth orbit and a committee files a report about it"
)
OTHER = (
    "completely different subject matter entirely about cooking pasta "
    "with garlic butter sauce and the correct amount of salted water "
    "for a rolling boil on a tuesday evening dinner service"
)


def test_first_ingest_empty_state_accepts_reps_only(spark):
    batch = _mk_batch(
        spark,
        [("a", LOREM), ("b", LOREM), ("c", OTHER)],  # a≡b within batch
    )
    sig, band = _empty_state(spark)
    res = incremental.ingest_batch(batch, sig, band, id_col="doc_id")
    accepted = {r["id"] for r in res.accepted.collect()}
    assert accepted == {"a", "c"}  # lowest-id rep kept
    rej = {r["id"]: r for r in res.rejected.collect()}
    assert set(rej) == {"b"}
    assert rej["b"]["why"] == "within_batch"
    assert rej["b"]["matched_id"] == "a"
    # state rows cover exactly the accepted docs
    assert {r["id"] for r in res.new_sig_rows.collect()} == {"a", "c"}
    bands = res.new_band_rows.collect()
    assert {r["id"] for r in bands} == {"a", "c"}
    assert len(bands) == 2 * 8  # bands=8 per doc


def test_second_ingest_rejects_cross_corpus_duplicate(spark):
    b1 = _mk_batch(spark, [("a", LOREM)])
    sig, band = _empty_state(spark)
    r1 = incremental.ingest_batch(b1, sig, band, id_col="doc_id")
    sig1, band1 = r1.new_sig_rows.cache(), r1.new_band_rows.cache()

    b2 = _mk_batch(spark, [("x", LOREM), ("y", OTHER)])  # x duplicates corpus 'a'
    r2 = incremental.ingest_batch(b2, sig1, band1, id_col="doc_id")
    assert {r["id"] for r in r2.accepted.collect()} == {"y"}
    rej = {r["id"]: r for r in r2.rejected.collect()}
    assert rej["x"]["why"] == "cross_corpus"
    assert rej["x"]["matched_id"] == "a"
    assert rej["x"]["est_jaccard"] == 1.0  # identical text ⇒ identical sig
    # the rejected doc must NOT enter the state
    assert {r["id"] for r in r2.new_sig_rows.collect()} == {"y"}


def test_incremental_equals_batch_on_exact_copies(spark, docs):
    """Split 200 real docs into two increments with planted exact copies
    straddling the split: the union of accepted ids over both ingests must
    equal the batch minhash dedup's kept set over the whole corpus."""
    base = docs.limit(200).select("doc_id", "text")
    # second increment = 30 docs copied verbatim from the first, new ids
    inc1 = base
    inc2 = (
        base.limit(30)
        .select(F.concat(F.lit("copy_"), "doc_id").alias("doc_id"), "text")
    )
    sig, band = _empty_state(spark)
    r1 = incremental.ingest_batch(inc1, sig, band, id_col="doc_id")
    sig1 = r1.new_sig_rows.cache()
    band1 = r1.new_band_rows.cache()
    r2 = incremental.ingest_batch(inc2, sig1, band1, id_col="doc_id")

    got = {r["id"] for r in r1.accepted.collect()} | {
        r["id"] for r in r2.accepted.collect()
    }

    full = inc1.unionByName(inc2)
    pairs = dedup.minhash_lsh_pairs(full, id_col="doc_id")
    groups = dedup.neardup_groups(full.select(F.col("doc_id").alias("id")), pairs)
    want_batch = {
        r["doc_id"]
        for r in dedup.drop_near_duplicates(full, groups, "doc_id").collect()
    }
    # batch CC picks the component-min id; incremental picks the FIRST-SEEN
    # id (earlier increment wins).  "copy_X" > "X" lexicographically, so on
    # this corpus both resolve to the original — the sets match exactly.
    assert got == want_batch
    # every planted copy was rejected — against its cross-corpus source, or
    # within-batch against a sibling copy when the SOURCE docs were already
    # near-dups of each other (the testdata corpus plants such pairs)
    rej = {r["id"]: r["matched_id"] for r in r2.rejected.collect()}
    for r in inc2.collect():
        assert r["doc_id"] in rej


def test_reingesting_same_batch_rejects_everything(spark):
    """Crash-recovery property: identical content re-offered to the index is
    fully rejected (est_jaccard 1.0) — the state append is idempotent by
    content, not by run id."""
    b = _mk_batch(spark, [("a", LOREM), ("c", OTHER)])
    sig, band = _empty_state(spark)
    r1 = incremental.ingest_batch(b, sig, band, id_col="doc_id")
    sig1, band1 = r1.new_sig_rows.cache(), r1.new_band_rows.cache()
    b_again = _mk_batch(spark, [("a2", LOREM), ("c2", OTHER)])
    r2 = incremental.ingest_batch(b_again, sig1, band1, id_col="doc_id")
    assert r2.accepted.count() == 0
    assert {r["why"] for r in r2.rejected.collect()} == {"cross_corpus"}


def test_sig_agreement_tracks_true_jaccard(spark, docs):
    """Estimator calibration on real near-dup pairs: for every verified
    batch pair (exact Jaccard known), the signature-agreement estimate is
    within the binomial noise band for n_hashes=32."""
    sample = docs.limit(300).select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(sample, id_col="doc_id", threshold=0.3)
    sigs = incremental.sig_table(sample, id_col="doc_id")
    est = (
        pairs.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sa")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sb")), "id_b")
        .withColumn("est", incremental.sig_agreement(F.col("sa"), F.col("sb"), 32))
        .select("jaccard", "est")
        .collect()
    )
    assert len(est) > 0
    for r in est:
        # 4 sigma of Binomial(32, J)/32 ≈ 0.36 worst case; planted dups sit
        # near J=1 where the band is tight
        assert abs(r["est"] - r["jaccard"]) <= 0.4


def test_distributed_cc_fallback_matches_local_unionfind(spark, docs):
    """local_pairs_cap=0 forces the iterative-CC path; accepted/rejected
    sets must be identical to the default driver-side union-find."""
    batch = docs.limit(120).select("doc_id", "text")
    sig, band = _empty_state(spark)
    r_local = incremental.ingest_batch(batch, sig, band, id_col="doc_id")
    r_dist = incremental.ingest_batch(
        batch, sig, band, id_col="doc_id", local_pairs_cap=0
    )
    assert {r["id"] for r in r_local.accepted.collect()} == {
        r["id"] for r in r_dist.accepted.collect()
    }
    loc = {(r["id"], r["matched_id"]) for r in r_local.rejected.collect()}
    dist = {(r["id"], r["matched_id"]) for r in r_dist.rejected.collect()}
    assert loc == dist


def test_ingest_rejects_numpy_hash_impl(spark):
    b = _mk_batch(spark, [("a", LOREM)])
    sig, band = _empty_state(spark)
    with pytest.raises(ValueError, match="sig-derived"):
        incremental.ingest_batch(b, sig, band, id_col="doc_id", hash_impl="numpy")


def test_bucketed_state_probe_skips_state_side_shuffle(spark, docs, tmp_path):
    """The 100 TB shape claimed in the module docstring, machine-asserted:
    with band_index/sig_store written as bucketed tables on their join keys
    (sources/bucketed.py), the ingest probe exchanges ONLY the (small)
    batch side — the corpus-sized state side reads its catalog layout.
    Broadcast is disabled so the shuffle path is real (at true scale the
    batch side broadcasts and the question is moot; bucketing is the
    answer when it can't)."""
    from log_analysis_spark.sources import bucketed as buck

    base = docs.limit(300).select("doc_id", "text")
    corpus = base.filter(F.xxhash64("doc_id") % 3 != 0)
    batch = base.filter(F.xxhash64("doc_id") % 3 == 0)
    sig, band = _empty_state(spark)
    r0 = incremental.ingest_batch(corpus, sig, band, id_col="doc_id")

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS incr_buck LOCATION '{tmp_path}/wh'"
    )
    try:
        buck.write_bucketed(r0.new_band_rows, "incr_buck.band_idx",
                            ["band", "bkey"], 8)
        buck.write_bucketed(r0.new_sig_rows, "incr_buck.sig_store", "id", 8)
        band_b = buck.read_bucketed(spark, "incr_buck.band_idx")
        sig_b = buck.read_bucketed(spark, "incr_buck.sig_store")

        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            res_b = incremental.ingest_batch(batch, sig_b, band_b, id_col="doc_id")
            plan_b = res_b.accepted._jdf.queryExecution().executedPlan().toString()
            # flat-read control: same rows, no catalog layout
            r0.new_sig_rows.write.mode("overwrite").parquet(f"{tmp_path}/flat_sig")
            r0.new_band_rows.write.mode("overwrite").parquet(f"{tmp_path}/flat_band")
            res_f = incremental.ingest_batch(
                batch,
                spark.read.parquet(f"{tmp_path}/flat_sig"),
                spark.read.parquet(f"{tmp_path}/flat_band"),
                id_col="doc_id",
            )
            plan_f = res_f.accepted._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

        assert "Bucketed: true" in plan_b
        assert plan_b.count("Exchange") < plan_f.count("Exchange")
        # same accepted set either way — bucketing is layout, not semantics
        assert {r["id"] for r in res_b.accepted.collect()} == {
            r["id"] for r in res_f.accepted.collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS incr_buck.band_idx")
        spark.sql("DROP TABLE IF EXISTS incr_buck.sig_store")
        spark.sql("DROP DATABASE IF EXISTS incr_buck")


# ---------------------------------------------------------------------------
# round 4: state compaction, params sidecar, loud state-read failures
# ---------------------------------------------------------------------------


def _write_state_partition(res, state_dir, ingest_id):
    res.new_sig_rows.write.mode("overwrite").parquet(
        f"{state_dir}/sig_store/ingest_id={ingest_id}"
    )
    res.new_band_rows.write.mode("overwrite").parquet(
        f"{state_dir}/band_index/ingest_id={ingest_id}"
    )


def test_compaction_preserves_ingest_results(spark, docs, tmp_path):
    """Ingest results over the compacted bucketed state are IDENTICAL to
    results over the plain per-ingest partitions (compaction is layout, not
    semantics), and the probe plan over compacted state reads the catalog
    bucket layout with no state-side Exchange."""
    import os

    state = str(tmp_path / "state")
    base = docs.limit(240).select("doc_id", "text")
    inc1 = base.filter(F.xxhash64("doc_id") % 3 == 0)
    inc2 = base.filter(F.xxhash64("doc_id") % 3 == 1)
    inc3 = base.filter(F.xxhash64("doc_id") % 3 == 2)

    sig, band = _empty_state(spark)
    r1 = incremental.ingest_batch(inc1, sig, band, id_col="doc_id")
    _write_state_partition(r1, state, 0)
    s1, b1 = incremental.load_state(spark, state, 1)
    r2 = incremental.ingest_batch(inc2, s1, b1, id_col="doc_id")
    _write_state_partition(r2, state, 1)
    # materialize BEFORE compaction: these lazy frames read the per-ingest
    # partitions that compaction prunes (standard Spark semantics — a reader
    # created before a layout change must be re-created after it)
    n_r1, n_r2 = r1.new_sig_rows.count(), r2.new_sig_rows.count()

    # plain-layout ingest of increment 3
    s2, b2 = incremental.load_state(spark, state, 2)
    r3_plain = incremental.ingest_batch(inc3, s2, b2, id_col="doc_id")
    plain_accepted = {r["id"] for r in r3_plain.accepted.collect()}
    plain_rejected = {
        (r["id"], r["matched_id"]) for r in r3_plain.rejected.collect()
    }

    marker = incremental.compact_state(spark, state, 2, n_buckets=8)
    assert marker["upto"] == 2
    # folded partitions pruned; marker durable
    assert not os.path.exists(f"{state}/sig_store/ingest_id=0")
    assert not os.path.exists(f"{state}/sig_store/ingest_id=1")
    assert incremental._read_compaction_marker(state) == marker

    s2c, b2c = incremental.load_state(spark, state, 2)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r3_comp = incremental.ingest_batch(inc3, s2c, b2c, id_col="doc_id")
        plan = r3_comp.accepted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    assert {r["id"] for r in r3_comp.accepted.collect()} == plain_accepted
    assert {
        (r["id"], r["matched_id"]) for r in r3_comp.rejected.collect()
    } == plain_rejected
    assert "Bucketed: true" in plan

    # compacting again below the watermark is a no-op returning the marker
    assert incremental.compact_state(spark, state, 2, n_buckets=8) == marker

    # a LATER increment appends a tail partition; load_state must union
    # compacted + tail
    _write_state_partition(r3_comp, state, 2)
    s3, b3 = incremental.load_state(spark, state, 3)
    assert s3.count() == n_r1 + n_r2 + r3_comp.new_sig_rows.count()
    assert b3.count() == s3.count() * 8

    db = incremental._state_db(state)
    spark.sql(f"DROP TABLE IF EXISTS {db}.sig_store_c2")
    spark.sql(f"DROP TABLE IF EXISTS {db}.band_index_c2")
    spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_load_state_raises_on_corrupt_file(spark, tmp_path):
    """A corrupt data file must fail the ingest loudly — swallowing it as
    'first increment' would admit every duplicate and pollute the state."""
    state = str(tmp_path / "state")
    import os

    os.makedirs(f"{state}/sig_store/ingest_id=0")
    os.makedirs(f"{state}/band_index/ingest_id=0")
    with open(f"{state}/sig_store/ingest_id=0/part-0.parquet", "w") as f:
        f.write("this is not parquet")
    with open(f"{state}/band_index/ingest_id=0/part-0.parquet", "w") as f:
        f.write("this is not parquet")
    with pytest.raises(Exception):
        s, b = incremental.load_state(spark, state, 1)
        s.count()


def test_load_state_empty_dirs_are_empty_state(spark, tmp_path):
    """Directories with no data files (every increment so far accepted zero
    docs) are still the legitimate empty state."""
    state = str(tmp_path / "state")
    import os

    os.makedirs(f"{state}/sig_store/ingest_id=0")
    os.makedirs(f"{state}/band_index/ingest_id=0")
    sig, band = incremental.load_state(spark, state, 1)
    assert sig.count() == 0 and band.count() == 0
    assert sig.schema == spark.createDataFrame([], SIG_SCHEMA).schema


def test_state_params_sidecar(tmp_path):
    state = str(tmp_path / "state")
    p = dict(hash_impl="xxhash64", shingle_k=3, n_hashes=32, bands=8)
    assert incremental.ensure_state_params(state, **p) == p
    # identical params: fine
    assert incremental.ensure_state_params(state, **p) == p
    # drifted LSH knob: refuse — the state would silently never collide
    with pytest.raises(ValueError, match="n_hashes"):
        incremental.ensure_state_params(state, **{**p, "n_hashes": 64})
    with pytest.raises(ValueError, match="hash_impl"):
        incremental.ensure_state_params(state, **{**p, "hash_impl": "md5"})


def test_ingest_rejects_state_hash_family_mismatch(spark):
    """md5 ingest against an xxhash64-typed sig store is structurally
    detectable (array<string> vs array<bigint>) and must raise."""
    b = _mk_batch(spark, [("a", LOREM)])
    sig, band = _empty_state(spark)  # xxhash64-shaped
    with pytest.raises(ValueError, match="hash family"):
        incremental.ingest_batch(b, sig, band, id_col="doc_id", hash_impl="md5")


def test_md5_state_schemas(spark):
    """sig_schema/band_schema derive element types from the hash impl, so an
    md5 pipeline's canonical empty state unions cleanly with real rows."""
    sig = spark.createDataFrame([], incremental.sig_schema("md5"))
    band = spark.createDataFrame([], incremental.band_schema("md5"))
    b = _mk_batch(spark, [("a", LOREM), ("c", OTHER)])
    res = incremental.ingest_batch(b, sig, band, id_col="doc_id", hash_impl="md5")
    rows = res.new_sig_rows.collect()
    assert {r["id"] for r in rows} == {"a", "c"}
    assert all(isinstance(x, str) for x in rows[0]["sig"])
    bands_ = res.new_band_rows.collect()
    assert all(isinstance(r["bkey"], str) for r in bands_)
    # and the union with the canonical empty frame type-checks
    assert sig.unionByName(res.new_sig_rows).count() == 2


def test_snapshot_diff_drives_incremental_reprocessing(spark):
    """Composition: corpus.snapshot_diff tells the incremental path what a
    re-crawl actually changed — only ADDED + CHANGED docs enter
    ingest_batch, and the state already holds the old corpus, so the
    changed doc's old twin rejects a near-identical rewrite while the new
    doc is admitted.  This is the maintenance loop of a living 100 TB
    corpus: diff (narrow fingerprint join) → increment-sized ingest, no
    full re-dedup anywhere."""
    from log_analysis_spark.operators.corpus import snapshot_diff

    v1 = _mk_batch(
        spark,
        [("a", LOREM), ("b", OTHER), ("c", LOREM + " extra trailing words")],
    )
    # v2: 'b' unchanged, 'c' lightly edited (near-dup of its v1 self),
    # 'd' genuinely new, 'a' removed
    v2 = _mk_batch(
        spark,
        [
            ("b", OTHER),
            ("c", LOREM + " extra trailing words edited"),
            ("d", "an entirely new document about violin maintenance and "
                  "the correct humidity for storing instruments in winter"),
        ],
    )
    diff = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(v1, v2, "doc_id", ["text"]).collect()
    }
    assert diff == {"a": "removed", "b": "unchanged", "c": "changed", "d": "added"}

    # state = v1 ingested from empty
    sig, band = _empty_state(spark)
    st1 = incremental.ingest_batch(v1, sig, band, threshold=0.5)
    sig1, band1 = st1.new_sig_rows, st1.new_band_rows

    # reprocess ONLY added+changed (what the diff says), not the corpus
    todo = v2.join(
        snapshot_diff(v1, v2, "doc_id", ["text"]).filter(
            F.col("status").isin("added", "changed")
        ),
        "doc_id",
    ).select("doc_id", "text")
    assert todo.count() == 2
    st2 = incremental.ingest_batch(todo, sig1, band1, threshold=0.5)
    accepted = {r["id"] for r in st2.accepted.collect()}
    # the edited 'c' is a near-dup of its own v1 state row → rejected;
    # the new 'd' is admitted
    assert accepted == {"d"}


def _empty_keys(spark, id_type="long"):
    from log_analysis_spark.operators.incremental import exact_key_schema

    return spark.createDataFrame([], exact_key_schema(id_type))


def test_exact_ingest_split_equals_batch(spark, sf_dir):
    """Ingesting the corpus in two increments admits exactly the docs
    one-shot exact_dedup keeps."""
    from log_analysis_spark.operators import dedup, incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plant exact duplicates across the split boundary AND within a half
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    full = docs.unionByName(dup)
    a = full.filter((F.col("doc_id") % 2 == 0))
    b = full.filter((F.col("doc_id") % 2 == 1))
    st = _empty_keys(spark)
    r1 = incremental.ingest_exact_batch(a, st)
    keys1 = r1.new_key_rows
    r2 = incremental.ingest_exact_batch(b, keys1)
    got = sorted(
        r["doc_id"]
        for r in r1.accepted.select("doc_id").union(
            r2.accepted.select("doc_id")
        ).collect()
    )
    want_tbl = dedup.exact_dedup(full, id_col="doc_id")
    id_col = "doc_id" if "doc_id" in want_tbl.columns else want_tbl.columns[0]
    want = sorted(r[0] for r in want_tbl.select(id_col).collect())
    # one-shot keep-first keeps the GLOBAL min id; split ingest keeps the
    # first-ARRIVED — compare as key sets, which must be identical
    assert len(got) == len(want)
    got_keys = sorted(
        map(tuple, r1.new_key_rows.select("khash", "klen").union(
            r2.new_key_rows.select("khash", "klen")
        ).collect())
    )
    assert len(got_keys) == len(set(got_keys)) == len(want)


def test_exact_ingest_idempotent_and_reasons(spark):
    from log_analysis_spark.operators import incremental

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb")], "doc_id long, text string"
    )
    st = _empty_keys(spark)
    r1 = incremental.ingest_exact_batch(docs, st)
    assert sorted(r["doc_id"] for r in r1.accepted.collect()) == [1, 3]
    rej = {(r["id"], r["matched_id"], r["why"]) for r in r1.rejected.collect()}
    assert rej == {(2, 1, "within_batch")}
    # re-ingest the identical batch against the new state: all rejected
    r2 = incremental.ingest_exact_batch(docs, r1.new_key_rows)
    assert r2.accepted.count() == 0
    whys = {r["why"] for r in r2.rejected.collect()}
    assert whys == {"within_batch", "cross_corpus"}
    assert r2.new_key_rows.count() == 0


def test_exact_ingest_plan_text_free(spark):
    """Document text never enters an exchange — the probe runs on
    (khash, klen, id) only."""
    from log_analysis_spark.operators import incremental
    from tools.explain_audit import shuffle_schemas

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    res = incremental.ingest_exact_batch(docs, _empty_keys(spark))
    shufs = shuffle_schemas(res.new_key_rows)
    assert all("text" not in cols for _, cols in shufs), shufs
