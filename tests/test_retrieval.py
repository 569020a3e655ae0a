"""BM25 retrieval + Bloom-filter decontamination behavior tests.

The cross-engine exactness of both contract queries is covered by
tests/test_retired_contract.py; here we pin the closed-form math, tie
rules, edge cases, and the Bloom superset / false-positive semantics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import corpus, retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id int, query_text string")


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    """Closed-form single-term BM25 with the operator's quantization."""
    idf = round(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6)
    tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return round(round(idf * tfn, 6) * 1e6) / 1e6


def test_bm25_single_term_closed_form(spark):
    # 4 docs, term 'cat' in docs 1 (tf=2, dl=4) and 2 (tf=1, dl=2); N=4,
    # total_len = 4+2+3+1 = 10, avgdl = 2.5
    docs = _docs(
        spark,
        [
            (1, "cat cat dog bird"),
            (2, "cat fish"),
            (3, "dog dog bird"),
            (4, "fish"),
        ],
    )
    out = retrieval.bm25_topk(docs, _queries(spark, [(1, "cat")]), k=10)
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out.collect()}
    exp1 = _bm25_ref(tf=2, df=2, n_docs=4, dl=4, avgdl=2.5)
    exp2 = _bm25_ref(tf=1, df=2, n_docs=4, dl=2, avgdl=2.5)
    assert set(got) == {1, 2}
    assert got[1][0] == pytest.approx(exp1, abs=0)
    assert got[2][0] == pytest.approx(exp2, abs=0)
    # tf=2 in the longer doc still outranks tf=1 here
    assert [d for d, (_, rk) in sorted(got.items(), key=lambda kv: kv[1][1])] == (
        [1, 2] if exp1 > exp2 else [2, 1]
    )


def test_bm25_multi_term_sums_and_ties(spark):
    # docs 1 and 2 are identical -> identical scores; tie breaks by doc id
    docs = _docs(spark, [(2, "alpha beta"), (1, "alpha beta"), (3, "alpha gamma")])
    out = retrieval.bm25_topk(docs, _queries(spark, [(7, "alpha beta")]), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["score"] == rows[1]["score"] > rows[2]["score"]


def test_bm25_k_cuts_and_no_hits(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "alpha"), (3, "alpha")])
    out = retrieval.bm25_topk(docs, _queries(spark, [(1, "alpha")]), k=2)
    assert out.count() == 2
    assert retrieval.bm25_topk(
        docs, _queries(spark, [(1, "zzz missing")]), k=2
    ).count() == 0
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, _queries(spark, [(1, "alpha")]), k=0)


def test_bm25_query_term_dedup_and_lowercase(spark):
    # repeated query terms contribute once; matching is case-insensitive
    docs = _docs(spark, [(1, "Alpha beta"), (2, "gamma")])
    one = retrieval.bm25_topk(docs, _queries(spark, [(1, "alpha")]), k=5)
    twice = retrieval.bm25_topk(docs, _queries(spark, [(1, "ALPHA alpha")]), k=5)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, twice.collect()))


def _bloom_frames(spark):
    # planted contamination: doc 10 shares a 3-gram with the bench text
    bench = _docs(spark, [(100, "the quick brown fox jumps over")])
    docs = _docs(
        spark,
        [
            (10, "we saw the quick brown fox yesterday evening here"),
            (11, "completely unrelated text about database engines today"),
            (12, "another clean document with no overlap at all"),
        ],
    )
    return docs, bench


def test_bloom_superset_of_exact_and_no_false_negatives(spark):
    docs, bench = _bloom_frames(spark)
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in corpus.decontaminate(docs, bench, n=3).collect()
    }
    bl = {
        r["doc_id"]: r["n_flagged_grams"]
        for r in corpus.decontaminate_bloom(
            docs, bench, n=3, m_bits=1 << 20, n_hashes=4
        ).collect()
    }
    assert set(bl) == set(exact)
    assert all(bl[d] >= exact[d] for d in exact)  # never a false negative
    assert exact[10] > 0 and bl[10] > 0
    # at 2^20 bits for a handful of grams, no false positives remain
    assert bl == exact


def test_bloom_tiny_filter_produces_false_positives_only(spark):
    # m=2 bits saturates instantly: every gram flags -> all docs flagged,
    # still a strict superset (the no-false-negative guarantee)
    docs, bench = _bloom_frames(spark)
    bl = corpus.decontaminate_bloom(docs, bench, n=3, m_bits=2, n_hashes=2)
    assert all(r["contaminated"] for r in bl.collect())


def test_bloom_min_hits_and_validation(spark):
    docs, bench = _bloom_frames(spark)
    strict = corpus.decontaminate_bloom(
        docs, bench, n=3, min_hits=10_000, m_bits=1 << 20, n_hashes=4
    )
    assert not any(r["contaminated"] for r in strict.collect())
    with pytest.raises(ValueError):
        corpus.decontaminate_bloom(docs, bench, n=0)
    with pytest.raises(ValueError):
        corpus.bloom_positions(F.lit("x"), m_bits=1, n_hashes=4)
    with pytest.raises(ValueError):
        corpus.bloom_positions(F.lit("x"), m_bits=16, n_hashes=0)


def test_bloom_positions_deterministic_and_bounded(spark):
    df = spark.range(1).select(
        corpus.bloom_positions(F.lit("some gram"), m_bits=64, n_hashes=8).alias("p")
    )
    [row] = df.collect()
    again = df.collect()[0]
    assert row["p"] == again["p"]
    assert len(row["p"]) == len(set(row["p"])) <= 8
    assert all(0 <= p < 64 for p in row["p"])


def test_phrase_search_consecutive_only(spark):
    from log_analysis_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the data is here and the data returns"),
            (2, "data the — reversed, no match"),
            (3, "THE DATA uppercase still matches"),
            (4, "the unrelated data far apart"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "the data").collect()
    }
    assert got == {1: (2, 0), 3: (1, 0)}


def test_phrase_search_overlapping_repeated_token(spark):
    from log_analysis_spark.operators.retrieval import phrase_search

    # 'table table table' holds TWO overlapping 'table table' matches;
    # the repeated token exercises multi-offset anchor nomination
    docs = spark.createDataFrame(
        [(1, "x table table table y"), (2, "table alone")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "table table").collect()
    }
    assert got == {1: (2, 1)}


def test_phrase_search_rejects_empty(spark):
    import pytest as _pytest

    from log_analysis_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        phrase_search(docs, "  .,; ")


# ---------------------------------------------------------------------------
# token-set Jaccard ranking + reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_jaccard_topk_closed_form_and_candidates(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma"),        # q∩={alpha,beta} |d|=3
            (2, "alpha alpha alpha"),       # dup tokens collapse: |d|=1
            (3, "delta epsilon zeta"),      # zero overlap -> not a candidate
        ],
    )
    qs = _queries(spark, [(7, "alpha beta")])
    out = {
        r["doc_id"]: (r["jaccard_micro"], r["rank"])
        for r in retrieval.jaccard_topk(docs, qs, k=10).collect()
    }
    assert set(out) == {1, 2}  # doc 3 shares no term
    # doc1: inter=2, union=2+3-2=3 -> 666666 ; doc2: inter=1, union=2+1-1=2
    assert out[1] == ((1_000_000 * 2) // 3, 1)
    assert out[2] == (500_000, 2)


def test_jaccard_topk_tie_breaks_by_doc_id(spark):
    docs = _docs(spark, [(5, "alpha beta"), (2, "beta alpha")])
    qs = _queries(spark, [(1, "alpha")])
    rows = retrieval.jaccard_topk(docs, qs, k=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in rows] == [(2, 1), (5, 2)]


def test_rrf_fuse_matches_python_mirror(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 12, 1), (1, 10, 2), (1, 13, 3)], "query_id int, doc_id long, rank int"
    )
    out = {
        r["doc_id"]: (r["rrf_micro"], r["rank"])
        for r in retrieval.rrf_fuse([a, b], k=10, k0=60).collect()
    }
    mirror = {}
    for ranks in ({10: 1, 11: 2, 12: 3}, {12: 1, 10: 2, 13: 3}):
        for d, rk in ranks.items():
            mirror[d] = mirror.get(d, 0) + 1_000_000 // (60 + rk)
    order = sorted(mirror, key=lambda d: (-mirror[d], d))
    assert out == {d: (mirror[d], i + 1) for i, d in enumerate(order)}
    # doc 12 (ranks 3+1) must beat doc 10 (ranks 1+2)? 1/63+1/61 vs 1/61+1/62:
    # 10 wins -> pin the expected head explicitly too
    assert out[10][1] == 1 and out[12][1] == 2


def test_rrf_fuse_single_list_absences_and_validation(spark):
    a = spark.createDataFrame([(1, 10, 1)], "query_id int, doc_id long, rank int")
    out = retrieval.rrf_fuse([a], k=5).collect()
    assert [(r["doc_id"], r["rrf_micro"])
            for r in out] == [(10, 1_000_000 // 61)]
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([], k=5)
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([a], k=0)
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([a], k=5, k0=0)


def test_hybrid_rrf_promotes_cross_ranker_agreement(spark):
    """A doc ranked mid-list by BOTH rankers outranks one ranked first by a
    single ranker only — the fusion property RRF exists for."""
    both = spark.createDataFrame(
        [(1, 100, 2), (1, 101, 1)], "query_id int, doc_id long, rank int"
    )
    one = spark.createDataFrame(
        [(1, 100, 2)], "query_id int, doc_id long, rank int"
    )
    out = {r["doc_id"]: r["rank"]
           for r in retrieval.rrf_fuse([both, one], k=5).collect()}
    assert out[100] == 1  # 2/62 > 1/61
