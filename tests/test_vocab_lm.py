"""Vocabulary build + unigram-LM surprise scoring on planted corpora (the
contract-level oracle exactness is covered by test_retired_contract.py)."""

from __future__ import annotations

import math

import pytest

from log_analysis_spark.operators.textstats import unigram_surprise, vocabulary


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocabulary_counts_ranks_and_tiebreak(spark):
    df = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "Banana cherry"),
            (3, "apple  cherry!"),
        ],
    )
    got = [
        (r["token"], r["n_occ"], r["vocab_rank"])
        for r in vocabulary(df, top_v=10).collect()
    ]
    # apple x3; banana/cherry x2 each (lowercased, punctuation split) —
    # tie broken token-asc
    assert got == [("apple", 3, 1), ("banana", 2, 2), ("cherry", 2, 3)]


def test_vocabulary_top_v_cut_and_validation(spark):
    df = _docs(spark, [(1, "a a a b b c")])
    got = [(r["token"], r["vocab_rank"]) for r in vocabulary(df, top_v=2).collect()]
    assert got == [("a", 1), ("b", 2)]
    with pytest.raises(ValueError, match="top_v"):
        vocabulary(df, top_v=0)


def test_unigram_surprise_planted_values(spark):
    df = _docs(spark, [(1, "a a b"), (2, "b c"), (3, "")])
    out = {
        r["doc_id"]: (r["n_tokens"], r["surprise"])
        for r in unigram_surprise(df).collect()
    }
    # counts: a=2, b=2, c=1, total=5 — replicate the op's quantization
    def micro(cnt):
        return round(-round(math.log(cnt / 5.0), 6) * 1e6)

    def surprise(cnts):
        return round(sum(micro(c) for c in cnts) / len(cnts) / 1e6, 6)

    assert out[1] == (3, surprise([2, 2, 2]))
    assert out[2] == (2, surprise([2, 1]))
    assert out[3] == (0, 0.0)
    # rarer vocabulary ⇒ strictly higher surprise
    assert out[2][1] > out[1][1]


def test_unigram_surprise_uniform_corpus_is_flat(spark):
    df = _docs(spark, [(1, "x y"), (2, "y x")])
    vals = {r["surprise"] for r in unigram_surprise(df).collect()}
    assert vals == {round(-round(math.log(0.5), 6), 6)}


def test_dsir_weights_favor_target_vocabulary(spark):
    """Docs written in the target slice's vocabulary must outrank docs in
    the off-target vocabulary, with the mixed doc in between; hand-check
    one weight against the closed-form add-1 LM ratio."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.textstats import (
        dsir_logweights,
        dsir_select,
    )

    rows = [
        (1, "alpha alpha alpha", True),
        (2, "alpha alpha beta", True),
        (3, "beta beta beta", False),
        (4, "alpha beta beta", False),
        (5, "alpha alpha alpha", False),  # target-voc text, non-target doc
        (6, "", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = {
        r["doc_id"]: (r["n_tokens"], r["logw_micro"])
        for r in dsir_logweights(df, F.col("is_t")).collect()
    }
    assert w[6] == (0, 0)
    # closed form: cr(alpha)=9, cr(beta)=6 (raw total 15, vocab 2);
    # target counts ct(alpha)=5, ct(beta)=1 (target total 6); add-1 over
    # the shared vocab => p_t = (ct+1)/(6+2), p_r = (cr+1)/(15+2)
    def micro(p):
        return round(round(math.log(p), 6) * 1e6)

    d_alpha = micro(6 / 8) - micro(10 / 17)
    d_beta = micro(2 / 8) - micro(7 / 17)
    assert w[1] == (3, 3 * d_alpha)
    assert w[3] == (3, 3 * d_beta)
    assert w[4] == (3, d_alpha + 2 * d_beta)
    # weights depend only on text, not on the doc's own flag
    assert w[5] == w[1]
    # per-token signal: alpha pulls toward target, beta away
    assert d_alpha > 0 > d_beta
    # selection: top-2 are the all-alpha docs, tie broken by id
    top = [
        r["doc_id"] for r in dsir_select(df, F.col("is_t"), k=2).collect()
    ]
    assert top == [1, 5]
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(df, F.col("is_t"), k=0)
