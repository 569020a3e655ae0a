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


def _clf_mirror(rows, target_ids, n_buckets, bigrams=True):
    """Pure-Python mirror of the hashed-n-gram NB classifier: feature
    hashing (md5-u32 mod B), add-1 NB log-odds over the FIXED bucket
    space, per-doc integer micro-nat sums."""
    import hashlib
    import re

    def feats(text):
        toks = [t.lower() for t in re.split(r"[^\w']+", text.strip()) if t]
        out = list(toks)
        if bigrams:
            out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets
            for f in out
        ]

    cr, ct = {}, {}
    for doc_id, text in rows:
        for b in feats(text):
            cr[b] = cr.get(b, 0) + 1
            if doc_id in target_ids:
                ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())

    def micro(p):
        return round(round(math.log(p), 6) * 1e6)

    w = {
        b: micro((ct.get(b, 0) + 1) / (tt + n_buckets))
        - micro((c + 1) / (tr + n_buckets))
        for b, c in cr.items()
    }
    default = micro(1 / (tt + n_buckets)) - micro(1 / (tr + n_buckets))
    scores = {}
    for doc_id, text in rows:
        fs = feats(text)
        scores[doc_id] = (len(fs), sum(w.get(b, default) for b in fs))
    return w, default, scores


def test_classifier_matches_python_mirror(spark):
    """End-to-end closed form: train + score on a planted corpus must equal
    an independent pure-Python recompute of hashing, NB weights and sums."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.textstats import ngram_quality_classifier

    rows = [
        (1, "good clean prose flows well"),
        (2, "good prose reads well enough"),
        (3, "buy cheap pills now now now"),
        (4, "cheap cheap buy buy now"),
        (5, "good prose but buy pills"),
        (6, ""),
    ]
    target = {1, 2}
    df = spark.createDataFrame(
        [(i, t, i in target) for i, t in rows],
        "doc_id long, text string, is_t boolean",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["mean_logodds"])
        for r in ngram_quality_classifier(
            df, F.col("is_t"), n_buckets=1 << 16
        ).collect()
    }
    _, _, want = _clf_mirror(rows, target, 1 << 16)
    for doc_id, (nf, sm) in want.items():
        mean = round(sm / nf / 1e6, 6) if nf else 0.0
        assert got[doc_id] == (nf, sm, mean), doc_id
    assert got[6] == (0, 0, 0.0)
    # the target-voc docs outrank the spam docs on the normalized mean
    assert min(got[1][2], got[2][2]) > max(got[3][2], got[4][2])


def test_classifier_bigram_sensitivity(spark):
    """Same unigrams, different order: only the bigram features separate
    the classes — with bigrams on the scores differ, with bigrams off they
    collapse to equal."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.textstats import ngram_quality_classifier

    rows = [
        (1, "alpha beta", True),
        (2, "alpha beta", True),
        (3, "beta alpha", False),
        (4, "beta alpha", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    with_bg = {
        r["doc_id"]: r["score_micro"]
        for r in ngram_quality_classifier(
            df, F.col("is_t"), n_buckets=1 << 16
        ).collect()
    }
    assert with_bg[1] > with_bg[3]
    no_bg = {
        r["doc_id"]: r["score_micro"]
        for r in ngram_quality_classifier(
            df, F.col("is_t"), n_buckets=1 << 16, bigrams=False
        ).collect()
    }
    assert no_bg[1] == no_bg[3]


def test_classifier_default_weight_scores_unseen_corpus(spark):
    """Persisted-weights path: score a NEW corpus whose tokens were never
    seen in training — every feature takes the bucket=-1 default weight."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.textstats import (
        classifier_score,
        train_ngram_quality,
    )

    B = 1 << 16
    train = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "gamma delta", False)],
        "doc_id long, text string, is_t boolean",
    )
    w = train_ngram_quality(train, F.col("is_t"), n_buckets=B)
    default = w.filter("bucket = -1").collect()[0]["w_micro"]
    new = spark.createDataFrame(
        [(10, "zzzznovel qqqqtoken")], "doc_id long, text string"
    )
    got = classifier_score(new, w, n_buckets=B).collect()[0]
    # 2 unigrams + 1 bigram, all unseen (md5 buckets of novel strings
    # colliding with the 5 trained buckets has probability ~2e-4)
    assert got["n_feats"] == 3
    assert got["score_micro"] == 3 * default


def test_classifier_validation(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.textstats import train_ngram_quality

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        train_ngram_quality(df, F.lit(True), n_buckets=1)


def test_pareto_gate_matches_python_mirror(spark):
    """keep_pareto for hand-planted scores equals the pure-Python
    recompute of sigmoid -> pre-inverted Pareto CDF -> md5-u16 integer
    comparison, across positive/negative/zero scores."""
    import hashlib

    from log_analysis_spark.operators.textstats import pareto_classifier_gate

    rows = [(i, s) for i, s in enumerate([-3.0, -0.5, 0.0, 0.7, 5.0, -0.08])]
    df = spark.createDataFrame(rows, "doc_id long, mean_logodds double")
    got = {
        r["doc_id"]: r["keep_pareto"]
        for r in pareto_classifier_gate(df, alpha=9.0).collect()
    }
    for i, s in rows:
        q = 1.0 / (1.0 + math.exp(-s))
        thr = math.floor(round(1.0 - (2.0 - q) ** -9.0, 6) * 65536.0)
        u16 = int(hashlib.md5(f"pareto:{i}".encode()).hexdigest()[:4], 16)
        assert got[i] == (u16 >= thr), (i, s, u16, thr)


def test_pareto_gate_extremes_and_validation(spark):
    """A hugely positive score (quality -> 1, CDF -> 0) survives for every
    draw; alpha <= 0 raises."""
    from log_analysis_spark.operators.textstats import pareto_classifier_gate

    df = spark.createDataFrame(
        [(i, 50.0) for i in range(64)], "doc_id long, mean_logodds double"
    )
    out = pareto_classifier_gate(df, alpha=9.0)
    assert all(r["keep_pareto"] for r in out.collect())
    with pytest.raises(ValueError, match="alpha"):
        pareto_classifier_gate(df, alpha=0.0)


def test_bigram_surprise_detects_shuffled_order(spark):
    """The property unigram_surprise is blind to: a doc with the SAME
    tokens in incoherent order scores strictly higher under the bigram LM
    (fluent bigrams are frequent in the corpus, shuffled ones are not)."""
    from pyspark.sql import Row

    from log_analysis_spark.operators.textstats import (
        bigram_surprise,
        unigram_surprise,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    # same multiset of tokens, incoherent order
    shuffled = "mat the on dog sat the and rug cat the on sat the"
    # corpus context: many fluent sentences so fluent bigrams dominate
    ctx = [Row(doc_id=i, text=f"the cat sat on the mat {i}") for i in range(20)]
    docs = spark.createDataFrame(
        ctx + [Row(doc_id=100, text=fluent), Row(doc_id=101, text=shuffled)]
    )
    bg = {r["doc_id"]: r["bigram_surprise"] for r in bigram_surprise(docs).collect()}
    assert bg[101] > bg[100]
    # and the unigram gate cannot separate them (same token multiset)
    un = {r["doc_id"]: r["surprise"] for r in unigram_surprise(docs).collect()}
    assert abs(un[101] - un[100]) < 1e-9


def test_bigram_surprise_short_docs_and_lam_validation(spark):
    import pytest
    from pyspark.sql import Row

    from log_analysis_spark.operators.textstats import bigram_surprise

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="hello"), Row(doc_id=2, text="hello world")]
    )
    out = {r["doc_id"]: r.asDict() for r in bigram_surprise(docs).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["bigram_surprise"] == 0.0
    assert out[2]["n_bigrams"] == 1
    with pytest.raises(ValueError):
        bigram_surprise(docs, lam=1.0)


def test_tfidf_top_terms_planted_values(spark):
    from log_analysis_spark.operators.textstats import tfidf_top_terms

    df = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "apple durian durian durian"),
        ],
    )
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["score_micro"], r["rank"])
        for r in tfidf_top_terms(df, m=2).collect()
    }

    # N=3; df: apple=2, banana=2, cherry=1, durian=1 — replicate the op's
    # micro-nat quantization exactly
    def idfm(dft):
        return round(round(math.log(4.0 / (dft + 1)), 6) * 1e6)

    # doc 1: apple tf2·idf(2), banana tf1·idf(2) — apple wins on score
    assert got[(1, "apple")] == (2, 2 * idfm(2), 1)
    assert got[(1, "banana")] == (1, idfm(2), 2)
    # doc 2: banana and cherry both tf1 — cherry's rarer idf wins
    assert got[(2, "cherry")] == (1, idfm(1), 1)
    assert got[(2, "banana")] == (1, idfm(2), 2)
    # doc 3: durian tf3 rare beats apple; m=2 keeps only top 2
    assert got[(3, "durian")] == (3, 3 * idfm(1), 1)
    assert got[(3, "apple")] == (1, idfm(2), 2)
    assert len(got) == 6


def test_tfidf_equal_score_ties_break_token_asc(spark):
    from log_analysis_spark.operators.textstats import tfidf_top_terms

    df = _docs(spark, [(1, "zed axe"), (2, "unrelated")])
    got = [
        (r["token"], r["rank"])
        for r in tfidf_top_terms(df, m=2)
        .filter("doc_id = 1")
        .orderBy("rank")
        .collect()
    ]
    # zed and axe: identical tf=1, identical df=1 → identical score;
    # token asc decides
    assert got == [("axe", 1), ("zed", 2)]


def test_tfidf_validation(spark):
    import pytest as _pytest

    from log_analysis_spark.operators.textstats import tfidf_top_terms

    with _pytest.raises(ValueError, match="m must"):
        tfidf_top_terms(_docs(spark, [(1, "a")]), m=0)


def test_strip_markup_planted(spark):
    from log_analysis_spark.operators.textstats import strip_markup

    html = (
        '<html><head><style>p { color: red }</style>'
        '<script type="text/js">var x = "<p>";</script></head>'
        '<body><!-- note --><p id="1">Hello &amp;amp; '
        '<b>world</b> &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>\n'
        '  trailing</body></html>'
    )
    df = spark.createDataFrame([(1, html), (2, "plain text")], "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in strip_markup(df).collect()}
    # &amp;amp; decodes ONE level (to &amp;) because &amp; is replaced last
    assert got[1] == 'Hello &amp; world <tag> "q" \'s\' trailing'
    assert got[2] == "plain text"


def test_normalize_unicode_composes_and_passes_columns(spark):
    from log_analysis_spark.operators.textstats import normalize_unicode

    decomposed = "cafe\u0301 A\u030aB"   # e + combining acute, A + ring
    composed = "caf\u00e9 \u00c5B"
    df = spark.createDataFrame(
        [(1, decomposed, "en"), (2, "ascii", "en")],
        "doc_id long, text string, lang string",
    )
    out = normalize_unicode(df, "NFC")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["norm_text"] == composed
    assert rows[1]["text"] == decomposed          # original untouched
    assert rows[1]["lang"] == "en"                # pass-through column
    assert rows[2]["norm_text"] == "ascii"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(df, "NFX")


def test_classifier_calibration_separable_corpus(spark):
    """On a cleanly separable corpus the reliability curve is perfectly
    ordered: target docs land in strictly higher-score bins with rate 1,
    non-target in lower bins with rate 0."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators import textstats

    rows = [(i, "alpha beta gamma delta", "en") for i in range(10)] + [
        (100 + i, "uno dos tres cuatro", "es") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cal = textstats.classifier_calibration(
        df, F.col("lang") == "en", n_buckets=512, bin_width_milli=50
    ).collect()
    by_bin = sorted((r["bin"], r["n_docs"], r["rate_micro"]) for r in cal)
    assert sum(n for _, n, _ in by_bin) == 20
    # rates are monotone nondecreasing over bins, hitting 0 and 1e6
    rates = [r for _, _, r in by_bin]
    assert rates == sorted(rates)
    assert rates[0] == 0 and rates[-1] == 1_000_000
    with __import__("pytest").raises(ValueError):
        textstats.classifier_calibration(
            df, F.col("lang") == "en", bin_width_milli=0
        )


def test_vocab_drift_matches_python_mirror(spark):
    from log_analysis_spark.operators.textstats import vocab_drift

    old = _docs(spark, [(1, "alpha beta beta gamma"), (2, "alpha beta delta")])
    new = _docs(spark, [(1, "alpha beta gamma"), (3, "alpha zeta zeta zeta")])
    got = {
        r["token"]: (r["n_old"], r["n_new"], r["drift_micro"])
        for r in vocab_drift(old, new, top_k=10, min_total=1).collect()
    }

    def toks(texts):
        out = []
        for t in texts:
            out += [w.lower() for w in t.strip().split() if w]
        return out

    import collections

    co = collections.Counter(toks(["alpha beta beta gamma", "alpha beta delta"]))
    cn = collections.Counter(toks(["alpha beta gamma", "alpha zeta zeta zeta"]))
    vocab = set(co) | set(cn)
    to, tn, v = sum(co.values()), sum(cn.values()), len(vocab)

    def micro(x):
        return int(round(round(x, 6) * 1e6))

    for tok in vocab:
        drift = micro(math.log((cn[tok] + 1) / (tn + v))) - micro(
            math.log((co[tok] + 1) / (to + v))
        )
        assert got[tok] == (co[tok], cn[tok], drift), tok
    # zeta appears only in the new snapshot and rises; delta only in old, falls
    assert got["zeta"][2] > 0 and got["delta"][2] < 0


def test_vocab_drift_min_total_and_topk(spark):
    from log_analysis_spark.operators.textstats import vocab_drift

    old = _docs(spark, [(1, "common common common rare")])
    new = _docs(spark, [(1, "common common shift shift")])
    # min_total=2 drops 'rare' (1 occurrence total); keeps common (5), shift (2)
    toks = {r["token"] for r in vocab_drift(old, new, min_total=2).collect()}
    assert toks == {"common", "shift"}
    # top_k=1 keeps the single largest |drift| mover
    top = vocab_drift(old, new, top_k=1, min_total=2).collect()
    assert len(top) == 1 and top[0]["token"] == "shift"
    with pytest.raises(ValueError):
        vocab_drift(old, new, top_k=0)
    with pytest.raises(ValueError):
        vocab_drift(old, new, min_total=0)


def test_lexical_diversity_closed_form(spark):
    from log_analysis_spark.operators.textstats import lexical_diversity

    df = _docs(
        spark,
        [
            (1, "a b c d"),            # all distinct: ttr 1.0
            (2, "a a a a"),            # one type of four: 250000
            (3, "A a B b"),            # lowercase folds: 2 of 4
            (4, ""),                   # empty: zeros
        ],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["ttr_micro"])
        for r in lexical_diversity(df).collect()
    }
    assert out[1] == (4, 4, 1_000_000)
    assert out[2] == (4, 1, 250_000)
    assert out[3] == (4, 2, 500_000)
    assert out[4] == (0, 0, 0)
