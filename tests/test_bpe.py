"""BPE trainer/encoder verification: the distributed trainer must equal a
pure-Python reference implementation merge-for-merge (no SQL oracle can
express the iterative argmax loop), and encoding must reproduce training's
segmentation on the training words."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row

from log_analysis_spark.operators import bpe


def ref_bpe(word_freqs: dict[str, int], n: int, min_pair_count: int = 2):
    """Sennrich et al. 2016 Algorithm 1, verbatim (greedy left-to-right
    rewrite, (count desc, pair asc) argmax)."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + bpe.END_MARK]): f
        for w, f in word_freqs.items()
    }
    out = []
    for rank in range(n):
        pc: Counter = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if cnt < min_pair_count:
            break
        out.append((rank, a, b, a + b, cnt))
        nv: dict[tuple, int] = {}
        for sym, f in vocab.items():
            s: list[str] = []
            for x in sym:
                if s and s[-1] == a and x == b:
                    s[-1] = a + b
                else:
                    s.append(x)
            nv[tuple(s)] = nv.get(tuple(s), 0) + f
        vocab = nv
    return out


def _got(merges):
    return [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in merges
    ]


def test_bpe_classic_corpus_matches_reference(spark):
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merges = bpe.train_bpe(docs, n_merges=10)
    assert _got(merges) == ref_bpe(Counter(texts), 10)
    # the canonical first merges on this corpus
    assert merges[0]["merged"] == "es" and merges[1]["merged"] == "est" + bpe.END_MARK


def test_bpe_real_corpus_matches_reference(spark, sf_dir):
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    wf: Counter = Counter()
    for r in docs.select("text").collect():
        for w in re.split(r"[^\w']+", r["text"].strip()):
            if w:
                wf[w.lower()] += 1
    merges = bpe.train_bpe(docs, n_merges=25)
    assert _got(merges) == ref_bpe(wf, 25)
    assert len(merges) == 25


def test_bpe_early_stop_on_min_pair_count(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="ab"), Row(doc_id=2, text="cd")]
    )
    # every pair occurs once → nothing reaches min_pair_count=2
    assert bpe.train_bpe(docs, n_merges=5) == []


def test_bpe_encode_reproduces_training_segmentation(spark):
    texts = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merges = bpe.train_bpe(docs, n_merges=10)
    enc = {
        r["doc_id"]: list(r["subwords"])
        for r in bpe.encode_bpe(docs, merges).collect()
    }
    E = bpe.END_MARK
    assert enc[0] == ["low" + E]              # fully merged training word
    # 'lower' keeps w unmerged: the learned merge is (lo, w▁) — word-FINAL
    # w only — which is exactly the end-sentinel distinction working
    assert enc[5] == ["lo", "w", "e", "r" + E]
    assert enc[7] == ["newest" + E]
    # unseen word: falls back to characters + learned fragments only
    unseen = spark.createDataFrame([Row(doc_id=99, text="xlow")])
    [r] = bpe.encode_bpe(unseen, merges).collect()
    assert r["subwords"][0] == "x" and r["n_subwords"] >= 2


def test_bpe_validation(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        bpe.train_bpe(docs, n_merges=0)
