"""Unit tests for operators/chunking.py — token-window chunking against a
pure-Python mirror of the window rules, plus edge cases (exact-multiple
lengths, overlap-absorbed tails, empty docs, parameter validation)."""

from __future__ import annotations

import re

import pytest

from log_analysis_spark.operators import chunking


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_chunks(text, max_tokens, overlap, min_tokens=1):
    """Independent mirror: same tokenization rule as textstats.tokens_col
    (trim, split on runs of non-word chars, drop empty tokens)."""
    t = [x for x in re.split(r"[^\w']+", text.strip()) if x != ""]
    stride = max_tokens - overlap
    out = []
    for s in range(0, len(t), stride):
        w = t[s : s + max_tokens]
        if s > 0 and len(w) <= overlap:
            continue  # adds no new tokens
        if len(w) < min_tokens:
            continue
        out.append((s // stride, len(w), " ".join(w)))
    return out


def _collect(df):
    return sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.text) for r in df.collect()
    )


def test_chunk_documents_matches_python_mirror(spark):
    texts = {
        1: "a b c d e f g h i j",          # 10 tokens
        2: "one two three four",            # exactly max_tokens
        3: "x",                              # single token
        4: "",                               # empty -> no chunks
        5: "  p  q,r.s   t  ",               # messy separators, 5 tokens
        6: " ".join(f"w{i}" for i in range(23)),  # long, ragged tail
    }
    df = _docs_df(spark, list(texts.items()))
    got = _collect(chunking.chunk_documents(df, max_tokens=4, overlap=1))
    want = sorted(
        (d, cid, n, tx)
        for d, text in texts.items()
        for cid, n, tx in _py_chunks(text, 4, 1)
    )
    assert got == want
    assert not any(d == 4 for d, *_ in got)  # empty doc emits nothing


def test_chunk_documents_no_overlap_and_min_tokens(spark):
    df = _docs_df(spark, [(1, "a b c d e f g")])  # 7 tokens
    got = _collect(chunking.chunk_documents(df, max_tokens=3, overlap=0))
    assert got == [(1, 0, 3, "a b c"), (1, 1, 3, "d e f"), (1, 2, 1, "g")]
    # min_tokens=2 drops the length-1 tail
    got2 = _collect(
        chunking.chunk_documents(df, max_tokens=3, overlap=0, min_tokens=2)
    )
    assert got2 == got[:2]


def test_chunk_documents_tail_absorbed_by_overlap(spark):
    # 5 tokens, max=4, overlap=2, stride=2: starts 0,2,4; start 4 has
    # 1 token <= overlap -> dropped; start 2 has 3 tokens > overlap -> kept
    df = _docs_df(spark, [(1, "a b c d e")])
    got = _collect(chunking.chunk_documents(df, max_tokens=4, overlap=2))
    assert got == [(1, 0, 4, "a b c d"), (1, 1, 3, "c d e")]


def test_chunk_documents_validates_params(spark):
    df = _docs_df(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=4, overlap=-1)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=4, min_tokens=0)


def _py_pack(texts, L):
    import hashlib

    def toks(s):
        return [x for x in re.split(r"[^\w']+", s.strip()) if x != ""]

    order = sorted(
        (i for i in texts if toks(texts[i])),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    pos, out = 0, []
    for i in order:
        t = toks(texts[i])
        n = len(t)
        for q in range(pos // L, (pos + n - 1) // L + 1):
            ts = max(q * L - pos, 0)
            te = min((q + 1) * L, pos + n) - pos
            out.append((i, q, max(pos - q * L, 0), ts, te - ts, " ".join(t[ts:te])))
        pos += n
    return sorted(out)


def test_pack_sequences_matches_python_mirror(spark):
    texts = {
        1: "a b c d e",
        2: "",
        3: "x y z",
        4: "p q r s t u v w",
        5: "m",
        6: " ".join(f"w{i}" for i in range(11)),
    }
    df = _docs_df(spark, list(texts.items()))
    got = sorted(
        (r.doc_id, r.seq_id, r.start_in_seq, r.tok_start, r.n_tokens, r.text)
        for r in chunking.pack_sequences(df, 4).collect()
    )
    assert got == _py_pack(texts, 4)
    # narrow path: same map without text
    narrow = sorted(
        (r.doc_id, r.seq_id, r.start_in_seq, r.tok_start, r.n_tokens)
        for r in chunking.pack_sequences(df, 4, emit_text=False).collect()
    )
    assert narrow == [row[:5] for row in _py_pack(texts, 4)]


def test_pack_sequences_covers_every_token_exactly_once(spark):
    texts = {i: " ".join(f"t{i}_{j}" for j in range(i % 7)) for i in range(1, 30)}
    df = _docs_df(spark, list(texts.items()))
    rows = chunking.pack_sequences(df, 5).collect()
    total = sum(len(t.split()) for t in texts.values())
    # token conservation: segments partition the stream
    assert sum(r.n_tokens for r in rows) == total
    # per-doc segments tile [0, n) without gaps or overlaps
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.tok_start, r.n_tokens))
    for i, segs in by_doc.items():
        segs.sort()
        assert segs[0][0] == 0
        for (a, na), (b, _) in zip(segs, segs[1:]):
            assert a + na == b
    # per-sequence slots tile [0, L) (last sequence may be short)
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append((r.start_in_seq, r.n_tokens))
    for q, segs in sorted(by_seq.items()):
        segs.sort()
        assert segs[0][0] == 0
        filled = sum(n for _, n in segs)
        assert filled == 5 or q == max(by_seq)
        for (a, na), (b, _) in zip(segs, segs[1:]):
            assert a + na == b
    with pytest.raises(ValueError):
        chunking.pack_sequences(df, 0)


def test_pack_sequences_order_col_groups_are_contiguous(spark):
    from log_analysis_spark.operators import chunking

    rows = [
        (1, "a " * 10, "en"), (2, "b " * 10, "de"),
        (3, "c " * 10, "en"), (4, "d " * 10, "de"),
        (5, "e " * 10, "en"),
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), l) for i, t, l in rows],
        "doc_id long, text string, lang string",
    )
    out = chunking.pack_sequences(
        df, seq_len=7, order_col="lang", emit_text=False
    ).collect()
    lang = {1: "en", 2: "de", 3: "en", 4: "de", 5: "en"}
    # reconstruct each doc's global start: seq_id*7 + start_in_seq of its
    # first segment; within the stream all de docs precede or follow all
    # en docs as one contiguous block
    starts = {}
    for r in out:
        pos = r["seq_id"] * 7 + r["start_in_seq"] - r["tok_start"]
        starts.setdefault(r["doc_id"], pos)
    ordered = [lang[d] for d, _ in sorted(starts.items(), key=lambda kv: kv[1])]
    # grouped: exactly one transition between the two language blocks
    transitions = sum(1 for a, b in zip(ordered, ordered[1:]) if a != b)
    assert transitions == 1
    # token conservation unchanged by the ordering knob
    total = sum(r["n_tokens"] for r in out)
    assert total == 5 * 10


def test_global_token_offsets_null_order_col_kept_and_first(spark):
    """A NULL order_col value must neither drop rows (the null-unsafe
    equi-join failure mode) nor land in a different stream position than
    the DuckDB oracle's pinned NULLS FIRST ordering."""
    from log_analysis_spark.operators import corpus

    rows = [
        (1, "a " * 4, "en"), (2, "b " * 4, None),
        (3, "c " * 4, "de"), (4, "d " * 4, None),
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), l) for i, t, l in rows],
        "doc_id long, text string, lang string",
    )
    out = corpus.global_token_offsets(df, order_col="lang").collect()
    # no row dropped
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3, 4]
    # token conservation: offsets tile [0, total) exactly
    segs = sorted((r["_goff"], r["n_tokens"]) for r in out)
    assert segs[0][0] == 0
    for (a, na), (b, _) in zip(segs, segs[1:]):
        assert a + na == b
    # NULL group is FIRST in the stream (Spark ASC default == oracle's
    # pinned NULLS FIRST): docs 2 and 4 occupy offsets 0 and 4
    null_offs = sorted(r["_goff"] for r in out if r["doc_id"] in (2, 4))
    assert null_offs == [0, 4]
