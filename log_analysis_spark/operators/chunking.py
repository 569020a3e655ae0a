"""Token-window document chunking: fixed-size windows with overlap.

The standard corpus-shaping step between curation and consumption — both
pre-training packers (split documents longer than the model context into
window-sized pieces, overlapping so no span is ever seen only truncated)
and retrieval indexes (passage-level units for BM25 / dense search) want
the corpus re-keyed from documents to ``(doc, chunk)`` token windows.
This module provides that re-keying as pure DataFrame algebra.

Semantics (the sliding-window convention used by common tokenizer
``return_overflowing_tokens`` implementations): windows of ``max_tokens``
tokens start every ``stride = max_tokens - overlap`` tokens; the final
window may be shorter; a trailing window wholly contained in its
predecessor (length <= overlap, start > 0) is dropped — it contributes
no new tokens.  Chunk text is the window's tokens re-joined with single
spaces (the token-rendered form — the same normalization every
token-level operator in this repo scores on).

Scale shape: one projection computes the token array ONCE per document
(explicit let-binding — see textstats.winnow_fingerprints for why a
higher-order lambda must not close over the split expression), builds
all window structs inside that single pass, and a generator explodes the
ALREADY-SLICED chunk structs — the full token array is never duplicated
per output row, document text never enters an exchange (there is no
exchange: scan -> project -> generate is shuffle-free and pipelined), and
there is no Python anywhere.  Per-doc work is O(n_tokens * chunks_per_
token-position) = O(n_tokens * max_tokens / stride).

Reference provenance: the reference repo operates on whole log lines and
has no chunking; this extends the engine's corpus surface (SURVEY.md
"beyond the reference" mandate) alongside packing/sampling/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows →
    ``(id, chunk_id, n_tokens, text)``.

    * windows start at ``0, stride, 2*stride, ...`` with
      ``stride = max_tokens - overlap`` (``overlap`` must be <
      ``max_tokens``); ``chunk_id`` is the 0-based window ordinal
      (``start / stride``);
    * every window has ``min(max_tokens, n - start)`` tokens; a trailing
      window that adds no new tokens (``start > 0`` and length <=
      ``overlap``) is dropped, as are windows shorter than
      ``min_tokens``;
    * empty documents (no tokens) emit no chunks;
    * ``text`` is the window tokens joined by single spaces.

    Tokenization is the repo-wide :func:`textstats.tokens_col` rule, so
    chunk token counts agree with every other token-level operator.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}/{max_tokens}"
        )
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    stride = max_tokens - overlap

    def let(value, body):
        # evaluate `value` once, expose it to `body` as a lambda variable
        return F.element_at(F.transform(F.array(value), body), 1)

    def windows(t):
        n = F.size(t)
        # sequence(0, -1, +step) raises on empty docs — guard to no chunks
        starts = F.when(
            n > F.lit(0), F.sequence(F.lit(0), n - F.lit(1), F.lit(stride))
        ).otherwise(F.array().cast("array<int>"))
        chunks = F.transform(
            starts,
            lambda s: F.struct(
                (s / F.lit(stride)).cast("int").alias("chunk_id"),
                F.least(F.lit(max_tokens), n - s).cast("long").alias("n_tokens"),
                F.array_join(F.slice(t, s + F.lit(1), max_tokens), " ").alias(
                    "text"
                ),
                s.alias("_start"),
            ),
        )
        return F.filter(
            chunks,
            lambda c: (
                (c["_start"] == 0) | (c["n_tokens"] > F.lit(overlap))
            )
            & (c["n_tokens"] >= F.lit(min_tokens)),
        )

    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    chunked = docs.select(
        F.col(id_col), let(toks, windows).alias("_chunks")
    ).select(F.col(id_col), F.explode("_chunks").alias("_c"))
    return chunked.select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.n_tokens").alias("n_tokens"),
        F.col("_c.text").alias("text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    emit_text: bool = True,
    order_col: str | None = None,
) -> DataFrame:
    """GPT-style concat-and-split sequence packing → one row per
    ``(document, training sequence)`` segment.

    The last step of a pretraining pipeline: the curated corpus becomes
    a single deterministic token stream (documents concatenated in
    ``pack_key = md5(id)`` order — the decorrelating shuffle
    ``corpus.pack_shards`` uses) and the stream is cut into fixed
    ``seq_len``-token training sequences.  Documents span sequence
    boundaries, so the output is the SEGMENT map trainers consume for
    attention masking / boundary resets:

    * ``seq_id``       — which training sequence (``stream_pos div
      seq_len``);
    * ``start_in_seq`` — the segment's first slot within that sequence;
    * ``tok_start``    — 0-based first token of the segment within the
      document;
    * ``n_tokens``     — segment length (>= 1; empty docs emit nothing);
    * ``text``         — the segment's tokens re-joined with single
      spaces (``emit_text=True``; the token-rendered form every
      token-level operator here scores on).

    Every token of every non-empty document lands in exactly one segment
    and every sequence slot below the stream total is covered — packing
    wastes nothing (the final sequence may be short).

    Scale shape: the placement decision is ``corpus.global_token_offsets``
    — entirely over the narrow ``(id, n_tokens, pack_key)`` projection
    (two-phase cumsum, single-partition stage bounded at 256 rows).  With
    ``emit_text=False`` the whole operator is narrow: document text never
    enters any exchange.  With text, the segment map re-attaches to the
    corpus by ONE id equi-join (text moves once — bucketed-by-id input
    makes even that shuffle-free) and a generator explodes PRE-SLICED
    segment structs from a let-bound token array, exactly
    :func:`chunk_documents`'s zero-duplication shape.  All arithmetic is
    integer (``div``) so offsets stay exact at any stream length.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from .corpus import global_token_offsets

    L = F.lit(int(seq_len))
    off = (
        global_token_offsets(docs, id_col, token_count_col, text_col, order_col)
        .filter(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            F.col("_goff"),
            F.expr(f"_goff div {int(seq_len)}").alias("_q0"),
            F.expr(f"(_goff + n_tokens - 1) div {int(seq_len)}").alias("_q1"),
        )
    )
    if not emit_text:
        segs = off.select(
            F.col(id_col),
            F.explode(F.sequence("_q0", "_q1")).alias("seq_id"),
            "_goff",
            "n_tokens",
        )
        ts = F.greatest(F.col("seq_id") * L - F.col("_goff"), F.lit(0))
        te = F.least((F.col("seq_id") + 1) * L, F.col("_goff") + F.col("n_tokens")) - F.col("_goff")
        return segs.select(
            id_col,
            "seq_id",
            F.greatest(F.col("_goff") - F.col("seq_id") * L, F.lit(0)).alias(
                "start_in_seq"
            ),
            ts.alias("tok_start"),
            (te - ts).alias("n_tokens"),
        )

    def let(value, body):
        return F.element_at(F.transform(F.array(value), body), 1)

    def segments(t):
        # all segment structs built in ONE pass over the let-bound array;
        # the generator then explodes already-sliced structs
        def seg(q):
            q = q.cast("long")
            ts = F.greatest(q * L - F.col("_goff"), F.lit(0))
            te = (
                F.least((q + 1) * L, F.col("_goff") + F.col("n_tokens"))
                - F.col("_goff")
            )
            return F.struct(
                q.alias("seq_id"),
                F.greatest(F.col("_goff") - q * L, F.lit(0)).alias("start_in_seq"),
                ts.alias("tok_start"),
                (te - ts).alias("n_tokens"),
                F.array_join(
                    F.slice(t, (ts + 1).cast("int"), (te - ts).cast("int")), " "
                ).alias("text"),
            )

        return F.transform(F.sequence("_q0", "_q1"), seg)

    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    withtext = docs.select(id_col, text_col).join(off, id_col)
    return (
        withtext.select(
            F.col(id_col), let(toks, segments).alias("_segs")
        )
        .select(F.col(id_col), F.explode("_segs").alias("_s"))
        .select(
            id_col,
            F.col("_s.seq_id").alias("seq_id"),
            F.col("_s.start_in_seq").alias("start_in_seq"),
            F.col("_s.tok_start").alias("tok_start"),
            F.col("_s.n_tokens").alias("n_tokens"),
            F.col("_s.text").alias("text"),
        )
    )
