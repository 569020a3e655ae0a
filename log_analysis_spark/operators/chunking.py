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

__all__ = ["chunk_documents"]


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
