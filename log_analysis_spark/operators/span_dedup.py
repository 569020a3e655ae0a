"""Duplicated-span (substring-level) deduplication.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) showed that removing *spans* that recur across a
corpus — not just whole near-duplicate documents — measurably improves
LMs.  Their ExactSubstr uses a corpus-wide suffix array; that structure
is inherently single-machine.  The distributed re-expression here works
at word-``k``-gram granularity, which is the standard Spark-able
approximation (the same granularity the Gopher/GPT-3 decontamination
steps use, see ``corpus.decontaminate``):

* every document yields one gram per token position ``i``:
  ``md5`` of the space-joined tokens ``t_i .. t_{i+k-1}``;
* a gram value is **duplicated** if it occurs at >= 2 (doc, pos)
  locations anywhere in the corpus (cross-doc or within-doc);
* the lexicographically smallest (doc_id, pos) occurrence of each
  duplicated gram is the **keeper**; every other occurrence is removed
  (keep-first, the same convention as ``dedup.exact_dedup``'s
  ``min(id)``);
* a removed occurrence covers token positions ``[pos, pos+k-1]``; the
  union of covered positions per document defines the duplicated-span
  coverage, and ``remove_dup_spans`` rebuilds the text from the
  uncovered tokens only.

Scale shape (the part that matters at 100 TB): the only corpus-sized
shuffle is keyed by the 16-byte gram md5 — positions are ints, the
document text NEVER enters a shuffle.  Per-doc covered-position arrays
come back as one small aggregate (only documents that actually contain
removed spans appear), which AQE broadcasts against the corpus for the
final rebuild, so the text column stays where the scan put it.
Tokenization is ``textstats.tokens_col`` (split on non-word runs) with
empties dropped — byte-identical to the DuckDB oracle's
``list_filter(string_split_regex(...))``.

Spiritual reference: the reference repo deduplicates nothing below
whole-record granularity; this operator family is part of the
LLM-training-data surface the engine adds (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

__all__ = [
    "dup_span_occurrences",
    "dup_span_stats",
    "remove_dup_spans",
    "dup_line_occurrences",
    "dedup_lines",
    "strip_common_lines",
]


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    return df.select(F.col(id_col), F.col(text_col), toks.alias("_toks"))


def _gram_occurrences(base: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, pos, g): one md5 gram per token position; docs shorter than
    ``k`` tokens contribute nothing.  The explicit ``n >= k`` guard
    matters: ``sequence(0, n-k)`` with ``n < k`` would descend."""
    n = F.size("_toks")
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "g")
    )


def dup_span_occurrences(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All REMOVED occurrences: (id, pos) of every duplicated gram except
    its global keep-first keeper.  The groupBy key and payload are the
    16-byte gram hash + two ints — never text."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    occ = _gram_occurrences(_with_tokens(df, text_col, id_col), id_col, k)
    agg = occ.groupBy("g").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct(F.col(id_col).alias("_kid"), F.col("pos").alias("_kpos"))).alias(
            "_keep"
        ),
    )
    return (
        occ.join(agg.filter(F.col("_cnt") > 1), "g")
        .filter(
            ~(
                (F.col(id_col) == F.col("_keep._kid"))
                & (F.col("pos") == F.col("_keep._kpos"))
            )
        )
        .select(id_col, "pos")
    )


def _covered_positions(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, sorted array of covered token positions) — one row per doc
    that actually contains a removed span (sparse, broadcast-sized
    relative to the corpus when duplication is sparse)."""
    removed = dup_span_occurrences(df, k=k, text_col=text_col, id_col=id_col)
    return (
        removed.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias(
                "_tpos"
            ),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_tpos")).alias("_cov"))
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc duplicated-span coverage: (id, n_tokens, covered_tokens,
    dup_coverage).  ``dup_coverage`` is the covered-token fraction
    rounded to 6 decimals (0.0 for empty docs) — the filter signal for
    'drop documents that are mostly recycled text'."""
    base = _with_tokens(df, text_col, id_col)
    cov = _covered_positions(df, k, text_col, id_col)
    n_tok = F.size("_toks")
    n_cov = F.size(F.coalesce(F.col("_cov"), F.array().cast("array<int>")))
    return (
        base.join(cov, id_col, "left")
        .select(
            id_col,
            n_tok.cast("long").alias("n_tokens"),
            n_cov.cast("long").alias("covered_tokens"),
            F.when(n_tok > 0, F.round(n_cov / n_tok, 6))
            .otherwise(F.lit(0.0))
            .alias("dup_coverage"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Rebuild each document from its uncovered tokens (space-joined;
    empty string when everything was covered).  The rebuild is a pure
    JVM higher-order filter over the token array against the doc's
    covered-position array — zero Python, and the text reaches this
    stage via the scan, not a shuffle (the covered-position aggregate is
    the small join side)."""
    base = _with_tokens(df, text_col, id_col)
    cov = _covered_positions(df, k, text_col, id_col)
    covered = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    clean = F.concat_ws(
        " ",
        F.filter("_toks", lambda x, i: ~F.array_contains(covered, i)),
    )
    return base.join(cov, id_col, "left").select(
        id_col, clean.alias(out_col)
    )


def dup_line_occurrences(
    df: DataFrame,
    min_words: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All REMOVED line occurrences for exact line-level corpus dedup
    (RefinedWeb / MassiveText style: a line recurring anywhere in the
    corpus — navigation chrome, templated status lines, license headers —
    keeps only its lexicographically-first (doc, line_no) occurrence).

    A line is ELIGIBLE when its trimmed text is non-empty and has >=
    ``min_words`` word tokens (raise it to protect common short lines like
    "yes"); the dedup key is ``md5(trim(line))`` so indentation variants
    of the same line match.  Returns (id, pos) of every eligible
    occurrence except each duplicated line's keeper; ``pos`` is the
    0-based line index within the doc's ``split(text, '\\n')``.

    Scale shape: the only corpus-sized shuffle is keyed by the 16-byte
    line md5 and carries (id, pos) ints — the document text never enters
    an exchange (same discipline as the word-k-gram family above)."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    lines = F.split(F.col(text_col), "\n")
    occ = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "_line")
    )
    line_toks = F.filter(
        F.split(F.trim(F.col("_line")), r"[^\w']+"), lambda x: x != ""
    )
    eligible = occ.filter(
        (F.trim(F.col("_line")) != "") & (F.size(line_toks) >= min_words)
    ).select(
        F.col(id_col),
        "pos",
        F.md5(F.trim(F.col("_line"))).alias("_k"),
    )
    agg = eligible.groupBy("_k").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(
            F.struct(F.col(id_col).alias("_kid"), F.col("pos").alias("_kpos"))
        ).alias("_keep"),
    )
    return (
        eligible.join(agg, "_k")
        .filter(
            (F.col("_cnt") >= 2)
            & ~(
                (F.col(id_col) == F.col("_keep._kid"))
                & (F.col("pos") == F.col("_keep._kpos"))
            )
        )
        .select(id_col, "pos")
    )


def dedup_lines(
    df: DataFrame,
    min_words: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Rebuild each document without its removed duplicate lines →
    (id, out_col, n_lines, n_lines_removed).  Complements
    ``corpus.transcripts_to_docs``'s boilerplate strip: that stage drops
    turns recurring across >= frac of CONVERSATIONS; this one catches any
    line duplicated even twice anywhere in the corpus.

    The rebuild is a pure JVM indexed filter of the doc's line array
    against its (sparse, left-joined) removed-position array — text
    reaches this stage via the scan, never a shuffle; only docs that
    actually lose a line appear on the join's build side.

    Skew note for 100 TB: keep-first needs every occurrence of a line to
    meet its keeper, so a line recurring across a large fraction of the
    corpus is a hot join key.  Run ``strip_common_lines`` (broadcast
    removal of frequency-common lines, no keeper) first — as
    ``q_doc_line_dedup``'s boilerplate-stripped input does — so the
    duplicates this op resolves are sub-threshold by construction."""
    removed = dup_line_occurrences(df, min_words, text_col, id_col)
    drops = removed.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_drops")
    )
    lines = F.split(F.col(text_col), "\n")
    dr = F.coalesce(F.col("_drops"), F.array().cast("array<int>"))
    clean = F.concat_ws(
        "\n", F.filter(lines, lambda x, i: ~F.array_contains(dr, i))
    )
    return df.join(drops, id_col, "left").select(
        F.col(id_col),
        clean.alias(out_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(dr).cast("long").alias("n_lines_removed"),
    )


def strip_common_lines(
    df: DataFrame,
    max_doc_frac: float = 0.1,
    min_docs: int = 2,
    min_words: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Boilerplate-line stripping: any eligible line occurring in >=
    ``max(min_docs, ceil(max_doc_frac * n_docs))`` DISTINCT documents is
    removed from EVERY document (no keeper) — the C4/RefinedWeb boilerplate
    rule (navigation chrome, cookie banners, license headers) at line
    granularity, and the skew-safe companion of ``dedup_lines``:

    * ``dedup_lines`` keeps one occurrence per duplicated line, which at
      100 TB makes a line recurring across a large fraction of the corpus
      a HOT join key (all its (id, pos) occurrences meet in one reducer).
      Run this op first: frequency-common lines are removed outright, and
      the residual duplicates dedup_lines sees are sub-threshold by
      construction.
    * the common-line set is bounded by construction (a line in >=
      frac*n docs means <= avg_lines_per_doc / frac distinct commons), so
      it BROADCASTS: occurrences never shuffle at all — the only
      corpus-sized movement is the per-doc drop-list aggregate, keyed by
      doc id (uniform).

    Output: (id, out_col, n_lines, n_lines_removed).  Eligibility and the
    ``md5(trim(line))`` key match ``dup_line_occurrences``; the doc-count
    threshold rides a broadcast 1-row aggregate (no driver-side count),
    the same discipline as ``corpus.transcripts_to_docs``."""
    if not (0.0 < max_doc_frac <= 1.0):
        raise ValueError(
            f"max_doc_frac must be in (0, 1], got {max_doc_frac}"
        )
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    lines = F.split(F.col(text_col), "\n")
    occ = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "_line")
    )
    line_toks = F.filter(
        F.split(F.trim(F.col("_line")), r"[^\w']+"), lambda x: x != ""
    )
    eligible = occ.filter(
        (F.trim(F.col("_line")) != "") & (F.size(line_toks) >= min_words)
    ).select(
        F.col(id_col), "pos", F.md5(F.trim(F.col("_line"))).alias("_k")
    )
    totals = df.agg(F.count(F.lit(1)).alias("_nd"))
    common = (
        eligible.groupBy("_k")
        .agg(F.count_distinct(F.col(id_col)).alias("_docs"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("_docs")
            >= F.greatest(
                F.lit(int(min_docs)),
                F.ceil(F.lit(float(max_doc_frac)) * F.col("_nd")),
            )
        )
        .select("_k")
    )
    drops = (
        eligible.join(F.broadcast(common), "_k")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_drops"))
    )
    all_lines = F.split(F.col(text_col), "\n")
    dr = F.coalesce(F.col("_drops"), F.array().cast("array<int>"))
    clean = F.concat_ws(
        "\n", F.filter(all_lines, lambda x, i: ~F.array_contains(dr, i))
    )
    return df.join(drops, id_col, "left").select(
        F.col(id_col),
        clean.alias(out_col),
        F.size(all_lines).cast("long").alias("n_lines"),
        F.size(dr).cast("long").alias("n_lines_removed"),
    )
