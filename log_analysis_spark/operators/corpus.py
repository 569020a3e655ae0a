"""Corpus-level training-data operators: repetition/quality filtering,
token-budget shard packing, and stratified sampling.

These are the pieces a pretraining-data pipeline runs between dedup and
training-shard materialization:

* ``repetition_stats`` — Gopher-style repetition signals (duplicate-line
  fraction, duplicate-line *character* fraction, most-frequent-2-gram
  character fraction) plus a keep/reject flag.  Rae et al., "Scaling
  Language Models: Methods, Analysis & Insights from Training Gopher"
  (arXiv:2112.11446, §A1.1) motivates the signal family; the exact
  definitions here are this engine's own (documented per column) so they
  can be mirrored verbatim in a cross-engine SQL oracle.
* ``pack_shards`` — deterministic token-budget packing: order the corpus
  by a content-independent hash key (md5 of the id — a deterministic
  global shuffle), run an exclusive running token sum, and cut shards
  every ``budget`` tokens.  Two-phase (per-bucket cumsum + bucket offsets)
  so no stage ever sees more than a 256-row single-partition window —
  the same pattern as ``windows_ops.stable_order`` (W4).
* ``stratified_sample`` — per-stratum deterministic downsampling: keep a
  row iff ``md5(id)``'s leading 16 bits, as a uniform draw in [0, 1),
  fall under the stratum's rate.  Reproducible across engines and runs
  (no RNG state), the standard way to re-weight a 100 TB mixture without
  a shuffle: it is a pure filter.

All math is JVM expressions (split/explode/groupBy/window/md5/conv) —
no Python per row anywhere; shuffles are keyed by doc id (narrow,
uniformly distributed), never all-pairs.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col

__all__ = [
    "repetition_stats",
    "pack_shards",
    "stratified_sample",
    "DEFAULT_REPETITION_THRESHOLDS",
]

# keep a document unless any repetition signal exceeds its threshold
# (same spirit as Gopher's §A1.1 table; values chosen for this corpus)
DEFAULT_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.30,
    "top_2gram_char_frac": 0.20,
}


def _nonempty_lines(text_col: str) -> F.Column:
    """Trimmed, non-empty lines of the text ('\\n'-split)."""
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _word_2grams(text_col: str) -> F.Column:
    """All (non-distinct) space-joined word 2-grams over non-empty tokens."""
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    n = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i.cast("int")), F.element_at(toks, (i + 1).cast("int"))
        ),
    )
    # sequence(1, 0) DESCENDS and ANSI element_at throws out-of-bounds, so
    # degenerate docs (< 2 tokens) must short-circuit to an empty array
    return F.when(n > 0, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: Mapping[str, float] = DEFAULT_REPETITION_THRESHOLDS,
) -> DataFrame:
    """Per-document repetition signals + keep flag.

    Columns (all fractions in [0, 1], 0.0 for empty/degenerate docs):

    * ``n_lines`` — count of trimmed non-empty '\\n'-lines.
    * ``dup_line_frac`` — ``1 − distinct_lines / n_lines``: the fraction of
      line *occurrences* that are repeats of an earlier line.
    * ``dup_line_char_frac`` — characters inside lines that occur more than
      once (ALL their occurrences), over total line characters.
    * ``top_2gram`` / ``top_2gram_char_frac`` — the most frequent word
      2-gram (ties → lexicographically smallest) and the fraction of the
      document's characters its occurrences cover
      (``count × len(gram) / len(text)``).
    * ``keep_repetition`` — true iff every signal is ≤ its threshold.

    Execution shape: two explode→groupBy(doc, key)→groupBy(doc) trees
    (lines, 2-grams) joined back on the doc id — every shuffle is keyed by
    (doc_id[, line|gram]), uniformly distributed, so the op partitions
    cleanly at any corpus size; no per-row Python, no all-pairs stage.
    """
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_n_chars"),
        _nonempty_lines(text_col).alias("_lines"),
        _word_2grams(text_col).alias("_grams"),
    )

    # --- line-level: explode → per-(doc, line) counts → per-doc stats
    per_line = (
        base.select(id_col, F.explode("_lines").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"))
        .withColumn("chars", F.length("line"))
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("cnt") * F.col("chars")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.col("chars")).otherwise(0)).alias(
            "dup_line_chars"
        ),
    )

    # --- 2-gram level: top gram by (count desc, gram asc) via min-struct
    per_gram = (
        base.select(id_col, F.explode("_grams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    gram_stats = per_gram.groupBy(id_col).agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram"))).alias("top")
    )

    out = (
        base.select(id_col, "_n_chars")
        .join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
    )
    n_lines = F.coalesce(F.col("n_lines"), F.lit(0))
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.col("n_distinct_lines").cast("double") / F.col("n_lines"),
    ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        F.coalesce(F.col("line_chars"), F.lit(0)) > 0,
        F.col("dup_line_chars").cast("double") / F.col("line_chars"),
    ).otherwise(F.lit(0.0))
    top_gram = F.col("top.gram")
    top_frac = F.when(
        top_gram.isNotNull() & (F.col("_n_chars") > 0),
        (-F.col("top.neg")).cast("double") * F.length(top_gram) / F.col("_n_chars"),
    ).otherwise(F.lit(0.0))

    out = (
        out.withColumn("n_lines", n_lines)
        .withColumn("dup_line_frac", dup_line_frac)
        .withColumn("dup_line_char_frac", dup_char_frac)
        .withColumn("top_2gram", top_gram)
        .withColumn("top_2gram_char_frac", top_frac)
    )
    keep = (
        (F.col("dup_line_frac") <= float(thresholds["dup_line_frac"]))
        & (F.col("dup_line_char_frac") <= float(thresholds["dup_line_char_frac"]))
        & (F.col("top_2gram_char_frac") <= float(thresholds["top_2gram_char_frac"]))
    )
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_2gram",
        "top_2gram_char_frac",
        keep.alias("keep_repetition"),
    )


def pack_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-budget packing → (id, n_tokens, pack_key, shard).

    Order the corpus by ``pack_key = md5(id)`` (a content-independent
    deterministic global shuffle — the standard trick for decorrelating
    adjacent source documents before sequence packing), compute each doc's
    EXCLUSIVE running token sum ``c`` in that order, and assign
    ``shard = floor(c / budget)``: greedy sequential packing where a shard
    closes once its running total reaches the budget.

    Scale shape (two-phase, mirroring ``windows_ops.stable_order``):
    a global ``Window.orderBy`` would funnel the corpus through ONE
    partition, so instead docs are bucketed by the key's first hex byte
    (256 uniform buckets), the running sum runs per bucket (parallel,
    keyed window), and per-bucket offsets come from a 256-row cumulative
    window — the only single-partition stage, bounded at 256 rows for any
    corpus size.

    The plan scans the input twice (per-doc cumsum branch + bucket-total
    branch); when tokenization is the expensive part, pass a
    pre-materialized ``token_count_col`` so the second scan re-reads a
    stored long instead of re-splitting text.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else F.size(F.filter(tokens_col(text_col), lambda x: x != ""))
    )
    keyed = df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("pack_key"),
    ).withColumn("_bucket", F.substring("pack_key", 1, 2))

    in_bucket = Window.partitionBy("_bucket").orderBy("pack_key", id_col)
    with_local = keyed.withColumn(
        "_local_excl",
        F.coalesce(
            F.sum("n_tokens").over(in_bucket.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )

    bucket_tot = keyed.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
    off_win = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.withColumn(
        "_offset", F.coalesce(F.sum("_btok").over(off_win), F.lit(0))
    ).select("_bucket", "_offset")

    return (
        with_local.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "shard",
            F.floor((F.col("_local_excl") + F.col("_offset")) / F.lit(int(budget))),
        )
        .select(id_col, "n_tokens", "pack_key", "shard")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling — a pure filter, no shuffle.

    A row's uniform draw is ``u = int(md5(id)[:4 hex], 16) / 65536`` —
    16 independent leading bits of the id's md5, reproducible in any
    engine; the row survives iff ``u < rate(stratum)``.  Granularity is
    1/65536 ≈ 0.000015, so requested rates are honored to ~0.002 %.

    This is how a 100 TB mixture gets re-weighted (e.g. downsample the
    dominant language) without materializing anything: the predicate sits
    in the scan and composes with partition pruning.  Rates outside
    [0, 1] raise.
    """
    for k, v in list(rates.items()) + [("default", default_rate)]:
        if not (0.0 <= float(v) <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    u16 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    # integer threshold comparison (u16 < rate*65536) — no float equality
    return df.filter(u16 < F.round(rate * F.lit(65536.0)).cast("long"))
