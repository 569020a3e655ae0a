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
* ``decontaminate`` — benchmark decontamination by word n-gram collision
  (the GPT-3 appendix C / Gopher §A1.2 hygiene step): distinct benchmark
  grams broadcast against the exploded corpus grams, per-doc hit counts +
  contaminated flag.
* ``decontaminate_bloom`` — the bounded-memory variant: benchmark grams
  fold into a Bloom set-bit table (≤ ``m_bits`` rows by construction, no
  matter how large the benchmark), no false negatives, deterministic
  false-positive set — for eval suites whose distinct grams outgrow a
  broadcast.
* ``transcripts_to_docs`` — the transcripts→corpus bridge: one training
  document per conversation (ordered ``role: text`` rendering) with
  boilerplate turns (exact text recurring across ≥ frac of conversations)
  stripped via a broadcast anti-join.

All math is JVM expressions (split/explode/groupBy/window/md5/conv) —
no Python per row anywhere; shuffles are keyed by doc id (narrow,
uniformly distributed), never all-pairs.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_from_tokens
from .textstats import tokens_col

__all__ = [
    "repetition_stats",
    "pack_shards",
    "global_token_offsets",
    "stratified_sample",
    "cap_per_group",
    "temperature_mix",
    "leakage_safe_split",
    "decontaminate",
    "decontaminate_bloom",
    "bloom_positions",
    "transcripts_to_docs",
    "corpus_report",
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


def _word_ngrams(text_col: str, n: int) -> F.Column:
    """All (non-distinct) space-joined word n-grams over non-empty tokens —
    delegates to the shared shingle builder (one copy of the degenerate-doc
    guard lives in dedup.shingles_from_tokens)."""
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    return shingles_from_tokens(toks, n, distinct=False)


def _word_2grams(text_col: str) -> F.Column:
    return _word_ngrams(text_col, 2)


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
    order_col: str | None = None,
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
    return (
        global_token_offsets(df, id_col, token_count_col, text_col, order_col)
        .withColumn("shard", F.floor(F.col("_goff") / F.lit(int(budget))))
        .select(id_col, "n_tokens", "pack_key", "shard")
    )


def global_token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """Exclusive global running token offsets in deterministic
    ``pack_key = md5(id)`` order → ``(id, n_tokens, pack_key, _goff)`` —
    the shared first phase of greedy shard packing (:func:`pack_shards`)
    and fixed-length sequence packing (``chunking.pack_sequences``): both
    need every document's position in ONE deterministic concatenated
    token stream.

    Scale shape (two-phase, mirroring ``windows_ops.stable_order``): a
    global ``Window.orderBy`` would funnel the corpus through ONE
    partition, so docs are bucketed by the key's first hex byte (256
    uniform buckets), the running sum runs per bucket (parallel, keyed
    window), and per-bucket offsets come from a 256-row cumulative window
    — the only single-partition stage, bounded at 256 rows for any corpus
    size.  The plan scans the input twice (per-doc cumsum branch +
    bucket-total branch); when tokenization is the expensive part, pass a
    pre-materialized ``token_count_col`` so the second scan re-reads a
    stored long instead of re-splitting text.

    ``order_col`` prepends a GROUPING dimension to the stream order —
    the order becomes ``(order_col, pack_key, id)``, so same-group
    documents are ADJACENT in the token stream (a language- or
    cluster-coherent pack: a fixed-length training sequence then rarely
    straddles two groups) while staying md5-shuffled within the group.
    Buckets become (order value, hex byte), so the bounded offset window
    grows to |groups| × 256 rows — still knob-bounded, never corpus-sized
    (keep ``order_col`` low-cardinality: lang, source, cluster id).
    """
    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else F.size(F.filter(tokens_col(text_col), lambda x: x != ""))
    )
    ocols = [order_col] if order_col else []
    keyed = df.select(
        *ocols,
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("pack_key"),
    ).withColumn("_bucket", F.substring("pack_key", 1, 2))
    bkeys = ocols + ["_bucket"]

    in_bucket = Window.partitionBy(*bkeys).orderBy("pack_key", id_col)
    with_local = keyed.withColumn(
        "_local_excl",
        F.coalesce(
            F.sum("n_tokens").over(in_bucket.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )

    bucket_tot = keyed.groupBy(*bkeys).agg(F.sum("n_tokens").alias("_btok"))
    # Pin null ordering explicitly: Spark's ASC default is NULLS FIRST
    # but an oracle engine's (DuckDB) is NULLS LAST — a NULL order_col
    # value must land in the same stream position in both engines.
    off_win = Window.orderBy(
        *[F.asc_nulls_first(k) for k in bkeys]
    ).rowsBetween(Window.unboundedPreceding, -1)
    # Right-side keys renamed _r_<k>: both frames share lineage, so
    # unqualified key references would resolve ambiguously (Spark warns
    # "trivially true predicate" and may pick the wrong side).
    offsets = bucket_tot.withColumn(
        "_offset", F.coalesce(F.sum("_btok").over(off_win), F.lit(0))
    ).select(
        *[F.col(k).alias(f"_r_{k}") for k in bkeys], "_offset"
    )

    # Null-SAFE attach: a plain equi-join on bkeys would silently DROP
    # every NULL-order_col row (NULL != NULL), not just misorder it.
    cond = None
    for k in bkeys:
        c = F.col(k).eqNullSafe(F.col(f"_r_{k}"))
        cond = c if cond is None else (cond & c)
    return (
        with_local.join(F.broadcast(offsets), cond)
        .withColumn("_goff", F.col("_local_excl") + F.col("_offset"))
        .select(id_col, "n_tokens", "pack_key", "_goff")
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination via word n-gram collision →
    ``(id, n_hit_grams, contaminated)``.

    The standard pretraining hygiene step (GPT-3 appendix C / Gopher §A1.2
    use 13-gram overlap on web text; ``n`` scales with document length):
    a training document is *contaminated* iff it shares at least
    ``min_hits`` distinct word n-grams with any document of the evaluation
    benchmark set.  ``n_hit_grams`` counts the distinct offending grams so
    callers can apply stricter thresholds post hoc.

    Scale shape: the benchmark side (small by construction — eval sets are
    KBs against a 100 TB corpus) reduces to DISTINCT grams and broadcasts;
    the corpus side is explode → broadcast-hash join → groupBy(id) — every
    shuffle keyed by the uniformly-distributed doc id, no all-pairs stage,
    and the corpus is scanned once.  Set ``broadcast_bench=False`` for a
    benchmark too large to broadcast (falls back to a gram-keyed shuffle
    join)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_grams = (
        bench.select(
            F.explode(F.array_distinct(_word_ngrams(bench_text_col or text_col, n))).alias(
                "gram"
            )
        )
        .distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(_word_ngrams(text_col, n))).alias("gram")
    )
    hits = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("n_hit_grams", F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hit_grams") >= F.lit(int(min_hits)))
    )


def bloom_positions(col: F.Column, m_bits: int, n_hashes: int) -> F.Column:
    """The DISTINCT Bloom bit positions of a value: for hash index i in
    [0, n_hashes), position_i = md5-u32("<i>:" || value) mod m_bits.  The
    md5-u32 draw is the repo's standard engine-portable uniform (see
    textstats' feature hashing); distinct because two hash indexes may
    collide on a position and membership is set-membership of bits."""
    if m_bits < 2 or n_hashes < 1:
        raise ValueError(f"need m_bits >= 2 and n_hashes >= 1, got {m_bits}/{n_hashes}")
    return F.array_distinct(
        F.array(
            *[
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), col)), 1, 8), 16, 10)
                .cast("long")
                % F.lit(int(m_bits))
                for i in range(n_hashes)
            ]
        )
    )


def bloom_bitmap(
    keys: DataFrame, col: str, m_bits: int, n_hashes: int
) -> DataFrame:
    """Fold a key column into an m_bits Bloom bitmap PACKED INTO
    ``m_bits/64`` longs, returned as ONE row ``(_bloom array<bigint>)`` —
    the broadcastable form a probe side tests with pure JVM bit
    arithmetic (no per-position explode, no equi-join on positions).
    Build cost: one narrow aggregate over the distinct positions; the
    driver collect is ≤ m_bits/64 rows — bounded by the KNOB, not data.
    Shared by ``decontaminate_bloom`` and ``joins.bloom_prefiltered_join``
    so the two bitmap layouts can never drift."""
    n_words = (int(m_bits) + 63) // 64
    set_words = (
        keys.select(
            F.explode(
                bloom_positions(F.col(col).cast("string"), m_bits, n_hashes)
            ).alias("_p")
        )
        .distinct()
        .groupBy((F.col("_p") / 64).cast("int").alias("_w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))")
            ).alias("_bits")
        )
        .collect()
    )
    bitmap = [0] * n_words
    for r in set_words:
        bitmap[r["_w"]] = r["_bits"]
    return keys.sparkSession.createDataFrame(
        [(bitmap,)], "_bloom array<bigint>"
    )


def bloom_all_set(value: F.Column, m_bits: int, n_hashes: int) -> F.Column:
    """TRUE iff every salted position of ``value`` is set in the packed
    ``_bloom`` bitmap column (which must be in scope — crossJoin the
    one-row frame from :func:`bloom_bitmap` first).  Positions are the
    same ``bloom_positions`` md5-u32 draw, so membership semantics are
    identical to the exploded set-bit probe, row for row."""
    from functools import reduce

    tests = []
    for i in range(n_hashes):
        pos = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), value)), 1, 8),
                16,
                10,
            ).cast("long")
            % F.lit(int(m_bits))
        )
        # call_function/F.get: the py wrappers for shiftleft/element_at
        # only take literal ints for the second argument
        word = F.get(F.col("_bloom"), (pos / 64).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, tests)


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Bloom-filter benchmark decontamination →
    ``(id, n_flagged_grams, contaminated)`` — the bounded-memory variant of
    :func:`decontaminate` for benchmark sets too large to broadcast as
    distinct grams.

    The benchmark's distinct word n-grams are folded into a Bloom bit set
    (``n_hashes`` md5-derived positions in ``[0, m_bits)``); a corpus gram
    is *flagged* iff ALL of its positions are set, and a document is
    contaminated iff >= ``min_hits`` distinct grams flag.  Classic Bloom
    semantics (Bloom 1970): NO false negatives — the flagged set is always
    a superset of :func:`decontaminate`'s exact hit set (unit-asserted) —
    and a deterministic false-positive set of rate roughly
    ``(1 - exp(-n_hashes * n_grams / m_bits)) ** n_hashes``, which is the
    right trade for a hygiene filter (over-dropping epsilon of clean docs
    is harmless; missing contamination is not).

    Scale shape: the broadcast side is the bit set PACKED INTO m_bits/64
    longs as ONE row (:func:`bloom_bitmap`) — bounded by ``m_bits`` BY
    CONSTRUCTION no matter how large the benchmark grows (a 128 MB bit
    budget checks ~10^9 grams at 4 hashes / ~2% FP) — where the exact
    operator's broadcast grows linearly with the benchmark's distinct
    grams.  Each corpus gram tests ALL its positions with JVM bit
    arithmetic inside one projection (:func:`bloom_all_set` — no
    per-position explode, no position join), so the only corpus-sized
    exchange is the per-doc flagged count, keyed by id alone; gram text
    never enters an exchange.  Everything is md5/conv/bit JVM
    expressions — deterministic given (m_bits, n_hashes), hence exactly
    mirrorable in a cross-engine oracle, and no per-row Python.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_grams = bench.select(
        F.explode(
            F.array_distinct(_word_ngrams(bench_text_col or text_col, n))
        ).alias("gram")
    ).distinct()
    # the bench bits ride as ONE packed-longs row (bloom_bitmap) and each
    # corpus gram tests all its positions with JVM bit arithmetic in the
    # SAME projection — no per-position explode, no position equi-join, no
    # per-gram md5 id: the only corpus-sized exchange left is the per-doc
    # count, keyed by id alone.  (The previous exploded-probe shape paid
    # n_hashes rows per gram THROUGH a hit-join and a (id, gram-md5)
    # regroup — at a loaded filter nearly every position hits, so that
    # shuffle approached n_hashes x |corpus grams| wide rows: measured
    # 27.0 s -> see BENCH/BASELINE.md session-17 notes at sf0.1.)
    bdf = bloom_bitmap(bench_grams, "gram", m_bits, n_hashes)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_word_ngrams(text_col, n))).alias("gram"),
    )
    flagged = (
        doc_grams.crossJoin(F.broadcast(bdf))
        .filter(bloom_all_set(F.col("gram"), m_bits, n_hashes))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_flagged_grams"))
    )
    return (
        docs.select(id_col)
        .join(flagged, id_col, "left")
        .withColumn(
            "n_flagged_grams",
            F.coalesce(F.col("n_flagged_grams"), F.lit(0)).cast("long"),
        )
        .withColumn("contaminated", F.col("n_flagged_grams") >= F.lit(int(min_hits)))
    )


def transcripts_to_docs(
    turns: DataFrame,
    boilerplate_conv_frac: float = 0.1,
    min_convs: int = 2,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Assemble one training document per conversation from ordered turns,
    stripping boilerplate turns → ``(conv_id, text, n_turns, n_turns_kept)``.

    The transcripts→corpus bridge of an LLM-data pipeline: templated turns
    (headers, health checks, canned status lines — anything whose exact text
    recurs across ``max(min_convs, ceil(boilerplate_conv_frac × n_convs))``
    DISTINCT conversations) carry no training signal and are dropped; the
    surviving turns render as ``role: text`` lines joined by ``sep`` in
    ``order_col`` order.  A conversation whose every turn is boilerplate
    still emits a row (empty text, ``n_turns_kept = 0``) so downstream
    accounting sees the full corpus.

    Scale shape: the boilerplate set is bounded by construction (a text in
    ≥ frac·n_convs conversations ⇒ at most avg_turns/frac distinct such
    texts), so it broadcasts and the corpus-side anti-join never shuffles
    the fact table; the threshold itself rides a broadcast 1-row aggregate
    (no driver-side count()).  Assembly is one conv-keyed groupBy — narrow,
    uniformly distributed — with per-conv in-memory sort of that conv's
    turns only (no global window)."""
    if not (0.0 < boilerplate_conv_frac <= 1.0):
        raise ValueError(
            f"boilerplate_conv_frac must be in (0, 1], got {boilerplate_conv_frac}"
        )
    # NULL turn text normalizes to '' up front: otherwise it threads two
    # different null semantics through the op (anti-join never matches
    # NULL so the turn survives stripping, then concat_ws silently skips
    # the null arg rendering a bare role) while a SQL recompute's
    # NOT IN / '||' drop the turn entirely — a divergence the round-5 sf1
    # pass hit on a corpus with ~1% null text.
    turns = turns.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    totals = turns.agg(F.countDistinct(conv_col).alias("_nc"))
    bp = (
        turns.groupBy(text_col)
        .agg(F.countDistinct(conv_col).alias("_nd"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("_nd")
            >= F.greatest(
                F.lit(int(min_convs)),
                F.ceil(F.lit(float(boilerplate_conv_frac)) * F.col("_nc")),
            )
        )
        .select(F.col(text_col).alias("_bp_text"))
    )
    kept = turns.join(
        F.broadcast(bp), turns[text_col] == bp["_bp_text"], "left_anti"
    )
    asm = kept.groupBy(conv_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col), F.col(role_col), F.col(text_col)))
                ),
                lambda s: F.concat_ws(": ", s[role_col], s[text_col]),
            ),
            sep,
        ).alias("_text"),
        F.count("*").alias("_kept"),
    )
    per_conv = turns.groupBy(conv_col).agg(F.count("*").alias("n_turns"))
    return (
        per_conv.join(asm, conv_col, "left")
        .select(
            conv_col,
            F.coalesce(F.col("_text"), F.lit("")).alias("text"),
            "n_turns",
            F.coalesce(F.col("_kept"), F.lit(0)).cast("long").alias("n_turns_kept"),
        )
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


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, deterministically — the
    CommonCrawl-style per-host / per-source quota (cap the dominant
    domain so no single crawl seed swamps the mixture) that rate-based
    :func:`stratified_sample` can't express (a rate halves a group; a cap
    bounds it regardless of size).

    Which rows survive an over-cap group is a deterministic uniform draw:
    rank by ``(md5(id), id)`` within the group and keep rank <= cap — the
    same engine-portable md5 ordering the sampler thresholds on, so the
    kept set is reproducible anywhere and independent of physical row
    order.

    Scale shape: the decision runs entirely over the narrow ``(id,
    group)`` projection — document text NEVER enters the rank shuffle.  A
    first map-side-combinable count finds the over-cap groups (a tiny
    frame — broadcast); under-cap groups pass through via a broadcast
    anti-join with NO window at all (at 100 TB almost every host is
    under-cap, so almost no row pays the rank); only over-cap groups'
    (id, group) rows enter the rank window, and its shuffle carries
    ~40 B/row.  Survivor ids re-attach to the full rows by id equi-join
    (the dedup re-attach pattern).  A pathological single-host corpus
    still ranks that host on one partition — the inherent cost of an
    exact global rank; cap audits at that scale should pre-shard by a
    salted approximate pass first.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    keys = df.select(id_col, group_col)
    over = F.broadcast(
        keys.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > F.lit(int(cap)))
        .select(group_col)
    )
    under_ids = keys.join(over, group_col, "left_anti").select(id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    over_ids = (
        keys.join(over, group_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(int(cap)))
        .select(id_col)
    )
    return df.join(under_ids.unionByName(over_ids), id_col)


def budget_mix(
    df: DataFrame,
    weights: Mapping[str, float],
    budget_tokens: int,
    mix_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
) -> DataFrame:
    """Token-budget mixture planner: select documents totalling (up to)
    ``budget_tokens`` whose per-group token mass follows ``weights`` —
    with WATERFILLING when a group can't supply its share (the surplus
    redistributes over the remaining groups by weight, the rule every
    "60% web / 30% code / 10% books but code ran out" mix needs).  Groups
    absent from ``weights`` get weight 0 (excluded).

    The cut is the closed-form waterfilling scan, all-integer so a DuckDB
    oracle replays it bit-for-bit: groups sort ascending by the integer
    fill ratio ``(avail·1e6) div w_micro`` (ties: avail, group); walking
    that order with two prefix sums, a group is CAPPED (takes all its
    tokens) iff ``avail·W_from ≤ w·(B − prefix_avail_before)`` (W_from =
    weights from this group onward — the pool its share divides over) —
    cross-multiplied, no division; uncapped groups get ``target =
    (w·B_final) div W_final`` of the post-cap budget.  Flooring may leave
    up to |groups| tokens of budget unused — deterministic by design.

    Selection within a group is the deterministic token-prefix rule: docs
    ordered by (md5(id), id), a doc is kept iff its EXCLUSIVE in-group
    running token sum is < target — so the kept mass overshoots the
    target by at most one document (greedy prefix, same decorrelating
    order as shard packing).

    Scale shape: per-group avail is one map-side-combinable aggregate;
    the waterfilling windows run over the |groups|-row stats table (the
    bounded-single-partition class of pack's 256-row offset window);
    targets broadcast back; the in-group cumsum is a keyed window (no
    global funnel).  Output: selected ``(id, group, n_tokens)``."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    w_rows = [(k, int(round(w * 1_000_000))) for k, w in weights.items()]
    wdf = df.sparkSession.createDataFrame(
        w_rows, "group string, w_micro long"
    ).filter(F.col("w_micro") > 0)

    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else F.size(F.filter(tokens_col(text_col), lambda x: x != ""))
    )
    toks = df.select(
        F.col(id_col),
        F.col(mix_col).alias("group"),
        n_tok.cast("long").alias("n_tokens"),
    )
    avail = toks.groupBy("group").agg(F.sum("n_tokens").alias("avail"))
    g = avail.join(wdf, "group")  # inner: unweighted groups excluded

    B = F.lit(int(budget_tokens)).cast("decimal(18,0)")
    quot = F.expr("CAST((avail * 1000000) DIV w_micro AS BIGINT)")
    order = [F.col("_quot"), F.col("avail"), F.col("group")]
    win = Window.orderBy(*order)
    stats = (
        g.withColumn("_quot", quot)
        .withColumn(
            "_pre_avail",
            F.coalesce(
                F.sum("avail").over(win.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("decimal(18,0)"),
        )
        .withColumn(
            # the uncapped pool at my position INCLUDES me: my share of
            # the residual budget is w·(B − pre_avail) / (w + W_strictly_after)
            "_w_from",
            F.coalesce(
                F.sum("w_micro").over(
                    win.rowsBetween(Window.currentRow, Window.unboundedFollowing)
                ),
                F.lit(0),
            ).cast("decimal(18,0)"),
        )
        .withColumn(
            "_capped",
            F.col("avail").cast("decimal(18,0)") * F.col("_w_from")
            <= F.col("w_micro").cast("decimal(18,0)")
            * (B - F.col("_pre_avail")),
        )
    )
    totals = stats.agg(
        F.coalesce(
            F.sum(F.when(F.col("_capped"), F.col("avail"))), F.lit(0)
        ).cast("decimal(18,0)").alias("_capped_avail"),
        F.coalesce(
            F.sum(F.when(~F.col("_capped"), F.col("w_micro"))), F.lit(0)
        ).cast("decimal(18,0)").alias("_w_final"),
    )
    targets = stats.crossJoin(F.broadcast(totals)).select(
        "group",
        F.when(F.col("_capped"), F.col("avail").cast("decimal(18,0)"))
        .otherwise(
            F.expr(
                "CAST((w_micro * (CAST({b} AS DECIMAL(18,0)) - _capped_avail))"
                " DIV _w_final AS DECIMAL(38,0))".format(b=int(budget_tokens))
            )
        )
        .cast("long")
        .alias("_target"),
    )

    in_group = Window.partitionBy("group").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum = toks.withColumn(
        "_excl",
        F.coalesce(
            F.sum("n_tokens").over(
                in_group.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return (
        cum.join(F.broadcast(targets), "group")
        .filter(F.col("_excl") < F.col("_target"))
        .select(id_col, F.col("group").alias(mix_col), "n_tokens")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str = "source",
    temperature: float = 2.0,
    target_fraction: float = 0.5,
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-flattened source mixing — the standard pretraining-mix
    reweighting (T5 §3.4.3 / Gopher §A2 style): a source's mixture share
    goes from its natural share ``n_s / N`` to ``n_s^(1/T) / Σ n_t^(1/T)``,
    so ``T > 1`` upweights small sources and downweights dominant ones.

    The realized keep rate per source is
    ``rate_s = min(1, target_fraction · N · share_s / n_s)`` and each
    row's draw is the same engine-portable md5-u16 uniform as
    ``stratified_sample`` — so the whole op is ONE map-side-combinable
    count aggregate (rows out = #sources), a broadcast join of the tiny
    rate table back onto the corpus, and a pure filter.  No corpus-sized
    shuffle anywhere; at 100 TB the per-source counts are the only thing
    that moves.

    ``weight_col`` switches the mass measure from row counts to e.g. a
    precomputed ``n_tokens`` column (mixing by tokens, the usual unit).

    Cross-engine exactness: ``pow`` is IEEE-double in both engines; the
    rate is rounded to 6 decimals before the integer threshold
    (``floor(round6(rate)·65536)``), so a last-ulp ``pow`` divergence
    would need the rate on a 5e-7 boundary — measure-zero, the same
    accepted risk as the md5-seed centroid rounding.

    Spiritual reference: the reference pipeline has no mixing stage (it is
    single-source); this is part of the LLM-training-data surface the
    engine adds (SURVEY §6).
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not (0.0 < target_fraction <= 1.0):
        raise ValueError(
            f"target_fraction must be in (0,1], got {target_fraction}"
        )
    alpha = 1.0 / float(temperature)
    mass = (
        F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    ).cast("double")
    stats = df.groupBy(strata_col).agg(mass.alias("_mass"))
    tot = stats.agg(
        F.sum("_mass").alias("_tot_mass"),
        F.sum(F.pow(F.col("_mass"), F.lit(alpha))).alias("_denom"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_fraction))
        * F.col("_tot_mass")
        * F.pow(F.col("_mass"), F.lit(alpha))
        / F.col("_denom")
        / F.col("_mass"),
    )
    thr = F.floor(F.round(rate, 6) * F.lit(65536.0)).cast("long")
    rates = stats.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col).alias("_stratum"), thr.alias("_thr")
    )
    u16 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        df.join(F.broadcast(rates), df[strata_col] == F.col("_stratum"), "inner")
        .filter(u16 < F.col("_thr"))
        .drop("_stratum", "_thr")
    )


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    eval_fraction: float = 0.1,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Contamination-free train/eval split: assign whole NEAR-DUP GROUPS to
    a split atomically, so no near-duplicate pair ever straddles the
    boundary (a doc-level random split leaks — the eval twin of a training
    doc inflates every downstream metric; see the GPT-3 appendix-C
    contamination analysis and Lee et al. 2021 §6.2, which measured the
    same leak from duplicated spans).

    ``groups`` is (id, rep_id) from ``dedup.neardup_groups`` over ANY pair
    family (MinHash, SimHash, n-gram Jaccard, embedding-cosine, SemDeDup) —
    the split composes with whichever notion of "duplicate" the pipeline
    trusts.  The split draw is the group REPRESENTATIVE's md5-u16 (the same
    engine-portable uniform as ``stratified_sample``) DOMAIN-SEPARATED with
    a ``'split:'`` purpose prefix: sampling stages draw on ``md5(id)``, so
    an unprefixed ``md5(rep_id)`` would be CORRELATED with them — a corpus
    already filtered to low-u16 ids would see eval fractions far above the
    requested one (observed: 35% at requested 25% after temperature
    mixing).  Every member inherits its group's draw:
    ``u16('split:' || rep) < round(eval_fraction * 65536)`` => eval.

    Scale shape: one (id, rep_id) equi-join onto the corpus (ids only — the
    group table never carries text) and a pure projection.  Deterministic:
    re-running on the same corpus reproduces the same split, and an
    incrementally grown corpus keeps old members' splits stable as long as
    their group representative is unchanged (keep-first reps are stable
    under appends with higher ids)."""
    if not (0.0 <= float(eval_fraction) <= 1.0):
        raise ValueError(
            f"eval_fraction must be in [0,1], got {eval_fraction}"
        )
    thr = int(round(float(eval_fraction) * 65536.0))
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("rep_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    split = F.when(u16 < thr, F.lit("eval")).otherwise(F.lit("train"))
    g = groups.select(F.col("id").alias(id_col), "rep_id")
    return df.join(g, id_col).withColumn(split_col, split)


def corpus_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
    gopher_min_stopwords: int = 2,
) -> DataFrame:
    """One-pass corpus audit report — the table a data operator reads
    before committing a training run: per group (default source × lang),
    document and token totals, length extrema, and how many docs each
    scan-fused gate (Gopher rules at paper defaults, PII presence)
    would flag.

    All per-doc features (token counts, rule booleans, PII counts) are
    pure projections that fuse into the scan; the report itself is ONE
    map-side-combinable aggregate whose output is |source|x|lang| rows —
    at 100 TB this is a single pass over the corpus producing a
    driver-sized table, with no second job per statistic.

    Integer-only aggregate payload (counts, sums, min/max) — bit-exact
    cross-engine; deliberately no medians/quantiles, which are not
    exactly recomputable across engines without a sort."""
    from .textstats import gopher_rules, scrub_pii, tokens_col as _tc

    feats = scrub_pii(
        gopher_rules(df, min_stopwords=gopher_min_stopwords),
        text_col=text_col,
    )
    n_tok = F.size(F.filter(_tc(text_col), lambda x: x != "")).cast("long")
    has_pii = (
        (F.col("n_emails") + F.col("n_ips") + F.col("n_nums")) > 0
    ).cast("int")
    return (
        feats.withColumn("_nt", n_tok)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum(F.length(F.col(text_col)).cast("long")).alias("n_chars"),
            F.min("_nt").alias("min_tokens"),
            F.max("_nt").alias("max_tokens"),
            F.sum(F.col("keep_gopher").cast("int")).cast("long").alias(
                "n_gopher_keep"
            ),
            F.sum(has_pii).cast("long").alias("n_docs_with_pii"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Corpus version diff: classify every id present in either snapshot as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit step
    between two curation runs (what did yesterday's re-crawl actually
    change?) and the input to incremental re-processing (only ``added`` +
    ``changed`` need re-deduping against state).

    Scale shape: each side is first projected to ``(id, md5(fingerprint))``
    — 16 bytes per row — so the full-outer join co-partitions two NARROW
    tables on the id; document text never enters the exchange.  The
    fingerprint concatenates the compare columns with an unambiguous
    field separator and a per-field null marker, so (NULL, 'a') can never
    collide with ('a', NULL) and a value containing the separator cannot
    forge a boundary (md5 of the length-prefixed field join).
    """
    def fp(df: DataFrame) -> DataFrame:
        parts = []
        for c in compare_cols:
            s = F.col(c).cast("string")
            # length-prefix each field; NULL gets a marker no value has
            parts.append(
                F.when(s.isNull(), F.lit("\x00N")).otherwise(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        return df.select(
            F.col(id_col), F.md5(F.concat_ws("\x1e", *parts)).alias("_fp")
        )

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(id_col), status.alias("status"))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    domain: str = "ws:",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-Res): each row draws ``key = u^(1/w)`` from its
    domain-separated md5-u16 uniform and the k largest keys win — inclusion
    probability proportional to weight, exactly the sample a
    token-weighted / quality-weighted corpus draw needs where a RATE
    (stratified_sample) can't express per-row weights.

    Cross-engine exactness: u = (u16 + 0.5) / 65536 (never 0, so pow is
    finite), key rounded to 1e-6, ties broken by id — pow/round are
    IEEE-double in both engines, the same discipline as the Pareto gate.
    Selection is ``orderBy(key desc, id).limit(k)``, which Spark executes
    as TakeOrderedAndProject: per-partition top-k + a k-row driver merge,
    never a global sort.  Non-positive weights raise (their key would be
    pow to a negative exponent — ill-defined sampling, not a silent drop).
    """
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(domain), F.col(id_col).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    u = (u16.cast("double") + F.lit(0.5)) / F.lit(65536.0)
    w = F.col(weight_col).cast("double")
    bad = df.filter(w.isNull() | (w <= 0)).limit(1).count()
    if bad:
        raise ValueError(
            f"weighted_sample requires positive weights in {weight_col!r}"
        )
    key = F.round(F.pow(u, F.lit(1.0) / w), 6)
    return (
        df.withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_wkey")
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    id_col: str = "doc_id",
    out: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each row goes
    to the shard maximizing ``md5(shard || ':' || id)`` — the consistent
    placement a GROWING corpus store needs: adding a shard moves only
    ~1/(n+1) of rows (those whose new shard now wins), while the mod-N
    assignment a naive ``hash(id) % n`` gives reshuffles ~(n-1)/n of the
    corpus on every resize.  Weights are content-independent (id only), so
    placement is reproducible in any engine and stable across re-ingests.

    Scale shape: pure per-row projection — n_shards md5 evaluations folded
    by ``array_max`` over (hash, shard) structs, zero shuffles, zero Python
    (the shard list is a literal; it is a CLUSTER topology, bounded by
    construction).  The struct max compares (hash, shard) lexicographically
    — on the measure-zero md5 collision the larger shard name wins, still
    deterministic.
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("shard names must be distinct")
    sid = F.col(id_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.md5(F.concat(F.lit(s + ":"), sid)).alias("h"),
                F.lit(s).alias("s"),
            )
            for s in sorted(shards)
        ]
    )
    return df.withColumn(out, F.array_max(pairs)["s"])
