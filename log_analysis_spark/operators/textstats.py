"""Text-analysis operators over the ``documents`` table — the pieces a
large-scale training-data pipeline needs: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All hot-path math is JVM-side (split / size / transform / xxhash64 inside
WholeStageCodegen) — no Python per row anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "de", "et"],
    "zh": ["的", "了", "是", "在"],
}


def tokens_col(text_col: str = "text") -> F.Column:
    """Whitespace tokenization with a BPE-ish fallback: split on runs of
    non-word characters so punctuation-glued tokens still separate."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"[^\w']+")
    )


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens_col(text_col)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-score features: length, mean token length, punctuation ratio,
    stopword ratio, and a composite [0,1] score."""
    t = F.col(text_col)
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_char = F.length(t)
    punct = n_char - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_list, F.lower(x))))
    out = (
        df.withColumn("n_chars_calc", n_char)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_token_len",
            F.when(n_tok > 0, (n_char - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_char > 0, punct.cast("double") / n_char).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0)),
        )
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", score)


def with_lang_pred(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: most stopword hits wins; ties break by a fixed
    language priority (deterministic)."""
    toks = F.transform(tokens_col(text_col), lambda x: F.lower(x))
    scores = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(wl, x))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct orders by first field (hits) then lang string
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    )


# PII scrub patterns — deliberately restricted to syntax that Java regex
# (Spark) and RE2 (DuckDB) interpret identically (no lookaround, no
# backrefs), so the op has an exact cross-engine oracle.  Order matters and
# is part of the op's contract: emails first (their local parts may contain
# digit runs), then IPv4s, then long digit runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("num", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, long digit runs) and count them.

    Adds ``n_emails`` / ``n_ips`` / ``n_nums`` (match counts over the
    ORIGINAL text — overlapping classes may both count, e.g. an all-digit
    email local part) and ``out_col`` = the text with each pattern replaced
    by its token, applied in ``PII_PATTERNS`` order on the progressively
    cleaned string.

    Scale shape: a pure projection — ``regexp_count``/``regexp_replace``
    JVM expressions inside WholeStageCodegen, zero Python, zero shuffle; at
    100 TB this fuses into the scan like any other filter/projection."""
    counts = {
        f"n_{name}s": F.regexp_count(F.col(text_col), F.lit(pat)).cast("int")
        for name, pat, _tok in PII_PATTERNS
    }
    cleaned = F.col(text_col)
    for _name, pat, tok in PII_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, tok)
    out = df
    for c, e in counts.items():
        out = out.withColumn(c, e)
    return out.withColumn(out_col, cleaned)


def with_fingerprint(df: DataFrame, text_col: str = "text", k: int = 16) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): xxhash64 over
    every k-char window, fingerprint = min window hash; plus a full-text
    md5.  All JVM expressions (sequence/transform/substring/xxhash64)."""
    t = F.col(text_col)
    n_win = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    win_hashes = F.transform(
        F.sequence(F.lit(1), n_win), lambda i: F.xxhash64(F.substring(t, i, k))
    )
    return df.withColumn("fingerprint", F.array_min(win_hashes)).withColumn(
        "md5_full", F.md5(t)
    )


def with_fingerprint_md5(df: DataFrame, text_col: str = "text", k: int = 16) -> DataFrame:
    """Engine-portable twin of ``with_fingerprint``: same winnowing-lite
    structure (min over every k-char window's hash, lexicographic min of the
    hex digests) but with md5 as the window hash, which DuckDB can compute
    verbatim — giving the rolling-hash semantics an EXACT cross-engine
    oracle.  xxhash64 stays the production fingerprint (≈20× cheaper);
    this variant exists so the fingerprint op itself is oracle-provable."""
    t = F.col(text_col)
    n_win = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    win_hashes = F.transform(
        F.sequence(F.lit(1), n_win), lambda i: F.md5(F.substring(t, i, k))
    )
    return df.withColumn("fingerprint_md5", F.array_min(win_hashes))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    hash_impl: str = "xxhash64",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full winnowing (Schleimer et al. 2003, SIGMOD): hash every k-char
    gram, slide a window of ``w`` gram hashes, select each window's MINIMUM
    hash taking the RIGHTMOST occurrence on ties, and emit the distinct
    selected (pos, gram_hash) pairs — the document's fingerprint sketch.
    The winnowing guarantee: any substring shared between two documents of
    length >= w + k - 1 chars produces at least one shared fingerprint, at
    ~2/(w+1) expected density (vs the single-min ``with_fingerprint``,
    which only catches whole-document near-identity).

    ``hash_impl='xxhash64'`` is production (long hashes, min = numeric);
    ``'md5'`` is the engine-portable twin (hex strings, min = lexicographic
    — identical rule in DuckDB) used by the exact contract oracle.

    Scale shape: pure projection + explode — sequence/transform/slice/
    array_min/array_position are all JVM expressions; no Python, no
    shuffle, text never leaves the scan.  Per-doc work is O(grams * w);
    docs shorter than k chars emit nothing.  The rightmost-min is found by
    position of the min in the REVERSED window (first match there = last
    match forward), so ties need no second pass.

    O(grams * w) is guaranteed by explicit LET-BINDINGS
    (``transform(array(x), v -> body)[1]``): a Catalyst higher-order
    lambda re-evaluates any closed-over subtree once PER ELEMENT, so
    referencing the gram-hash array expression directly inside the
    per-window lambda would recompute every gram hash for every window —
    O(grams^2) hashing that turned a seconds-long scan into a 40-minute
    single task at sf0.1 before the binding was introduced.  The let
    materializes the gram array, each window slice, and each window min
    exactly once as lambda variables."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    if hash_impl not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_impl: {hash_impl!r}")

    def let(value, body):
        # evaluate `value` once, expose it to `body` as a lambda variable
        return F.element_at(F.transform(F.array(value), body), 1)

    t = F.col(text_col)
    hfn = F.xxhash64 if hash_impl == "xxhash64" else F.md5
    m = F.length(t) - F.lit(k - 1)  # gram count
    h = F.transform(
        F.sequence(F.lit(1), m), lambda i: hfn(F.substring(t, i, k))
    )
    n_win = F.greatest(m - F.lit(w - 1), F.lit(1))

    def pick(hv, i):
        # slice clamps to the array end when m < i+w-1
        return let(
            F.slice(hv, i, w),
            lambda s: let(
                F.array_min(s),
                lambda mn: F.struct(
                    (
                        i + (F.size(s) + 1 - F.array_position(F.reverse(s), mn)) - 1
                    ).cast("long").alias("pos"),
                    mn.alias("gram_hash"),
                ),
            ),
        )

    sel = let(
        h,
        lambda hv: F.array_distinct(
            F.transform(F.sequence(F.lit(1), n_win), lambda i: pick(hv, i))
        ),
    )
    return (
        df.filter(F.length(t) >= k)
        .select(F.col(id_col), F.explode(sel).alias("_fp"))
        .select(id_col, F.col("_fp.pos").alias("pos"),
                F.col("_fp.gram_hash").alias("gram_hash"))
    )


# Gopher's required-stopword containment list (Rae et al. 2021, table A1).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_per10: int = 1,
    max_bullet_per10: int = 9,
    max_ellipsis_per10: int = 3,
    min_alpha_per10: int = 8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, "Scaling Language
    Models", appendix A1.1) — the de-facto standard heuristic gate for web
    pretraining corpora, reused by MassiveText / RefinedWeb / Dolma:

    - word count in [min_words, max_words];
    - mean word length in [min_mean_word_len, max_mean_word_len];
    - '#' and '...' symbol-to-word ratios each <= 0.1;
    - <= 90% of lines start with a bullet; <= 30% end with an ellipsis;
    - >= 80% of words contain at least one alphabetic character;
    - contains >= ``min_stopwords`` distinct words from Gopher's
      8-stopword containment list.

    Adds one boolean per rule (``g_*``) and ``keep_gopher`` (AND of all).

    Cross-engine exactness: every ratio threshold is evaluated as a
    CROSS-MULTIPLIED integer comparison — mean word length in [3, 10]
    becomes ``3*n <= sum_len <= 10*n``, a 0.1 ratio cap becomes
    ``count*10 <= n`` — so the op involves zero float arithmetic and the
    DuckDB oracle replays it bit-exactly (thresholds are therefore passed
    as integer numerators over a fixed denominator of 10).  Empty docs
    fail the word-count rule; the vacuous ratio rules (0 <= 0) stay true.

    Scale shape: a pure projection — split / filter / aggregate / length
    are all JVM expressions; zero shuffles, zero Python, and at 100 TB
    the whole gate fuses into the parquet scan.  The token and line
    arrays are materialized ONCE as intermediate columns and the per-doc
    counters ONCE as a struct the rule booleans read — every intermediate
    is multi-referenced and non-cheap, so Catalyst's CollapseProject
    keeps the projections separate instead of re-tokenizing per rule.
    The stopword containment count is ``size(array_intersect(lowered,
    stoplist))`` (distinct stopwords present), one pass over the tokens.
    """
    if min_words < 0 or max_words < min_words:
        raise ValueError(
            f"need 0 <= min_words <= max_words, got {min_words}, {max_words}"
        )
    t = F.col(text_col)
    base = df.withColumn(
        "_toks", F.filter(tokens_col(text_col), lambda x: x != "")
    ).withColumn("_lines", F.filter(F.split(t, "\n"), lambda x: F.trim(x) != ""))
    toks, lines = F.col("_toks"), F.col("_lines")
    stoplist = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    counters = F.struct(
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        .cast("long")
        .alias("n_hash"),
        (
            F.regexp_count(t, F.lit(r"\.\.\."))
            + F.length(t)
            - F.length(F.replace(t, F.lit("…"), F.lit("")))
        )
        .cast("long")
        .alias("n_ellipsis"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.filter(lines, lambda x: F.ltrim(x).rlike(r"^[-*•]")))
        .cast("long")
        .alias("n_bullet"),
        F.size(F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$")))
        .cast("long")
        .alias("n_ell_end"),
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
        .cast("long")
        .alias("n_alpha"),
        F.size(
            F.array_intersect(
                F.transform(toks, lambda x: F.lower(x)), stoplist
            )
        ).alias("n_stop"),
    )
    g = F.col("_g")
    rules = {
        "g_word_count": (g.n_words >= min_words) & (g.n_words <= max_words),
        "g_mean_word_len": (
            g.sum_len >= F.lit(min_mean_word_len) * g.n_words
        )
        & (g.sum_len <= F.lit(max_mean_word_len) * g.n_words),
        "g_symbol_ratio": (g.n_hash * 10 <= g.n_words * max_symbol_per10)
        & (g.n_ellipsis * 10 <= g.n_words * max_symbol_per10),
        "g_bullet_lines": g.n_bullet * 10 <= g.n_lines * max_bullet_per10,
        "g_ellipsis_lines": g.n_ell_end * 10
        <= g.n_lines * max_ellipsis_per10,
        "g_alpha_words": g.n_alpha * 10 >= g.n_words * min_alpha_per10,
        "g_stopwords": g.n_stop >= F.lit(min_stopwords),
    }
    out = base.withColumn("_g", counters).withColumn("n_words", g.n_words)
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        keep = keep & F.col(name)
    return out.withColumn("keep_gopher", keep).drop("_g", "_toks", "_lines")


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet's head/middle/tail corpus partitioning (Wenzek et al. 2020,
    §4.4): per language, rank documents by statistical-LM surprise
    (``unigram_surprise`` — low = fluent) and cut the ranking into
    ``n_buckets`` equal-mass buckets; bucket 0 is CCNet's "head" (the
    highest-quality slice, the one kept for LM pretraining), the last is
    the "tail".  Output: (id, lang, surprise, ppl_bucket).

    Equal-score documents land in the SAME bucket by construction —
    CCNet's cutoffs are score thresholds, not per-doc ranks — so the op
    needs no per-doc tie-break: bucket = floor(cum_below * k / n_lang)
    where ``cum_below`` counts the language's docs with strictly smaller
    surprise.  All integer arithmetic over round-6-derived micro-nat
    scores, hence bit-exact cross-engine.

    Scale shape (why this survives 100 TB where a per-lang rank window
    dies): ranking 10^12 docs with ``Window.partitionBy(lang)`` funnels
    each language — 60%+ of a web corpus is one language — through a
    single partition.  Instead the op aggregates a per-(lang, score)
    HISTOGRAM (map-side combinable; rows = distinct round-6 scores, vastly
    smaller than docs), runs the cumulative window over histogram rows
    only, and joins bucket labels back by the narrow (lang, 8 B score)
    key.  Document text never shuffles; no corpus-sized single partition
    exists anywhere in the plan."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    scored = unigram_surprise(df, text_col, id_col).join(
        df.select(id_col, lang_col), id_col
    )
    smicro = F.round(F.col("surprise") * F.lit(1e6), 0).cast("long")
    keyed = scored.select(
        id_col, lang_col, "surprise", smicro.alias("_smicro")
    )
    hist = keyed.groupBy(lang_col, "_smicro").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_lang = Window.partitionBy(lang_col)
    w_cum = w_lang.orderBy("_smicro").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucketed = (
        hist.withColumn(
            "_cum",
            F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0).cast("long")),
        )
        .withColumn("_tot", F.sum("_cnt").over(w_lang))
        .select(
            lang_col,
            "_smicro",
            F.expr(f"(_cum * {int(n_buckets)}) div _tot").alias("ppl_bucket"),
        )
    )
    return keyed.join(bucketed, [lang_col, "_smicro"]).select(
        id_col, lang_col, "surprise", F.col("ppl_bucket").cast("int").alias("ppl_bucket")
    )


def token_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """One row per token OCCURRENCE: (id, tok).  The shared first stage of
    vocabulary building and statistical LM scoring — text leaves the scan
    as individual tokens, so nothing downstream ever shuffles a document."""
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    out = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    return out.withColumn("tok", F.lower(F.col("tok"))) if lowercase else out


def vocabulary(
    df: DataFrame,
    top_v: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary: the ``top_v`` most frequent tokens as
    (token, n_occ, vocab_rank) — the first artifact a tokenizer build
    needs.  Deterministic total order: count desc, token asc.

    Scale shape: explode → groupBy(token) count is ONE token-keyed shuffle
    with map-side partial aggregation (the payload is (token, long), never
    text), and the top-V cut is ``orderBy().limit()`` which Spark executes
    as per-partition top-V + driver merge (TakeOrderedAndProject) — no
    global sort ever materializes.  The rank window runs over the V
    surviving rows only."""
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    counts = (
        token_table(df, text_col, id_col, lowercase)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    top = counts.orderBy(F.desc("n_occ"), F.asc("tok")).limit(top_v)
    w = Window.orderBy(F.desc("n_occ"), F.asc("tok"))
    return top.select(
        F.col("tok").alias("token"),
        F.col("n_occ").cast("long").alias("n_occ"),
        F.row_number().over(w).cast("int").alias("vocab_rank"),
    )


def lexical_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document type-token ratio → (id, n_tokens, n_types,
    ttr_micro = (1e6·n_types) div n_tokens) — the doc-level lexical-
    diversity quality signal (low TTR = repetitive/templated text;
    the per-DOC companion of the corpus-level distinct-n diversity).
    Empty docs emit (0, 0, 0).  Pure zero-shuffle projection: tokens are
    let-bound once, types via array_distinct — text never leaves the
    scan, and the ratio is integer micro-units, exact in any engine."""
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    if lowercase:
        toks = F.transform(toks, lambda x: F.lower(x))
    # let-binding: size() + array_distinct both reference the token array
    counts = F.get(
        F.transform(
            F.array(toks),
            lambda t: F.struct(
                F.size(t).cast("long").alias("n"),
                F.size(F.array_distinct(t)).cast("long").alias("d"),
            ),
        ),
        0,
    )
    return df.select(
        F.col(id_col),
        counts["n"].alias("n_tokens"),
        counts["d"].alias("n_types"),
        F.when(
            counts["n"] > 0,
            F.expr("CAST(1000000 AS BIGINT)") * counts["d"],
        ).otherwise(F.lit(0)).alias("_num"),
    ).select(
        id_col,
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("CAST(_num DIV n_tokens AS BIGINT)"),
        ).otherwise(F.lit(0).cast("long")).alias("ttr_micro"),
    )


def vocab_drift(
    df_old: DataFrame,
    df_new: DataFrame,
    top_k: int = 100,
    min_total: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots — the
    vocabulary-level companion of ``corpus.snapshot_diff`` (which tells you
    WHICH docs changed; this tells you what the change did to the language
    of the corpus): the ``top_k`` tokens whose smoothed log-probability
    moved most between the old and new snapshots, as
    ``(token, n_old, n_new, drift_micro)`` with

        drift = ln((n_new+1)/(tot_new+V)) - ln((n_old+1)/(tot_old+V))

    under add-1 smoothing over the UNION vocabulary V (so a token present
    in only one snapshot gets a finite score).  Positive drift = the token
    is over-represented in the new snapshot.  Each log-prob is round-6
    quantized to integer micro-nats before the subtraction — the same
    cross-engine discipline as ``dsir_logweights`` — so the score is an
    exact integer and ordering is engine-independent; ties break on token.
    ``min_total`` drops tokens with fewer than that many combined
    occurrences (rare-token noise dominates raw log-ratio drift).

    Scale shape: ONE token-keyed shuffle builds both counts (the snapshots
    union with a side tag and aggregate conditionally — (token, long, long)
    payload, never text); totals + vocab size are a one-row broadcast; the
    top-k cut is orderBy().limit() = per-partition top-k + driver merge
    (TakeOrderedAndProject), so no global sort materializes."""
    return vocab_drift_from_counts(
        token_counts(df_old, text_col, id_col, lowercase),
        token_counts(df_new, text_col, id_col, lowercase),
        top_k,
        min_total,
    )


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(tok, n) corpus token counts — the ADDITIVE cell form of a unigram
    LM snapshot (fold per micro-batch and the stream equals the batch
    recount exactly); feeds ``vocab_drift_from_counts``."""
    return (
        token_table(df, text_col, id_col, lowercase)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def vocab_drift_from_counts(
    old_counts: DataFrame,
    new_counts: DataFrame,
    top_k: int = 100,
    min_total: int = 5,
) -> DataFrame:
    """The drift finisher over two (tok, n) count tables — shared verbatim
    by the batch operator and the streaming twin (reference counts frozen,
    current side folded additively), so the two cannot drift (see
    vocab_drift)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_total < 1:
        raise ValueError(f"min_total must be >= 1, got {min_total}")
    counts = (
        old_counts.select("tok", F.col("n").alias("n_old"), F.lit(0).cast("long").alias("n_new"))
        .unionByName(
            new_counts.select("tok", F.lit(0).cast("long").alias("n_old"), F.col("n").alias("n_new"))
        )
        .groupBy("tok")
        .agg(F.sum("n_old").alias("n_old"), F.sum("n_new").alias("n_new"))
    )
    tots = counts.agg(
        F.sum("n_old").cast("double").alias("_to"),
        F.sum("n_new").cast("double").alias("_tn"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    micro = lambda c: F.round(c * F.lit(1e6), 0).cast("long")  # noqa: E731
    lp_old = F.round(F.log((F.col("n_old") + 1) / (F.col("_to") + F.col("_v"))), 6)
    lp_new = F.round(F.log((F.col("n_new") + 1) / (F.col("_tn") + F.col("_v"))), 6)
    scored = (
        counts.crossJoin(F.broadcast(tots))
        .filter(F.col("n_old") + F.col("n_new") >= min_total)
        .select(
            F.col("tok").alias("token"),
            F.col("n_old").cast("long").alias("n_old"),
            F.col("n_new").cast("long").alias("n_new"),
            (micro(lp_new) - micro(lp_old)).alias("drift_micro"),
        )
    )
    return scored.orderBy(
        F.desc(F.abs("drift_micro")), F.asc("token")
    ).limit(top_k)


def unigram_surprise(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document statistical-LM quality signal (CCNet-style, Wenzek et
    al. 2020 — there a 5-gram KenLM; here the corpus's own unigram model,
    the Spark-able same-shaped signal): surprise = mean negative log
    probability of the doc's tokens under corpus unigram frequencies.
    High surprise = rare/garbled vocabulary; low = common fluent text.
    Output (id, n_tokens, surprise), empty docs 0.0.

    Scale shape: token counts are one token-keyed shuffle (map-side
    combine); the corpus total is a one-row broadcast; scoring joins the
    exploded tokens to the (token, logprob) table — narrow key + 8 B
    payload — then one per-doc aggregate.  Document text never shuffles.

    Cross-engine exactness: each token's logprob is ln(cnt/total) rounded
    to 6 decimals from the SAME integers in both engines (1-ulp libm ln
    divergence would need a value on a 5e-7 boundary — measure-zero, the
    accepted pow/round risk class), then quantized to EXACT integer
    micro-nats.  The per-doc mean is integer-sum / count — a float mean of
    round-6 doubles is order-dependent at ~1e-13 and DID land two sf0.01
    docs on opposite sides of a 6th-decimal rounding boundary; the integer
    sum makes the quotient bit-identical in both engines."""
    tok = token_table(df, text_col, id_col, lowercase)
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt").alias("_tot"))
    lp6 = F.round(F.log(F.col("_cnt") / F.col("_tot")), 6)
    lp = counts.crossJoin(F.broadcast(total)).select(
        "tok", F.round(-lp6 * F.lit(1e6), 0).cast("long").alias("_lpmicro")
    )
    scored = (
        tok.join(lp, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum("_lpmicro").cast("double")
                / F.count(F.lit(1))
                / F.lit(1e6),
                6,
            ).alias("surprise"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("surprise", F.lit(0.0)).alias("surprise"),
    )


def dsir_logweights(
    df: DataFrame,
    target: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): per-doc
    log importance weight under two unigram LMs — a TARGET model over the
    docs where ``target`` is true (the high-quality exemplar slice) and a
    RAW model over the whole corpus — so resampling by weight shifts the
    corpus toward the target distribution.  Output
    (id, n_tokens, logw_micro):

        logw = sum over token occurrences of ln p_target(tok) - ln p_raw(tok)

    with add-1 smoothing over the SHARED raw vocabulary (so unseen-in-target
    tokens get a finite penalty, and both LMs normalize over the same V).
    ``logw_micro`` is the sum of per-token round-6 log-probs quantized to
    integer micro-nats — an EXACT integer in any engine (the same
    cross-engine discipline as ``unigram_surprise``; DSIR's hashed n-gram
    feature space degrades gracefully to unigrams here, where the tokenizer
    is the repo-standard word split).  Docs with zero tokens get (0, 0).

    Scale shape: ONE token-keyed shuffle builds both LMs (conditional
    counts in the same aggregate); totals + vocab size are a one-row
    broadcast; scoring joins exploded tokens to the (tok, 8 B) weight table
    and integer-sums per doc.  Document text never enters an exchange."""
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    tok = df.select(
        F.col(id_col), target.cast("boolean").alias("_is_t"),
        F.explode(toks).alias("tok"),
    )
    if lowercase:
        tok = tok.withColumn("tok", F.lower(F.col("tok")))
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.count_if(F.col("_is_t")).alias("_ct"),
    )
    tots = counts.agg(
        F.sum("_cr").cast("double").alias("_tr"),
        F.sum("_ct").cast("double").alias("_tt"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    lp_t = F.round(F.log((F.col("_ct") + 1) / (F.col("_tt") + F.col("_v"))), 6)
    lp_r = F.round(F.log((F.col("_cr") + 1) / (F.col("_tr") + F.col("_v"))), 6)
    micro = lambda c: F.round(c * F.lit(1e6), 0).cast("long")  # noqa: E731
    dlp = counts.crossJoin(F.broadcast(tots)).select(
        "tok", (micro(lp_t) - micro(lp_r)).alias("_dlpmicro")
    )
    scored = (
        tok.join(dlp, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_dlpmicro").cast("long").alias("logw_micro"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("logw_micro", F.lit(0).cast("long")).alias("logw_micro"),
    )


def dsir_select(
    df: DataFrame,
    target: F.Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Deterministic DSIR selection: the ``k`` docs whose unigram importance
    weight toward the target slice is highest (ties → lowest id; the paper
    resamples via Gumbel noise on logw — a fixed top-k keeps the operator
    replayable and oracle-able, and a caller wanting sampled selection can
    add a seeded jitter column before the cut).  ``orderBy().limit(k)``
    executes as per-partition top-k + driver merge (TakeOrderedAndProject)
    — no global sort materializes."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_logweights(df, target, text_col, id_col, lowercase)
    return w.orderBy(F.desc("logw_micro"), F.asc(id_col)).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    m: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document keyword extraction: the ``m`` highest-TF-IDF tokens of
    each doc as (id, token, tf, score_micro, rank) — the classic corpus
    summarization / topic-tagging primitive (distinct from BM25, which
    scores DOCS against a QUERY; this scores TOKENS within a doc against
    the corpus).  Smoothed idf = ln((N+1)/(df_t+1)) with N = total docs.

    Cross-engine exactness: idf is quantized to integer micro-nats from the
    round-6 log (the repo's standard discipline), and the score is the
    EXACT integer tf·idf_micro — no float arithmetic reaches the ranking.
    Total order per doc: score desc, token asc.

    Scale shape: one (id, token) shuffle with map-side combine builds the
    tf table (payload (16 B key, long) — text never shuffles); document
    frequency is a second narrow groupBy over that table; N is a one-row
    broadcast; scoring is a token-keyed 8 B join; the top-m window runs
    per doc over its distinct-token rows only — no global sort, no
    SinglePartition stage."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    tok = token_table(df, text_col, id_col, lowercase)
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_nd"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("_dft"))
    idf6 = F.round(
        F.log((F.col("_nd") + F.lit(1.0)) / (F.col("_dft") + F.lit(1.0))), 6
    )
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "tok", F.round(idf6 * F.lit(1e6), 0).cast("long").alias("_idfm")
    )
    scored = tf.join(idf, "tok").select(
        id_col,
        F.col("tok").alias("token"),
        F.col("tf").cast("long").alias("tf"),
        (F.col("tf") * F.col("_idfm")).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_micro"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= m)
        .select(id_col, "token", "tf", "score_micro", "rank")
    )


def _hash_bucket(feat: F.Column, n_buckets: int) -> F.Column:
    """Engine-portable feature hashing: leading 8 md5 hex nibbles (32 bits)
    as an integer, mod ``n_buckets`` — the same md5-decode idiom as the
    corpus sampling u16 draw, widened so bucket collisions are hash-driven
    rather than truncation-driven."""
    return F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long") % F.lit(
        n_buckets
    )


def hashed_feature_table(
    df: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """One row per hashed n-gram feature OCCURRENCE: (id, bucket) — the
    fastText-style feature space (Joulin et al. 2016): word unigrams plus
    (optionally) space-joined word bigrams, hashed into a FIXED bucket
    space.  The fixed space is the 100 TB story: vocabulary grows without
    bound with the corpus, but the feature table is capped at ``n_buckets``
    rows, so any model over it stays broadcastable by construction no
    matter how large the corpus gets.

    Text leaves the scan as (id, 8 B bucket) rows — documents never enter
    a shuffle.  ``extra_cols`` carries flag columns (e.g. a train-label
    boolean) alongside the explode."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    if lowercase:
        toks = F.transform(toks, F.lower)
    n = F.size(toks)
    feats = toks
    if bigrams:
        big = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        feats = F.concat(feats, big)
    cols = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    return df.select(*cols, F.explode(feats).alias("_feat")).select(
        *[c for c in ([id_col] + list(extra_cols or []))],
        _hash_bucket(F.col("_feat"), n_buckets).alias("bucket"),
    )


def train_ngram_quality(
    df: DataFrame,
    target: F.Column,
    n_buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
) -> DataFrame:
    """Closed-form linear quality classifier over hashed n-gram features —
    the model-based quality filter every large pretraining pipeline runs
    (GPT-3's WebText-vs-CommonCrawl classifier, CCNet, Llama): here the
    fastText feature space (hashed unigrams+bigrams) with Naive-Bayes
    log-likelihood-ratio weights, which ARE a linear classifier and train
    in ONE aggregation pass — no SGD, fully deterministic, engine-exact.

        w(bucket) = ln p(bucket | target) - ln p(bucket | corpus)

    with add-1 smoothing over the FIXED ``n_buckets`` space (not the
    observed vocab — so weights are comparable across corpora sharing the
    bucket space).  Output (bucket, w_micro): per-bucket round-6 log-odds
    quantized to integer micro-nats (the repo's cross-engine exactness
    discipline), PLUS a ``bucket = -1`` row carrying the default weight of
    a never-observed bucket — scoring a NEW corpus against a persisted
    weight table substitutes it for unseen buckets.

    Scale shape: ONE bucket-keyed shuffle with map-side combine builds both
    conditional counts in the same aggregate (payload (8 B, long, long));
    the output is ≤ n_buckets + 1 rows — broadcastable by construction."""
    feats = hashed_feature_table(
        df.select(
            id_col, text_col, target.cast("boolean").alias("_is_t")
        ),
        n_buckets,
        text_col,
        id_col,
        bigrams,
        lowercase,
        extra_cols=["_is_t"],
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.count_if(F.col("_is_t")).alias("_ct"),
    )
    tots = counts.agg(
        F.sum("_cr").cast("double").alias("_tr"),
        F.sum("_ct").cast("double").alias("_tt"),
    )
    b = F.lit(float(n_buckets))
    micro = lambda c: F.round(F.round(c, 6) * F.lit(1e6), 0).cast("long")  # noqa: E731
    w_of = lambda ct, cr: (  # noqa: E731
        micro(F.log((ct + 1) / (F.col("_tt") + b)))
        - micro(F.log((cr + 1) / (F.col("_tr") + b)))
    )
    observed = counts.crossJoin(F.broadcast(tots)).select(
        "bucket", w_of(F.col("_ct"), F.col("_cr")).alias("w_micro")
    )
    default = tots.select(
        F.lit(-1).cast("long").alias("bucket"),
        w_of(F.lit(0.0), F.lit(0.0)).alias("w_micro"),
    )
    return observed.unionByName(default)


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
    broadcast_weights: bool = True,
) -> DataFrame:
    """Score documents under a hashed-n-gram linear model: per doc,
    ``score_micro`` = integer sum of the weight of every feature occurrence
    (unseen buckets take the weight table's ``bucket = -1`` default), plus
    ``mean_logodds`` = round-6 per-token mean in nats — the length-
    normalized quantity a keep/drop threshold should compare (integer-sum
    division, so it is order-independent and engine-exact).  Docs with zero
    features get (0, 0, 0.0).

    Scale shape: features are (id, 8 B) rows; the weight join is a
    broadcast hash join (weights ≤ n_buckets + 1 rows by construction —
    set ``broadcast_weights=False`` only to force the shuffle plan for
    testing); the per-doc aggregate is one id-keyed shuffle with map-side
    partial sums.  Text never enters an exchange."""
    feats = hashed_feature_table(
        df, n_buckets, text_col, id_col, bigrams, lowercase
    )
    defw = weights.filter(F.col("bucket") == -1).agg(
        F.coalesce(F.max("w_micro"), F.lit(0)).cast("long").alias("_defw")
    )
    w = weights.filter(F.col("bucket") != -1)
    if broadcast_weights:
        w, defw = F.broadcast(w), F.broadcast(defw)
    scored = (
        feats.join(w, "bucket", "left")
        .crossJoin(defw)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(F.coalesce(F.col("w_micro"), F.col("_defw")))
            .cast("long")
            .alias("score_micro"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce("score_micro", F.lit(0).cast("long")).alias("score_micro"),
        F.when(
            F.coalesce("n_feats", F.lit(0)) > 0,
            # + 0.0 collapses IEEE negative zero: a tiny negative mean
            # rounds to -0.0 under IEEE round (DuckDB) but to +0.0 under
            # BigDecimal HALF_UP (Spark) — the two print differently and
            # break hash equality (found by the round-5 sf1 pass)
            F.round(
                F.col("score_micro").cast("double")
                / F.col("n_feats")
                / F.lit(1e6),
                6,
            )
            + F.lit(0.0),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_logodds"),
    )


def pareto_classifier_gate(
    scored: DataFrame,
    alpha: float = 9.0,
    score_col: str = "mean_logodds",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-3's stochastic quality gate (Brown et al. 2020, Appendix A):
    instead of a hard threshold, a document survives iff
    ``pareto_draw(alpha) > 1 - quality`` — low-scoring docs still get in
    with probability ``(2 - quality)^(-alpha)``, preserving tail diversity
    the hard cut would destroy.  ``quality = sigmoid(score_col)`` maps the
    classifier's log-odds to the (0,1) range the rule expects.

    The draw is deterministic and engine-portable: the doc's md5-u16
    uniform under a ``'pareto:'`` domain-separation prefix (decorrelated
    from the sampling/split draws by construction).  Rather than sampling
    the Pareto and comparing, the rule is pre-inverted through the CDF —
    keep iff ``u16 > floor(round6(1 - (2 - sigmoid(score))^(-alpha)) ·
    65536)`` — so the only float math is one exp + one pow, quantized to
    round-6 before the integer comparison (the temperature_mix discipline:
    a last-ulp divergence needs the CDF on a 5e-7 boundary, measure-zero).

    Input is ``classifier_score`` output (or anything carrying
    ``score_col``); output adds ``keep_pareto``.  Pure projection +
    filter-ready flag — zero exchanges, composes into the scan."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    quality = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(score_col)))
    cdf = F.lit(1.0) - F.pow(F.lit(2.0) - quality, F.lit(-float(alpha)))
    thr = F.floor(F.round(cdf, 6) * F.lit(65536.0)).cast("long")
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pareto:"), F.col(id_col).cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    return scored.withColumn("keep_pareto", u16 >= thr)


def ngram_quality_classifier(
    df: DataFrame,
    target: F.Column,
    n_buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
    lowercase: bool = True,
) -> DataFrame:
    """Train-and-score convenience: NB log-odds weights toward ``target``
    over this corpus, then every doc scored under them — the single-job
    form of the GPT-3-style quality-classifier gate.  For scoring a NEW
    corpus under persisted weights, call ``train_ngram_quality`` once,
    write the (≤ n_buckets + 1)-row table, and ``classifier_score`` each
    increment against it."""
    w = train_ngram_quality(
        df, target, n_buckets, text_col, id_col, bigrams, lowercase
    )
    return classifier_score(
        df, w, n_buckets, text_col, id_col, bigrams, lowercase
    )


def bigram_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id, prev, cur) — the order-aware
    sibling of ``token_table``.  The pair is built in the projection
    (let-bound token array, zip with its own tail) so text leaves the scan
    as ~20-byte token pairs and never shuffles as documents."""
    from .similarity import _let  # evaluate-once lambda binding

    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    if lowercase:
        toks = F.transform(toks, lambda x: F.lower(x))
    pairs = _let(
        toks,
        lambda t: F.zip_with(
            F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        ),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur")
    )


def bigram_surprise(
    df: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Interpolated-bigram LM quality signal — the order-aware deepening of
    ``unigram_surprise`` (CCNet-shaped, Wenzek et al. 2020: there a 5-gram
    KenLM; here the corpus's own Jelinek-Mercer-interpolated bigram model):

        P(cur | prev) = lam · c(prev,cur)/c(prev,·) + (1-lam) · c(cur)/N

    surprise = mean −ln P over the doc's bigram positions.  A doc of
    individually common but incoherently ORDERED tokens (shuffled text,
    keyword stuffing) scores high here while passing the unigram gate.
    Output (id, n_bigrams, bigram_surprise); docs with < 2 tokens → 0.0.

    Scale shape: the bigram LM is ONE pair-keyed shuffle with map-side
    combine (payload (prev, cur, long)); context totals reuse the same
    aggregate output; the corpus token total is a 1-row broadcast; scoring
    joins the doc's exploded pairs to the (pair, micro-nat) table and one
    per-doc aggregate reduces — text never shuffles.

    Cross-engine exactness: the probability is computed from the SAME four
    integers in both engines, −ln rounded to 6 decimals, quantized to
    integer micro-nats; per-doc mean = integer sum / count (the
    unigram_surprise discipline — a float mean is order-dependent)."""
    if not (0.0 < lam < 1.0):
        raise ValueError(f"lam must be in (0,1), got {lam}")
    bg = bigram_table(df, text_col, id_col, lowercase)
    tok = token_table(df, text_col, id_col, lowercase)
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("_cu"))
    n_total = tok.agg(F.count(F.lit(1)).alias("_n"))
    bcnt = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("_cb"))
    ctx = bcnt.groupBy("prev").agg(F.sum("_cb").alias("_cp"))
    p = (
        F.lit(float(lam)) * F.col("_cb") / F.col("_cp")
        + F.lit(1.0 - float(lam)) * F.col("_cu") / F.col("_n")
    )
    lp = (
        bcnt.join(ctx, "prev")
        .join(uni, F.col("cur") == F.col("tok"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "prev",
            "cur",
            F.round(F.round(-F.log(p), 6) * F.lit(1e6), 0)
            .cast("long")
            .alias("_lpmicro"),
        )
    )
    scored = (
        bg.join(lp, ["prev", "cur"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum("_lpmicro").cast("double") / F.count(F.lit(1)) / F.lit(1e6),
                6,
            ).alias("bigram_surprise"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce("bigram_surprise", F.lit(0.0)).alias("bigram_surprise"),
    )


def strip_markup(
    df: DataFrame, text_col: str = "text", out: str = "clean_text"
) -> DataFrame:
    """HTML/markup stripping — the first stage of a web-crawl text
    pipeline: drop <script>/<style> blocks WITH their contents, remove all
    remaining tags, unescape the five core entities (&amp; decoded LAST so
    double-escapes survive one level, the standard order), collapse
    whitespace runs, trim.

    Pure JVM regexp_replace chain (zero shuffle, zero Python, scan-fused);
    every pattern is RE2-safe (no backreferences), so the DuckDB oracle
    runs the IDENTICAL patterns.  This is a pragmatic tag stripper, not an
    HTML5 parser — comments/CDATA are handled, malformed-nesting recovery
    is not (documented trade: a real crawl pipeline runs this shape at
    scan speed and routes pathological documents to a slow path).
    """
    t = F.col(text_col)
    for pat, repl in [
        (r"(?is)<script[^>]*>.*?</script>", " "),
        (r"(?is)<style[^>]*>.*?</style>", " "),
        (r"(?s)<!--.*?-->", " "),
        (r"(?s)<[^>]+>", " "),
    ]:
        t = F.regexp_replace(t, pat, repl)
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&amp;", "&"),
    ]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    # explicit class, not \s: Java's \s includes \x0B, RE2's does not —
    # the explicit form is byte-identical in both engines
    t = F.trim(F.regexp_replace(t, r"[ \t\r\n\f]+", " "))
    return df.withColumn(out, t)


def normalize_unicode(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "norm_text",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
    every dedup/hash stage upstream assumes: visually-identical strings
    with different codepoint sequences (composed vs combining accents,
    compatibility forms) collapse to one byte representation, so
    md5-keyed exact dedup stops treating them as distinct documents.

    Arrow-batched ``mapInPandas`` using pandas' ``Series.str.normalize``
    (per-string work is inherent to the transform, as with payload
    decode); all other columns pass through untouched.  The DuckDB oracle
    twin uses ``nfc_normalize`` — both engines implement the same Unicode
    standard, so NFC outputs are byte-identical.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    import pandas as pd  # noqa: F401  (documented dependency of the UDF)

    in_schema = df.schema
    out_schema = T.StructType(in_schema.fields + [T.StructField(out, T.StringType())])

    def norm(batches):
        for pdf in batches:
            pdf[out] = pdf[text_col].astype("string").str.normalize(form)
            yield pdf

    return df.mapInPandas(norm, out_schema)


def with_badwords(
    df: DataFrame,
    words: list[str],
    text_col: str = "text",
) -> DataFrame:
    """C4-style word-boundary blocklist counter (Raffel et al. 2020 §2.2
    drop any page containing a listed word): adds ``n_badwords`` — how
    many token OCCURRENCES (case-insensitive, tokenizer-exact, so
    'class' never matches a listed 'ass' the way substring grep does)
    hit the list.  The list itself is a parameter; ship your own.

    Pure scan-fused projection over a literal IN-list — zero shuffles,
    zero Python, zero joins at any corpus size."""
    if not words:
        raise ValueError("empty badwords list")
    lowered = sorted({w.lower() for w in words})
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    hits = F.filter(toks, lambda t: F.lower(t).isin(lowered))
    return df.withColumn("n_badwords", F.size(hits))


def badwords_gate(
    df: DataFrame,
    words: list[str],
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Keep only documents with at most ``max_hits`` blocklisted token
    occurrences (C4 uses 0).  Same zero-shuffle shape as the counter."""
    return (
        with_badwords(df, words, text_col)
        .filter(F.col("n_badwords") <= int(max_hits))
        .drop("n_badwords")
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """DEFLATE compression ratio as a quality signal (the gzip-ratio
    heuristic production pipelines run alongside Gopher rules): ratio
    near 1 = incompressible noise (binary junk, encrypted blobs,
    high-entropy garbage), very high ratio = templated/repetitive spam —
    both tails are what a corpus gate drops.

    -> (id, n_bytes, n_compressed, ratio_micro) with
    ``ratio_micro = n_bytes * 1e6 div n_compressed`` (exact integer).

    Implementation: whole-batch Arrow ``mapInPandas``; the per-payload
    DEFLATE pass is inherent to the signal (same class as hashing —
    the house zero-per-row-Python rule allows per-PAYLOAD work the
    operator's definition requires).  Deterministic for a fixed zlib
    level, but the byte count is a library artifact, not portable
    algebra — so this ships as a rows-only query with a pure-Python
    mirror test, not a DuckDB oracle (DuckDB has no SQL-level DEFLATE).

    Scale shape: scan → mapInPandas, ZERO exchanges; cost is one pass
    over the text column.  Text never shuffles; the output is 4 narrow
    columns."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
            T.StructField("ratio_micro", T.LongType()),
        ]
    )
    lvl = int(level)

    def batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            raw = [
                (s if isinstance(s, str) else "").encode("utf-8")
                for s in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, lvl)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_micro": [
                        (b * 1_000_000) // c for b, c in zip(nb, nc)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, out_schema)


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade level (Kincaid et al.
    1975) — the classic curriculum-difficulty signals corpus builders use
    to stratify pretraining data by reading level (e.g. filtering for
    "textbook-like" spans or building difficulty curricula).

    Deterministic counting rules (a heuristic, stated precisely so both
    engines replay it bit-for-bit):

    - words     = the repo tokenizer (``tokens_col``, empty-filtered);
    - sentences = runs of ``[.!?]+`` in the raw text, floored at 1 so a
      terminator-free fragment counts as one sentence;
    - syllables = per word, runs of ``[aeiouy]+`` in the lowercased word,
      floored at 1 (every word has at least one syllable).

    Cross-engine exactness: the two classic formulas are evaluated in
    MILLI-units with integral division only —

        flesch_milli   = 206835 - (1015*W) div S - (84600*Syl) div W
        fk_grade_milli = (390*W) div S + (11800*Syl) div W - 15590

    so there is no float arithmetic anywhere and the DuckDB oracle replays
    the exact integers (operands are non-negative, so floor and truncate
    coincide).  Docs with zero words emit NULL scores.

    Scale shape: a pure projection — the token array is materialized ONCE
    as an intermediate column (multi-referenced, so CollapseProject keeps
    it a separate projection instead of re-tokenizing per counter), the
    syllable sum is one ``aggregate`` over it; zero shuffles, zero Python;
    at 100 TB the whole op fuses into the parquet scan.
    """
    base = df.withColumn("_toks", F.filter(tokens_col(text_col), lambda x: x != ""))
    toks = F.col("_toks")
    w = F.size(toks).cast("long")
    s = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), F.lit(0))).cast("long"),
    )
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.greatest(
            F.lit(1).cast("long"),
            F.size(F.regexp_extract_all(F.lower(x), F.lit("[aeiouy]+"), F.lit(0))).cast("long"),
        ),
    )
    counted = base.withColumn(
        "_c", F.struct(w.alias("w"), s.alias("s"), syl.alias("syl"))
    )
    cw, cs, csyl = F.col("_c.w"), F.col("_c.s"), F.col("_c.syl")
    # integral division: expr-level DIV keeps everything in exact integers
    flesch_milli = F.when(
        cw > 0,
        F.lit(206835).cast("long")
        - F.expr("(1015 * _c.w) DIV _c.s")
        - F.expr("(84600 * _c.syl) DIV _c.w"),
    )
    fk_milli = F.when(
        cw > 0,
        F.expr("(390 * _c.w) DIV _c.s")
        + F.expr("(11800 * _c.syl) DIV _c.w")
        - F.lit(15590).cast("long"),
    )
    return counted.select(
        id_col,
        cw.alias("n_words"),
        cs.alias("n_sentences"),
        csyl.alias("n_syllables"),
        flesch_milli.cast("long").alias("flesch_milli"),
        fk_milli.cast("long").alias("fk_grade_milli"),
    )


def loop_detection(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_period: int = 8,
) -> DataFrame:
    """Degenerate-loop detection for generated text: the longest stretch
    where the token stream repeats with period p ("the cat the cat the
    cat…" = period 2) for every p ≤ ``max_period`` — the failure mode of
    a looping decoder, which Gopher-style DUPLICATE-fraction signals
    under-weight (a loop's grams are all distinct-ish for large p, but
    ``tok[i] == tok[i−p]`` holds along the whole stretch).

    Rule (stated precisely so both engines replay it): for period p, let
    m_p = the longest run of consecutive positions i with
    ``tok[i] = tok[i−p]``; the loop covers ``m_p + p`` tokens and counts
    only when ``m_p >= p`` (at least two full repetitions).  Reported:
    ``best_period`` (tie → smallest p), ``loop_tokens`` = max over p,
    and ``loop_frac_micro = 1e6·loop_tokens div n_tokens`` — exact
    integers.  Docs with no qualifying loop report (0, 0, 0).

    Scale shape: pure zero-shuffle zero-Python projection — the token
    array is let-bound once, each period's match list and run fold are
    ``transform``/``aggregate`` lambdas over it; at 100 TB the whole
    signal fuses into the parquet scan.
    """
    if max_period < 1:
        raise ValueError(f"max_period must be >= 1, got {max_period}")
    base = df.withColumn("_toks", F.filter(tokens_col(text_col), lambda x: x != ""))
    toks = F.col("_toks")
    n = F.size(toks)

    def run_for(p: int) -> F.Column:
        # matches[i] = tok(p+i) == tok(i), 1-based over n-p positions.
        # Guard: sequence(1, 0) DESCENDS and ANSI element_at throws
        # out-of-bounds (the shingles_from_tokens lesson), so docs with
        # n <= p short-circuit to an empty match list.
        matches = F.when(
            n > F.lit(p),
            F.transform(
                F.sequence(F.lit(1), n - F.lit(p)),
                lambda i: (
                    F.element_at(toks, (i + F.lit(p)).cast("int"))
                    == F.element_at(toks, i.cast("int"))
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))
        best_m = F.aggregate(
            matches,
            F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
            lambda acc, x: F.struct(
                (F.when(x == 1, acc.cur + 1).otherwise(F.lit(0))).alias("cur"),
                F.greatest(
                    acc.best,
                    F.when(x == 1, acc.cur + 1).otherwise(F.lit(0)),
                ).alias("best"),
            ),
            lambda acc: acc.best,
        )
        loop_toks = F.when(best_m >= F.lit(p), best_m + F.lit(p)).otherwise(
            F.lit(0)
        )
        return F.struct(
            loop_toks.alias("lt"), F.lit(-p).alias("negp")
        )
    cands = F.array(*[run_for(p) for p in range(1, max_period + 1)])
    best = F.array_max(cands)  # max loop_tokens, tie -> smallest p (-p max)
    counted = base.withColumn("_best", best).withColumn("_n", n)
    lt = F.col("_best.lt")
    return counted.select(
        id_col,
        F.col("_n").cast("long").alias("n_tokens"),
        F.when(lt > 0, -F.col("_best.negp")).otherwise(F.lit(0))
        .cast("int")
        .alias("best_period"),
        lt.cast("long").alias("loop_tokens"),
        F.when(
            F.col("_n") > 0,
            F.expr("CAST((1000000 * _best.lt) DIV _n AS BIGINT)"),
        ).otherwise(F.lit(0).cast("long")).alias("loop_frac_micro"),
    )


def distinct_ngram_ratio(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level distinct-n diversity (Li et al. 2016's distinct-n,
    applied corpus-wide): for each n, the ratio of DISTINCT n-grams to
    total n-gram occurrences — the one-table answer to "how templated is
    this corpus?"  A crawl dominated by boilerplate or a generation dump
    from a looping model collapses the ratio long before any per-doc gate
    fires; FineWeb-class dedup rollouts watch exactly this number move.

    Returns one row per n: ``(n, total_grams, distinct_grams,
    ratio_micro)`` with ``ratio_micro = 1e6·distinct div total`` — exact
    integers.

    Scale shape: grams leave the scan as 16-byte md5 keys (text never
    shuffles — the exact_dedup discipline; md5 is also what makes the
    count-distinct identical in the oracle); per n one
    count/count-distinct aggregate over those keys, map-side combined."""
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must all be >= 1, got {ns}")
    from log_analysis_spark.operators.dedup import shingles_from_tokens

    base = df.withColumn(
        "_toks", F.filter(tokens_col(text_col), lambda x: x != "")
    )
    out = None
    for n in ns:
        grams = shingles_from_tokens(F.col("_toks"), int(n), distinct=False)
        keyed = base.select(
            F.explode(grams).alias("_g")
        ).select(F.md5("_g").alias("_h"))
        agg = keyed.agg(
            F.count(F.lit(1)).cast("long").alias("total_grams"),
            F.countDistinct("_h").cast("long").alias("distinct_grams"),
        ).select(
            F.lit(int(n)).alias("n"),
            "total_grams",
            "distinct_grams",
            F.expr(
                "CAST(CASE WHEN total_grams > 0 "
                "THEN (1000000 * distinct_grams) DIV total_grams "
                "ELSE 0 END AS BIGINT)"
            ).alias("ratio_micro"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def classifier_calibration(
    df: DataFrame,
    target: F.Column,
    n_buckets: int = 1 << 16,
    bin_width_milli: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Calibration table for the NB quality classifier: bin every doc's
    ``mean_logodds`` into fixed-width bins and report each bin's observed
    target rate — the reliability curve that answers "does a higher score
    actually mean more-target-like?" before anyone trusts the gate's
    threshold.  A well-ordered classifier shows rate_micro monotone in
    the bin; a flat curve means the score is noise at that granularity.

    Deterministic binning (the PSI discipline): scores micro-quantize
    first, ``bin = floor(score_micro / (1000·bin_width_milli))`` — no
    data-dependent edges.  Returns per occupied bin: ``(bin, n_docs,
    n_target, rate_micro = 1e6·n_target div n_docs)`` — exact integers.

    Scale shape: scoring is the classifier's own (broadcast weight
    table, text never shuffles); the calibration adds ONE narrow (bin)
    conditional-count aggregate."""
    if bin_width_milli < 1:
        raise ValueError(f"bin_width_milli must be >= 1, got {bin_width_milli}")
    scored = ngram_quality_classifier(
        df, target, n_buckets, text_col, id_col
    ).select(id_col, "mean_logodds")
    labeled = df.select(id_col, target.alias("_is_target")).join(
        scored, id_col
    )
    width_micro = 1000 * int(bin_width_milli)
    b = F.floor(
        F.round(F.col("mean_logodds") * 1_000_000).cast("long")
        / F.lit(width_micro)
    ).cast("long")
    return (
        labeled.select(b.alias("bin"), "_is_target")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("_is_target")).cast("long").alias("n_target"),
        )
        .withColumn(
            "rate_micro",
            F.expr("CAST((1000000 * n_target) DIV n_docs AS BIGINT)"),
        )
    )


def with_lang_margin(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID with CONFIDENCE: top-2 stopword-hit languages per doc,
    their margin, and a ``mixed`` flag for code-switched text (second
    language's evidence at least half the winner's and >= 2 hits) — the
    docs a single-label language gate silently mislabels.  Shares the
    stopword lists and the (hits, lang) struct-max tie rule with
    ``with_lang_pred`` so the two can never disagree on the winner.

    Adds ``lang_pred`` / ``best_hits`` / ``second_lang`` /
    ``second_hits`` / ``margin`` / ``mixed``.  Zero-shuffle zero-Python
    projection."""
    toks = F.transform(tokens_col(text_col), lambda x: F.lower(x))
    base = df.withColumn("_ltoks", toks)
    lt = F.col("_ltoks")
    scores = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(lt, lambda x: F.array_contains(wl, x))).alias(
                    "hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    ranked = F.reverse(F.array_sort(F.array(*scores)))
    best, second = ranked[0], ranked[1]
    out = (
        base.withColumn(
            "lang_pred",
            F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
        )
        .withColumn("best_hits", best["hits"].cast("long"))
        .withColumn(
            "second_lang",
            F.when(second["hits"] > 0, second["lang"]).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .withColumn("second_hits", second["hits"].cast("long"))
        .withColumn(
            "margin", (best["hits"] - second["hits"]).cast("long")
        )
        .withColumn(
            "mixed",
            (second["hits"] * 2 >= best["hits"]) & (second["hits"] >= 2),
        )
        .drop("_ltoks")
    )
    return out
