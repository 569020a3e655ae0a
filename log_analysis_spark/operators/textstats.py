"""Text-analysis operators over the ``documents`` table — the pieces a
large-scale training-data pipeline needs: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All hot-path math is JVM-side (split / size / transform / xxhash64 inside
WholeStageCodegen) — no Python per row anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
