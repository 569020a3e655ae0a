"""URL / domain operators — the link-level stage of a web-crawl curation
pipeline (C4 and RefinedWeb both gate documents on the domains they cite
or originate from: UT1-style blocklists, per-domain caps, domain audit
tables).

Reference parity note: the reference engine (OPENDAP/log-analysis) parses
request URLs out of log lines with grok patterns; this module is the
corpus-curation generalization — extract every URL from free text,
canonicalize to a registered domain, and gate/aggregate on it.

Scale design: extraction and domain canonicalization are pure JVM
projections (regexp_extract_all + a per-element lambda — zero Python,
zero shuffle, scan-fused); the blocklist gate keeps the list in the plan
as a literal array (bounded lists — the UT1 category lists a pipeline
actually gates on are 10^3-10^5 domains; for larger lists compose
``joins.bloom_prefiltered_join``'s bitmap probe in front).  Every regex
is RE2-safe (no backrefs, no ``\\s`` — the explicit ``[ \\t\\r\\n\\f]``
class) so DuckDB evaluates the identical pattern.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Explicit whitespace class: Java's \s and RE2's \s disagree on \x0B, so
# neither side uses \s at all.
URL_PATTERN = "https?://[^ \\t\\r\\n\\f<>\"']+"
# Trailing sentence punctuation is part of the sentence, not the URL.
TRAIL_PUNCT = "[.,;:!?)]+$"

# Minimal two-level public-suffix set: enough for the common ccTLD
# registries; a production deployment swaps in the full PSL snapshot
# (still a bounded literal/broadcast table).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.kr", "co.nz", "co.za",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
)


def _domain_of(url: F.Column) -> F.Column:
    """Registered domain (eTLD+1 under TWO_LEVEL_SUFFIXES) of one URL:
    authority -> drop userinfo -> drop port -> lowercase -> last 2 labels,
    or last 3 when the last 2 are a two-level public suffix."""
    host = F.lower(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract(url, "^https?://([^/?#]+)", 1),
                "^[^@]*@",
                "",
            ),
            ":[0-9]+$",
            "",
        )
    )
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    last3 = F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2)
    return (
        F.when((n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def with_url_domains(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``urls`` (every http(s) URL in the text, trailing sentence
    punctuation trimmed) and ``domains`` (sorted distinct registered
    domains) — one scan-fused projection, no shuffle, no Python."""
    urls = F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0)),
        lambda u: F.regexp_replace(u, TRAIL_PUNCT, ""),
    )
    out = df.withColumn("urls", urls)
    domains = F.array_sort(
        F.array_distinct(
            F.filter(
                F.transform(F.col("urls"), _domain_of), lambda d: d != ""
            )
        )
    )
    return out.withColumn("domains", domains)


def domain_counts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-registered-domain document counts over ``with_url_domains``
    output — the audit table a blocklist decision is made FROM.  domains
    is already per-doc distinct, so count(*) = distinct citing docs; the
    only shuffle is the narrow (domain) aggregate."""
    return (
        df.select(id_col, F.explode("domains").alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def blocklist_filter(df: DataFrame, blocked: Sequence[str]) -> DataFrame:
    """Drop every document citing ANY blocked registered domain (C4's
    badwords-domain gate).  The blocklist is a literal array in the plan —
    a pure projection filter, zero shuffle; ``arrays_overlap`` on the
    per-doc distinct domain set.  Raises on an empty blocklist (an empty
    gate is always a configuration error, never intent)."""
    if not blocked:
        raise ValueError("blocklist_filter: empty blocklist")
    return df.filter(
        ~F.arrays_overlap(
            F.col("domains"), F.array(*[F.lit(b) for b in blocked])
        )
    )


def path_prefix_rollup(
    df: DataFrame, path_col: str = "url_path", max_depth: int = 4
) -> DataFrame:
    """Hierarchical URL-path rollup: every path contributes one row per
    prefix depth (``/a/b/c`` -> ``/a``, ``/a/b``, ``/a/b/c``), counted —
    the path-tree view (traffic by collection, by sub-collection, ...)
    the reference reads off its per-path counts by hand
    (cmr_stats.py:88-104 tallies full paths only).

    -> (depth, prefix, n), depth capped at ``max_depth`` so the fan-out
    per row is bounded by a constant, not by path length.

    Scale shape: a projection + bounded generate (≤ max_depth rows per
    input), then ONE (depth, prefix) count aggregate — map-side
    combinable, and the shuffle key is the prefix string, whose
    cardinality is the size of the path TREE, not the traffic volume.
    Hot prefixes (every request shares ``/``-depth-1) are exactly the
    rows partial aggregation collapses before the exchange.
    """
    guarded = (
        f"CASE WHEN size(_segs) >= 1 THEN "
        f"transform(sequence(1, least(size(_segs), {int(max_depth)})), "
        f"d -> struct(d AS depth, "
        f"concat('/', array_join(slice(_segs, 1, d), '/')) AS prefix)) "
        f"ELSE array() END"
    )
    return (
        df.filter(F.col(path_col).isNotNull())
        .select(
            F.filter(
                F.split(F.col(path_col), "/"), lambda s: s != ""
            ).alias("_segs")
        )
        .select(F.explode(F.expr(guarded)).alias("_p"))
        .select(F.col("_p.depth").alias("depth"), F.col("_p.prefix").alias("prefix"))
        .groupBy("depth", "prefix")
        .agg(F.count(F.lit(1)).alias("n"))
    )
