"""Log template mining — Drain-style structure discovery over raw log
lines (He et al. 2017, "Drain: An Online Log Parsing Approach"), the
operator a log-analysis engine uses to turn millions of free-text lines
into a few dozen event TYPES (and to flag the lines that match none of
the common ones).

The reference greps known patterns out of known line shapes
(cmr_stats.py:21-63's hand-written regex table); template mining is the
inverse: discover the line shapes from the data.  This implementation is
a deterministic batch variant of Drain's grouping rule so the result is
exactly reproducible cross-engine (the online Drain tree is
insertion-order dependent — useless for an oracle):

  1. tokenize on whitespace; any token containing a digit is masked to
     ``<#>`` (Drain's preprocessing step — numbers are almost never part
     of the constant structure);
  2. group lines by (token count, first masked token) — Drain's
     fixed-depth prefix tree with depth 1, made exact;
  3. within a group, a position keeps its token iff EVERY line in the
     group agrees on it; disagreeing positions become ``<*>``.

Scale shape: one posexplode to (group, pos, token) rows — tokens are
short and the document/line text itself never enters an exchange after
tokenization; the per-position agreement is a (group, pos) aggregate
(map-side combinable), the template reassembly a (group) aggregate over
at most n_positions rows per group, and line counts ride a separate
narrow (group) aggregate.  A template that dominates the corpus (the
normal case for logs) hashes to ONE (group, pos) cell per position —
bounded by line length, not line volume, so hot templates cannot
straggle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASK = "<#>"
WILD = "<*>"


def _masked_tokens(text_col: str) -> F.Column:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return F.transform(
        toks,
        lambda t: F.when(t.rlike("[0-9]"), F.lit(MASK)).otherwise(t),
    )


def _grouped(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        _masked_tokens(text_col).alias("_tk"),
    ).select(
        "_tk",
        F.size("_tk").alias("n_tok"),
        F.element_at("_tk", 1).alias("head"),
    )


def mine_templates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (template, n_tok, n_wild, n_lines): one row per discovered
    template, its positional wildcard count, and how many input lines it
    covers.  Deterministic: independent of row and partition order."""
    base = _grouped(df, text_col)
    lines = base.groupBy("n_tok", "head").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    pos = base.select(
        "n_tok", "head", F.posexplode("_tk").alias("pos", "tok")
    )
    agg = pos.groupBy("n_tok", "head", "pos").agg(
        F.countDistinct("tok").alias("_nd"), F.min("tok").alias("_tok0")
    )
    tok_out = F.when(F.col("_nd") == 1, F.col("_tok0")).otherwise(F.lit(WILD))
    tmpl = (
        agg.select("n_tok", "head", "pos", tok_out.alias("_t"),
                   (F.col("_nd") > 1).cast("int").alias("_w"))
        .groupBy("n_tok", "head")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_t"))),
                    lambda s: s["_t"],
                ),
                " ",
            ).alias("template"),
            F.sum("_w").cast("long").alias("n_wild"),
        )
    )
    return tmpl.join(lines, ["n_tok", "head"]).select(
        "template", "n_tok", "n_wild", "n_lines"
    )


def rare_template_lines(
    df: DataFrame,
    text_col: str = "text",
    min_lines: int = 5,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Anomalous-line detection: the lines whose template covers fewer
    than ``min_lines`` lines — the "never seen this shape before" alert
    feed.  The template table is tiny (distinct shapes, not lines), so
    both attach joins broadcast: the corpus itself is never reshuffled.
    """
    base = df.select(
        *(keep_cols or df.columns),
        _masked_tokens(text_col).alias("_tk"),
    ).select(
        *(keep_cols or df.columns),
        F.size("_tk").alias("n_tok"),
        F.element_at("_tk", 1).alias("head"),
    )
    tmpl = mine_templates(df, text_col).filter(
        F.col("n_lines") < min_lines
    )
    # re-derive the grouping key of each rare template from its own
    # tokenization (the template's head is the group head: position 1
    # either agreed — the head itself — or is a wildcard only if heads
    # differed, impossible within a (n_tok, head) group)
    rare = tmpl.select(
        F.size(F.split(F.col("template"), r"\s+")).alias("n_tok"),
        F.element_at(F.split(F.col("template"), r"\s+"), 1).alias("head"),
        "template",
        "n_lines",
    )
    return base.join(F.broadcast(rare), ["n_tok", "head"]).drop(
        "n_tok", "head"
    )
