"""Market-basket association mining over grouped item sets.

The reference aggregates per-class counts (SURVEY.md §2.5 A1/A2); this
module adds the CO-OCCURRENCE layer a workflow-analytics pipeline needs:
which tools are invoked together in the same conversation, and with what
confidence/lift — the classic support/confidence/lift association rules
(Agrawal et al. 1993) restricted to pairs, which is the part of frequent
itemset mining that parallelizes as plain DataFrame algebra (no candidate
generation rounds, no FP-tree).

Exact cross-engine by construction: confidence and lift are emitted in
integer micro-units via integral division —

    confidence_micro = (10^6 * n_both)              div n_antecedent
    lift_micro       = (10^6 * n_groups * n_both)   div (n_ante * n_cons)

(the lift numerator in DECIMAL(38,0): 10^6 * n_groups * n_both overflows
BIGINT at ~10^6 groups x 10^6 pairs) — no float anywhere, so the DuckDB
oracle replays the whole computation bit-for-bit.

Scale shape (100 TB): the per-group item sets are deduped FIRST (one
shuffle keyed by (group, item) — narrow rows, never the payload), so the
pair join fans out per-group over BASKET sizes, not event counts; basket
size is bounded by the item vocabulary (tool registry), and the loud
``max_basket`` guard refuses quadratic blow-up instead of silently
stalling.  Pair counts and item counts are map-side-combined aggregates;
the per-item totals attach via broadcast (the item table is vocabulary-
sized by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int = 10_000,
) -> DataFrame:
    """Directed pair rules antecedent -> consequent over the distinct
    per-group item sets of ``df``.

    Returns (antecedent, consequent, n_both, n_antecedent, n_consequent,
    n_groups, confidence_micro, lift_micro), both directions of every
    unordered co-occurring pair with ``n_both >= min_pair_count``.

    ``max_basket`` is a loud guard: a group holding more distinct items
    than this raises instead of paying an unbounded quadratic fan-out
    (the SemDeDup ``max_cluster`` discipline).
    """
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1: {min_pair_count}")
    baskets = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    sizes = baskets.groupBy("g").agg(F.count(F.lit(1)).alias("n_items"))
    big = sizes.filter(F.col("n_items") > max_basket).limit(1).collect()
    if big:
        raise ValueError(
            f"group {big[0]['g']!r} holds {big[0]['n_items']} distinct items "
            f"(> max_basket={max_basket}); refusing quadratic pair fan-out — "
            "raise max_basket explicitly if this is intended"
        )
    totals = sizes.agg(F.count(F.lit(1)).alias("n_groups"))
    item_counts = baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_counts = (
        a.join(b, on=(F.col("a.g") == F.col("b.g"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pair_count)
    )
    directed = pair_counts.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_both",
    ).unionByName(
        pair_counts.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_both",
        )
    )
    ante = item_counts.select(
        F.col("item").alias("antecedent"), F.col("n_item").alias("n_antecedent")
    )
    cons = item_counts.select(
        F.col("item").alias("consequent"), F.col("n_item").alias("n_consequent")
    )
    withn = (
        directed.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(totals))
    )
    return withn.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        "n_consequent",
        "n_groups",
        F.expr(
            "CAST((1000000 * n_both) div n_antecedent AS BIGINT)"
        ).alias("confidence_micro"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_groups * n_both)"
            " div (CAST(n_antecedent AS DECIMAL(38,0)) * n_consequent)"
            " AS BIGINT)"
        ).alias("lift_micro"),
    )
