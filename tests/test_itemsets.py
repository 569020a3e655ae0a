"""Association rules: integer micro-unit confidence/lift vs a brute-force
Python mirror, direction symmetry, thresholds, and the basket guard."""

from __future__ import annotations

from itertools import combinations

import pytest

from log_analysis_spark.operators import itemsets

ROWS = [
    # (conv, tool) with a duplicate row to prove per-group dedup
    ("c1", "read"), ("c1", "read"), ("c1", "grep"), ("c1", "edit"),
    ("c2", "read"), ("c2", "grep"),
    ("c3", "read"), ("c3", "edit"),
    ("c4", "grep"),
    ("c5", "read"), ("c5", "grep"), ("c5", "bash"),
]


def _py_rules(rows, min_pair_count):
    baskets: dict = {}
    for g, it in rows:
        baskets.setdefault(g, set()).add(it)
    n_groups = len(baskets)
    item_n: dict = {}
    for s in baskets.values():
        for it in s:
            item_n[it] = item_n.get(it, 0) + 1
    pair_n: dict = {}
    for s in baskets.values():
        for a, b in combinations(sorted(s), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    out = {}
    for (a, b), nb in pair_n.items():
        if nb < min_pair_count:
            continue
        for ante, cons in ((a, b), (b, a)):
            out[(ante, cons)] = (
                nb, item_n[ante], item_n[cons], n_groups,
                (1_000_000 * nb) // item_n[ante],
                (1_000_000 * n_groups * nb) // (item_n[ante] * item_n[cons]),
            )
    return out


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "conv string, tool string")


def test_rules_match_bruteforce_mirror(spark):
    got = {
        (r["antecedent"], r["consequent"]): (
            r["n_both"], r["n_antecedent"], r["n_consequent"], r["n_groups"],
            r["confidence_micro"], r["lift_micro"],
        )
        for r in itemsets.pair_association_rules(
            _df(spark), "conv", "tool", min_pair_count=1
        ).collect()
    }
    assert got == _py_rules(ROWS, 1)
    # spot-check the semantics: read&grep co-occur in 3 of 5 convs;
    # confidence(read->grep) = 3/4, lift = 5*3/(4*4)
    assert got[("read", "grep")][0] == 3
    assert got[("read", "grep")][4] == 750_000
    assert got[("read", "grep")][5] == (1_000_000 * 5 * 3) // 16


def test_rules_min_pair_count_prunes_both_directions(spark):
    got = itemsets.pair_association_rules(
        _df(spark), "conv", "tool", min_pair_count=2
    ).collect()
    pairs = {(r["antecedent"], r["consequent"]) for r in got}
    assert pairs == {
        (a, b) for (a, b), v in _py_rules(ROWS, 2).items()
    }
    # bash pairs appear once only -> pruned entirely
    assert all("bash" not in p for p in pairs)


def test_rules_null_items_ignored_and_guard_fires(spark):
    rows = ROWS + [("c9", None)]
    df = spark.createDataFrame(rows, "conv string, tool string")
    got = itemsets.pair_association_rules(df, "conv", "tool", min_pair_count=1)
    # c9 holds only a null item: contributes no basket, so n_groups stays 5
    assert got.select("n_groups").distinct().collect()[0][0] == 5
    with pytest.raises(ValueError, match="max_basket"):
        itemsets.pair_association_rules(
            _df(spark), "conv", "tool", max_basket=2
        ).collect()
    with pytest.raises(ValueError, match="min_pair_count"):
        itemsets.pair_association_rules(_df(spark), "conv", "tool",
                                        min_pair_count=0)
