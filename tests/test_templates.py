"""Drain-style template mining (operators/templates.py): positional
agreement, digit masking, group isolation, and order independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_spark.operators import templates


def _df(spark, lines):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(lines)], "line_id long, text string"
    )


def test_templates_positional_agreement(spark):
    lines = [
        "cache hit for /a/b",
        "cache miss for /c/d",
        "cache hit for /e/f",
        "worker started ok now",
    ]
    got = {
        (r["template"], r["n_tok"], r["n_wild"], r["n_lines"])
        for r in templates.mine_templates(_df(spark, lines)).collect()
    }
    assert got == {
        ("cache <*> for <*>", 4, 2, 3),
        ("worker started ok now", 4, 0, 1),
    }


def test_templates_digit_masking_unifies_numbers(spark):
    # digit-bearing tokens mask to <#> BEFORE grouping, so lines that
    # differ only in numbers share one fully-constant template
    lines = ["took 12 ms", "took 7 ms", "took 4096 ms"]
    got = templates.mine_templates(_df(spark, lines)).collect()
    assert len(got) == 1
    assert got[0]["template"] == "took <#> ms"
    assert got[0]["n_wild"] == 0
    assert got[0]["n_lines"] == 3


def test_templates_group_isolation(spark):
    # same head, different token counts -> separate groups (never merged)
    lines = ["start job alpha", "start job", "start job beta"]
    got = {
        (r["template"], r["n_lines"])
        for r in templates.mine_templates(_df(spark, lines)).collect()
    }
    assert got == {("start job <*>", 2), ("start job", 1)}


def test_templates_order_independent(spark):
    lines = [f"evt {chr(97 + i % 5)} done" for i in range(40)]
    a = templates.mine_templates(_df(spark, lines))
    b = templates.mine_templates(_df(spark, list(reversed(lines))).repartition(7))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rare_template_lines(spark):
    lines = ["ping ok"] * 9 + ["segfault at 0xdead handler crashed"]
    out = templates.rare_template_lines(
        _df(spark, lines), min_lines=5, keep_cols=["line_id", "text"]
    ).collect()
    assert len(out) == 1
    assert out[0]["text"].startswith("segfault")
    assert out[0]["template"] == "segfault at <#> handler crashed"
    assert out[0]["n_lines"] == 1
