"""Duplicated-span dedup (span_dedup.py) vs a brute-force Python oracle,
plus temperature_mix determinism/rate checks."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.corpus import temperature_mix
from log_analysis_spark.operators.span_dedup import (
    dedup_lines,
    dup_line_occurrences,
    dup_span_occurrences,
    dup_span_stats,
    remove_dup_spans,
    strip_common_lines,
)


def _toks(s: str) -> list[str]:
    # ASCII mirror of textstats.tokens_col (Java \w is ASCII-only)
    return [t for t in re.split(r"[^a-zA-Z0-9_']+", s.strip()) if t]


def _brute(docs: dict[int, str], k: int):
    """Keep-first duplicated-gram removal, straight from the definition."""
    occ = []  # (doc, pos, gram-string)
    for d in sorted(docs):
        t = _toks(docs[d])
        for i in range(len(t) - k + 1):
            occ.append((d, i, " ".join(t[i : i + k])))
    by_gram: dict[str, list[tuple[int, int]]] = {}
    for d, i, g in occ:
        by_gram.setdefault(g, []).append((d, i))
    removed = []
    for g, locs in by_gram.items():
        if len(locs) > 1:
            keeper = min(locs)
            removed.extend(loc for loc in locs if loc != keeper)
    covered: dict[int, set[int]] = {}
    for d, i in removed:
        covered.setdefault(d, set()).update(range(i, i + k))
    stats = {}
    clean = {}
    for d in sorted(docs):
        t = _toks(docs[d])
        cov = covered.get(d, set())
        stats[d] = (
            len(t),
            len(cov),
            round(len(cov) / len(t), 6) if t else 0.0,
        )
        clean[d] = " ".join(x for i, x in enumerate(t) if i not in cov)
    return set(removed), stats, clean


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(d, s) for d, s in sorted(docs.items())], "doc_id long, text string"
    )


PLANTED = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "intro words then the quick brown fox jumps away fast",
    3: "totally unrelated content with unique words only here",
    4: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    5: "x y",  # shorter than k=3: no grams
    6: "",  # empty
}


def test_dup_span_planted_matches_brute_force(spark):
    k = 3
    removed_b, stats_b, clean_b = _brute(PLANTED, k)
    df = _docs_df(spark, PLANTED)
    removed = {
        (r["doc_id"], r["pos"])
        for r in dup_span_occurrences(df, k=k).collect()
    }
    assert removed == removed_b
    stats = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_coverage"])
        for r in dup_span_stats(df, k=k).collect()
    }
    assert stats == stats_b
    clean = {
        r["doc_id"]: r["clean_text"] for r in remove_dup_spans(df, k=k).collect()
    }
    assert clean == clean_b
    # exact-duplicate doc 4 is fully covered; keeper doc 1 is untouched
    assert clean[4] == ""
    assert clean[1] == PLANTED[1]
    # short/empty docs pass through
    assert clean[5] == "x y" and clean[6] == ""
    assert stats[6] == (0, 0, 0.0)


@pytest.mark.parametrize("k", [2, 4])
def test_dup_span_random_corpus_matches_brute_force(spark, k):
    rng = random.Random(20260818 + k)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for d in range(1, 41)
    }
    removed_b, stats_b, clean_b = _brute(docs, k)
    df = _docs_df(spark, docs)
    removed = {
        (r["doc_id"], r["pos"])
        for r in dup_span_occurrences(df, k=k).collect()
    }
    assert removed == removed_b
    stats = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_coverage"])
        for r in dup_span_stats(df, k=k).collect()
    }
    assert stats == stats_b
    clean = {
        r["doc_id"]: r["clean_text"] for r in remove_dup_spans(df, k=k).collect()
    }
    assert clean == clean_b


def test_dup_span_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        dup_span_occurrences(_docs_df(spark, {1: "a b c"}), k=0)


# ---------------------------------------------------------------- mixing


def _mix_df(spark):
    rows = [(i, "A" if i <= 900 else "B", 10 + (i % 7)) for i in range(1, 1001)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")


def test_temperature_mix_identity_keeps_everything(spark):
    df = _mix_df(spark)
    out = temperature_mix(df, "source", temperature=1.0, target_fraction=1.0)
    assert out.count() == df.count()


def test_temperature_mix_flattens_and_is_deterministic(spark):
    df = _mix_df(spark)
    out = temperature_mix(df, "source", temperature=1e9, target_fraction=0.5)
    kept = {(r["doc_id"], r["source"]) for r in out.collect()}
    by_src = {"A": 0, "B": 0}
    for _, s in kept:
        by_src[s] += 1
    # T -> inf flattens shares to 1/2 each: B's rate hits 1.0 (all 100 kept),
    # A's is 250/900 ~ 0.278 (md5 draw is fixed, so the count is a constant
    # inside a binomial-ish band)
    assert by_src["B"] == 100
    assert 200 <= by_src["A"] <= 300
    again = {
        (r["doc_id"], r["source"])
        for r in temperature_mix(
            df, "source", temperature=1e9, target_fraction=0.5
        ).collect()
    }
    assert again == kept
    # kept rows are a subset of the input, schema unchanged
    assert out.columns == df.columns


def test_temperature_mix_weight_col_and_natural_temperature(spark):
    df = _mix_df(spark)
    # T=1 keeps natural shares: every source's rate is exactly target_fraction
    out = temperature_mix(
        df, "source", temperature=1.0, target_fraction=0.25, weight_col="n_tokens"
    )
    n = out.count()
    assert 150 <= n <= 350  # ~250 expected under the fixed md5 draw


def test_temperature_mix_rejects_bad_params(spark):
    df = _mix_df(spark)
    with pytest.raises(ValueError):
        temperature_mix(df, "source", temperature=0.0)
    with pytest.raises(ValueError):
        temperature_mix(df, "source", target_fraction=0.0)


def test_line_dedup_keep_first_and_rebuild(spark):
    """Planted duplicate lines across and within docs: keep-first by
    (doc_id, pos), ineligible lines (short / blank) untouched, rebuild
    preserves surviving line order."""
    dup = "shared navigation chrome line"
    docs = [
        (1, f"{dup}\nunique alpha content here\nok"),      # keeper (doc 1 pos 0)
        (2, f"intro text two\n{dup}\nmore body two"),       # loses its copy
        (3, f"{dup}\n{dup}\ntail three content"),           # loses both copies
        (4, "totally unrelated document body"),
        (5, ""),                                              # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    removed = {
        (r["doc_id"], r["pos"])
        for r in dup_line_occurrences(df, min_words=2).collect()
    }
    assert removed == {(2, 1), (3, 0), (3, 1)}
    out = {r["doc_id"]: r for r in dedup_lines(df, min_words=2).collect()}
    assert out[1]["clean_text"] == docs[0][1]          # keeper doc intact
    assert out[2]["clean_text"] == "intro text two\nmore body two"
    assert out[3]["clean_text"] == "tail three content"
    assert out[3]["n_lines"] == 3 and out[3]["n_lines_removed"] == 2
    assert out[4]["clean_text"] == docs[3][1]
    assert out[5]["clean_text"] == "" and out[5]["n_lines"] == 1
    # "ok" (1 word) is ineligible at min_words=2 even though... it is
    # unique anyway; plant an explicit short-dup check:
    df2 = spark.createDataFrame(
        [(1, "yes\nbody one two"), (2, "yes\nbody three four")],
        "doc_id long, text string",
    )
    assert dup_line_occurrences(df2, min_words=2).count() == 0
    assert (
        dup_line_occurrences(df2, min_words=1).collect()[0]["doc_id"] == 2
    )


def test_line_dedup_whitespace_normalized_key(spark):
    """Indentation variants of a line share the md5(trim(line)) key, and
    the REBUILT text keeps the surviving occurrence byte-identical
    (original indentation, not the trimmed key form)."""
    df = spark.createDataFrame(
        [(1, "  shared template line\nunique one"),
         (2, "shared template line   \nunique two")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean_text"]
           for r in dedup_lines(df, min_words=2).collect()}
    assert out[1] == "  shared template line\nunique one"
    assert out[2] == "unique two"
    with pytest.raises(ValueError, match="min_words"):
        dup_line_occurrences(df, min_words=0)


def test_strip_common_lines_threshold_and_no_keeper(spark):
    """A line in >= max(min_docs, ceil(frac*n)) distinct docs is removed
    from EVERY doc (no keeper kept); sub-threshold lines are untouched
    even when duplicated; within-doc repeats count as ONE distinct doc."""
    common = "shared cookie banner line"
    sub = "below threshold line"
    docs = [
        (1, f"{common}\nunique one body"),
        (2, f"{common}\n{common}\nunique two body"),   # twice in ONE doc
        (3, f"{common}\nunique three body"),
        (4, f"{sub}\nunique four body"),
        (5, f"{sub}\nunique five body"),
        (6, "nothing shared here at all"),
        (7, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # threshold: max(3, ceil(0.1*7)=1) = 3 distinct docs -> only `common`
    out = {r["doc_id"]: r for r in strip_common_lines(
        df, max_doc_frac=0.1, min_docs=3, min_words=2
    ).collect()}
    assert out[1]["clean_text"] == "unique one body"
    assert out[2]["clean_text"] == "unique two body"
    assert out[2]["n_lines_removed"] == 2       # both within-doc copies go
    assert out[3]["clean_text"] == "unique three body"
    # `sub` is in only 2 docs < 3 -> kept everywhere (dedup_lines' job)
    assert out[4]["clean_text"] == docs[3][1]
    assert out[5]["clean_text"] == docs[4][1]
    assert out[6]["clean_text"] == docs[5][1]
    assert out[7]["clean_text"] == "" and out[7]["n_lines_removed"] == 0
    # distinct-doc counting: min_docs=2 now also catches `sub`
    out2 = {r["doc_id"]: r["clean_text"] for r in strip_common_lines(
        df, max_doc_frac=0.1, min_docs=2, min_words=2
    ).collect()}
    assert out2[4] == "unique four body" and out2[5] == "unique five body"
    with pytest.raises(ValueError, match="max_doc_frac"):
        strip_common_lines(df, max_doc_frac=0.0)
    with pytest.raises(ValueError, match="min_words"):
        strip_common_lines(df, min_words=0)


def test_strip_common_then_dedup_lines_composition(spark):
    """The documented 100 TB composition: strip_common_lines removes the
    hot frequency-common lines, then dedup_lines on the residue resolves
    only sub-threshold duplicates — and the pair's combined removal
    equals running dedup_lines alone except that common lines lose ALL
    occurrences (dedup_lines alone would keep one)."""
    common = "hot recurring header line"
    docs = [(i, f"{common}\nbody line number {i} here") for i in range(1, 5)]
    docs.append((5, "body line number 1 here\nunique tail five"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stripped = strip_common_lines(
        df, max_doc_frac=0.5, min_docs=2, min_words=2
    ).select("doc_id", F.col("clean_text").alias("text"))
    final = {r["doc_id"]: r["clean_text"]
             for r in dedup_lines(stripped, min_words=2).collect()}
    assert final[1] == "body line number 1 here"   # keeper of the sub-dup
    assert final[5] == "unique tail five"          # its copy deduped
    for i in (2, 3, 4):
        assert final[i] == f"body line number {i} here"
    assert common not in "\n".join(final.values())
