from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import urls


@pytest.fixture(scope="module")
def linked(spark):
    rows = [
        (1, "plain text, no links at all"),
        (2, "see https://ads.tracker.com/a?x=1, then stop"),
        (3, "dual http://u:p@News.BBC.co.uk:8080/path#f and https://safe.io"),
        (4, "bare https://example.org. end"),
        (5, "repeat https://a.example.org/1 https://b.example.org/2"),
    ]
    return urls.with_url_domains(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_url_extraction_and_trailing_punct(spark, linked):
    got = {r["doc_id"]: list(r["urls"]) for r in linked.collect()}
    assert got[1] == []
    assert got[2] == ["https://ads.tracker.com/a?x=1"]  # trailing ',' trimmed
    assert got[4] == ["https://example.org"]            # trailing '.' trimmed
    assert len(got[3]) == 2 and len(got[5]) == 2


def test_registered_domains(spark, linked):
    got = {r["doc_id"]: list(r["domains"]) for r in linked.collect()}
    assert got[1] == []
    assert got[2] == ["tracker.com"]          # subdomain folded to eTLD+1
    assert got[3] == ["bbc.co.uk", "safe.io"]  # two-level suffix keeps 3 labels,
    #                                            userinfo/port/case stripped
    assert got[5] == ["example.org"]           # per-doc distinct


def test_blocklist_filter_drops_citing_docs(spark, linked):
    kept = {
        r["doc_id"]
        for r in urls.blocklist_filter(linked, ["tracker.com", "bbc.co.uk"]).collect()
    }
    assert kept == {1, 4, 5}
    with pytest.raises(ValueError, match="empty blocklist"):
        urls.blocklist_filter(linked, [])


def test_domain_counts(spark, linked):
    got = {r["domain"]: r["n_docs"] for r in urls.domain_counts(linked).collect()}
    assert got == {
        "tracker.com": 1, "bbc.co.uk": 1, "safe.io": 1, "example.org": 2,
    }


def test_blocklist_filter_is_pure_projection(spark, linked):
    """The gate is scan-fused: no Exchange, no Python in the plan."""
    plan = (
        urls.blocklist_filter(linked, ["tracker.com"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_path_prefix_rollup_edges(spark):
    from log_analysis_spark.operators.urls import path_prefix_rollup

    df = spark.createDataFrame(
        [("/a/b/c/d/e",), ("/a/b",), ("/a",), ("/",), (None,)],
        "url_path string",
    )
    got = {
        (r["depth"], r["prefix"]): r["n"]
        for r in path_prefix_rollup(df, max_depth=3).collect()
    }
    # '/' has no segments (no rows); None dropped; depth capped at 3
    assert got == {
        (1, "/a"): 3,
        (2, "/a/b"): 2,
        (3, "/a/b/c"): 1,
    }
