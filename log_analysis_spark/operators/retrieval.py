"""Keyword retrieval over the document corpus: BM25 top-k scoring.

A training-data pipeline uses lexical retrieval constantly — targeted
quality audits ("show me the docs about X"), data selection by query
(recall-oriented mining of domain documents), eval-set neighbor pulls,
and contamination triage all start from "rank the corpus against a small
query set".  This module provides the classic Okapi BM25 ranking
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond") re-expressed as DataFrame algebra:

* the corpus side is tokenized ONCE into a postings stream and
  immediately semi-filtered by the (broadcast) query vocabulary — at
  100 TB the only rows that survive the scan are postings of query
  terms, so shuffle volume is proportional to the hit set, not the
  corpus;
* document frequencies and per-document term frequencies are one
  aggregate each over that filtered stream (map-side combine, keys are
  (term) / (doc, term) — narrow and uniformly distributed);
* corpus statistics (N, total token count) ride a broadcast one-row
  aggregate that never touches text;
* per-query ranking is a window over scored documents only (documents
  sharing >= 1 term with the query), never the whole corpus.

Document text never enters an exchange; there is no per-row Python.

Cross-engine exactness (the repo's integer micro-nat discipline): the
only libm call is ln() inside idf, rounded to 6 decimals immediately
(the accepted 1-ulp risk class documented in textstats.unigram_surprise);
every other factor is IEEE +-*/ over exact integers and identically
parsed decimal constants, so the per-term contribution rounds to the
same 6th decimal in Spark and DuckDB and accumulates as exact integer
micro-units.

Reference provenance: the reference repo has no retrieval operator; this
extends the engine's corpus-curation surface (SURVEY.md "beyond the
reference" mandate) the same way dedup/quality/decontamination do.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_table, tokens_col

__all__ = ["bm25_topk", "phrase_search", "query_terms", "jaccard_topk", "rrf_fuse"]


def query_terms(
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    lowercase: bool = True,
) -> DataFrame:
    """Distinct (query_id, term) pairs from a query table — the standard
    de-duplicated BM25 query bag (each distinct query term contributes
    once; see Robertson & Zaragoza 2009 §3.2, the qtf-free form)."""
    toks = F.filter(tokens_col(query_text_col), lambda x: x != "")
    if lowercase:
        toks = F.transform(toks, F.lower)
    return queries.select(
        F.col(query_id_col), F.explode(F.array_distinct(toks)).alias("term")
    ).distinct()


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    lowercase: bool = True,
) -> DataFrame:
    """BM25 top-k documents per query →
    ``(query_id, doc_id, score, rank)``, ``rank`` 1-based, ties broken by
    ascending doc id.

    Scoring (Okapi BM25, Lucene's non-negative idf variant):

        score(d, q) = sum over distinct terms t of q present in d of
            idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )

    with N = total documents, df = documents containing t, dl = document
    token count, avgdl = total corpus tokens / N.  ``idf`` is rounded to
    6 decimals at the term level and each (query, doc, term) contribution
    to 6 decimals before integer micro-unit accumulation, so the score is
    bit-identical across engines (see module docstring).

    Scale shape: postings are filtered to the broadcast query vocabulary
    AT THE SCAN (inner hash join on the exploded token stream), so tf/df
    aggregation and scoring only ever see query-term postings; corpus
    stats are a text-free one-row broadcast; the rank window partitions
    by query over scored docs only.  Returns an empty frame when no
    document shares a term with any query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qterms = query_terms(queries, query_id_col, query_text_col, lowercase)
    vocab = F.broadcast(qterms.select("term").distinct())

    # per-doc token counts (dl) + corpus stats — no explode, text never
    # leaves the scan stage
    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    lengths = docs.select(F.col(id_col), F.size(toks).cast("long").alias("_dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).cast("long").alias("_n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).cast("long").alias("_total_len"),
    )

    # postings of query terms only: explode -> broadcast-filter -> tf/df
    postings = token_table(docs, text_col, id_col, lowercase).join(
        vocab, F.col("tok") == F.col("term")
    )
    tf = postings.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("_tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("_df"))

    n_docs = F.col("_n_docs").cast("double")
    idf6 = F.round(
        F.log((n_docs - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5)) + F.lit(1.0)),
        6,
    )
    # dl/avgdl = dl * N / total_len, all-double IEEE over exact integers
    dl_ratio = F.col("_dl").cast("double") * n_docs / F.col("_total_len").cast("double")
    tfd = F.col("_tf").cast("double")
    tfn = (
        tfd
        * F.lit(float(k1) + 1.0)
        / (tfd + F.lit(float(k1)) * (F.lit(1.0 - float(b)) + F.lit(float(b)) * dl_ratio))
    )
    contrib_micro = F.round(F.round(idf6 * tfn, 6) * F.lit(1e6), 0).cast("long")

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("_cmicro", contrib_micro)
        .join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_cmicro").alias("_smicro"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_smicro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(
            query_id_col,
            id_col,
            F.round(F.col("_smicro").cast("double") / F.lit(1e6), 6).alias("score"),
            "rank",
        )
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Exact-phrase retrieval: the documents whose token stream contains
    ``phrase``'s tokens CONSECUTIVELY -> (doc_id, n_matches, first_pos)
    (``first_pos`` 0-based token offset of the earliest match).  The
    positional-postings complement of ``bm25_topk`` — bag-of-words BM25
    cannot distinguish "new york" from "york new"; contamination triage
    and targeted audits need the exact form.

    Shape (the inverted positional index, folded into one pass): tokens
    posexplode to (doc, pos, tok); a literal IN-list keeps ONLY the
    phrase's tokens (pushed into the scan projection, so corpus shuffle
    volume is the phrase-token hit set, not the corpus); each surviving
    posting nominates the anchor positions it could support (pos - i for
    every phrase offset i holding that token — bounded fan-out, phrase
    length); a match is a (doc, anchor) cell covering all k offsets:
    ONE countDistinct aggregate.  Text never enters an exchange; no
    window, no join, no Python.
    """
    toks = [t for t in re.split(r"[^\w']+", phrase.strip()) if t]
    if lowercase:
        toks = [t.lower() for t in toks]
    if not toks:
        raise ValueError("phrase has no tokens")
    k = len(toks)
    stream = F.filter(tokens_col(text_col), lambda x: x != "")
    if lowercase:
        stream = F.transform(stream, F.lower)
    postings = docs.select(
        F.col(id_col), F.posexplode(stream).alias("pos", "tok")
    ).filter(F.col("tok").isin(toks))
    # offsets of this token within the phrase (literal map, bounded by k)
    offsets = F.array(
        *[
            F.when(F.col("tok") == F.lit(t), F.lit(i))
            for i, t in enumerate(toks)
        ]
    )
    anchors = postings.select(
        id_col,
        F.explode(F.filter(offsets, lambda o: o.isNotNull())).alias("i"),
        "pos",
    ).select(
        id_col, "i", (F.col("pos") - F.col("i")).alias("anchor")
    ).filter(F.col("anchor") >= 0)
    matches = (
        anchors.groupBy(id_col, "anchor")
        .agg(F.countDistinct("i").alias("_cov"))
        .filter(F.col("_cov") == k)
    )
    return matches.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


def jaccard_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    lowercase: bool = True,
) -> DataFrame:
    """Token-SET Jaccard ranking: top-k documents per query by
    ``|q ∩ d| / |q ∪ d|`` over distinct lowercased tokens →
    ``(query_id, doc_id, jaccard_micro, rank)``, rank 1-based, ties by
    ascending doc id.  Only documents sharing >= 1 term with the query are
    candidates (standard set-overlap retrieval semantics — a zero-overlap
    doc scores 0 and is never a useful top-k member).

    Cross-engine exactness: the score is
    ``jaccard_micro = (1_000_000 * |∩|) div (|q| + |d| - |∩|)`` — all
    exact integers, no float anywhere.

    Scale shape: the doc-side distinct-token count is computed AT THE SCAN
    (``size(array_distinct(...))`` — text never leaves the scan stage);
    intersections come from the postings stream broadcast-filtered to the
    query vocabulary, then a distinct + one narrow (query, doc) count
    aggregate; ranking windows over candidates only, never the corpus.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qterms = query_terms(queries, query_id_col, query_text_col, lowercase)
    qsize = qterms.groupBy(query_id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_qs")
    )

    toks = F.filter(tokens_col(text_col), lambda x: x != "")
    dtoks = F.array_distinct(F.transform(toks, F.lower)) if lowercase else F.array_distinct(toks)
    dsize = docs.select(F.col(id_col), F.size(dtoks).cast("long").alias("_ds"))

    inter = (
        token_table(docs, text_col, id_col, lowercase)
        .join(F.broadcast(qterms), F.col("tok") == F.col("term"))
        .select(query_id_col, id_col, "term")
        .distinct()
        .groupBy(query_id_col, id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_inter"))
    )
    scored = (
        inter.join(F.broadcast(qsize), query_id_col)
        .join(dsize, id_col)
        .withColumn(
            "jaccard_micro",
            F.expr("CAST((1000000 * _inter) DIV (_qs + _ds - _inter) AS BIGINT)"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("jaccard_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(query_id_col, id_col, "jaccard_micro", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    N per-query rankings into one — hybrid search's standard score-free
    merge (e.g. BM25 + vector ANN), robust to incomparable score scales
    because only RANKS enter the fusion:

        rrf(d) = sum over input lists of 1 / (k0 + rank_list(d))

    Each input frame needs ``(query_id, id, rank)``; a doc absent from a
    list contributes nothing for it.  Returns
    ``(query_id, doc_id, rrf_micro, rank)``, ties by ascending doc id.

    Cross-engine exactness: per-list contributions are
    ``1_000_000 div (k0 + rank)`` — exact integers summed exactly, so the
    fused order (and the oracle's) is bit-identical.

    Scale shape: inputs are already top-k-per-query (bounded: lists × k
    rows per query); the union + one narrow (query, doc) sum aggregate +
    per-query rank window never touch the corpus or any text/vector
    column."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = None
    for r in rankings:
        part = r.select(
            F.col(query_id_col),
            F.col(id_col),
            F.expr(f"CAST(1000000 DIV ({int(k0)} + rank) AS BIGINT)").alias("_c"),
        )
        contrib = part if contrib is None else contrib.unionByName(part)
    fused = contrib.groupBy(query_id_col, id_col).agg(
        F.sum("_c").alias("rrf_micro")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_micro").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(query_id_col, id_col, "rrf_micro", "rank")
    )
