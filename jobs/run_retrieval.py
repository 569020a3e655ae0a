"""spark-submit entrypoint for corpus retrieval — the audit/query side of
the engine: rank the documents table against a query set with BM25, a
token-set-Jaccard second ranker, and (optionally) fuse the two by
reciprocal-rank fusion into a hybrid top-k.

Cluster usage (same --py-files launch shape as jobs/run_pipeline.py):

    spark-submit --py-files log_analysis_spark.zip jobs/run_retrieval.py \
        --docs /path/documents.parquet --out /path/ret_out \
        --query "hash join table" --query "slow scan filter" --hybrid

Sandbox usage:

    python jobs/run_retrieval.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/ret --query "hash join table" --hybrid

Outputs under --out: ``bm25/`` (per-query BM25 top-k), ``jaccard/`` +
``hybrid/`` when ``--hybrid`` (the Jaccard ranking and the RRF fusion),
``phrase/`` when ``--phrase`` (exact-phrase match positions).  The summary
JSON line carries per-output row counts and the query list.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="documents table path (parquet)")
    src.add_argument("--sf-dir", help="testdata dir holding documents.parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--query", action="append", default=[],
        help="query text (repeatable; query_id = position, 1-based)",
    )
    ap.add_argument("--k", type=int, default=10, help="final top-k per query")
    ap.add_argument(
        "--k-each", type=int, default=0,
        help="per-ranker candidate depth before fusion (default 4*k)",
    )
    ap.add_argument("--hybrid", action="store_true",
                    help="also run the Jaccard ranker and RRF-fuse")
    ap.add_argument("--rrf-k0", type=int, default=60)
    ap.add_argument("--phrase", default="",
                    help="exact phrase to locate (positional match)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.query:
        ap.error("at least one --query is required")

    from log_analysis_spark.operators import retrieval
    from log_analysis_spark.session import get_spark

    spark = get_spark("run_retrieval", master=args.master)
    path = args.docs or f"{args.sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    queries = spark.createDataFrame(
        [(i + 1, q) for i, q in enumerate(args.query)],
        "query_id int, query_text string",
    )
    k_each = args.k_each or 4 * args.k
    counts: dict[str, int] = {}

    bm = retrieval.bm25_topk(docs, queries, k=k_each if args.hybrid else args.k)
    bm.write.mode("overwrite").parquet(f"{args.out}/bm25")
    counts["n_bm25"] = spark.read.parquet(f"{args.out}/bm25").count()

    if args.hybrid:
        jac = retrieval.jaccard_topk(docs, queries, k=k_each)
        jac.write.mode("overwrite").parquet(f"{args.out}/jaccard")
        counts["n_jaccard"] = spark.read.parquet(f"{args.out}/jaccard").count()
        fused = retrieval.rrf_fuse(
            [
                spark.read.parquet(f"{args.out}/bm25"),
                spark.read.parquet(f"{args.out}/jaccard"),
            ],
            k=args.k,
            k0=args.rrf_k0,
        )
        fused.write.mode("overwrite").parquet(f"{args.out}/hybrid")
        counts["n_hybrid"] = spark.read.parquet(f"{args.out}/hybrid").count()

    if args.phrase:
        ph = retrieval.phrase_search(docs, args.phrase)
        ph.write.mode("overwrite").parquet(f"{args.out}/phrase")
        counts["n_phrase_docs"] = spark.read.parquet(
            f"{args.out}/phrase"
        ).count()

    print(
        json.dumps(
            {
                "docs_path": path,
                "queries": args.query,
                "k": args.k,
                "hybrid": bool(args.hybrid),
                **counts,
            }
        )
    )


if __name__ == "__main__":
    main()
