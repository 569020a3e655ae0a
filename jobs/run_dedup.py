"""spark-submit entrypoint for the corpus-dedup pipeline — the training-data
half of the engine: near-dup pair discovery → connected-components group
resolution → deduplicated corpus write.

Cluster usage (same --py-files launch shape as jobs/run_pipeline.py):

    spark-submit --py-files log_analysis_spark.zip jobs/run_dedup.py \
        --docs /path/documents.parquet --out /path/dedup_out --method jaccard

Sandbox usage:

    python jobs/run_dedup.py --sf-dir /root/testdata/sf0.001 --out /tmp/dd

Methods: ``jaccard`` = exact global n-gram Jaccard via prefix filtering
(100% recall at the threshold); ``minhash`` = MinHash+LSH candidates with
exact-Jaccard verify (recall governed by the banding).  Both resolve pairs
to groups and keep the lowest-id representative per group.
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
    ap.add_argument("--method", default="jaccard", choices=["jaccard", "minhash"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--shingle-k", type=int, default=2)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from log_analysis_spark.operators import dedup
    from log_analysis_spark.session import get_spark

    spark = get_spark("run_dedup", master=args.master)
    path = args.docs or f"{args.sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)

    if args.method == "jaccard":
        pairs = dedup.ngram_jaccard_pairs(
            docs, k=args.shingle_k, threshold=args.threshold
        )
    else:
        pairs = dedup.minhash_lsh_pairs(
            docs, k=max(args.shingle_k, 3), threshold=args.threshold
        )
    # pair discovery (shingle → band join → exact verify) is the job's most
    # expensive stage and is consumed twice — by the group resolution below
    # and by the n_pairs summary count — so cache the pair list (tiny
    # relative to the corpus: one row per near-dup pair)
    pairs = pairs.persist()
    groups = dedup.neardup_groups(docs.select(F.col("doc_id").alias("id")), pairs)
    kept = dedup.drop_near_duplicates(docs, groups)
    kept.write.mode("overwrite").parquet(f"{args.out}/kept")

    n_docs = docs.count()
    n_kept = spark.read.parquet(f"{args.out}/kept").count()
    print(
        json.dumps(
            {
                "method": args.method,
                "threshold": args.threshold,
                "n_docs": n_docs,
                "n_pairs": pairs.count(),
                "n_kept": n_kept,
                "n_dropped": n_docs - n_kept,
                "kept_path": f"{args.out}/kept",
            }
        )
    )


if __name__ == "__main__":
    main()
