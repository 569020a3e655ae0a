"""spark-submit entrypoint for corpus preparation — the stage between dedup
and training: repetition filtering → stratified sampling → token-budget
shard packing → per-shard corpus write.

Cluster usage (same --py-files launch shape as jobs/run_pipeline.py):

    spark-submit --py-files log_analysis_spark.zip jobs/run_corpus.py \
        --docs /path/documents.parquet --out /path/corpus_out \
        --budget 1048576 --rates '{"en": 0.5}'

Sandbox usage:

    python jobs/run_corpus.py --sf-dir /root/testdata/sf0.001 --out /tmp/cp

Stages (each optional-off via flags, all deterministic — reruns produce
byte-identical shard assignments):

1. **repetition filter** (`corpus.repetition_stats`): drop docs whose
   duplicate-line / duplicate-character / top-2-gram fractions exceed the
   thresholds (Gopher-style spam gate).
2. **decontamination** (`corpus.decontaminate`, when ``--bench`` is given):
   drop docs sharing >= ``--decontam-min-hits`` word ``--decontam-n``-grams
   with the benchmark table.
3. **PII scrub** (`textstats.scrub_pii`, when ``--scrub-pii``): redact
   emails / IPv4s / long digit runs in place (text column replaced).
4. **stratified sample** (`corpus.stratified_sample`): per-stratum
   md5-threshold downsampling (e.g. re-weight dominant languages) — a pure
   filter, composes with partition pruning.
5. **shard packing** (`corpus.pack_shards`): md5-ordered exclusive token
   cumsum, shard = floor(cumsum / budget); written partitioned by shard so
   a training loader reads one directory per shard.
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
    ap.add_argument("--budget", type=int, default=65536, help="tokens per shard")
    ap.add_argument(
        "--rates",
        default="{}",
        help='JSON per-stratum sampling rates, e.g. \'{"en": 0.5}\' (empty = keep all)',
    )
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--no-repetition-filter", action="store_true")
    ap.add_argument("--bench", help="benchmark table (parquet) to decontaminate against")
    ap.add_argument("--decontam-n", type=int, default=5)
    ap.add_argument("--decontam-min-hits", type=int, default=1)
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from log_analysis_spark.operators import corpus, textstats
    from log_analysis_spark.session import get_spark

    spark = get_spark("run_corpus", master=args.master)
    path = args.docs or f"{args.sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    n_input = docs.count()

    # each expensive stage persists its output before the count so the
    # progressively-longer chain (explode→groupBy repetition trees, the
    # decontamination gram join) executes ONCE, not once per downstream
    # count + once for the final write; predecessors unpersist as soon as
    # the next stage is materialized
    prev_cached = None

    def _materialize(df):
        nonlocal prev_cached
        if df is prev_cached:
            # stage was a no-op (e.g. empty --rates, no --scrub-pii): the
            # frame is already persisted; unpersisting "prev" here would
            # evict the very cache the downstream two scans rely on
            return df, df.count()
        df = df.persist()
        n = df.count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = df
        return df, n

    if not args.no_repetition_filter:
        rep = corpus.repetition_stats(docs).select("doc_id", "keep_repetition")
        docs, n_clean = _materialize(
            docs.join(rep, "doc_id")
            .filter(F.col("keep_repetition"))
            .drop("keep_repetition")
        )
    else:
        n_clean = n_input

    if args.bench:
        bench = spark.read.parquet(args.bench)
        flags = corpus.decontaminate(
            docs, bench, n=args.decontam_n, min_hits=args.decontam_min_hits
        ).select("doc_id", "contaminated")
        docs, n_decontam = _materialize(
            docs.join(flags, "doc_id")
            .filter(~F.col("contaminated"))
            .drop("contaminated")
        )
    else:
        n_decontam = n_clean

    if args.scrub_pii:
        docs = (
            textstats.scrub_pii(docs)
            .drop("text")
            .withColumnRenamed("text_clean", "text")
        )

    rates = json.loads(args.rates)
    if rates:
        docs = corpus.stratified_sample(docs, args.strata_col, rates)
    # docs feeds pack_shards AND the final join — persist so the sampled
    # scrubbed frame isn't recomputed on both sides
    docs, n_sampled = _materialize(docs)

    packed = corpus.pack_shards(docs, budget=args.budget)
    out = (
        docs.join(packed.select("doc_id", "n_tokens", "shard"), "doc_id")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(f"{args.out}/shards")
    if prev_cached is not None:
        prev_cached.unpersist()

    shards = spark.read.parquet(f"{args.out}/shards")
    n_shards = shards.select("shard").distinct().count()
    tok_total = shards.agg(F.sum("n_tokens")).collect()[0][0] or 0
    print(
        json.dumps(
            {
                "n_input": n_input,
                "n_after_repetition_filter": n_clean,
                "n_after_decontamination": n_decontam,
                "n_after_sampling": n_sampled,
                "budget": args.budget,
                "n_shards": n_shards,
                "total_tokens": int(tok_total),
                "shards_path": f"{args.out}/shards",
            }
        )
    )


if __name__ == "__main__":
    main()
