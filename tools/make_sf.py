"""Deterministic scale-factor generator for the four scaled tables
(documents / embeddings / events — plus copies of the sf0.1 TPC-H
dimension parquets, which no sf1 query touches but whose views the
oracle harness registers unconditionally).

The driver only ships sf<=0.1; the 100 TB claim needs at least one pass
an order of magnitude up to surface size-dependent cliffs (spill,
partition counts, quadratic candidate blowups).  Correctness evidence at
a generated sf is as strong as at a driver sf: the oracle compare is
engine-vs-engine over the SAME parquet input, so only the SHAPE of the
data (schemas, value domains, dup structure, time ordering) has to match
the driver's distribution — measured off /root/testdata/sf0.1:

  * documents: doc_id 0..N-1, ~31-word vocab soup of 40..70 words,
    lang en ~40% / de es fr zh ~15% each, source src0..src19,
    n_chars = length(text); ~0.5% planted exact dups and ~1% near-dups
    (2-word edits) so the dedup operators have real work;
  * embeddings: unit-norm isotropic 64-dim float32, 10 balanced labels;
  * events: event_id-ordered timestamps across 30 days, ~15k users/M
    rows, 5 event types, exponential value (~1% NULL), props={"k": int}.

Sizes scale linearly: sf1 = 50k docs / 20k vectors / 1M events (10x the
driver's sf0.1).  numpy Generator(PCG64, seed=42) is bit-stable across
platforms, so the output is reproducible.

Usage: python tools/make_sf.py <sf> <out_dir>
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "stream line value a small table vector window scan batch customer "
    "spark column filter fast slow join order group row big data the "
    "query hash merge key sort agg part "
)

DIM_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    """Vocabulary SCALES with the corpus (Heaps' law, crudely): reusing the
    driver's 31-word soup at 10x the documents makes every shingle's
    posting list 10x denser — by 50k docs the 2-gram posting lists hit
    ~2.8k docs each and every prefix-filter candidate join goes quadratic,
    which no real corpus does (vocabulary grows with size).  Suffixed
    decile variants (word0..word<v>) keep per-shingle posting density
    roughly constant as n grows — same trick as the scaling bench's
    decorrelated replicas."""
    base = np.array(VOCAB.split())
    n_variants = max(1, int(round((n / 5_000) ** 0.5 * 3)))
    # variant 0 keeps the BARE word so fixed-term queries (BM25 / phrase
    # search rows probe the driver vocabulary) stay non-trivial at any sf
    vocab = np.array(
        [w if v == 0 else f"{w}{v}" for w in base for v in range(n_variants)]
    )
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
    lengths = rng.integers(40, 71, size=n)
    lang = langs[rng.choice(5, size=n, p=lang_p)]
    source = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    texts: list[str] = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=lengths[i])]
        texts.append(" ".join(words))
    # planted dup structure (deterministic positions):
    #   i % 199 == 13 -> exact copy of doc i-13   (~0.5%)
    #   i % 101 == 7  -> near-dup of doc i-7 with 2 word edits (~1%)
    for i in range(n):
        if i % 199 == 13 and i >= 13:
            texts[i] = texts[i - 13]
        elif i % 101 == 7 and i >= 7:
            w = texts[i - 7].split()
            w[3], w[11] = "drift", "probe"
            texts[i] = " ".join(w)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "source": pa.array(source, type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # a sprinkle of planted near-identical vectors for the neardup ops
    for i in range(0, n, 151):
        if i + 1 < n:
            v[i + 1] = v[i] + rng.standard_normal(dim).astype(np.float32) * 0.01
            v[i + 1] /= np.linalg.norm(v[i + 1])
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in v], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(n) * 2654435761 % 10).astype(np.int32),
                type=pa.int32(),
            ),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    span_us = 30 * 86400 * 1_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    base = (np.arange(n, dtype=np.int64) * (span_us // n))
    jitter = rng.integers(0, max(span_us // n, 1), size=n)
    ts = t0 + (base + jitter).astype("timedelta64[us]")
    types = np.array(["signup", "purchase", "view", "click", "error"])
    value = np.round(rng.exponential(50.0, size=n), 2)
    value = np.clip(value, 0.0, 560.0)
    null_mask = rng.random(n) < 0.01
    varr = pa.array(
        [None if m else float(x) for m, x in zip(null_mask, value)],
        type=pa.float64(),
    )
    n_users = max(int(round(n * 15 / 1000)), 10)
    return pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(1, n_users + 1, size=n), type=pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, 5, size=n)], type=pa.string()
            ),
            "value": varr,
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
                type=pa.string(),
            ),
        }
    )


def main() -> int:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_docs = int(round(50_000 * sf))
    n_vecs = int(round(20_000 * sf))
    n_events = int(round(1_000_000 * sf))
    pq.write_table(gen_documents(rng, n_docs), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, n_vecs), f"{out}/embeddings.parquet")
    pq.write_table(gen_events(rng, n_events), f"{out}/events.parquet")
    for t in DIM_TABLES:
        src = f"/root/testdata/sf0.1/{t}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    print(f"wrote sf={sf}: {n_docs} docs, {n_vecs} vecs, {n_events} events -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
