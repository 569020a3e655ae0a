"""Similarity search over an embedding column (``array<float>``).

* Brute-force cosine top-k — the correctness baseline: broadcast the query
  set, JVM-side dot products via ``zip_with`` + ``aggregate`` (no Python in
  the scoring loop), window top-k.
* IVF (inverted-file) top-k — the scale path: corpus vectors are assigned
  to their nearest of K centroids once; a query probes only its ``n_probe``
  nearest centroid buckets, cutting scored pairs by ~K/n_probe.  At 100 TB
  the assignment is a narrow map + one small broadcast join; no cross join
  ever materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _let(value: F.Column, body) -> F.Column:
    """Let-binding for Catalyst expressions: evaluate ``value`` ONCE and
    expose it to ``body`` as a lambda variable.  A higher-order lambda
    re-evaluates any closed-over subtree once per element, so e.g. a norm
    referenced inside a per-component normalize lambda would re-run the
    O(dim) aggregate for every component — O(dim²) per row."""
    return F.element_at(F.transform(F.array(value), body), 1)


def with_unit_vec(df: DataFrame, vec_col: str = "embedding", out: str = "unit") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    unit = _let(
        v,
        lambda vv: _let(
            _norm(vv),
            lambda n: F.when(n > 0, F.transform(vv, lambda x: x / n)),
        ),
    )
    return df.withColumn(out, unit)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: score = dot(unit_q, unit_c); ranking uses
    the score rounded to 1e-6 with id tiebreak so ordering is reproducible
    across engines/float orders."""
    from pyspark.sql import Window

    c = with_unit_vec(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col("unit").alias("cvec")
    )
    q = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .withColumn("score", F.round(_dot(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "corpus_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


_PAIR_COSINE_UDF = None


def _pair_cosine(ua: F.Column, ub: F.Column) -> F.Column:
    """Batched exact dot of two unit-vector columns (einsum over the whole
    Arrow batch), rounded to 1e-6 like every cross-engine score here.

    The pandas_udf is built lazily on first use: decorating at module level
    parses the return type via the active SparkContext, which breaks any
    import that happens before the session exists (e.g. spark-submit
    entrypoints and bench subprocesses import operators first)."""
    global _PAIR_COSINE_UDF
    if _PAIR_COSINE_UDF is None:

        @F.pandas_udf("double")
        def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series([], dtype="float64")
            A = np.stack(a.to_numpy())
            B = np.stack(b.to_numpy())
            return pd.Series(np.round(np.einsum("ij,ij->i", A, B), 6))

        _PAIR_COSINE_UDF = _cos
    return _PAIR_COSINE_UDF(ua, ub)


def cosine_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRODUCTION form of the exact brute-force top-k: the query matrix
    rides in the UDF closure and each Arrow batch of the corpus is scored
    with ONE numpy matmul (``U_batch @ Q.T``), keeping only that batch's
    top-(k+1) per query — so the shuffle carries ~batches × |Q| × (k+1)
    candidate rows instead of the |corpus| × |Q| join product the
    expression path materializes.  A final tiny window merges the partial
    top-ks.  Exactness: each batch emits its best k+1 rows under the SAME
    total order as the final ranking (score desc, corpus_id asc — lexsort),
    and k+1 covers the case where the batch's own self-match occupies a
    slot, so the global top-k (excluding self) is always among the
    candidates.  Scores are round-6 like the expression path; tests assert
    identical output.

    Driver-side |Q| × dim query matrix is the same pattern as the IVF
    coarse quantizer — queries are the broadcast-small side by contract."""
    from pyspark.sql import Window

    q_rows = (
        with_unit_vec(queries, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("query_id"), "unit")
        .collect()
    )
    if not q_rows:
        raise ValueError("no non-null query vectors")
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["unit"] for r in q_rows], dtype=np.float64)  # (q, dim)
    dim = Q.shape[1]
    take = k + 1

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(
                    f"corpus dim {E.shape[1]} != query dim {dim}"
                )
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            ids = ids[keep]
            U = E[keep] / nrm[keep, None]
            S = np.round(U @ Q.T, 6)  # (n, q)
            n = len(ids)
            out_q, out_c, out_s = [], [], []
            for j in range(Q.shape[0]):
                col = S[:, j]
                if n > take:
                    # exact top-(k+1) under (score desc, corpus_id asc):
                    # lexsort is stable with the LAST key primary
                    top = np.lexsort((ids, -col))[:take]
                else:
                    top = np.lexsort((ids, -col))
                out_q.append(np.full(len(top), q_ids[j]))
                out_c.append(ids[top])
                out_s.append(col[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "corpus_id": np.concatenate(out_c),
                    "score": np.concatenate(out_s),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        batch_iter, "query_id long, corpus_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        cand.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def _lit_vec(v: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _centroid_sims(unit: F.Column, cents: list[list[float]]) -> F.Column:
    """Array of round-6 cosine sims vs each (unit-norm) centroid — a pure
    projection over centroid literals: assignment and probing never shuffle
    or window the corpus."""
    return F.array(*[F.round(_dot(unit, _lit_vec(c)), 6) for c in cents])


def build_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_rounds: int = 2,
    sample_mod: int = 1,
) -> list[list[float]]:
    """IVF centroid build, scale-shaped end to end:

    * seeds — the ``n_centroids`` lowest ``xxhash64(id)`` vectors via
      ``orderBy(hash).limit(K)``, which Spark executes as per-partition
      top-K + driver merge (TakeOrderedAndProject): deterministic
      hash-sampling with NO single-task global sort (the round-1 build
      windowed ``row_number() OVER (ORDER BY id)`` over the whole corpus).
    * refinement — ``kmeans_rounds`` Lloyd iterations over a deterministic
      hash-sample (``xxhash64(id) % sample_mod == 0``): assignment is a
      shuffle-free projection (``_centroid_sims`` argmax), means come from
      one posexplode + groupBy(cid, dim) pass.
    * the K×dim centroid table is driver-side by design — it is broadcast
      into every subsequent expression, exactly like any ANN index's
      coarse quantizer.

    Components are rounded to 6 decimals so downstream plans embed compact,
    engine-portable literals.
    """
    cu = with_unit_vec(corpus, vec_col).filter(F.col("unit").isNotNull())
    seed_rows = (
        cu.select("unit")
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    cents = [[round(float(x), 6) for x in r["unit"]] for r in seed_rows]
    if not cents:
        raise ValueError(
            "no centroid seeds: corpus has no non-zero-norm vectors"
        )

    sample = cu if sample_mod <= 1 else cu.filter(
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(sample_mod)) == 0
    )
    for _ in range(kmeans_rounds):
        sims = _centroid_sims(F.col("unit"), cents)
        assigned = sample.withColumn(
            "centroid_id", F.array_position(sims, F.array_max(sims)).cast("int")
        )
        means = (
            assigned.select("centroid_id", F.posexplode("unit").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        dim = len(cents[0])
        acc = {cid + 1: np.zeros(dim) for cid in range(len(cents))}
        seen = set()
        for r in means:
            acc[r["centroid_id"]][r["dim"]] = r["m"]
            seen.add(r["centroid_id"])
        new_cents = []
        for cid in range(1, len(cents) + 1):
            if cid in seen and np.linalg.norm(acc[cid]) > 0:
                v = acc[cid] / np.linalg.norm(acc[cid])
                new_cents.append([round(float(x), 6) for x in v])
            else:  # empty cluster: keep the previous centroid
                new_cents.append(cents[cid - 1])
        cents = new_cents
    return cents


def assign_to_centroids(
    corpus: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest of the GIVEN centroids
    (ties → lowest centroid id via array_position-of-max).  The assignment
    is a pure projection — no join, no window, no shuffle on the corpus."""
    cu = with_unit_vec(corpus, vec_col).filter(F.col("unit").isNotNull())
    sims = _centroid_sims(F.col("unit"), cents)
    return cu.withColumn(
        "centroid_id", F.array_position(sims, F.array_max(sims)).cast("int")
    ).select(id_col, "centroid_id", "unit")


def assign_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_rounds: int = 2,
    sample_mod: int = 1,
) -> tuple[DataFrame, list[list[float]]]:
    """Build centroids (``build_centroids``) and assign the corpus to them.

    Returns (assigned corpus with ``centroid_id``, centroid list)."""
    cents = build_centroids(
        corpus, n_centroids, id_col, vec_col, kmeans_rounds, sample_mod
    )
    return assign_to_centroids(corpus, cents, id_col, vec_col), cents


def md5_seed_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """ENGINE-PORTABLE centroid seeds: the unit vectors of the
    ``n_centroids`` corpus rows with the lowest ``md5(cast(id as string))``,
    components rounded to 6 decimals — every ingredient (md5 ordering, unit
    normalization, round-6) is verbatim-computable in DuckDB, so an IVF
    probe over these seeds gets an EXACT given-this-index oracle (the same
    md5-twin discipline as minhash/simhash/fingerprint).  ``build_centroids``
    (xxhash64 seeds + Lloyd rounds) stays the production index: better
    bucket balance, same probe machinery — tests assert the probe is
    centroid-agnostic.

    Rounding caveat: each engine rounds its own unit components (Python
    HALF_EVEN vs DuckDB HALF_UP) — divergence needs a component exactly on
    a 5e-7 boundary, measure-zero for real vectors and absent on the test
    corpus (same accepted risk as the hyperplane sign bits)."""
    cu = with_unit_vec(corpus, vec_col).filter(F.col("unit").isNotNull())
    rows = (
        cu.select("unit", F.col(id_col).alias("_id"))
        .orderBy(F.md5(F.col("_id").cast("string")))
        .limit(n_centroids)
        .collect()
    )
    cents = [[round(float(x), 6) for x in r["unit"]] for r in rows]
    if not cents:
        raise ValueError(
            "no centroid seeds: corpus has no non-zero-norm vectors"
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_rounds: int = 2,
    prebuilt: tuple[DataFrame, list[list[float]]] | None = None,
    impl: str = "expr",
) -> DataFrame:
    """IVF-bucketed ANN top-k: probe only the ``n_probe`` nearest centroid
    buckets per query (scored pairs cut by ~n_probe/K vs brute force).
    Approximate — recall vs cosine_topk is asserted in tests.

    Probe selection is also a projection (sort the per-centroid sim array,
    slice n_probe, explode); the only shuffle is the bucket equi-join on
    centroid_id plus the final per-query top-k window.

    ``prebuilt`` takes (assigned, centroids) from ``assign_centroids`` so
    the one-time index build amortizes across query batches — the
    production calling pattern.

    ``impl``: "expr" scores candidates with the JVM HOF dot (cross-engine
    reproducible fold — the oracle-parity default); "matmul" scores with
    the batched einsum Pandas UDF (``_pair_cosine``) — same round-6 values,
    whole-batch Arrow execution for the probe hot path at scale (tests
    assert identical output)."""
    from pyspark.sql import Window

    if impl not in ("expr", "matmul"):
        raise ValueError(f"impl must be 'expr' or 'matmul', got {impl!r}")

    assigned, cents = prebuilt if prebuilt is not None else assign_centroids(
        corpus, n_centroids, id_col, vec_col, kmeans_rounds
    )
    q = with_unit_vec(queries, vec_col).filter(F.col("unit").isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col("unit").alias("qvec")
    )
    sims = _centroid_sims(F.col("qvec"), cents)
    # struct array (-sim, cid): ascending sort == (sim desc, cid asc)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-F.element_at(sims, i + 1)).alias("negsim"),
                    F.lit(i + 1).alias("cid"),
                )
                for i in range(len(cents))
            ]
        )
    )
    qprobe = q.withColumn(
        "centroid_id",
        F.explode(F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cid"])),
    )
    score_col = (
        F.round(_dot(F.col("qvec"), F.col("unit")), 6)
        if impl == "expr"
        else _pair_cosine(F.col("qvec"), F.col("unit"))
    )
    scored = (
        qprobe.join(assigned, on="centroid_id")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("score", score_col)
        .select("query_id", F.col(id_col).alias("corpus_id"), "score")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-band LSH, components
    rounded to 6 decimals so the exact same values can be embedded as
    literals in both the Spark expressions and the DuckDB oracle SQL."""
    rng = np.random.RandomState(seed)
    h = rng.standard_normal((n_planes, dim))
    return [[round(float(x), 6) for x in row] for row in h]


def _sign_bit(unit: F.Column, plane: list[float]) -> F.Column:
    """1 iff the unit vector lies on the non-negative side of the plane.
    The dot is rounded to 1e-6 before the sign test so the bit is identical
    across engines/float-fold orders (same trick as the top-k scores).

    Scale note: the JVM fold keeps the signature bit-for-bit reproducible in
    the DuckDB oracle; a production run that doesn't need cross-engine
    parity should compute the full n_planes×dim signature as one numpy
    matmul in a Pandas UDF (~100× per-row throughput, same recall)."""
    p = F.array(*[F.lit(c) for c in plane])
    return F.when(F.round(_dot(unit, p), 6) >= 0, F.lit(1)).otherwise(F.lit(0))


def _signatures_matmul(
    df: DataFrame,
    planes: list[list[float]],
    band_bits: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Whole-batch sign-band signatures: one numpy matmul per Arrow batch
    (``U @ P.T`` for all rows × all planes at once) instead of the
    expression path's per-element interpreted HOF fold — measured ~2
    orders of magnitude less per-row work at 64 planes × 64 dims.  Same
    semantics: unit-normalize (zero-norm rows dropped), dot rounded to 1e-6
    before the sign test, bands of ``band_bits`` MSB-first bits.

    Output: one NARROW row per vector — (id, bkeys[n_bands]); the caller
    posexplodes bkeys into the (id, band, bkey) band join.  The unit vector
    deliberately does NOT ride along: the band self-join explodes every row
    ×n_bands and duplicates both sides per candidate, so a vector column
    there multiplies shuffle volume by ~n_bands×dim×8 B — units re-attach
    post-candidate-dedup via ``_units_matmul`` (two id equi-joins, same
    shape as ``dedup.minhash_lsh_pairs``' shingle re-attach)."""
    n_planes = len(planes)
    n_bands = n_planes // band_bits
    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    weights = (1 << np.arange(band_bits - 1, -1, -1)).astype(np.int64)

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != P.shape[1]:
                raise ValueError(
                    f"embedding size mismatch: expected {P.shape[1]}, "
                    f"got {E.shape[1]}"
                )
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            U = E[keep] / nrm[keep, None]
            S = np.round(U @ P.T, 6)
            B = (S >= 0).astype(np.int64).reshape(len(U), n_bands, band_bits)
            K = (B * weights).sum(axis=2).astype(np.int32)  # (n, n_bands)
            yield pd.DataFrame({"id": ids[keep], "bkeys": list(K)})

    return df.select(id_col, vec_col).mapInPandas(
        batch_iter, "id long, bkeys array<int>"
    )


def _units_matmul(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, unit) with numpy normalization — bit-identical to the unit
    vectors ``_signatures_matmul`` derived internally (same np.linalg.norm /
    divide), so the post-candidate cosine verify scores exactly the vectors
    the banding saw.  Zero-norm rows drop, mirroring the signature pass."""

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            yield pd.DataFrame(
                {"id": ids[keep], "unit": list(E[keep] / nrm[keep, None])}
            )

    return df.select(id_col, vec_col).mapInPandas(
        batch_iter, "id long, unit array<double>"
    )


def _attach_units_and_verify(
    cand: DataFrame, units: DataFrame, threshold: float, score_fn
) -> DataFrame:
    """Shared tail of both near-dup paths: re-attach unit vectors to the
    deduped (id_a, id_b) candidates via two id equi-joins, score, filter.
    The vectors touch a shuffle only HERE — once per side, keyed by id —
    never inside the exploded band join."""
    pairs = cand.join(
        units.select(F.col("id").alias("id_a"), F.col("unit").alias("ua")), "id_a"
    ).join(
        units.select(F.col("id").alias("id_b"), F.col("unit").alias("ub")), "id_b"
    )
    return (
        pairs.withColumn("cosine", score_fn(F.col("ua"), F.col("ub")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_neardup_pairs_matmul(
    df: DataFrame,
    threshold: float = 0.99,
    dim: int | None = None,
    n_planes: int = 64,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRODUCTION path of ``embedding_neardup_pairs``: identical pipeline
    (same deterministic hyperplanes, same round-6 sign rule, same banding,
    same exact-cosine verify threshold) with the per-row math vectorized —
    signatures via one numpy matmul per Arrow batch (``_signatures_matmul``)
    and the candidate verify via a batched einsum Pandas UDF, instead of the
    expression path's interpreted ``aggregate``/``zip_with`` lambdas (64
    planes × 64 dims of per-element interpretation per row — fine for
    cross-engine oracle parity at test scale, a multiplier at 100 TB).

    Band join carries only (id, band, bkey), like the expression twin —
    units re-attach post-candidate-dedup via ``_units_matmul`` (numpy
    normalization bit-identical to the one inside the signature pass).

    The expression path stays the DuckDB-oracle twin; tests assert both
    paths produce identical pair sets and cosines on the test corpus.  (The
    one theoretical divergence is rounding of a dot landing exactly on a
    5e-7 boundary — JVM HALF_UP vs numpy HALF_EVEN — measure-zero for real
    vectors and absent on the test corpus.)"""
    dim = _validate_dim(df, vec_col, dim)
    planes = hyperplanes(dim, n_planes, seed)
    sig = _signatures_matmul(df, planes, band_bits, id_col, vec_col)
    banded = sig.select("id", F.posexplode("bkeys").alias("band", "bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bkey") == F.col("b.bkey"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    units = _units_matmul(df, id_col, vec_col)
    return _attach_units_and_verify(cand, units, threshold, _pair_cosine)


def _validate_dim(
    df: DataFrame, vec_col: str, dim: int | None
) -> int:
    """Resolve the embedding dimensionality from ONE row (``limit(1)`` —
    the scan stops at the first non-null vector, never a full pass over the
    corpus).  A silently wrong ``dim`` is catastrophic, not degraded: too
    large and ``zip_with`` null-pads so every dot is null and every sign bit
    collapses to 0 — ALL vectors then share EVERY band key and the candidate
    join degenerates to the full N²/2 cross product; too small and trailing
    dimensions are silently ignored (recall loss).  Per-row consistency is
    therefore enforced INSIDE the main pipeline pass — ``_guard_dim`` on the
    expression path, the numpy shape check in ``_signatures_matmul`` on the
    batch path — so a ragged row or a wrong explicit ``dim`` still fails the
    job loudly, at zero extra table scans."""
    if dim is not None:
        return dim
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .limit(1)
        .first()
    )
    if row is None:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    return int(row["d"])


def _guard_dim(vec_col: str, dim: int):
    """Column guard: pass vectors of exactly ``dim`` through (nulls too —
    they are filtered downstream); any other size raises mid-scan."""
    c = F.col(vec_col)
    return F.when(
        c.isNull() | (F.size(c) == dim), c
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"embedding size mismatch in {vec_col!r}: expected {dim}, got "),
                F.size(c).cast("string"),
            )
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    dim: int | None = None,
    n_planes: int = 64,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane sign-band LSH —
    CONTENT-BASED candidates (unlike the round-1 ``id % n_blocks`` sampling):
    a pair's collision probability per bit is ``1 - θ/π``, so high-cosine
    pairs collide in some band with probability → 1 while far pairs rarely
    do.  Exact cosine verify on candidates.

    Banding: ``n_planes`` sign bits split into bands of ``band_bits``; two
    vectors are candidates iff some band matches exactly.  Scale: the band
    join carries ONLY (id, band, bkey) — unit vectors re-attach to the
    deduped candidates via two id equi-joins (``_attach_units_and_verify``,
    the same narrow-join + re-attach shape as ``dedup.minhash_lsh_pairs``),
    so the exploded shuffle stays ~20 B/row instead of ~n_bands × dim × 8 B
    per vector; ``band_bits`` sets bucket granularity — raise it as the
    corpus grows (buckets ~ N/2^band_bits per band).  At near-dup thresholds (cos >= 0.99, θ <= 8°) recall with 8×8-bit
    bands is > 0.999; the contract query's lower threshold trades recall for
    a non-trivial result on the synthetic corpus and the oracle mirrors the
    same candidate rule, so the cross-engine check stays exact.

    ``dim`` defaults to the data's actual embedding size; an explicit value
    is validated against it (see ``_validate_dim`` — a mismatch silently
    destroys either the candidate structure or recall)."""
    dim = _validate_dim(df, vec_col, dim)
    planes = hyperplanes(dim, n_planes, seed)
    n_bands = n_planes // band_bits
    units = (
        with_unit_vec(df.withColumn(vec_col, _guard_dim(vec_col, dim)), vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("id"), "unit")
    )
    u = units.withColumn(
        "bits", F.array(*[_sign_bit(F.col("unit"), p) for p in planes])
    )
    banded = u.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sum(
                            (
                                F.element_at("bits", b * band_bits + j + 1)
                                * F.lit(1 << (band_bits - 1 - j))
                            )
                            for j in range(band_bits)
                        ).alias("bkey"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bkey") == F.col("b.bkey"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _attach_units_and_verify(
        cand, units, threshold, lambda ua, ub: F.round(_dot(ua, ub), 6)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination (the semantic complement
    of ``corpus.decontaminate``'s n-gram collision test): a corpus document
    is contaminated iff its embedding's cosine vs ANY benchmark embedding
    reaches ``threshold`` — catching paraphrased/reformatted eval leakage
    that exact n-gram overlap misses.  Output one row per nonzero-norm
    corpus vector: (id, max_bench_cos, contaminated), with max_bench_cos the
    max round-6 cosine (max of round-6 values is order-independent, so the
    score is engine-exact under the repo's accepted 1-ulp libm risk class).

    This is the EXPRESSION oracle twin: a broadcast cross join against the
    (small by contract) benchmark set, then a per-id max — the shape DuckDB
    can replay literally.  Production is ``semantic_decontaminate_matmul``
    (one numpy matmul per Arrow batch, zero joins); tests assert identical
    output."""
    b = (
        with_unit_vec(bench, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col("unit").alias("bunit"))
    )
    c = (
        with_unit_vec(corpus, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col), F.col("unit").alias("cunit"))
    )
    scored = (
        c.crossJoin(F.broadcast(b))
        .groupBy(id_col)
        .agg(
            F.max(F.round(_dot(F.col("cunit"), F.col("bunit")), 6)).alias(
                "max_bench_cos"
            )
        )
    )
    return scored.select(
        id_col,
        "max_bench_cos",
        (F.col("max_bench_cos") >= F.lit(threshold)).alias("contaminated"),
    )


def semantic_decontaminate_matmul(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bench: int = 100_000,
) -> DataFrame:
    """PRODUCTION form of ``semantic_decontaminate``: the benchmark unit
    matrix rides in the UDF closure (same broadcast-small-side contract as
    the IVF coarse quantizer and ``cosine_topk_matmul``'s query matrix) and
    each Arrow batch of the corpus is scored with ONE numpy matmul —
    ``round6(U_batch @ B.T).max(axis=1)``.  The corpus is touched exactly
    once, with ZERO joins and ZERO shuffles: the plan is scan →
    mapInPandas, so at 100 TB the cost is one pass over the embedding
    column regardless of how the corpus is partitioned.  Rounding happens
    BEFORE the max, exactly like the expression twin, so outputs are
    identical row-for-row (tests assert it).

    ``max_bench`` bounds the driver-side collect: a benchmark set is
    thousands of eval rows by nature; exceeding the bound raises loudly
    rather than silently building an executor-crushing closure."""
    b_rows = (
        with_unit_vec(bench, vec_col)
        .filter(F.col("unit").isNotNull())
        .select("unit")
        .limit(max_bench + 1)
        .collect()
    )
    if not b_rows:
        raise ValueError("benchmark set has no non-null vectors")
    if len(b_rows) > max_bench:
        raise ValueError(
            f"benchmark set exceeds max_bench={max_bench}; raise the bound "
            "explicitly if the closure size is acceptable"
        )
    B = np.array([r["unit"] for r in b_rows], dtype=np.float64)  # (nb, dim)
    dim = B.shape[1]
    thr = float(threshold)
    id_field = corpus.schema[id_col].dataType.simpleString()

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(f"corpus dim {E.shape[1]} != bench dim {dim}")
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            U = E[keep] / nrm[keep, None]
            mx = np.round(U @ B.T, 6).max(axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids[keep],
                    "max_bench_cos": mx,
                    "contaminated": mx >= thr,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        batch_iter,
        f"{id_col} {id_field}, max_bench_cos double, contaminated boolean",
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (query), the top-k most cosine-similar corpus vectors with a DIFFERENT
    label — the near-misses a contrastive loss learns the most from
    (self-exclusion is implied: the anchor shares its own label).

    Expression/oracle twin of ``hard_negatives_matmul`` — a deliberate
    broadcast |corpus|×|Q| baseline whose arithmetic (round-6 dot,
    (score desc, id asc) rank) DuckDB replays exactly.  Reach for the
    matmul path at scale."""
    from pyspark.sql import Window

    c = with_unit_vec(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(label_col).alias("_clab"),
        F.col("unit").alias("cvec"),
    )
    q = with_unit_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("_qlab"),
        F.col("unit").alias("qvec"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("_qlab") != F.col("_clab"))
        .withColumn("score", F.round(_dot(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "corpus_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def hard_negatives_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """PRODUCTION hard-negative mining: anchors (|Q| × dim + labels) ride
    in the UDF closure, each Arrow batch of the corpus is scored with ONE
    numpy matmul, same-label scores are masked out, and only the batch's
    top-k per anchor survive to the shuffle (~batches × |Q| × k candidate
    rows — never the |corpus| × |Q| join product).  Output is identical to
    ``hard_negatives`` (tests assert it): round-6 scores, (score desc,
    corpus_id asc) total order carried through the per-batch lexsort."""
    from pyspark.sql import Window

    q_rows = (
        with_unit_vec(queries, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("query_id"), F.col(label_col), "unit")
        .collect()
    )
    if not q_rows:
        raise ValueError("no non-null query vectors")
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_labs = np.array([r[label_col] for r in q_rows], dtype=np.int64)
    Q = np.array([r["unit"] for r in q_rows], dtype=np.float64)
    dim = Q.shape[1]

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            labs = pdf[label_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(f"corpus dim {E.shape[1]} != query dim {dim}")
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            ids, labs = ids[keep], labs[keep]
            U = E[keep] / nrm[keep, None]
            S = np.round(U @ Q.T, 6)  # (n, q)
            out_q, out_c, out_s = [], [], []
            for j in range(Q.shape[0]):
                mask = labs != q_labs[j]
                if not mask.any():
                    continue
                cids, col = ids[mask], S[mask, j]
                order = np.lexsort((cids, -col))
                top = order[:k] if len(cids) > k else order
                out_q.append(np.full(len(top), q_ids[j]))
                out_c.append(cids[top])
                out_s.append(col[top])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "corpus_id": np.concatenate(out_c),
                    "score": np.concatenate(out_s),
                }
            )

    cand = corpus.select(id_col, vec_col, label_col).mapInPandas(
        batch_iter, "query_id long, corpus_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "score", "rank")
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "qvec",
) -> DataFrame:
    """Scalar int8 quantization of the unit vector — the vector-compression
    step a 100 TB embedding store runs before anything else: each round-6
    unit component maps to ``floor(round6(u)·127 + 0.5)`` ∈ [-127, 127],
    stored as ``array<tinyint>`` (1 byte/dim vs 8 for the double unit —
    an 8× cut in scan bytes, shuffle payload, and ANN-index residency).

    The quantizer is INTEGER-DETERMINED: half-up on the already-rounded
    6-decimal component, so both engines floor the identical double and the
    DuckDB oracle reproduces every code exactly (cross-engine float-boundary
    risk is confined to the same round-6 step every score here relies on).
    Zero-norm vectors quantize to NULL (same contract as ``with_unit_vec``).
    """
    u = with_unit_vec(df, vec_col)
    q = F.transform(
        F.col("unit"),
        lambda x: F.floor(F.round(x, 6) * 127.0 + F.lit(0.5)).cast("tinyint"),
    )
    return u.withColumn(out, q).drop("unit")


def _qdot(a: F.Column, b: F.Column) -> F.Column:
    """Exact integer dot of two int8 code arrays (widened per element —
    tinyint·tinyint would wrap)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors — the
    expression/oracle twin: scores are EXACT INTEGERS (sum of widened
    int8 products, |score| ≤ 127²·dim), so the cross-engine comparison has
    no float arithmetic at all past the shared quantizer.  Ranking is
    (qscore desc, corpus_id asc).  Reach for ``quantized_topk_matmul`` at
    scale; recall vs the exact float top-k is asserted in tests."""
    from pyspark.sql import Window

    c = quantize_int8(corpus, id_col, vec_col).filter(F.col("qvec").isNotNull())
    cq = c.select(F.col(id_col).alias("corpus_id"), F.col("qvec").alias("cq"))
    qq = (
        quantize_int8(queries, id_col, vec_col)
        .filter(F.col("qvec").isNotNull())
        .select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qq"))
    )
    scored = (
        cq.join(F.broadcast(qq), F.col("query_id") != F.col("corpus_id"))
        .withColumn("qscore", _qdot(F.col("qq"), F.col("cq")))
        .select("query_id", "corpus_id", "qscore")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "qscore", "rank")
    )


def quantized_topk_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRODUCTION form of the quantized top-k: the int8 query matrix rides
    in the UDF closure and each Arrow batch is scored with ONE int32 matmul
    (exact — |score| ≤ 127²·dim < 2³¹), keeping the batch's top-(k+1) per
    query under the final (qscore desc, corpus_id asc) order, so the
    shuffle carries ~batches × |Q| × (k+1) candidate rows.  Output is
    identical to ``quantized_topk`` (tests assert it)."""
    from pyspark.sql import Window

    q_rows = (
        quantize_int8(queries, id_col, vec_col)
        .filter(F.col("qvec").isNotNull())
        .select(F.col(id_col).alias("query_id"), "qvec")
        .collect()
    )
    if not q_rows:
        raise ValueError("no non-null query vectors")
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["qvec"] for r in q_rows], dtype=np.int32)  # (q, dim)
    dim = Q.shape[1]
    take = k + 1

    def batch_iter(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(f"corpus dim {E.shape[1]} != query dim {dim}")
            nrm = np.linalg.norm(E, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            ids = ids[keep]
            U = np.round(E[keep] / nrm[keep, None], 6)
            C = np.floor(U * 127.0 + 0.5).astype(np.int32)
            S = C @ Q.T  # (n, q) exact int32
            n = len(ids)
            out_q, out_c, out_s = [], [], []
            for j in range(Q.shape[0]):
                col = S[:, j]
                order = np.lexsort((ids, -col))
                top = order[:take] if n > take else order
                out_q.append(np.full(len(top), q_ids[j]))
                out_c.append(ids[top])
                out_s.append(col[top].astype(np.int64))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "corpus_id": np.concatenate(out_c),
                    "qscore": np.concatenate(out_s),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        batch_iter, "query_id long, corpus_id long, qscore long"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("corpus_id"))
    return (
        cand.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "qscore", "rank")
    )


# ---------------------------------------------------------------------------
# PCA / whitening — the dimensionality-reduction stage embedding pipelines
# run before ANN / clustering / SemDeDup (OPQ-style preprocessing): fit a
# k-dim orthogonal projection from the corpus covariance, optionally
# whitening each component to unit variance.
# ---------------------------------------------------------------------------


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, "np.ndarray", "np.ndarray"]:
    """(n, mean[dim], cov[dim, dim]) of the vector column in ONE corpus
    pass: each Arrow batch emits a single partial-moment row (count, sum
    vector, flattened Gram sum — one numpy matmul per batch), the partials
    fold DISTRIBUTEDLY via posexplode + per-position sum (a dim²-row
    shuffle, never the corpus), and only dim² + dim + 1 doubles reach the
    driver.  Population covariance (divide by n).

    Float partial sums fold in partition order, so the last ulps of the
    moments — and anything fit from them — are partition-layout dependent:
    downstream contract queries are rows-only by design (same class as the
    k-means IVF build)."""
    import numpy as np

    dim = _infer_dim(df, vec_col)

    def partial(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(f"vector dim {E.shape[1]} != {dim}")
            yield pd.DataFrame(
                {
                    "n": [len(E)],
                    "s": [E.sum(axis=0)],
                    "ss": [(E.T @ E).ravel()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partial, schema="n long, s array<double>, ss array<double>"
    )
    parts = parts.persist()
    try:
        n = parts.agg(F.sum("n")).first()[0] or 0
        if n == 0:
            raise ValueError("no vectors to fit moments on")
        s = (
            parts.select(F.posexplode("s"))
            .groupBy("pos").agg(F.sum("col").alias("v"))
            .orderBy("pos").collect()
        )
        ss = (
            parts.select(F.posexplode("ss"))
            .groupBy("pos").agg(F.sum("col").alias("v"))
            .orderBy("pos").collect()
        )
    finally:
        parts.unpersist()
    mean = np.array([r["v"] for r in s]) / n
    gram = np.array([r["v"] for r in ss]).reshape(dim, dim) / n
    cov = gram - np.outer(mean, mean)
    return int(n), mean, cov


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).filter(F.col("d") > 0).first()
    if row is None:
        raise ValueError("empty vector column")
    return int(row["d"])


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding", whiten: bool = False
) -> dict:
    """Fit a k-component PCA from the corpus moments.  Returns the model
    {mean[dim], components[dim, k], eigvals[k], whiten} with a
    deterministic sign convention (each component's largest-magnitude
    entry is positive — eigh's signs are otherwise arbitrary).  Whitening
    folds 1/√λ into the components so projection stays one matmul; a
    zero-variance component under whiten is a loud error."""
    import numpy as np

    n, mean, cov = embedding_moments(df, vec_col)
    dim = mean.shape[0]
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    eigvals = np.maximum(vals[order], 0.0)
    W = vecs[:, order]  # (dim, k)
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    W = W * flip
    if whiten:
        if (eigvals <= 1e-12).any():
            raise ValueError(
                "whitening requested but a kept component has ~zero "
                "variance; reduce k"
            )
        W = W / np.sqrt(eigvals)
    return {
        "mean": mean, "components": W, "eigvals": eigvals,
        "whiten": whiten, "n": n,
    }


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project every vector through the fitted model — (X − mean) @ W as
    one numpy matmul per Arrow batch; the model rides the UDF closure
    (dim × k doubles).  Plan is scan → mapInPandas: ZERO exchanges, so at
    100 TB the cost is one pass over the embedding column.  Components
    round-6 like every score in this repo."""
    import numpy as np

    mean = model["mean"]
    W = model["components"]
    dim = mean.shape[0]

    def proj(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if E.shape[1] != dim:
                raise ValueError(f"vector dim {E.shape[1]} != {dim}")
            P = np.round((E - mean) @ W, 6)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(P)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )


def centroid_outliers(
    corpus: DataFrame,
    cents: list[list[float]],
    max_cos_micro: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier detection: the vectors whose BEST cosine
    against every centroid stays below ``max_cos_micro`` micro-units —
    far from all of the corpus's own mass.  The curation complement of
    SemDeDup: semantic dedup prunes what is too close to everything,
    this surfaces what is close to NOTHING (mislabeled modality, garbage
    embeddings, adversarial inserts) for audit or exclusion.

    -> (vec_id, best_cos_micro, nearest_centroid) for outliers only.

    Exact cross-engine: centroid sims are the shared round-6 projection
    (``_centroid_sims``); the micro conversion re-rounds the round-6
    value * 1e6 to the nearest integer, so a 1-ulp float wobble cannot
    move the threshold comparison.  With ``md5_seed_centroids`` the whole
    operator (seed pick, normalization, dots, threshold) is
    DuckDB-replayable — same given-this-index discipline as the IVF
    oracle.

    Scale shape: pure scan-fused projection + filter over centroid
    LITERALS — zero shuffles, zero Python, zero joins; cost is one pass
    over the embedding column regardless of corpus size.
    """
    cu = with_unit_vec(corpus, vec_col).filter(F.col("unit").isNotNull())
    sims = _centroid_sims(F.col("unit"), cents)
    best = F.array_max(sims)
    best_micro = F.round(best * F.lit(1_000_000)).cast("long")
    return (
        cu.select(
            id_col,
            best_micro.alias("best_cos_micro"),
            F.array_position(sims, best).cast("int").alias("nearest_centroid"),
        )
        .filter(F.col("best_cos_micro") < int(max_cos_micro))
    )


def cluster_histogram_psi(
    emb_a: DataFrame,
    emb_b: DataFrame,
    cents: list[list[float]],
    thr_micro: int = 200_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-distribution drift monitor: assign BOTH snapshots to the
    SAME given centroids and take the Population Stability Index of the two
    cluster-occupancy histograms — the semantic complement of the scalar
    ``expectations.psi_drift`` (which bins one numeric column).  A corpus
    refresh that shifts topic mix moves probability mass between clusters
    long before any scalar quality signal drifts; this is the number a
    100 TB ingest pipeline alerts on between snapshots.

    The bin space is the centroid id (bounded by construction, ≤ |cents|),
    so the PSI core — +1 smoothing on the union bin set, integer micro-nat
    terms, one integral division (``expectations.psi_from_cells``) — is
    exact cross-engine; with md5-seeded centroids
    (``md5_seed_centroids``) the WHOLE chain (seeds → round-6 assignment →
    counts → PSI) replays verbatim in the oracle.

    Scale shape: assignment is the projection-only ``assign_to_centroids``
    (no Exchange on either corpus); each side then collapses to ≤ |cents|
    (bin, count) cells at the scan (map-side combine) — the only shuffled
    rows are cluster-count cells, never vectors."""
    from log_analysis_spark.operators.expectations import psi_from_cells

    def cells(df, out):
        return (
            assign_to_centroids(df, cents, id_col, vec_col)
            .select(F.col("centroid_id").cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    return psi_from_cells(cells(emb_a, "ca"), cells(emb_b, "cb"), thr_micro)


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam_micro: int = 700_000,
    query_col: str = "query_id",
    id_col: str = "corpus_id",
    score_col: str = "score",
    unit_col: str = "unit",
    max_candidates: int = 10_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    — the standard diversity-aware selection over an ANN/BM25 candidate
    list: greedily pick the candidate maximizing

        λ·rel(c)  −  (1−λ)·max_{s ∈ selected} sim(c, s)

    (first pick = pure relevance), so near-duplicate hits don't crowd the
    top-k.  This is the retrieval-side twin of SemDeDup: instead of
    deleting semantic duplicates from the corpus, it de-duplicates each
    RESULT LIST.

    Inputs: one row per (query, candidate) with the round-6 relevance
    ``score_col`` and the candidate's ``unit`` vector (e.g.
    ``cosine_topk`` output joined back to unit vectors).  Returns
    ``(query_id, corpus_id, rank, rel_micro, val_pico)`` where ``rank``
    is selection order, ``rel_micro = round(score·1e6)`` and ``val_pico``
    the exact integer objective ``lam_micro·rel_micro −
    (1e6−lam_micro)·max_sim_micro`` at selection time — all arithmetic
    integer (pairwise sims are round-6 micro ints), ties → lowest id, so
    a DuckDB oracle replays the greedy loop bit-for-bit.

    Scale shape: MMR is inherently sequential in k, but only WITHIN a
    result list — candidate lists are bounded (top-N per query, N ≲ 100),
    so each list is one Arrow group in ``applyInPandas`` and queries
    parallelize embarrassingly; the k·N² work per group is a few thousand
    flops.  Nothing corpus-sized is shuffled — only the candidate rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0 <= lam_micro <= 1_000_000):
        raise ValueError(f"lam_micro must be in [0, 1e6], got {lam_micro}")
    if max_candidates < k:
        raise ValueError(
            f"max_candidates={max_candidates} must be >= k={k}"
        )
    qt = candidates.schema[query_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{query_col} {qt}, {id_col} {it}, rank int, rel_micro long, "
        "val_pico long"
    )
    kk, lam = int(k), int(lam_micro)

    mc = int(max_candidates)

    def rerank(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n > mc:
            # the N^2 sim matrix is the whole cost model — a caller who
            # passes an unbounded candidate list gets a LOUD error, not a
            # silent quadratic blowup on one executor
            raise ValueError(
                f"mmr_rerank: query {pdf[query_col].iloc[0]!r} has {n} "
                f"candidates > max_candidates={mc}; top-N the rankings "
                "before fusing or raise the knob explicitly"
            )
        rel = np.round(pdf[score_col].to_numpy() * 1e6).astype(np.int64)
        U = np.stack(pdf[unit_col].to_numpy())
        sim = np.round(np.round(U @ U.T, 6) * 1e6).astype(np.int64)
        picked: list[int] = []
        vals: list[int] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(kk, n)):
            if picked:
                max_sim = sim[:, picked].max(axis=1)
            else:
                max_sim = np.zeros(n, dtype=np.int64)
            val = lam * rel - (1_000_000 - lam) * max_sim
            val_masked = np.where(avail, val, np.iinfo(np.int64).min)
            i = int(np.argmax(val_masked))  # first max = lowest id (sorted)
            picked.append(i)
            vals.append(int(val[i]))
            avail[i] = False
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                id_col: pdf[id_col].iloc[picked].to_numpy(),
                "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
                "rel_micro": rel[picked],
                "val_pico": np.asarray(vals, dtype=np.int64),
            }
        )

    return (
        candidates.select(query_col, id_col, score_col, unit_col)
        .groupBy(query_col)
        .applyInPandas(rerank, out_schema)
    )
