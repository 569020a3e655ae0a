"""Unit tests for operators/corpus.py — repetition stats, token-budget
shard packing, stratified sampling (planted inputs with hand-computed
expectations, plus equivalence to naive single-pass references)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import corpus


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_planted_values(spark):
    df = _docs_df(
        spark,
        [
            # 3 lines, one dup pair; top 2-gram "a b" occurs twice
            (1, "a b\na b\nc d"),
            (2, ""),            # degenerate: no lines, no grams
            (3, "hello"),       # 1 line, single token → no grams
            (4, "x y\n\n  \nx y\nx y"),  # blank lines dropped, all dup
        ],
    )
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(df).collect()
    }
    r1 = out[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    assert r1["dup_line_char_frac"] == pytest.approx(6 / 9)
    assert r1["top_2gram"] == "a b"
    # "a b\na b\nc d" has 11 chars; "a b" (3 chars) occurs twice
    assert r1["top_2gram_char_frac"] == pytest.approx(6 / 11)

    r2 = out[2]
    assert r2["n_lines"] == 0
    assert r2["dup_line_frac"] == 0.0
    assert r2["top_2gram"] is None
    assert r2["keep_repetition"] is True

    r3 = out[3]
    assert r3["n_lines"] == 1
    assert r3["dup_line_frac"] == 0.0
    assert r3["top_2gram_char_frac"] == 0.0

    r4 = out[4]
    assert r4["n_lines"] == 3
    assert r4["dup_line_frac"] == pytest.approx(2 / 3)
    assert r4["dup_line_char_frac"] == pytest.approx(1.0)
    assert r4["keep_repetition"] is False


def test_repetition_keep_flag_separates_spam(spark):
    clean = "the quick brown fox\njumps over the lazy dog\nand runs away home"
    spam = "\n".join(["buy now limited offer"] * 10)
    df = _docs_df(spark, [(1, clean), (2, spam)])
    kept = {
        r["doc_id"]: r["keep_repetition"]
        for r in corpus.repetition_stats(df).collect()
    }
    assert kept == {1: True, 2: False}


def test_pack_shards_equals_naive_global_cumsum(spark):
    # 300 docs with varied token counts; the two-phase bucketed cumsum must
    # equal the naive single-ordering sequential packing bit-for-bit
    rows = [(i, "tok " * (1 + (i * 37) % 23)) for i in range(300)]
    df = _docs_df(spark, rows)
    budget = 100
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard"])
        for r in corpus.pack_shards(df, budget=budget).collect()
    }

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    naive = sorted(
        ((md5(str(i)), i, 1 + (i * 37) % 23) for i, _ in rows)
    )
    c = 0
    for key, i, ntok in naive:
        assert got[i] == (ntok, c // budget), f"doc {i}"
        c += ntok

    # shard ids are contiguous from 0 and every shard except possibly the
    # last closes at or past the budget
    shards = sorted({s for _, s in got.values()})
    assert shards == list(range(len(shards)))


def test_pack_shards_respects_budget_property(spark):
    df = _docs_df(spark, [(i, "w " * (1 + i % 7)) for i in range(200)])
    budget = 50
    out = corpus.pack_shards(df, budget=budget)
    per_shard = (
        out.groupBy("shard").agg(F.sum("n_tokens").alias("tok")).collect()
    )
    max_doc = 7
    for r in per_shard:
        # a shard stops accepting once it crosses the budget: its total is
        # < budget + the doc that crossed the line
        assert r["tok"] < budget + max_doc


def test_pack_shards_rejects_bad_budget(spark):
    df = _docs_df(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        corpus.pack_shards(df, budget=0)


def test_stratified_sample_deterministic_and_rate_accurate(spark):
    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out1 = corpus.stratified_sample(df, "lang", {"en": 0.5}, default_rate=1.0)
    out2 = corpus.stratified_sample(df, "lang", {"en": 0.5}, default_rate=1.0)
    rows1 = sorted(r["doc_id"] for r in out1.collect())
    rows2 = sorted(r["doc_id"] for r in out2.collect())
    assert rows1 == rows2  # pure function of md5(id) — no RNG state

    by_lang = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["de"] == n // 2  # default rate 1.0 keeps everything
    # en at 50%: md5 uniformity over 2000 draws → within ±6 percentage pts
    assert abs(by_lang["en"] / (n // 2) - 0.5) < 0.06


def test_stratified_sample_edge_rates(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    assert corpus.stratified_sample(df, "lang", {"en": 0.0}).count() == 0
    assert corpus.stratified_sample(df, "lang", {"en": 1.0}).count() == 100
    with pytest.raises(ValueError):
        corpus.stratified_sample(df, "lang", {"en": 1.5})


def test_decontaminate_planted(spark):
    # bench doc shares the 5-gram "q w e r t" with doc 10 (1 gram twice —
    # distinct count must still be 1) and "a b c d e"+"b c d e f" with doc 11
    bench = _docs_df(spark, [(100, "q w e r t zz"), (101, "a b c d e f")])
    docs = _docs_df(
        spark,
        [
            (10, "x q w e r t y q w e r t"),   # same gram at 2 offsets → 1 distinct hit
            (11, "a b c d e f g"),              # 2 distinct colliding grams
            (12, "t r e w q a"),                # reversed words — no gram collision
            (13, "a b c"),                      # < n tokens → no grams at all
        ],
    )
    out = {r["doc_id"]: r for r in corpus.decontaminate(docs, bench, n=5).collect()}
    assert len(out) == 4
    assert out[10]["n_hit_grams"] == 1 and out[10]["contaminated"] is True
    assert out[11]["n_hit_grams"] == 2 and out[11]["contaminated"] is True
    assert out[12]["n_hit_grams"] == 0 and out[12]["contaminated"] is False
    assert out[13]["n_hit_grams"] == 0 and out[13]["contaminated"] is False

    # min_hits raises the bar: only doc 11 clears 2
    out2 = {
        r["doc_id"]: r["contaminated"]
        for r in corpus.decontaminate(docs, bench, n=5, min_hits=2).collect()
    }
    assert out2 == {10: False, 11: True, 12: False, 13: False}

    with pytest.raises(ValueError):
        corpus.decontaminate(docs, bench, n=0)


def test_decontaminate_shuffle_fallback_matches_broadcast(spark):
    bench = _docs_df(spark, [(100, "q w e r t zz")])
    docs = _docs_df(spark, [(10, "x q w e r t y"), (12, "t r e w q a")])
    a = sorted(map(tuple, corpus.decontaminate(docs, bench, n=5).collect()))
    b = sorted(
        map(tuple, corpus.decontaminate(docs, bench, n=5, broadcast_bench=False).collect())
    )
    assert a == b


def test_scrub_pii_planted(spark):
    from log_analysis_spark.operators import textstats

    df = _docs_df(
        spark,
        [
            (1, "mail alice.smith+x@corp.example.org and bob@ex.io end"),
            (2, "host 192.168.0.1 then 10.0.0.255 ok"),
            (3, "acct 1234567890 short 12345678 padded 999999999"),
            (4, "clean text stays exactly as written"),
            (5, "mixed a@b.co 8.8.8.8 123456789012"),
        ],
    )
    out = {r["doc_id"]: r for r in textstats.scrub_pii(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_nums"]) == (2, 0, 0)
    assert out[1]["text_clean"] == "mail <EMAIL> and <EMAIL> end"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_nums"]) == (0, 2, 0)
    assert out[2]["text_clean"] == "host <IP> then <IP> ok"
    # 9+ digit runs only: 12345678 (8 digits) survives
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_nums"]) == (0, 0, 2)
    assert out[3]["text_clean"] == "acct <NUM> short 12345678 padded <NUM>"
    assert out[4]["text_clean"] == out[4]["text"]
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_nums"]) == (1, 1, 1)
    assert out[5]["text_clean"] == "mixed <EMAIL> <IP> <NUM>"


def test_transcripts_to_docs_planted(spark):
    rows = []
    # "STATUS OK" recurs in 3 of 4 convs (75% >= threshold) → boilerplate;
    # every other text is conv-unique
    for c in ("c1", "c2", "c3"):
        rows += [(c, 0, "user", f"hello {c}"), (c, 1, "system", "STATUS OK"),
                 (c, 2, "agent", f"bye {c}")]
    rows += [("c4", 0, "system", "STATUS OK"), ("c4", 1, "system", "STATUS OK")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {
        r["conv_id"]: r
        for r in corpus.transcripts_to_docs(df, boilerplate_conv_frac=0.5).collect()
    }
    assert out["c1"]["text"] == "user: hello c1\nagent: bye c1"
    assert out["c1"]["n_turns"] == 3 and out["c1"]["n_turns_kept"] == 2
    # all-boilerplate conv survives with empty text
    assert out["c4"]["text"] == "" and out["c4"]["n_turns_kept"] == 0
    assert out["c4"]["n_turns"] == 2

    # frac=1.0 ⇒ only texts in EVERY conv qualify — "STATUS OK" is in 4/4? no, 4 convs
    # have it in c1..c4 = 4 of 4 → still stripped; unique texts never are
    out_all = {
        r["conv_id"]: r
        for r in corpus.transcripts_to_docs(df, boilerplate_conv_frac=1.0).collect()
    }
    assert out_all["c1"]["n_turns_kept"] == 2  # STATUS OK is in all 4 convs

    with pytest.raises(ValueError):
        corpus.transcripts_to_docs(df, boilerplate_conv_frac=0.0)


def test_corpus_report_totals_and_gates(spark):
    from log_analysis_spark.operators.corpus import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "the cat sat with the dog and they have rested well", "web", "en"),
            (2, "the cat sat with the dog and they have rested too", "web", "en"),
            (3, "contact me at bob@mail.example for details", "web", "en"),
            (4, "el gato grande", "books", "es"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    rows = {
        (r["source"], r["lang"]): r
        for r in corpus_report(docs, gopher_min_stopwords=2).collect()
    }
    web = rows[("web", "en")]
    assert web["n_docs"] == 3
    assert web["n_tokens"] == 11 + 11 + 8
    assert web["min_tokens"] == 8 and web["max_tokens"] == 11
    # docs 1-2 pass every rule except word count (11 < 50) -> 0 keeps
    assert web["n_gopher_keep"] == 0
    assert web["n_docs_with_pii"] == 1          # the email in doc 3
    bk = rows[("books", "es")]
    assert bk["n_docs"] == 1 and bk["n_docs_with_pii"] == 0
    assert bk["n_chars"] == len("el gato grande")
    # one row per (source, lang): no cross-group leakage
    assert set(rows) == {("web", "en"), ("books", "es")}


def _cap_docs(spark):
    rows = [(i, f"text {i}", "web", "en" if i <= 30 else "fr") for i in range(1, 41)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )


def test_cap_per_group_caps_and_passes_through(spark):
    docs = _cap_docs(spark)  # en: 30 docs (over cap), fr: 10 (under)
    out = corpus.cap_per_group(docs, "lang", 12).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 12
    assert by_lang["fr"] == set(range(31, 41))  # under-cap: untouched
    # survivors of the over-cap group = the 12 smallest (md5(id), id) draws
    want = set(
        sorted(range(1, 31), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:12]
    )
    assert by_lang["en"] == want
    # full rows (text/source) survive the re-attach join
    assert all(r.text == f"text {r.doc_id}" and r.source == "web" for r in out)


def test_cap_per_group_deterministic_and_edge_caps(spark):
    docs = _cap_docs(spark)
    a = {r.doc_id for r in corpus.cap_per_group(docs, "lang", 12).collect()}
    b = {r.doc_id for r in corpus.cap_per_group(docs, "lang", 12).collect()}
    assert a == b
    # cap >= every group size: identity
    assert corpus.cap_per_group(docs, "lang", 100).count() == 40
    # cap 0: nothing survives
    assert corpus.cap_per_group(docs, "lang", 0).count() == 0
    with pytest.raises(ValueError):
        corpus.cap_per_group(docs, "lang", -1)


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------


def test_weighted_sample_favors_heavy_rows(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators.corpus import weighted_sample

    # 500 heavy (w=10) + 500 light (w=1) rows; a 200-row sample should be
    # dominated by heavy rows (E[heavy] ≈ 10/11 of the sample)
    rows = [Row(doc_id=i, w=10 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows)
    got = weighted_sample(df, "w", k=200, id_col="doc_id").collect()
    n_heavy = sum(1 for r in got if r["w"] == 10)
    assert len(got) == 200
    assert n_heavy > 150  # statistically certain under the md5 draw


def test_weighted_sample_deterministic_and_plan(spark):
    from pyspark.sql import Row

    from log_analysis_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame([Row(doc_id=i, w=i % 7 + 1) for i in range(300)])
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=50).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=50).collect())
    assert a == b
    plan = (
        weighted_sample(df, "w", k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_rejects_nonpositive_weights(spark):
    import pytest
    from pyspark.sql import Row

    from log_analysis_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame([Row(doc_id=1, w=2.0), Row(doc_id=2, w=0.0)])
    with pytest.raises(ValueError):
        weighted_sample(df, "w", k=1)


# ---- rendezvous shard assignment -------------------------------------------


def test_rendezvous_matches_python_mirror(spark):
    import hashlib

    from log_analysis_spark.operators.corpus import rendezvous_assign

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], "doc_id long, text string"
    )
    shards = ["s0", "s1", "s2"]
    got = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(docs, shards).collect()
    }
    want = {
        i: max(
            shards,
            key=lambda s: (hashlib.md5(f"{s}:{i}".encode()).hexdigest(), s),
        )
        for i in range(50)
    }
    assert got == want


def test_rendezvous_resize_moves_only_new_shard_rows(spark):
    """The consistent-placement property: adding a shard relocates ONLY the
    rows the new shard wins; every other row keeps its assignment."""
    from log_analysis_spark.operators.corpus import rendezvous_assign

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(400)], "doc_id long, text string"
    )
    before = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(docs, ["s0", "s1", "s2", "s3"]).collect()
    }
    after = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(
            docs, ["s0", "s1", "s2", "s3", "s4"]
        ).collect()
    }
    moved = {i for i in before if before[i] != after[i]}
    assert all(after[i] == "s4" for i in moved)
    # and the new shard takes roughly its fair 1/5 share (loose bound)
    assert 0.08 <= len(moved) / 400 <= 0.35


def test_rendezvous_validation(spark):
    import pytest as _pytest

    from log_analysis_spark.operators.corpus import rendezvous_assign

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(docs, [])
    with _pytest.raises(ValueError, match="distinct"):
        rendezvous_assign(docs, ["a", "a"])


def test_budget_mix_waterfilling(spark):
    from log_analysis_spark.operators import corpus as C
    from pyspark.sql import functions as F

    rows = (
        [(i, "t " * 10, "A") for i in range(10)]
        + [(i, "t " * 10, "B") for i in range(10, 13)]
        + [(i, "t " * 10, "C") for i in range(13, 18)]
    )
    df = spark.createDataFrame(
        [(i, t.strip(), g) for i, t, g in rows],
        "doc_id long, text string, source string",
    )

    def masses(out):
        return {
            r["source"]: r["tok"]
            for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("tok"))
            .collect()
        }

    # equal weights, budget 120: B (30 avail) caps, surplus waterfalls to
    # A and C (target 45 → greedy prefix overshoots to 50 at 10-token docs)
    m = masses(C.budget_mix(df, {"A": 1.0, "B": 1.0, "C": 1.0}, 120))
    assert m == {"A": 50, "B": 30, "C": 50}
    # no group caps: equal thirds
    m = masses(C.budget_mix(df, {"A": 1.0, "B": 1.0, "C": 1.0}, 60))
    assert m == {"A": 20, "B": 20, "C": 20}
    # budget >= corpus: everything kept, capped arm only
    out = C.budget_mix(df, {"A": 1.0, "B": 1.0, "C": 1.0}, 10_000)
    assert out.count() == 18 and sum(masses(out).values()) == 180
    # unweighted groups are excluded entirely
    m = masses(C.budget_mix(df, {"A": 2.0, "B": 1.0}, 60))
    assert set(m) == {"A", "B"} and m["A"] == 40 and m["B"] == 20
    # determinism: same call, same doc set
    ids1 = {r["doc_id"] for r in C.budget_mix(df, {"A": 1.0}, 50).collect()}
    ids2 = {r["doc_id"] for r in C.budget_mix(df, {"A": 1.0}, 50).collect()}
    assert ids1 == ids2 and len(ids1) == 5
    import pytest as _pt

    with _pt.raises(ValueError):
        C.budget_mix(df, {}, 100)
    with _pt.raises(ValueError):
        C.budget_mix(df, {"A": -1.0}, 100)
    with _pt.raises(ValueError):
        C.budget_mix(df, {"A": 1.0}, -5)
