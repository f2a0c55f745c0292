"""Unit tests for corpus-level pipeline operators (operators/corpus.py).

The reference has no corpus ops (SURVEY §2.7) — these pin the north-star
semantics on tiny hand-built DataFrames: decontamination overlap counts,
vocabulary top-k ordering, PII redaction, repetition scoring, stratified
sampling determinism, and quantile filtering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from penr_oz_agent_memory_rust_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_decontaminate_counts_overlapping_shingles(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps", "en"),  # shares "the quick brown", "quick brown fox"
            (2, "totally unrelated words here", "en"),
            (3, "the quick brown dog", "en"),  # shares "the quick brown"
        ],
    )
    test = _docs(spark, [(100, "see the quick brown fox run", "en")])
    got = {r["doc_id"]: r["n_overlap"] for r in corpus.decontaminate(train, test).collect()}
    assert got == {1: 2, 3: 1}  # doc 2 omitted (zero overlap)


def test_word_freq_topk_order_and_ties(spark):
    docs = _docs(spark, [(1, "a b b c c", "en"), (2, "c a", "en")])
    rows = corpus.word_freq_topk(docs, k=2).collect()
    assert [(r["token"], r["freq"]) for r in rows] == [("c", 3), ("a", 2)]


def test_pii_scan_redacts_and_counts(spark):
    docs = _docs(
        spark,
        [(1, "mail bob@example.com or call +1 (555) 123-4567 now", "en"), (2, "clean", "en")],
    )
    rows = {r["doc_id"]: r for r in corpus.pii_scan(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert rows[2]["n_emails"] == 0 and rows[2]["redacted"] == "clean"


def test_repetition_score_flags_boilerplate(spark):
    docs = _docs(spark, [(1, "spam spam spam spam", "en"), (2, "all words differ here", "en")])
    rows = {r["doc_id"]: r for r in corpus.repetition_score(docs).collect()}
    assert rows[1]["repetition"] == 0.75 and rows[1]["n_tokens"] == 4
    assert rows[2]["repetition"] == 0.0


def test_stratified_sample_is_deterministic_per_group(spark):
    docs = _docs(spark, [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(40)])
    a = corpus.stratified_sample(docs, n_per_group=5)
    counts = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 5, "de": 5}
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in corpus.stratified_sample(docs, n_per_group=5).collect()
    )


def test_quality_quantile_filter_keeps_top_three_quarters(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "doc_id bigint, quality double"
    )
    kept = sorted(r["doc_id"] for r in corpus.quality_quantile_filter(scored, q=0.25).collect())
    # p25 of 1..8 (linear interpolation) = 2.75 -> keep 3..8
    assert kept == [3, 4, 5, 6, 7, 8]


def test_zscore_by_group_zero_variance(spark):
    from penr_oz_agent_memory_rust_spark.operators.corpus import zscore_by_group

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 4.0), (3, "b", 7.0), (4, "b", 7.0)],
        "id bigint, g string, v double",
    )
    out = {r["id"]: r["z"] for r in zscore_by_group(df, "g", "v", ["id"]).collect()}
    assert out[1] == -1.0 and out[2] == 1.0          # (v - mean)/std over {2,4}
    assert out[3] == 0.0 and out[4] == 0.0           # zero variance -> 0


def test_observation_metrics_single_pass(spark):
    """Pipeline observability: df.observe collects input-count and mean
    quality in the SAME action that writes the filtered output — no second
    scan of a 100 TB input just to report what was dropped."""
    from pyspark.sql import Observation, functions as F

    from penr_oz_agent_memory_rust_spark.operators.text_ops import quality_score_expr

    docs = spark.createDataFrame(
        [(1, "a good long document " * 20), (2, "x"), (3, "another solid document " * 15)],
        "doc_id bigint, text string",
    )
    obs = Observation("corpus_quality")
    scored = docs.withColumn("q", F.round(quality_score_expr(F.col("text")), 6)).observe(
        obs, F.count(F.lit(1)).alias("n_in"), F.avg("q").alias("mean_q")
    )
    kept = scored.filter(F.col("q") > 0.7).collect()
    metrics = obs.get
    assert metrics["n_in"] == 3
    assert 0.0 < metrics["mean_q"] < 1.0
    assert {r["doc_id"] for r in kept} == {1, 3}


def test_corpus_mixture_sample_quotas(spark, sf_dir):
    """Count-based mixture: each group contributes exactly floor(w_g * n)
    docs (capped by availability), groups outside the weights are absent,
    and the same salt reproduces the same selection."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_mixture_sample
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    weights = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = corpus_mixture_sample(docs, weights, n_total=40, salt="t")
    sizes = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert sizes == {"en": 20, "de": 10, "fr": 10}
    again = corpus_mixture_sample(docs, weights, n_total=40, salt="t")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_corpus_mixture_small_group_not_rebalanced(spark):
    """A group smaller than its quota contributes all it has; the
    shortfall must NOT spill into other groups."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_mixture_sample

    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = corpus_mixture_sample(df, {"big": 0.5, "tiny": 0.5}, n_total=40)
    sizes = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert sizes == {"big": 20, "tiny": 3}


def test_corpus_token_mixture_budget(spark):
    """Token-budget mixture: docs are taken in hash order until the running
    total BEFORE the doc reaches the group budget — so the selection always
    covers >= the budget (boundary doc included) but drops everything
    after."""
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.corpus import corpus_token_mixture

    rows = [(i, "w " * 100, "en") for i in range(30)]  # 100 tokens each
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = corpus_token_mixture(df, {"en": 1.0}, token_budget=1000)
    got = out.agg(F.sum("n_tokens").alias("s"), F.count("*").alias("n")).first()
    # 10 docs fill the 1000-token budget exactly (no boundary overshoot here)
    assert got["n"] == 10 and got["s"] == 1000
    # overshoot case: budget not a multiple of doc length
    out2 = corpus_token_mixture(df, {"en": 1.0}, token_budget=950)
    got2 = out2.agg(F.sum("n_tokens").alias("s"), F.count("*").alias("n")).first()
    assert got2["n"] == 10 and got2["s"] == 1000  # 10th doc straddles the cut


def test_lm_quality_ranks_gibberish_low(spark):
    """The perplexity proxy must rank reference-like text above character
    gibberish and above wrong-alphabet-frequency text."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        char_bigram_counts,
        lm_quality_score,
    )

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs away") for i in range(20)],
        "doc_id bigint, text string",
    )
    lm = char_bigram_counts(train)
    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),  # in-distribution
            (2, "zxq vvk jjw qqz xxj kkv wwq zzx"),         # gibberish
        ],
        "doc_id bigint, text string",
    )
    scores = {r["doc_id"]: r["lm_score"] for r in lm_quality_score(probe, lm).collect()}
    assert scores[1] > scores[2] + 2, scores


def test_lm_quality_short_docs_absent(spark):
    """Docs whose normalized text has < 2 chars produce no bigrams and no
    row (never a [1,0]-sequence artifact)."""
    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        char_bigram_counts,
        lm_quality_score,
    )

    train = spark.createDataFrame([(1, "hello world")], "doc_id bigint, text string")
    probe = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, "!!"), (4, "ok")], "doc_id bigint, text string"
    )
    out = lm_quality_score(probe, char_bigram_counts(train)).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_diversity_sample_quota_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.corpus import diversity_sample
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = diversity_sample(emb, n_clusters=8, per_cluster=5)
    sizes = out.groupBy("cell").count().collect()
    assert all(r["count"] <= 5 for r in sizes)
    assert len(sizes) >= 2, "sampling collapsed to a single cell"
    again = diversity_sample(emb, n_clusters=8, per_cluster=5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_lm_quality_arrow_matches_expr(spark, sf_dir):
    """The vectorized Arrow scorer must agree with the oracle-checked
    expression path on every doc to the 6dp contract."""
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        char_bigram_counts,
        lm_quality_score,
        lm_quality_score_arrow,
    )
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    lm = char_bigram_counts(docs.filter(F.col("doc_id") < 250))
    probe = docs.filter(F.col("doc_id") >= 250)
    a = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lm_quality_score(probe, lm).collect()
    }
    b = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in lm_quality_score_arrow(probe, lm).collect()
    }
    assert set(a) == set(b)
    bad = {k: (a[k], b[k]) for k in a if a[k][0] != b[k][0] or abs(a[k][1] - b[k][1]) > 1e-6}
    assert not bad, list(bad.items())[:3]


def test_source_divergence_identical_vs_disjoint(spark):
    from penr_oz_agent_memory_rust_spark.operators.corpus import source_divergence

    same = [(i, "aa bb cc dd", "s1" if i % 2 else "s2") for i in range(40)]
    df = spark.createDataFrame(same, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_divergence(df).collect()}
    # two slices with IDENTICAL text distribution: each slice still diverges
    # slightly from the pooled corpus only via itself — here pooled == slice,
    # so js must be exactly 0
    assert out["s1"]["js_bits"] == pytest.approx(0.0, abs=1e-9)
    assert out["s2"]["js_bits"] == pytest.approx(0.0, abs=1e-9)
    assert out["s1"]["n_docs"] == 20

    # disjoint alphabets: each slice is half the pooled mass, JS(P, Q) with
    # Q = (P + P')/2 and P ⟂ P' gives 0.5*KL(P||M) + 0.5*KL(Q||M) where the
    # slice-vs-pool divergence lands at ~0.5 bits (not 1: Q contains P)
    mixed = [(i, "aa aa aa", "s1") for i in range(20)] + [
        (100 + i, "zz zz zz", "s2") for i in range(20)
    ]
    df2 = spark.createDataFrame(mixed, "doc_id long, text string, source string")
    out2 = {r["source"]: r["js_bits"] for r in source_divergence(df2).collect()}
    import math

    # exact: P = {bg in slice}, Q = 0.5P + 0.5P'; bigrams of "aa aa aa" are
    # {aa, 'a ', ' a'} x counts {3,2,2}/7... both slices symmetric, so equal
    assert out2["s1"] == pytest.approx(out2["s2"], abs=1e-6)
    # slice vs pooled with disjoint other half: KL(P||M)=log2(4/3)... just
    # pin the symmetric closed form numerically: p*log2(p/((p+q)/2)) with
    # q = p/2 summed = log2(4/3); kq has matching + disjoint halves
    p_terms = [3 / 7, 2 / 7, 2 / 7]
    kp = sum(p * math.log2(p / ((p + p / 2) / 2)) for p in p_terms)
    kq = sum(
        (p / 2) * math.log2((p / 2) / ((p + p / 2) / 2)) for p in p_terms
    ) + sum((p / 2) * math.log2((p / 2) / ((0 + p / 2) / 2)) for p in p_terms)
    want = round(0.5 * kp + 0.5 * kq, 6)
    assert out2["s1"] == pytest.approx(want, abs=1e-6)


def test_pmi_collocations_hand_computed(spark):
    import math

    # corpus: "x y" always adjacent (perfect collocation), "a b" random-ish
    rows = [(i, "x y a b a x y b a b x y", "s") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["w1"], r["w2"]): r
        for r in corpus.pmi_collocations(df, min_count=3, top_k=10).collect()
    }
    # counts per doc: tokens = 12 -> N = 36; pairs per doc = 11 -> M = 33
    # "x y" occurs 3x/doc = 9; c(x) = 9, c(y) = 9
    got = out[("x", "y")]
    assert got["pair_count"] == 9
    want = round(math.log2(9 / 33) - math.log2(9 / 36) - math.log2(9 / 36), 6)
    assert got["pmi"] == pytest.approx(want, abs=1e-6)
    # ranking: the perfect collocation must outrank the mixed pair
    assert ("x", "y") in out
    if ("a", "b") in out:
        assert got["pmi"] > out[("a", "b")]["pmi"]


def test_pmi_min_count_filters(spark):
    rows = [(0, "p q", "s"), (1, "p q", "s"), (2, "r s", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = {(r["w1"], r["w2"]) for r in corpus.pmi_collocations(df, min_count=2, top_k=10).collect()}
    assert ("p", "q") in pairs and ("r", "s") not in pairs


def test_grouped_quantile_filter_keeps_per_group_share(spark):
    # group a scores 1..100, group b scores 1001..1100: a global p25 would
    # drop ALL of a; the grouped gate keeps ~75% of each
    rows = [(i, "a", float(i)) for i in range(1, 101)]
    rows += [(1000 + i, "b", 1000.0 + i) for i in range(1, 101)]
    scored = spark.createDataFrame(rows, "doc_id bigint, lang string, quality double")
    out = corpus.grouped_quantile_filter(scored, "lang", score_col="quality", q=0.25)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # p25 of 1..100 is 25.75 -> keeps 26..100 = 75 rows, same for b
    assert per == {"a": 75, "b": 75}
    assert out.filter((F.col("lang") == "a") & (F.col("quality") < 25.75)).count() == 0


def test_winsorize_by_group_clamps_and_standardizes(spark):
    # group a: 1..99 plus an outlier 1000 -> p95 clamps it; group b constant
    rows = [(i, "a", float(i)) for i in range(1, 100)] + [(100, "a", 1000.0)]
    rows += [(200 + i, "b", 5.0) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, quality double")
    out = corpus.winsorize_by_group(df, "source")
    a = {r["doc_id"]: r for r in out.filter(F.col("source") == "a").collect()}
    hi = max(r["quality_wins"] for r in a.values())
    assert hi < 1000.0  # outlier clamped to p95
    lo = min(r["quality_wins"] for r in a.values())
    assert lo > 1.0  # low tail clamped to p05
    # z-scores of the winsorized values have ~zero mean
    import statistics

    zs = [r["quality_z"] for r in a.values()]
    assert abs(statistics.fmean(zs)) < 1e-3
    # constant group: sd = 0 -> z = 0
    for r in out.filter(F.col("source") == "b").collect():
        assert r["quality_z"] == 0.0 and r["quality_wins"] == 5.0


def test_temperature_mixture_weights_boosts_low_resource(spark):
    rows = [(i, "w " * 99, "big") for i in range(90)]
    rows += [(1000 + i, "w " * 99, "small") for i in range(10)]
    df = spark.createDataFrame(
        [(i, t.strip(), g) for i, t, g in rows], "doc_id bigint, text string, lang string"
    )
    out = {
        r["lang"]: r
        for r in corpus.temperature_mixture_weights(
            df, alpha=0.5, n_total=100
        ).collect()
    }
    assert out["big"]["raw_share"] == 0.9 and out["small"]["raw_share"] == 0.1
    # sqrt scaling: 3:1 instead of 9:1
    assert abs(out["big"]["temp_share"] - 0.75) < 1e-6
    assert abs(out["small"]["temp_share"] - 0.25) < 1e-6
    assert out["big"]["quota"] == 75 and out["small"]["quota"] == 25
    # alpha=1 reduces to proportional
    prop = {
        r["lang"]: r["temp_share"]
        for r in corpus.temperature_mixture_weights(df, alpha=1.0).collect()
    }
    assert abs(prop["big"] - 0.9) < 1e-6


def test_vocab_coverage_oov_rates(spark):
    train = spark.createDataFrame(
        [(1, "a b c a b a"), (2, "a d")], "doc_id bigint, text string"
    )
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "x y z a"), (12, "q")], "doc_id bigint, text string"
    )
    # vocab_size=3 -> {a, b, then count-1 ties broken lexically: c}
    out = {r["doc_id"]: r for r in corpus.vocab_coverage(train, docs, vocab_size=3).collect()}
    assert out[10].oov_tokens == 0 and out[10].oov_rate == 0.0
    assert out[11].n_tokens == 4 and out[11].oov_tokens == 3
    assert abs(out[11].oov_rate - 0.75) < 1e-9
    assert out[12].oov_rate == 1.0


def test_semantic_decontaminate_flags_only_near_test_vectors(spark):
    from penr_oz_agent_memory_rust_spark.operators.corpus import semantic_decontaminate

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),   # exact copy of a test vector -> sim 1.0
            (2, [0.9, 0.1, 0.0]),   # near the same test vector
            (3, [0.0, 0.0, 1.0]),   # orthogonal to the whole test set
            (4, [0.0, 0.0, 0.0]),   # zero norm -> never comparable
        ],
        "vec_id bigint, embedding array<float>",
    )
    test = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r["max_test_sim"] for r in
           semantic_decontaminate(train, test, threshold=0.5).collect()}
    assert set(got) == {1, 2}
    assert got[1] == 1.0 and 0.99 < got[2] < 1.0


def test_semantic_decontaminate_dim_mismatch_excluded(spark):
    from penr_oz_agent_memory_rust_spark.operators.corpus import semantic_decontaminate

    train = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    test = spark.createDataFrame(
        [(2, [1.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    assert semantic_decontaminate(train, test, threshold=0.0).count() == 0


def test_semantic_decontaminate_blas_matches_expr_at_6dp(spark, sf_dir):
    from pyspark.sql import functions as F

    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        semantic_decontaminate,
        semantic_decontaminate_blas,
    )
    from penr_oz_agent_memory_rust_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train, test = emb.filter(F.col("label") != 9), emb.filter(F.col("label") == 9)
    expr = {r["vec_id"]: r["max_test_sim"]
            for r in semantic_decontaminate(train, test, threshold=0.3).collect()}
    blas = {r["vec_id"]: r["max_test_sim"]
            for r in semantic_decontaminate_blas(train, test, threshold=0.3).collect()}
    assert set(expr) == set(blas)
    assert all(abs(expr[k] - blas[k]) <= 1e-6 for k in expr)


def test_semantic_decontaminate_blas_guards_test_size(spark):
    import pytest

    from penr_oz_agent_memory_rust_spark.operators.corpus import (
        semantic_decontaminate_blas,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="max_test_rows"):
        semantic_decontaminate_blas(df, df, max_test_rows=3).collect()
