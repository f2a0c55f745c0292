from __future__ import annotations

import math

from penr_oz_agent_memory_rust_spark.operators.ngram_lm import (
    word_lm_score,
    word_lm_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_train_counts(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a c")])
    bigrams, unigrams, totals = word_lm_train(train)
    bg = {(r.w1, r.w2): (r.c12, r.c1) for r in bigrams.collect()}
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 ; c1: a=3, b=2
    assert bg == {("a", "b"): (2, 3), ("b", "a"): (1, 2), ("a", "c"): (1, 3)}
    uni = {r.w: r.c for r in unigrams.collect()}
    assert uni == {"a": 3, "b": 2, "c": 1}
    t = totals.collect()[0]
    assert (t.n_tokens, t.v) == (6, 3)


def test_score_seen_and_backoff(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a c")])
    model = word_lm_train(train)
    docs = _docs(spark, [(10, "a b"), (11, "a z"), (12, "solo")])
    out = {r.doc_id: r for r in word_lm_score(docs, *model).collect()}
    # doc 10: seen bigram -> log2(2/3)
    assert abs(out[10].lm_score - round(math.log2(2 / 3), 6)) < 1e-9
    assert out[10].backoff_rate == 0.0
    # doc 11: backoff, z unseen -> log2(0.4 * 1 / 9)
    assert abs(out[11].lm_score - round(math.log2(0.4 * 1 / 9), 6)) < 1e-9
    assert out[11].backoff_rate == 1.0
    # doc 12: single token -> no row
    assert 12 not in out


def test_min_count_prunes_to_backoff(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a c")])
    bigrams, unigrams, totals = word_lm_train(train, min_count=2)
    assert {(r.w1, r.w2) for r in bigrams.collect()} == {("a", "b")}
    docs = _docs(spark, [(20, "a c")])
    out = word_lm_score(docs, bigrams, unigrams, totals).collect()[0]
    # (a,c) pruned -> backs off to unigram c: log2(0.4 * (1+1) / 9)
    assert out.backoff_rate == 1.0
    assert abs(out.lm_score - round(math.log2(0.4 * 2 / 9), 6)) < 1e-9


def test_mixed_doc_average(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a c")])
    model = word_lm_train(train)
    docs = _docs(spark, [(30, "a b z")])
    out = word_lm_score(docs, *model).collect()[0]
    seen = math.log2(2 / 3)
    bo = math.log2(0.4 * 1 / 9)
    assert out.n_bigrams == 2
    assert out.backoff_rate == 0.5
    assert abs(out.lm_score - round((seen + bo) / 2, 6)) < 1e-6
