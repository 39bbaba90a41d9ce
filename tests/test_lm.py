"""Bigram LM scoring: hand-computed add-one probabilities."""

import math

from jochre3_ocr_spark.operators.lm import (
    bigram_counts,
    bigram_lm_scores,
    quality_buckets,
    score_documents,
    vocab_size,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_counts_and_vocab(spark):
    train = _docs(spark, ["a b a b", "b c"])
    cnt = {(r.w1, r.w2): r.c for r in bigram_counts(train).collect()}
    assert cnt == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}
    assert vocab_size(train).collect()[0].v == 3.0


def test_hand_computed_logprob(spark):
    # model: c(a,b)=2, c(b,a)=1, c(b,c)=1; h(a)=2, h(b)=2; V=3
    train = _docs(spark, ["a b a b", "b c"])
    docs = _docs(spark, ["a b c"])
    r = bigram_lm_scores(docs, train).collect()[0]
    # P(b|a) = (2+1)/(2+3) = 0.6 ; P(c|b) = (1+1)/(2+3) = 0.4
    expect = (math.log(0.6) + math.log(0.4)) / 2
    assert r.n_bigrams == 2
    assert r.avg_logprob == round(expect, 6)


def test_unseen_history_scores_one_over_v(spark):
    train = _docs(spark, ["a b"])
    docs = _docs(spark, ["z q"])
    r = bigram_lm_scores(docs, train).collect()[0]
    # h(z)=0, c=0, V=2 -> P = 1/2
    assert r.avg_logprob == round(math.log(0.5), 6)


def test_short_doc_scores_zero(spark):
    train = _docs(spark, ["a b"])
    docs = _docs(spark, ["solo"])
    r = bigram_lm_scores(docs, train).collect()[0]
    assert (r.n_bigrams, r.avg_logprob) == (0, 0.0)


def test_buckets_from_cuts(spark):
    train = _docs(spark, ["a b a b a b a b", "a c"])
    docs = _docs(spark, ["a b a b", "a c", "z z"])
    scored = bigram_lm_scores(docs, train)
    rows = {r.doc_id: r.bucket for r in quality_buckets(scored, (-1.0, -0.5)).collect()}
    # doc 0 repeats the dominant bigram (high prob -> head); doc 2 unseen
    assert rows[0] == "head" and rows[2] == "tail"


def test_score_partitioning_invariant(spark):
    train = _docs(spark, [f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7}" for i in range(20)])
    docs = _docs(spark, [f"w{i % 7} w{(i + 3) % 5} w{i % 3}" for i in range(30)])
    a = sorted(map(tuple, bigram_lm_scores(docs, train).collect()))
    b = sorted(
        map(
            tuple,
            score_documents(
                docs.repartition(7),
                bigram_counts(train.repartition(3)),
                vocab_size(train),
            ).collect(),
        )
    )
    assert a == b


def test_shuffle_join_model_matches_broadcast(spark):
    train = _docs(spark, [f"w{i % 6} w{(i + 1) % 6} w{(i + 2) % 8}" for i in range(18)])
    docs = _docs(spark, [f"w{i % 8} w{(i + 3) % 6} w{i % 4}" for i in range(25)])
    a = sorted(map(tuple, bigram_lm_scores(docs, train).collect()))
    b = sorted(
        map(
            tuple,
            bigram_lm_scores(docs, train, broadcast_model=False).collect(),
        )
    )
    assert a == b
