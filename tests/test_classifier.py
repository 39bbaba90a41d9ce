"""Naive-Bayes text classification (operators/classifier.py): exact
hand-computed posteriors, separable-corpus accuracy, smoothing floor
for unseen tokens, empty-doc prior fallback, partitioning invariance."""

import math

from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.classifier import (
    nb_classify,
    nb_predict,
    nb_train,
)


def _corpus(spark):
    # perfectly separable two-label corpus with one shared token
    rows = [
        (0, "ja ja wurst", "de"),
        (1, "ja wurst wurst", "de"),
        (2, "yes yes tea", "en"),
        (3, "yes tea tea", "en"),
        (4, "yes tea common", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_hand_computed_posterior(spark):
    """One-token doc 'ja': score(de) = ln(2/5) + ln((c+1)/(tot+V)) with
    c(ja,de)=3, tot(de)=6, V=5 -> ln(0.4) + ln(4/11); score(en) =
    ln(3/5) + ln(1/14).  de must win."""
    train = _corpus(spark)
    probe = spark.createDataFrame([(10, "ja")], "doc_id long, text string")
    tc, lt, v = nb_train(train)
    [row] = nb_predict(probe, tc, lt, v).collect()
    assert row.pred_label == "de"
    expected = round(math.log(2 / 5) + math.log((3 + 1) / (6 + 5)), 6)
    assert abs(row.score - expected) < 1e-9


def test_nb_unseen_token_gets_smoothing_floor(spark):
    """A token never seen in training scores alpha/(tot+V) under every
    label — the prediction then rides on the prior."""
    train = _corpus(spark)
    probe = spark.createDataFrame(
        [(10, "zzz_unseen")], "doc_id long, text string"
    )
    [row] = nb_classify(probe, train).collect()
    assert row.pred_label == "en"  # higher prior (3 vs 2 docs)
    expected = round(math.log(3 / 5) + math.log(1 / (9 + 5)), 6)
    assert abs(row.score - expected) < 1e-9


def test_nb_separable_corpus_classifies_perfectly(spark):
    train = _corpus(spark)
    out = {r.doc_id: r.pred_label for r in nb_classify(train, train).collect()}
    truth = {r.doc_id: r.lang for r in train.collect()}
    assert out == truth


def test_nb_empty_doc_falls_back_to_prior(spark):
    train = _corpus(spark)
    probe = spark.createDataFrame([(10, "")], "doc_id long, text string")
    [row] = nb_classify(probe, train).collect()
    assert row.pred_label == "en"
    assert abs(row.score - round(math.log(3 / 5), 6)) < 1e-9


def test_nb_partitioning_invariance(spark):
    train = _corpus(spark)
    docs = spark.createDataFrame(
        [(i, "ja wurst" if i % 2 else "yes tea") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in nb_classify(docs, train).collect())
    b = sorted(
        tuple(r)
        for r in nb_classify(docs.repartition(11, "doc_id"), train).collect()
    )
    assert a == b


def test_nb_null_text_doc_is_kept_with_prior(spark):
    """A NULL-text document must appear in the output with the
    prior-fallback prediction, not silently vanish (split(NULL) is
    NULL — the NULL-text bug class)."""
    train = _corpus(spark)
    probe = spark.createDataFrame(
        [(10, None), (11, ""), (12, "ja")], "doc_id long, text string"
    )
    out = {r.doc_id: r.pred_label for r in nb_classify(probe, train).collect()}
    assert set(out) == {10, 11, 12}
    assert out[10] == "en" and out[11] == "en" and out[12] == "de"
