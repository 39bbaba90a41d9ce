"""DSIR importance weights (operators/importance.py).

An independent pure-Python replay (its own md5 bucketing, counting, and
smoothing — shares no code with the operator) pins the math; property
tests pin the identities the construction guarantees (target==raw → 0,
zero-gram docs → 0, deterministic selection)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.importance import (
    dsir_log_weights,
    dsir_select,
    hashed_gram_buckets,
)

WIDTH = 2
B = 16**WIDTH


def _grams(text):
    t = [w for w in text.split(" ") if w]
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(gram):
    return hashlib.md5(gram.encode()).hexdigest()[:WIDTH]


def _model(texts):
    counts: dict = {}
    for tx in texts:
        for g in _grams(tx):
            bkt = _bucket(g)
            counts[bkt] = counts.get(bkt, 0) + 1
    n = sum(counts.values())
    return counts, n


def _py_weight(text, target, raw):
    tc, tn = _model(target)
    rc, rn = _model(raw)
    lw = 0.0
    for g in _grams(text):
        bkt = _bucket(g)
        lp = math.log((tc.get(bkt, 0) + 1) / (tn + B))
        lq = math.log((rc.get(bkt, 0) + 1) / (rn + B))
        lw += lp - lq
    return round(lw, 6)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 60")
        .cache()
    )


def test_matches_independent_python_replay(spark, docs):
    rows = docs.select("doc_id", "text", "lang").collect()
    target = [r.text for r in rows if r.lang == "en"]
    raw = [r.text for r in rows]
    expected = {str(r.doc_id): _py_weight(r.text, target, raw) for r in rows}
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            docs, docs.filter("lang = 'en'"), width_hex=WIDTH
        ).collect()
    }
    assert got.keys() == expected.keys()
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=2e-6), k


def test_target_equals_raw_is_identically_zero(docs):
    out = dsir_log_weights(docs, docs, raw=docs).collect()
    assert out and all(r.log_weight == 0.0 for r in out)


def test_zero_gram_docs(spark):
    docs = spark.createDataFrame(
        [("1", "alpha beta"), ("2", "")], "doc_id string, text string"
    )
    target = spark.createDataFrame([("t", "alpha alpha")], "doc_id string, text string")
    out = {r.doc_id: r for r in dsir_log_weights(docs, target).collect()}
    assert out["2"].n_grams == 0 and out["2"].log_weight == 0.0
    assert out["1"].n_grams == 3  # 2 unigrams + 1 bigram


def test_gram_counts(spark, docs):
    got = (
        hashed_gram_buckets(docs)
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n"))
        .collect()
    )
    rows = {str(r.doc_id): r.text for r in docs.collect()}
    for r in got:
        assert r.n == len(_grams(rows[r.doc_id])), r.doc_id


def test_select_is_deterministic_topk(spark):
    w = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 1.0), ("d", 0.5)],
        "doc_id string, log_weight double",
    )
    out = {r.doc_id: (r.rnk, r.selected) for r in dsir_select(w, keep=2).collect()}
    # tie between a and c breaks on doc_id asc
    assert out == {"b": (1, True), "a": (2, True), "c": (3, False), "d": (4, False)}
