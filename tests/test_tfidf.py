"""TF-IDF top-k terms: hand-computed scores and deterministic ranks."""

import math

from jochre3_ocr_spark.operators.text_metrics import tfidf_top_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_hand_computed_scores(spark):
    docs = _docs(spark, ["x x y", "y z"])
    rows = {
        (r.doc_id, r.rnk): (r.term, r.tf, r.score)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    idf_rare = math.log(3 / 2) + 1  # df=1, N=2
    assert rows[(0, 1)] == ("x", 2, round(2 * idf_rare, 6))
    assert rows[(0, 2)] == ("y", 1, 1.0)  # idf(y) = ln(3/3)+1 = 1
    assert rows[(1, 1)] == ("z", 1, round(idf_rare, 6))


def test_tie_breaks_alphabetically(spark):
    rows = tfidf_top_terms(_docs(spark, ["b a"]), k=2).orderBy("rnk").collect()
    assert [r.term for r in rows] == ["a", "b"]


def test_k_limits_output(spark):
    docs = _docs(spark, ["a b c d e f"])
    assert tfidf_top_terms(docs, k=3).count() == 3


def test_partitioning_invariant(spark):
    docs = _docs(
        spark, [f"w{i % 5} w{(i + 2) % 9} w{i % 3} w{i % 5}" for i in range(24)]
    )
    a = sorted(map(tuple, tfidf_top_terms(docs, k=2).collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs.repartition(7), k=2).collect()))
    assert a == b
