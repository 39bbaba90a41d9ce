"""Vocab coverage + mixture planning: hand-computed values."""

from jochre3_ocr_spark.operators.text_metrics import (
    mixture_plan,
    vocab_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_vocab_coverage_exact(spark):
    # tokens: a x4, b x2, c x1 -> total 7, |V|=3
    docs = _docs(spark, [(0, "a a b a", "s"), (1, "a b c", "s")])
    r = vocab_coverage(docs, ks=(1, 2)).collect()[0]
    assert (r.total_tokens, r.vocab_size) == (7, 3)
    assert r.covered_1 == 4 and r.coverage_1 == round(4 / 7, 6)
    assert r.covered_2 == 6 and r.coverage_2 == round(6 / 7, 6)


def test_vocab_coverage_k_beyond_vocab(spark):
    r = vocab_coverage(_docs(spark, [(0, "x y", "s")]), ks=(100,)).collect()[0]
    assert r.coverage_100 == 1.0


def test_mixture_plan_binding_source_at_one(spark):
    rows = (
        [(i, "t", "a") for i in range(10)]
        + [(100 + i, "t", "b") for i in range(30)]
        + [(200 + i, "t", "c") for i in range(5)]
    )
    plan = {r.source: r for r in mixture_plan(
        _docs(spark, rows), {"a": 0.5, "b": 0.5}
    ).collect()}
    # c = min(10/0.5, 30/0.5) = 20 -> a keeps all, b keeps 1/3
    assert plan["a"].fraction == 1.0 and plan["a"].expected_docs == 10
    assert plan["b"].fraction == round(20 * 0.5 / 30, 6)
    assert plan["b"].expected_docs == 9  # floor(30 x 0.333333)
    assert plan["c"].fraction == 0.0 and plan["c"].expected_docs == 0


def test_mixture_plan_weights_realised(spark):
    # realised mixture (expected docs) proportions match target weights
    rows = [(i, "t", "a") for i in range(40)] + [
        (100 + i, "t", "b") for i in range(160)
    ]
    plan = {r.source: r for r in mixture_plan(
        _docs(spark, rows), {"a": 0.2, "b": 0.8}
    ).collect()}
    assert plan["a"].expected_docs == 40
    assert plan["b"].expected_docs == 160  # already at target ratio


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------
from jochre3_ocr_spark.operators.text_metrics import inverted_index  # noqa: E402


def test_inverted_index_postings(spark):
    docs = _docs(spark, [(0, "a b a", "s"), (1, "b b", "s")])
    idx = {r.term: r for r in inverted_index(docs).collect()}
    assert idx["a"].df_count == 1 and idx["a"].postings == "0:0|2"
    assert idx["b"].df_count == 2 and idx["b"].postings == "0:1,1:0|1"


def test_inverted_index_cap_keeps_exact_df(spark):
    docs = _docs(spark, [(i, "hot w", "s") for i in range(5)])
    r = {x.term: x for x in inverted_index(docs, max_postings=2).collect()}
    assert r["hot"].df_count == 5
    assert r["hot"].postings == "0:0,1:0"  # first two doc ids only


def test_inverted_index_partitioning_invariant(spark):
    docs = _docs(spark, [(i, f"t{i % 3} u{i % 5} t{i % 3}", "s") for i in range(14)])
    a = sorted(map(tuple, inverted_index(docs).collect()))
    b = sorted(map(tuple, inverted_index(docs.repartition(6)).collect()))
    assert a == b
