"""Exact-substring dedup: span construction, merging, stripping."""

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.substring import (
    duplicated_window_spans,
    strip_duplicated_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _w(s, n):  # n tokens derived from a stem
    return " ".join(f"{s}{i}" for i in range(n))


def test_shared_phrase_found_in_both_docs(spark):
    shared = _w("dup", 8)
    docs = _docs(spark, [f"{_w('a', 4)} {shared}", f"{shared} {_w('b', 4)}"])
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_window_spans(docs, k=8).collect()
    }
    assert spans == {(0, 4, 12), (1, 0, 8)}


def test_overlapping_windows_merge(spark):
    # a 10-token shared run yields 3 overlapping windows -> ONE span of 10
    shared = _w("dup", 10)
    docs = _docs(spark, [f"{shared} {_w('a', 3)}", f"{_w('b', 3)} {shared}"])
    rows = duplicated_window_spans(docs, k=8).orderBy("doc_id").collect()
    assert [(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in rows] == [
        (0, 0, 10, 3),
        (1, 3, 13, 3),
    ]


def test_distant_repeats_stay_separate_spans(spark):
    s1, s2 = _w("x", 8), _w("y", 8)
    docs = _docs(
        spark,
        [f"{s1} {_w('a', 9)} {s2}", f"{s2} {_w('b', 9)} {s1}"],
    )
    rows = duplicated_window_spans(docs, k=8).collect()
    assert sorted((r.doc_id, r.span_start, r.span_end) for r in rows) == [
        (0, 0, 8),
        (0, 17, 25),
        (1, 0, 8),
        (1, 17, 25),
    ]


def test_same_doc_repeat_counts(spark):
    phrase = _w("r", 8)
    docs = _docs(spark, [f"{phrase} {_w('m', 8)} {phrase}", _w("z", 20)])
    rows = duplicated_window_spans(docs, k=8).collect()
    assert {r.doc_id for r in rows} == {0}
    assert sorted((r.span_start, r.span_end) for r in rows) == [(0, 8), (16, 24)]


def test_short_docs_never_emit_windows(spark):
    docs = _docs(spark, ["a b c", "a b c"])  # exact dups but < k tokens
    assert duplicated_window_spans(docs, k=8).count() == 0


def test_strip_full_coverage_keeps_empty_row(spark):
    t = _w("e", 12)
    docs = _docs(spark, [t, t, _w("u", 5)])
    rows = {r.doc_id: r for r in strip_duplicated_spans(docs, k=8).collect()}
    assert len(rows) == 3
    assert rows[0].clean_text == "" and rows[0].n_kept == 0
    assert rows[0].n_removed == 12
    assert rows[2].clean_text == _w("u", 5) and rows[2].n_removed == 0


def test_strip_partial(spark):
    shared = _w("dup", 8)
    tail = _w("t", 4)
    docs = _docs(spark, [f"{shared} {tail}", f"{_w('o', 4)} {shared}"])
    rows = {r.doc_id: r for r in strip_duplicated_spans(docs, k=8).collect()}
    assert rows[0].clean_text == tail
    assert rows[0].n_kept == 4 and rows[0].n_removed == 8


def test_partitioning_invariant(spark):
    texts = [f"{_w('s', 8)} {_w(chr(97 + i), 6)}" for i in range(10)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, strip_duplicated_spans(docs, k=8).collect()))
    b = sorted(
        map(tuple, strip_duplicated_spans(docs.repartition(7), k=8).collect())
    )
    assert a == b


def test_min_count_threshold(spark):
    phrase = _w("q", 8)
    docs = _docs(spark, [f"{phrase} {_w('a', 3)}", f"{phrase} {_w('b', 3)}"])
    assert duplicated_window_spans(docs, k=8, min_count=3).count() == 0
    assert duplicated_window_spans(docs, k=8, min_count=2).count() == 2


# ---------------------------------------------------------------------------
# Span-level benchmark decontamination (contaminated_window_spans /
# decontaminate_spans): the Lee et al. construction pointed at an eval
# suite instead of the corpus itself.
# ---------------------------------------------------------------------------
from jochre3_ocr_spark.operators.substring import (  # noqa: E402
    contaminated_window_spans,
    decontaminate_spans,
)


def _bench(spark, texts):
    return spark.createDataFrame(
        [(f"b{i}", t) for i, t in enumerate(texts)],
        "doc_id string, text string",
    )


def test_contaminated_span_localised(spark):
    leaked = _w("leak", 8)
    docs = _docs(spark, [f"{_w('a', 3)} {leaked} {_w('z', 2)}", _w("c", 10)])
    bench = _bench(spark, [f"{_w('pre', 2)} {leaked}"])
    spans = [
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in contaminated_window_spans(docs, bench, k=8).collect()
    ]
    assert spans == [(0, 3, 11, 1)]


def test_corpus_repeats_alone_do_not_contaminate(spark):
    # the same phrase in MANY corpus docs is dup, not contamination —
    # only benchmark membership flags it
    phrase = _w("dup", 8)
    docs = _docs(spark, [f"{phrase} {_w('a', 2)}", f"{phrase} {_w('b', 2)}"])
    bench = _bench(spark, [_w("other", 12)])
    assert contaminated_window_spans(docs, bench, k=8).count() == 0


def test_decontaminate_keeps_document(spark):
    leaked = _w("leak", 8)
    keep = _w("keep", 5)
    docs = _docs(spark, [f"{keep} {leaked}", _w("u", 6)])
    bench = _bench(spark, [leaked])
    rows = {r.doc_id: r for r in decontaminate_spans(docs, bench, k=8).collect()}
    assert rows[0].clean_text == keep
    assert rows[0].n_kept == 5 and rows[0].n_removed == 8
    # untouched doc passes through, not dropped
    assert rows[1].clean_text == _w("u", 6) and rows[1].n_removed == 0


def test_decontaminate_same_doc_multiple_bench_hits_merge(spark):
    l1, l2 = _w("x", 8), _w("y", 8)
    docs = _docs(spark, [f"{l1} {l2}", f"{l1} MID {_w('t', 7)}"])
    bench = _bench(spark, [l1, l2])
    rows = {r.doc_id: r for r in decontaminate_spans(docs, bench, k=8).collect()}
    assert rows[0].clean_text == "" and rows[0].n_removed == 16
    assert rows[1].clean_text == f"MID {_w('t', 7)}"


def test_decontaminate_partitioning_invariant(spark):
    leaked = _w("leak", 8)
    texts = [f"{_w(chr(97 + i), 4)} {leaked}" for i in range(8)] + [
        _w("z", 9)
    ]
    docs = _docs(spark, texts)
    bench = _bench(spark, [leaked])
    a = sorted(map(tuple, decontaminate_spans(docs, bench, k=8).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate_spans(docs.repartition(5), bench, k=8).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# Fuzzy contamination fraction (contamination_stats): the GPT-3-style
# keep-iff-below-threshold policy.
# ---------------------------------------------------------------------------
from jochre3_ocr_spark.operators.substring import contamination_stats  # noqa: E402


def test_contamination_fraction_exact(spark):
    leaked = _w("leak", 8)
    # doc 0: 12 tokens -> 5 windows, exactly 1 of them leaked
    docs = _docs(spark, [f"{_w('a', 2)} {leaked} {_w('z', 2)}", _w("c", 9)])
    bench = _bench(spark, [leaked])
    rows = {r.doc_id: r for r in contamination_stats(docs, bench, k=8).collect()}
    assert (rows[0].n_windows, rows[0].n_contaminated) == (5, 1)
    assert rows[0].contaminated_frac == 0.2
    assert rows[1].n_contaminated == 0 and rows[1].keep


def test_contamination_threshold_verdict(spark):
    leaked = _w("leak", 8)
    docs = _docs(spark, [f"{leaked} {_w('a', 1)}", f"{leaked} {_w('b', 24)}"])
    bench = _bench(spark, [leaked])
    rows = {
        r.doc_id: r
        for r in contamination_stats(docs, bench, k=8, max_fraction=0.1).collect()
    }
    # doc 0: 2 windows, 1 hit -> 0.5 > 0.1 -> drop; doc 1: 25 windows,
    # 1 hit -> 0.04 <= 0.1 -> keep
    assert not rows[0].keep
    assert rows[1].keep and rows[1].contaminated_frac == 0.04


def test_contamination_short_doc_kept(spark):
    docs = _docs(spark, [_w("s", 5)])
    bench = _bench(spark, [_w("s", 8)])
    r = contamination_stats(docs, bench, k=8).collect()[0]
    assert (r.n_windows, r.n_contaminated, r.contaminated_frac, r.keep) == (
        0, 0, 0.0, True,
    )


def test_benchmark_needs_no_id_column(spark):
    # the benchmark contributes only text; its schema need not carry
    # the corpus id_col (regression: _windows used to select id_col
    # from the benchmark side too)
    leaked = _w("leak", 8)
    docs = _docs(spark, [f"{_w('a', 2)} {leaked}"])
    bench = spark.createDataFrame([(leaked,)], "text string")
    assert contaminated_window_spans(docs, bench, k=8).count() == 1
    assert contamination_stats(docs, bench, k=8).count() == 1
