"""Gopher repetition-filter features: hand-computed fractions."""

from jochre3_ocr_spark.operators.repetition import repetition_features


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_top_word_and_2gram_fracs(spark):
    # "a b a b a" — top word "a" 3/5; top 2-gram "a b" (len 3) count 2,
    # chars = 9 -> 2*3/9
    rows = repetition_features(_docs(spark, ["a b a b a"])).collect()
    r = rows[0]
    assert r.n_tokens == 5
    assert r.top_word_frac == 0.6
    assert r.top_2gram_char_frac == round(2 * 3 / 9, 6)
    # top 3-gram "a b a" (len 5) occurs at positions 0 and 2 -> count 2
    assert r.top_3gram_char_frac == round(2 * 5 / 9, 6)


def test_short_doc_zero_for_missing_n(spark):
    r = repetition_features(_docs(spark, ["x y"])).collect()[0]
    assert r.top_3gram_char_frac == 0.0
    assert r.top_4gram_char_frac == 0.0
    assert r.dup_5gram_token_frac == 0.0


def test_dup_ngram_coverage_merges_overlaps(spark):
    # a 6-token phrase repeated back-to-back: every 5-gram in each copy
    # repeats, covering all 12 phrase tokens; the 3 trailing singles dont
    phrase = "p0 p1 p2 p3 p4 p5"
    text = f"{phrase} {phrase} s0 s1 s2"
    r = repetition_features(_docs(spark, [text])).collect()[0]
    assert r.n_tokens == 15
    assert r.dup_5gram_token_frac == round(12 / 15, 6)


def test_no_repetition_floor(spark):
    # all-distinct tokens: top word 1/n, no dup coverage
    r = repetition_features(_docs(spark, ["t0 t1 t2 t3 t4 t5 t6"])).collect()[0]
    assert r.top_word_frac == round(1 / 7, 6)
    assert r.dup_5gram_token_frac == 0.0


def test_partitioning_invariant(spark):
    texts = [f"w{i} w{(i + 1) % 4} dup dup dup dup dup dup w{i}" for i in range(9)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, repetition_features(docs).collect()))
    b = sorted(map(tuple, repetition_features(docs.repartition(5)).collect()))
    assert a == b


def test_round_half_up_on_decimal_tie(spark):
    # 3/640 = 0.0046875 exactly: shortest-repr HALF_UP gives 0.004688
    # (what Spark round() and DuckDB round() both produce); quantizing
    # the exact binary expansion would give 0.004687 (review finding)
    toks = ["w"] * 3 + [f"u{i}" for i in range(637)]
    docs = _docs(spark, [" ".join(toks)])
    r = repetition_features(docs).collect()[0]
    assert r.n_tokens == 640
    assert r.top_word_frac == 0.004688
