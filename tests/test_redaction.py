"""PII redaction + BPE merge candidates: exact values."""

from jochre3_ocr_spark.operators.redaction import redact_pii
from jochre3_ocr_spark.operators.text_metrics import bpe_merge_candidates


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_redact_all_three_types(spark):
    r = redact_pii(
        _docs(spark, ["mail bob@site.org ip 10.0.0.1 tel 555-123-4567 end"])
    ).collect()[0]
    assert r.clean_text == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_redactions) == (1, 1, 1, 3)


def test_ip_inside_email_domain_counts_once(spark):
    # "10.0.0.1" is a valid IPv4 literal inside the email's domain; the
    # sequential count must see ONE email and ZERO ips (counting both
    # on the original text would report 2 but replace 1)
    r = redact_pii(_docs(spark, ["m u@10.0.0.1.cc z"])).collect()[0]
    assert r.clean_text == "m <EMAIL> z"
    assert (r.n_email, r.n_ipv4, r.n_redactions) == (1, 0, 1)


def test_bare_ip_redacts(spark):
    r = redact_pii(_docs(spark, ["ping 10.0.0.99 now"])).collect()[0]
    assert r.clean_text == "ping <IP> now"
    assert (r.n_email, r.n_ipv4, r.n_redactions) == (0, 1, 1)


def test_non_email_at_string_still_redacts_inner_ip(spark):
    # "a@10.0.0.99" is NOT an email (no alphabetic TLD after a dot), so
    # the email pass leaves it; the IP pass must still fire across the
    # "@" word boundary
    r = redact_pii(_docs(spark, ["x a@10.0.0.99 y"])).collect()[0]
    assert r.clean_text == "x a@<IP> y"
    assert (r.n_email, r.n_ipv4, r.n_redactions) == (0, 1, 1)


def test_clean_doc_untouched(spark):
    r = redact_pii(_docs(spark, ["just plain words here"])).collect()[0]
    assert r.clean_text == "just plain words here"
    assert r.n_redactions == 0


def test_bpe_merge_counts(spark):
    # words: "abab" -> ab, ba, ab ; "ab" -> ab ; "zz" -> zz
    rows = bpe_merge_candidates(
        _docs(spark, ["abab ab", "zz"]), k=3
    ).orderBy("rnk").collect()
    assert [(r.pair, r.cnt, r.rnk) for r in rows] == [
        ("ab", 3, 1),
        ("ba", 1, 2),
        ("zz", 1, 3),
    ]


def test_bpe_single_char_words_ignored(spark):
    assert bpe_merge_candidates(_docs(spark, ["a b c"]), k=5).count() == 0


def test_bpe_partitioning_invariant(spark):
    docs = _docs(spark, [f"w{i}xy{i % 3}z abca{i % 5}" for i in range(16)])
    a = [tuple(r) for r in bpe_merge_candidates(docs, k=8).collect()]
    b = [tuple(r) for r in bpe_merge_candidates(docs.repartition(5), k=8).collect()]
    assert a == b


def test_null_text_redacts_to_empty_with_zero_counts(spark):
    docs = spark.createDataFrame([(0, None)], "doc_id bigint, text string")
    r = redact_pii(docs).collect()[0]
    assert r.clean_text == ""
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_redactions) == (0, 0, 0, 0)
