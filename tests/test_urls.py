"""URL canonicalization (operators/urls.py): hand-written normalization
cases, the synthetic-variant merge property, and host statistics."""

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.urls import (
    canonicalize_urls,
    host_stats,
    synthesize_urls,
)

CASES = [
    # scheme/host case + default https port + fragment
    ("HTTPS://WWW.Ex.COM:443/p?b=2&a=1#x", "https://www.ex.com/p?a=1&b=2"),
    # http default port stripped; non-default kept
    ("http://ex.com:80/p", "http://ex.com/p"),
    ("http://ex.com:8080/p", "http://ex.com:8080/p"),
    ("https://ex.com:80/p", "https://ex.com:80/p"),  # 80 is NOT https default
    # utm params dropped, rest sorted, empty query dropped entirely
    ("https://ex.com/p?utm_source=a&utm_medium=b", "https://ex.com/p"),
    ("https://ex.com/p?z=1&utm_campaign=c&a=2", "https://ex.com/p?a=2&z=1"),
    # slash collapse + index.html strip + empty path
    ("https://ex.com//a///b//index.html", "https://ex.com/a/b/"),
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com/index.html", "https://ex.com/"),
    # index.html only strips as a suffix segment
    ("https://ex.com/index.html/more", "https://ex.com/index.html/more"),
    ("https://ex.com/not-index.html", "https://ex.com/not-index.html"),
    # & runs / trailing & leave no empty params
    ("https://ex.com/p?a=1&&b=2&", "https://ex.com/p?a=1&b=2"),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_canonical_cases(spark, url, expected):
    df = spark.createDataFrame([(url,)], "url string")
    [row] = canonicalize_urls(df).collect()
    assert row.canonical_url == expected


def test_host_column_lowercased_no_port(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Ex.COM:8443/p",)], "url string"
    )
    [row] = canonicalize_urls(df).collect()
    assert row.host == "www.ex.com"
    assert row.canonical_url == "https://www.ex.com:8443/p"


def test_garbage_input_does_not_raise(spark):
    df = spark.createDataFrame([("not a url",), ("",)], "url string")
    rows = canonicalize_urls(df).collect()
    assert len(rows) == 2  # degrades to empty parts, never throws


def test_synthetic_variants_merge(spark):
    """All surface variants of one page id canonicalize identically,
    and distinct page ids never collide."""
    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    u = canonicalize_urls(synthesize_urls(docs, share_mod=100))
    rows = u.collect()
    by_pid: dict = {}
    for r in rows:
        by_pid.setdefault(int(r.doc_id) % 100, set()).add(r.canonical_url)
    assert all(len(v) == 1 for v in by_pid.values())
    canon = {next(iter(v)) for v in by_pid.values()}
    assert len(canon) == 100
    # the synthesizer actually produced messy variants worth merging
    assert len({r.url for r in rows}) > 100


def test_host_stats(spark):
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    hs = host_stats(synthesize_urls(docs, share_mod=100))
    agg = hs.agg(
        F.sum("n_docs").alias("d"), F.sum("n_url_dupes").alias("dup")
    ).collect()[0]
    assert agg.d == 200
    assert agg.dup == 100  # each of the 100 pages appears exactly twice
    assert hs.filter("n_url_dupes < 0").count() == 0


def _verdicts(spark, urls, rules):
    """Run robots_verdicts over literal (doc_id, url) rows and
    (host, rule_type, path_prefix) rules."""
    from jochre3_ocr_spark.operators.urls import robots_verdicts

    u = spark.createDataFrame(urls, "doc_id string, url string")
    r = spark.createDataFrame(
        rules, "host string, rule_type string, path_prefix string"
    )
    return {
        row.doc_id: row for row in robots_verdicts(u, r).collect()
    }


def test_robots_longest_match_wins(spark):
    """RFC 9309 §2.2.2: the most specific (longest) rule applies —
    a deeper allow overrides a broader disallow and vice versa."""
    out = _verdicts(
        spark,
        [("1", "https://ex.com/a/b/x"), ("2", "https://ex.com/a/c/x")],
        [
            ("ex.com", "disallow", "/a/"),
            ("ex.com", "allow", "/a/b/"),
            ("ex.com", "disallow", "/a/c/"),
        ],
    )
    assert out["1"].allowed and out["1"].matched_prefix == "/a/b/"
    assert not out["2"].allowed and out["2"].matched_prefix == "/a/c/"


def test_robots_tie_allow_wins_and_no_rule_allows(spark):
    out = _verdicts(
        spark,
        [("1", "https://ex.com/a/x"), ("2", "https://other.com/a/x")],
        [
            ("ex.com", "disallow", "/a/"),
            ("ex.com", "allow", "/a/"),
        ],
    )
    # exact length tie → allow wins
    assert out["1"].allowed and out["1"].matched_type == "allow"
    # host with no rules at all → allowed, no match columns
    assert out["2"].allowed and out["2"].matched_type is None


def test_robots_prefix_is_literal_not_segment(spark):
    """Prefix match is byte-wise (standard REP), not path-segment —
    /a matches /abc; and an empty path never matches a non-empty
    prefix."""
    out = _verdicts(
        spark,
        [("1", "https://ex.com/abc"), ("2", "https://ex.com")],
        [("ex.com", "disallow", "/a")],
    )
    assert not out["1"].allowed
    assert out["2"].allowed  # path "" has no matching rule


def test_robots_synthetic_rules_cover_all_cases(spark):
    """The md5-steered synthesizer emits all three rule shapes and the
    verdicts over the synthetic crawl hit every branch."""
    from jochre3_ocr_spark.operators.urls import (
        robots_verdicts,
        synthesize_robots_rules,
        synthesize_urls,
    )

    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    u = synthesize_urls(docs, share_mod=200)
    rules = synthesize_robots_rules(u)
    # every host has exactly one disallow; allows are optional extras
    per_host = {
        r.host: r.n
        for r in rules.where("rule_type = 'disallow'")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_host.values()) == {1}
    v = robots_verdicts(u, rules)
    kinds = {
        (row.allowed, row.matched_type)
        for row in v.select("allowed", "matched_type").distinct().collect()
    }
    assert (False, "disallow") in kinds  # blocked pages exist
    assert (True, None) in kinds  # unmatched pages exist
    assert (True, "allow") in kinds  # allow-override fired somewhere
    assert v.count() == 400


def test_frontier_priorities_hand_semantics(spark):
    """Variants collapse to one row; disallowed pages get priority 0;
    priority = host_rank DIV n_variants; unknown host rank → 0."""
    from jochre3_ocr_spark.operators.urls import frontier_priorities

    u = spark.createDataFrame(
        [
            ("1", "https://ex.com/a/x"),
            ("2", "HTTPS://EX.COM/a/x"),  # variant of the same page
            ("3", "https://ex.com/blocked/x"),
            ("4", "https://norank.com/p"),
        ],
        "doc_id string, url string",
    )
    rules = spark.createDataFrame(
        [("ex.com", "disallow", "/blocked/")],
        "host string, rule_type string, path_prefix string",
    )
    ranks = spark.createDataFrame(
        [("ex.com", 1000)], "host string, host_rank long"
    )
    rows = {
        r.canonical_url: r
        for r in frontier_priorities(u, rules, ranks).collect()
    }
    assert len(rows) == 3  # 4 urls → 3 canonical pages
    page = rows["https://ex.com/a/x"]
    assert page.n_variants == 2 and page.allowed
    assert page.priority == 500  # 1000 DIV 2
    blocked = rows["https://ex.com/blocked/x"]
    assert not blocked.allowed and blocked.priority == 0
    assert blocked.host_rank == 1000  # rank reported even when blocked
    norank = rows["https://norank.com/p"]
    assert norank.allowed and norank.host_rank == 0 and norank.priority == 0


def test_frontier_without_ranks(spark):
    from jochre3_ocr_spark.operators.urls import frontier_priorities

    u = spark.createDataFrame(
        [("1", "https://ex.com/p")], "doc_id string, url string"
    )
    rules = spark.createDataFrame(
        [], "host string, rule_type string, path_prefix string"
    )
    [row] = frontier_priorities(u, rules).collect()
    assert row.allowed and row.host_rank == 0 and row.priority == 0


def test_robots_empty_prefix_never_matches(spark):
    """RFC 9309: a real robots.txt `Disallow:` with an EMPTY value means
    no restriction — an empty prefix must not block everything."""
    out = _verdicts(
        spark,
        [("1", "https://ex.com/a/x")],
        [("ex.com", "disallow", "")],
    )
    assert out["1"].allowed and out["1"].matched_type is None


def test_snapshot_delta_all_verdicts(spark):
    from jochre3_ocr_spark.operators.urls import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (5, "fresh"), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.verdict for r in snapshot_delta(old, new).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        5: "added",
        # NULL text fingerprints like empty (the NULL-text rule), so a
        # NULL -> '' recrawl is NOT a change
        4: "unchanged",
    }


def test_snapshot_delta_partitioning_invariance(spark):
    from jochre3_ocr_spark.operators.urls import snapshot_delta

    old = spark.createDataFrame(
        [(i, f"t{i % 5}") for i in range(60)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, f"t{i % 7}") for i in range(10, 70)], "doc_id long, text string"
    )
    a = sorted(tuple(r) for r in snapshot_delta(old, new).collect())
    b = sorted(
        tuple(r)
        for r in snapshot_delta(
            old.repartition(7, "doc_id"), new.repartition(3)
        ).collect()
    )
    assert a == b


def test_frontier_budget_caps_per_host(spark):
    from jochre3_ocr_spark.operators.urls import frontier_budget

    rows = [
        ("https://a.com/p1", "a.com", 1, 100, True, 100),
        ("https://a.com/p2", "a.com", 1, 100, True, 90),
        ("https://a.com/p3", "a.com", 1, 100, True, 80),
        ("https://a.com/blocked", "a.com", 1, 100, False, 0),
        ("https://b.com/p1", "b.com", 1, 50, True, 50),
    ]
    f = spark.createDataFrame(
        rows,
        "canonical_url string, host string, n_variants long, "
        "host_rank long, allowed boolean, priority long",
    )
    out = frontier_budget(f, per_host=2).collect()
    got = {(r.host, r.canonical_url, r.host_rank_pos) for r in out}
    assert got == {
        ("a.com", "https://a.com/p1", 1),
        ("a.com", "https://a.com/p2", 2),  # p3 over budget, blocked out
        ("b.com", "https://b.com/p1", 1),
    }
