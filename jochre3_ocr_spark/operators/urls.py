"""URL canonicalization and host-level corpus statistics — the web
pipeline's first dedup key.  Crawl corpora reach the engine keyed by
URL; the same page surfaces under scheme/case variants, default ports,
tracking parameters, fragments, and ``index.html`` suffixes, so
canonicalizing BEFORE content dedup removes the cheapest duplicate
class with zero text comparison (the RFC 3986 §6 normalization family
plus the standard tracking-param strip).

The reference engine has no URL analog (filesystem-fed OCR,
``Jochre.scala:186-211``); this sits upstream of ``dedup.exact_dedup``
in the web ingestion stack next to ``html_extract``.

100 TB posture: canonicalization is a pure narrow projection — regexp
extracts + array sort/filter over the query string, all
whole-stage-codegen column expressions, zero Python and zero shuffle;
host statistics are one map-side-combinable aggregation keyed by host
(domains are Zipfian, so at production scale the same skew treatment
as any hot-key agg applies — two-level partial agg absorbs it because
count/distinct-count partials combine).

Every step is expressible identically in DuckDB SQL (regexp_extract,
list_filter/list_sort), so the oracle twin replays the full chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "synthesize_urls",
    "canonicalize_urls",
    "host_stats",
    "synthesize_robots_rules",
    "robots_verdicts",
    "frontier_priorities",
    "bridge_node_ranks",
    "snapshot_delta",
    "frontier_budget",
]


def synthesize_urls(
    df: DataFrame, id_col: str = "doc_id", share_mod: int = 400
) -> DataFrame:
    """Deterministic messy crawl URL per document (test/bench input —
    production reads a real ``url`` column).  Page identity is
    ``doc_id % share_mod`` — documents sharing a page id get the SAME
    canonical page rendered through INDEPENDENT md5(doc_id)-driven
    surface variants (scheme/host case, explicit default port, doubled
    slashes, ``index.html`` suffix, utm param, param order, fragment),
    so canonicalization provably merges them while distinct pages stay
    distinct.  Both twins synthesize byte-identical urls."""
    pid = (F.col(id_col).cast("long") % share_mod).cast("string")
    h = F.md5(pid)  # page identity → host + stable param value
    v = F.md5(F.concat(F.lit("v:"), F.col(id_col).cast("string")))  # variants
    d = [F.substring(v, i + 1, 1) for i in range(7)]
    on = [x < F.lit("8") for x in d]  # each variant fires ~50%
    scheme = F.when(on[0], "HTTPS://").otherwise("https://")
    host_base = F.concat(F.lit("site-"), F.substring(h, 2, 2), F.lit(".example.com"))
    host = F.when(on[1], F.upper(host_base)).otherwise(host_base)
    port = F.when(on[2], ":443").otherwise("")
    path = F.concat(
        F.when(on[3], "/a//b/").otherwise("/a/b/"),
        pid,
        F.when(on[4], "/index.html").otherwise("/"),
    )
    pz = F.concat(F.lit("z="), F.substring(h, 5, 1))
    params = F.when(
        on[5], F.concat(pz, F.lit("&utm_source=feed&a=1"))
    ).otherwise(F.concat(F.lit("a=1&"), pz))
    frag = F.when(on[6], "#frag").otherwise("")
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(
            scheme, host, port, path, F.lit("?"), params, frag
        ).alias("url"),
    )


def _canonical(url: Column) -> tuple[Column, Column]:
    """(canonical_url, host) column pair for a raw ``url`` column.

    Steps (RFC 3986 §6.2.2-6.2.3 + tracking strip): lowercase scheme
    and host, drop the scheme's default port, collapse ``//`` runs in
    the path, strip a trailing ``index.html``, drop ``utm_*`` params,
    sort the surviving params, drop the fragment."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]*)", 1))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    norm_host = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    raw_path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(
        F.regexp_replace(
            F.when(raw_path == "", "/").otherwise(raw_path), r"/{2,}", "/"
        ),
        r"/index\.html$",
        "/",
    )
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"),
            lambda x: (x != "") & ~x.startswith("utm_"),
        )
    )
    query = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        norm_host,
        path,
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), query)),
    )
    return canonical, host


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` and ``host`` columns — one narrow
    codegen-only projection."""
    canonical, host = _canonical(F.col(url_col))
    return df.withColumn("canonical_url", canonical).withColumn("host", host)


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl statistics over canonicalized urls:
    (host, n_docs, n_canonical, n_url_dupes) where ``n_url_dupes`` =
    docs sharing an already-seen canonical url — the documents URL
    canonicalization alone would drop before any content dedup."""
    c = canonicalize_urls(df, url_col)
    return (
        c.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_url").alias("n_canonical"),
        )
        .select(
            "host",
            "n_docs",
            "n_canonical",
            (F.col("n_docs") - F.col("n_canonical")).alias("n_url_dupes"),
        )
    )


def synthesize_robots_rules(urls_df: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic per-host robots rules for the synthetic crawl
    (production parses real robots.txt).  Canonical synthetic paths are
    ``/a/b/<pid>/`` with decimal ``pid``, so the rules are keyed to the
    pid's first digit to produce a real verdict mix instead of
    all-match:

    * every host disallows one first-digit subtree ``/a/b/{1|2|3}``
      (digit steered by md5(host) — those digits cover ~28% of pages
      each under ``share_mod=400``'s first-digit distribution);
    * ~half the hosts add a one-char-deeper allow
      ``/a/b/<digit><hex>`` — the longest-match override case;
    * ~a quarter add an allow EQUAL to the disallow prefix — the
      exact-length tie, where RFC 9309 says allow wins.

    Returns (host, rule_type, path_prefix)."""
    hosts = canonicalize_urls(urls_df, url_col).select("host").distinct()
    h = F.md5(F.concat(F.lit("r:"), F.col("host")))
    c1, c2, c3, c4 = [F.substring(h, i, 1) for i in (1, 2, 3, 4)]
    digit = (
        F.when(c1 < F.lit("6"), F.lit("1"))
        .when(c1 < F.lit("b"), F.lit("2"))
        .otherwise(F.lit("3"))
    )
    dis = F.concat(F.lit("/a/b/"), digit)
    deep_allow = F.concat(dis, c3)
    rules = hosts.select(
        "host",
        F.concat(
            F.array(
                F.struct(
                    F.lit("disallow").alias("rule_type"),
                    dis.alias("path_prefix"),
                )
            ),
            F.when(
                c2 < F.lit("8"),
                F.array(
                    F.struct(
                        F.lit("allow").alias("rule_type"),
                        deep_allow.alias("path_prefix"),
                    )
                ),
            ).otherwise(F.array().cast(
                "array<struct<rule_type:string,path_prefix:string>>"
            )),
            F.when(
                c4 < F.lit("4"),
                F.array(
                    F.struct(
                        F.lit("allow").alias("rule_type"),
                        dis.alias("path_prefix"),
                    )
                ),
            ).otherwise(F.array().cast(
                "array<struct<rule_type:string,path_prefix:string>>"
            )),
        ).alias("rs"),
    )
    return rules.select("host", F.explode("rs").alias("r")).select(
        "host", "r.rule_type", "r.path_prefix"
    )


def _best_rule_match(c: DataFrame, rules_df: DataFrame, key: str) -> DataFrame:
    """All columns of ``c`` (one row per ``key``) plus
    (matched_type, matched_prefix) of the winning rule — NULL when no
    rule matches — under RFC 9309 §2.2.2 longest-match-wins (allow
    wins an exact length tie).  Zero-length prefixes never match: a
    real robots.txt ``Disallow:`` (empty value) means NO restriction,
    and a naive ``left(path, 0) = ''`` would invert it into
    block-everything.

    Plan: ZERO shuffle on the url side.  The rules table is bounded by
    the host space, so it collapses to one array row per host and
    broadcast-joins; the winner is picked per url row by a pure
    codegen array expression (filter hits → sort by the RFC ranking →
    take the head).  The earlier window formulations paid a
    corpus-scale Exchange whenever ``key`` was the row id — the
    CLAUDE.md per-row-math-in-a-shuffle-costume rule (and the
    first-cut join-back re-shuffled the page table a second time,
    +39% on the 10M-url soak)."""
    per_host = rules_df.where(F.length("path_prefix") > 0).groupBy(
        "host"
    ).agg(
        F.collect_list(
            F.struct(F.col("rule_type"), F.col("path_prefix"))
        ).alias("__rules")
    )
    hits = F.expr(
        "filter(__rules, r ->"
        " left(path, length(r.path_prefix)) = r.path_prefix)"
    )
    # RFC ranking: longest prefix first, allow before disallow on a
    # length tie, then prefix text for full determinism
    best = F.get(
        F.array_sort(
            hits,
            lambda a, b: F.when(
                F.length(a.path_prefix) != F.length(b.path_prefix),
                F.length(b.path_prefix) - F.length(a.path_prefix),
            )
            .when(a.rule_type < b.rule_type, F.lit(-1))
            .when(a.rule_type > b.rule_type, F.lit(1))
            .when(a.path_prefix < b.path_prefix, F.lit(-1))
            .when(a.path_prefix > b.path_prefix, F.lit(1))
            .otherwise(F.lit(0)),
        ),
        0,
    )
    return (
        c.join(F.broadcast(per_host), "host", "left")
        .withColumn("__best", best)
        .select(
            *[F.col(col) for col in c.columns],
            F.col("__best.rule_type").alias("matched_type"),
            F.col("__best.path_prefix").alias("matched_prefix"),
        )
    )


def robots_verdicts(
    urls_df: DataFrame, rules_df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Crawl-policy filter: apply per-host allow/disallow prefix rules
    to canonicalized urls with the standard longest-match-wins
    semantics (REP, RFC 9309 §2.2.2: most specific rule applies; on an
    exact length tie the allow rule wins).  No matching rule = allowed.

    Plan: see ``_best_rule_match`` — rule table broadcast, url side
    unshuffled.  Returns (doc_id, host, path, matched_type,
    matched_prefix, allowed)."""
    c = canonicalize_urls(urls_df, url_col).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "host",
        F.regexp_extract(
            "canonical_url", r"^[a-z]+://[^/?#]*([^?#]*)", 1
        ).alias("path"),
    )
    return _best_rule_match(c, rules_df, "doc_id").select(
        "doc_id",
        "host",
        "path",
        "matched_type",
        "matched_prefix",
        (
            F.col("matched_type").isNull()
            | (F.col("matched_type") == "allow")
        ).alias("allowed"),
    )


def bridge_node_ranks(ranks: DataFrame) -> DataFrame:
    """(host, host_rank) view of a link-graph rank table
    (``operators/graphs.pagerank`` output) over the SYNTHETIC host
    space: graph node ``hXY`` ↔ url host ``site-XY.example.com``
    share the 2-hex id.  One definition keeps the three Python
    call-sites (job, entry query, soak) in lockstep with the oracle
    SQL's mirrored join condition."""
    return ranks.select(
        F.concat(
            F.lit("site-"), F.substring("node", 2, 2), F.lit(".example.com")
        ).alias("host"),
        F.col("rank").alias("host_rank"),
    )


def frontier_priorities(
    urls_df: DataFrame,
    rules_df: DataFrame,
    host_ranks_df: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-frontier scheduling: one row per CANONICAL page with an
    all-integer priority — the composition a crawl scheduler runs over
    its discovered-url log before enqueueing fetches.

    Per canonical page: ``n_variants`` = how many raw urls collapsed
    onto it (already-seen pressure), ``host_rank`` = authority units
    looked up from a (host, host_rank) table (e.g. the link-graph
    PageRank, ``operators/graphs.py``; 0 when absent), ``allowed`` =
    the robots verdict on the canonical path, and
    ``priority = host_rank DIV n_variants`` for allowed pages, 0 for
    disallowed.  All integer arithmetic → bit-identical across engines
    and partitionings.

    Plan: ONE corpus-scale Exchange total — the canonical groupBy
    (keyed on canonical_url alone so the best-rule window reuses its
    partitioning and only adds a sort) — then two broadcast joins:
    rules (host-bounded, inside ``_best_rule_match``) and ranks
    (node-space-bounded)."""
    c = canonicalize_urls(urls_df, url_col)
    pages = c.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.max("host").alias("host"),  # constant per canonical url
    ).withColumn(
        "path",
        F.regexp_extract(
            "canonical_url", r"^[a-z]+://[^/?#]*([^?#]*)", 1
        ),
    )
    out = _best_rule_match(pages, rules_df, "canonical_url").withColumn(
        "allowed",
        F.col("matched_type").isNull() | (F.col("matched_type") == "allow"),
    )
    if host_ranks_df is not None:
        out = out.join(F.broadcast(host_ranks_df), "host", "left")
    else:
        out = out.withColumn("host_rank", F.lit(None).cast("long"))
    return out.select(
        "canonical_url",
        "host",
        "n_variants",
        F.coalesce("host_rank", F.lit(0)).alias("host_rank"),
        "allowed",
        F.when(
            F.col("allowed"),
            F.expr("coalesce(host_rank, 0) DIV n_variants"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("priority"),
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl delta: classify every document across two crawl
    snapshots as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by comparing content fingerprints — the incremental-crawl
    primitive that decides what re-enters the pipeline (pairs with
    ``dedup.incremental_dedup_verdicts`` and ``sources/upsert``: only
    the added+changed slice needs re-extraction and re-dedup).

    Returns (id_col, verdict, old_fp, new_fp).  Fingerprints are
    md5(text) with NULL text fingerprinting like empty (the NULL-text
    rule); the verdict depends only on row content, never on
    partitioning.

    100 TB shape: one full-outer equi-join on the id — both sides
    shuffle once on the same key, or ZERO times when the snapshots
    live in the bucketed table layout (``sources/upsert.py``), which
    is exactly how successive crawl snapshots should be stored."""
    fp = lambda c: F.md5(F.coalesce(F.col(c), F.lit("")))  # noqa: E731
    o = old.select(F.col(id_col), fp(text_col).alias("old_fp"))
    n = new.select(F.col(id_col), fp(text_col).alias("new_fp"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("verdict"),
        "old_fp",
        "new_fp",
    )


def frontier_budget(
    frontier_df: DataFrame, per_host: int = 4
) -> DataFrame:
    """Crawl-politeness budget: of the allowed canonical pages, keep
    the top ``per_host`` per host by priority — what a scheduler
    actually enqueues per fetch round (per-host caps are the polite
    crawl's core constraint).  Deterministic ranking:
    (priority DESC, canonical_url ASC).

    Plan: one window keyed by host over the ALLOWED subset — host
    counts are Zipfian but the window input is already the
    canonical-page table (not raw urls), and Spark's rank-limit
    pushdown (WindowGroupLimit) keeps only ``per_host`` rows per host
    per partition before the shuffle.  Returns the frontier columns
    plus ``host_rank_pos``."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("canonical_url")
    )
    return (
        frontier_df.where("allowed")
        .withColumn("host_rank_pos", F.row_number().over(w))
        .where(F.col("host_rank_pos") <= per_host)
    )
