"""HTML main-content extraction (operators/html_extract): boilerplate
strip + DOM heuristics + the interleaved span contract."""

import math

import pytest

from jochre3_ocr_spark.operators.html_extract import (
    classify_blocks,
    extract_spans,
    html_extract,
    main_text,
    parse_html_blocks,
    synthesize_html,
    synthesize_html_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- parser
def test_script_style_never_content():
    h = ("<html><body><p>real words here forming a paragraph of text</p>"
         "<script>var x = 'alert about nothing at all';</script>"
         "<style>.c { color: red }</style></body></html>")
    blocks = parse_html_blocks(h)
    texts = [b.text for b in blocks if b.text]
    assert texts == ["real words here forming a paragraph of text"]


def test_chrome_ancestry_marks_blocks():
    h = ("<body><nav>Home About Contact some navigation words</nav>"
         "<p>the actual article body with plenty of words in it</p>"
         "<footer>copyright words in the footer area</footer></body>")
    blocks = parse_html_blocks(h)
    by_text = {b.text: b.in_chrome for b in blocks if b.text}
    assert by_text["Home About Contact some navigation words"] is True
    assert by_text["the actual article body with plenty of words in it"] is False
    assert by_text["copyright words in the footer area"] is True


def test_link_density_computed():
    h = ("<body><p>Related: <a href='/a'>first story link</a> "
         "<a href='/b'>second story link</a></p></body>")
    (b,) = [x for x in parse_html_blocks(h) if x.text]
    assert b.link_density > 0.33


def test_malformed_html_is_lenient():
    h = "<body><p>unclosed paragraph words <div>nested <b>bold run"
    blocks = parse_html_blocks(h)
    assert [b.text for b in blocks if b.text] == [
        "unclosed paragraph words",
        "nested bold run",
    ]


def test_img_emits_media_block_with_src():
    h = "<body><p>words before</p><img src='pic:1'><p>words after</p></body>"
    blocks = parse_html_blocks(h)
    media = [b for b in blocks if b.is_media]
    assert len(media) == 1 and media[0].media_ref == "pic:1"


# ------------------------------------------------------- classification
def test_classify_keeps_long_linksparse_drops_chrome_and_linkfarm():
    h = ("<body><nav><a href='/'>Home</a> <a href='/x'>About the site</a></nav>"
         "<p>this is a long enough paragraph of genuine article content"
         " to pass the threshold</p>"
         "<p>Related: <a href='/a'>first related story</a> "
         "<a href='/b'>second related story</a></p></body>")
    blocks = parse_html_blocks(h)
    keep = classify_blocks(blocks)
    kept = [b.text for b, k in zip(blocks, keep) if k]
    assert kept == [
        "this is a long enough paragraph of genuine article content"
        " to pass the threshold"
    ]


def test_gap_smoothing_fuses_short_interior_blocks():
    long1 = "a sufficiently long opening paragraph of real content words"
    long2 = "another sufficiently long closing paragraph of real content"
    h = f"<body><p>{long1}</p><p>short aside</p><p>{long2}</p></body>"
    blocks = parse_html_blocks(h)
    keep = classify_blocks(blocks)
    assert [b.text for b, k in zip(blocks, keep) if k] == [
        long1, "short aside", long2,
    ]


def test_heading_before_content_survives():
    body = "the body paragraph with enough words to be strong content"
    h = f"<body><h2>Title Words</h2><p>{body}</p></body>"
    blocks = parse_html_blocks(h)
    keep = classify_blocks(blocks)
    assert [b.text for b, k in zip(blocks, keep) if k] == [
        "Title Words", body,
    ]


def test_media_inside_content_run_kept_outside_dropped():
    long1 = "a sufficiently long opening paragraph of real content words"
    long2 = "another sufficiently long closing paragraph of real content"
    h = (f"<body><img src='banner:0'><p>{long1}</p><img src='fig:1'>"
         f"<p>{long2}</p></body><footer><img src='logo:2'></footer>")
    blocks = parse_html_blocks(h)
    keep = classify_blocks(blocks)
    media = [b.media_ref for b, k in zip(blocks, keep) if k and b.is_media]
    assert media == ["fig:1"]


# ------------------------------------------- synthesized-page round-trip
def test_synthesized_page_roundtrip_closed_form():
    """The driver-oracle contract: extraction over a synthesized page
    recovers title + exact token stream + media refs at closed-form
    offsets, and drops exactly the 5 chrome/link-farm blocks."""
    text = " ".join(f"w{i}" for i in range(40))
    spans = extract_spans(synthesize_html("7", text, "src0"),
                          min_content_chars=1)
    ntok, ppara, ievery = 40, 12, 3
    nparas = math.ceil(ntok / ppara)
    nmedia = (nparas - 1) // ievery
    assert len(spans) == 1 + nparas + nmedia
    assert spans[0] == {"kind": "heading", "text": "Doc 7",
                        "media_ref": "", "offset": 0}
    assert main_text(spans) == "Doc 7 " + text
    for k in range(1, nmedia + 1):
        assert spans[4 * k] == {"kind": "media", "text": "",
                                "media_ref": f"7:m{k}", "offset": 4 * k}
    blocks = parse_html_blocks(synthesize_html("7", text, "src0"))
    keep = classify_blocks(blocks, min_content_chars=1)
    dropped_text = [b for b, k in zip(blocks, keep)
                    if not k and b.text and not b.is_media]
    assert len(dropped_text) == 5  # h1/nav/aside/related/footer


def test_synthesized_empty_doc_title_only():
    spans = extract_spans(synthesize_html("9", "", "s"), min_content_chars=1)
    assert spans == [{"kind": "heading", "text": "Doc 9",
                      "media_ref": "", "offset": 0}]


# --------------------------------------------------------------- spark
def test_html_extract_spark_matches_oracle_shape(spark):
    import __spark_entry__ as E

    sdf = E.queries()["html_main_content"](spark, SF_DIR)
    got = sorted(tuple(r) for r in sdf.collect())
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    cur = con.execute(E.oracle_sql()["html_main_content"])
    cols = [d[0] for d in cur.description]
    idx = [cols.index(c) for c in sdf.columns]
    want = sorted(tuple(r[i] for i in idx) for r in cur.fetchall())
    assert got == want


def test_html_extract_plan_is_single_narrow_stage(spark):
    """Extraction must stay one scan → mapInPandas chain. The ONLY
    Exchange allowed is the compact-input spread (an explicit
    round-robin REPARTITION_BY_NUM below both Python stages — the
    _spread_small_input no-op at production split counts); no
    hash/range shuffle may ever appear (the same plan contract as the
    OCR extraction kernel)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = html_extract(synthesize_html_corpus(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1
    if n_exchange:
        assert "RoundRobinPartitioning" in plan
        assert "hashpartitioning" not in plan
    assert plan.count("MapInPandas") == 2  # synthesize + extract


def test_html_extract_quarantines_bad_rows(spark):
    df = spark.createDataFrame(
        [("1", "<body><p>fine long paragraph of words here okay</p></body>"),
         ("2", None)],
        "doc_id string, html string",
    )
    rows = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert rows["1"]["status"] == "ok"
    # None html coalesces to empty parse, not an error row
    assert rows["2"]["status"] == "ok" and rows["2"]["n_spans"] == 0


def test_markup_tokens_roundtrip_via_escaping():
    """Tokens containing <, >, & must survive synthesis → parse: the
    builder escapes, convert_charrefs unescapes, the raw token stream
    comes back exactly (the oracle compares against raw text)."""
    text = "x<y a&b p>q plain &amp; <script> turns into text tokens"
    spans = extract_spans(synthesize_html("5", text, "s"),
                          min_content_chars=1)
    assert main_text(spans) == "Doc 5 " + "x<y a&b p>q plain &amp; <script> turns into text tokens"


def test_synthesize_corpus_without_source_column(spark):
    """The documented corpus shape is (doc_id, text[, lang, source]) —
    a table without source must synthesize with the default site name,
    not die with KeyError."""
    df = spark.createDataFrame(
        [("1", "ten words of text in this tiny document body here")],
        "doc_id string, text string",
    )
    out = html_extract(synthesize_html_corpus(df), min_content_chars=1)
    (row,) = out.collect()
    assert row["status"] == "ok"
    assert "ten words of text" in row["main_text"]


def test_html_spans_bridge_vocabulary(spark):
    """The bridge converts extracted HTML spans into the engine's span
    vocabulary: each content span = block + line + word/space
    alternation, media passes through, offsets renumber 0..n-1."""
    from jochre3_ocr_spark.operators.html_extract import (
        html_spans_to_doc_spans,
    )

    df = spark.createDataFrame(
        [(
            "d1",
            [
                ("heading", "My Title", "", 0),
                ("text", "one two", "", 1),
                ("media", "", "d1:m1", 2),
                ("text", "three", "", 3),
            ],
        )],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    (row,) = html_spans_to_doc_spans(df).collect()
    got = [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans]
    assert got == [
        ("block", None, None, 0), ("line", None, None, 1),
        ("word", "My", None, 2), ("space", " ", None, 3),
        ("word", "Title", None, 4),
        ("block", None, None, 5), ("line", None, None, 6),
        ("word", "one", None, 7), ("space", " ", None, 8),
        ("word", "two", None, 9),
        ("media", None, "d1:m1", 10),
        ("block", None, None, 11), ("line", None, None, 12),
        ("word", "three", None, 13),
    ]


def test_html_extraction_e2e_runs_real_kernel(spark):
    """Web page → extraction engine: the driver query's output must show
    the REAL rule chain ran (the BiDi number-reversal rule reverses the
    title's digit run) and recover every body token."""
    import __spark_entry__ as E

    out = E.queries()["html_extraction_e2e"](spark, SF_DIR)
    rows = {r.doc_id: r for r in out.collect()}
    r10 = rows["10"]
    assert r10.processed_text.startswith("Doc 01\n")  # 10 reversed
    assert r10.status == "ok"


def test_bridge_excludes_quarantine_rows(spark):
    """Error rows from html_extract must NOT flow through the bridge as
    successfully-extracted empty documents — the error signal routes
    from the extractor's own output."""
    from jochre3_ocr_spark.operators.html_extract import (
        html_spans_to_doc_spans,
    )

    df = spark.createDataFrame(
        [("ok1", [("text", "fine words", "", 0)], "ok"),
         ("bad1", [], "error")],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, status string",
    )
    out = html_spans_to_doc_spans(df).collect()
    assert [r.doc_id for r in out] == ["ok1"]
