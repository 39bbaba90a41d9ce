"""Handwritten messy-HTML golden fixtures (VERDICT r4 next-round
item 7): html_extract is proven against its own synthesizer's
closed-form inverse and unit cases; these pin parser leniency and
classifier behavior BEYOND the synthetic distribution — nested layout
tables, entity soup, unclosed tags, RTL content, ``<base>``/relative
``src``, comment/attribute tag soup. Reference for the heuristics:
the public Boilerpipe/Readability family (Kohlschütter et al., WSDM'10);
nothing like this exists in /root/reference (web extraction is new
surface, north_rule)."""

from jochre3_ocr_spark.operators.html_extract import (
    extract_spans,
    main_text,
    parse_html_blocks,
)


def _seq(spans):
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_nested_layout_table_with_link_sidebar():
    """A layout table wrapping a content table plus an all-links sidebar
    cell: content cells extracted in document order, the link-farm cell
    (link density 1.0) dropped, the short heading cell retained by the
    heading-before-content rule."""
    html = """
    <html><body>
    <table><tr><td>
      <table>
        <tr><td><h2>Quarterly results</h2></td></tr>
        <tr><td>Revenue grew twelve percent compared to the previous
                year across all regions.</td></tr>
        <tr><td>Margins stayed flat despite increased infrastructure
                spending during the period.</td></tr>
      </table>
    </td><td>
      <a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a>
    </td></tr></table>
    </body></html>
    """
    spans = extract_spans(html)
    assert [s["kind"] for s in spans] == ["heading", "text", "text"]
    assert spans[0]["text"] == "Quarterly results"
    assert spans[1]["text"].startswith("Revenue grew twelve percent")
    assert spans[2]["text"].startswith("Margins stayed flat")
    assert "Home" not in main_text(spans)
    # offsets are dense and ordered — the span contract
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_entity_soup_decodes_once_exactly():
    """Named, decimal, hex, double-escaped, and invalid entities: one
    decode pass (convert_charrefs) — ``&amp;amp;`` must surface as the
    literal text ``&amp;`` and a bare ``&`` must survive untouched."""
    html = (
        "<p>Fish &amp; chips &#8212; now &lt;half&gt; price "
        "&amp;amp; more &#x2764; at AT&T forever</p>"
    )
    blocks = parse_html_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].text == (
        "Fish & chips — now <half> price &amp; more ❤ "
        "at AT&T forever"
    )
    spans = extract_spans(html)
    assert len(spans) == 1 and spans[0]["kind"] == "text"


def test_unclosed_tags_still_segment_blocks():
    """Unclosed <p>/<li> (legal HTML, endemic in the wild): the NEXT
    block start must flush the previous block — four blocks, all long
    enough to be kept, none merged or lost."""
    html = """
    <div><p>First paragraph runs long enough to be content on its own
    merits even unclosed
    <p>Second paragraph is also long enough to be kept without its
    closing tag ever appearing
    <ul><li>item one of the list which is long enough to survive the
    length threshold
    <li>item two equally long enough to survive the threshold despite
    the missing close
    </body>
    """
    spans = extract_spans(html)
    assert [s["kind"] for s in spans] == ["text"] * 4
    assert spans[0]["text"].startswith("First paragraph")
    assert spans[1]["text"].startswith("Second paragraph")
    assert spans[2]["text"].startswith("item one")
    assert spans[3]["text"].startswith("item two")


def test_rtl_content_preserved_in_logical_order():
    """RTL (Yiddish) content: text comes out codepoint-for-codepoint in
    LOGICAL order — the parser must not reorder, strip combining marks
    (e.g. yud-yud-patah), or mangle non-ASCII; downstream BiDi handling
    belongs to the extraction kernel, not the HTML layer."""
    head = "אַ קעפּל אויף ייִדיש"
    para = (
        "דאָס איז אַ פּאַראַגראַף מיט גענוג טעקסט אין ייִדיש "
        "צו בלײַבן אינהאַלט נאָך די שוועל."
    )
    html = f'<html dir="rtl"><body><h1>{head}</h1><p>{para}</p></body></html>'
    spans = extract_spans(html)
    assert _seq(spans) == [("heading", head, ""), ("text", para, "")]


def test_base_and_relative_src_kept_verbatim():
    """``media_ref`` is the RAW src attribute — relative paths stay
    relative and ``<base>`` is NOT resolved (pinned contract: URL
    resolution is the fetch layer's job, the extractor must not alter
    the document's references). In-content media kept; trailing
    chrome-adjacent media dropped."""
    html = """
    <html><head><base href="https://example.org/news/"></head><body>
    <p>Intro paragraph long enough to be counted as real page content
    here today.</p>
    <img src="images/chart.png" alt="">
    <p>Closing paragraph long enough to be counted as real page content
    too indeed.</p>
    <img src="/favicon.ico">
    </body></html>
    """
    spans = extract_spans(html)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text"]
    assert spans[1]["media_ref"] == "images/chart.png"  # verbatim
    assert all(s["media_ref"] == "" for s in spans if s["kind"] != "media")


def test_comment_and_attribute_tag_soup():
    """Comments (including commented-out markup), unquoted/valueless
    attributes, and stray ``>`` characters: the parser must stay lenient
    and the commented-out block must NOT surface as content."""
    html = """
    <body>
    <!-- navigation starts
    <p>this commented-out paragraph must never appear in the output</p>
    -->
    <p class=lead data-x>Real content paragraph with an unquoted class
    attribute and enough length.</p>
    <p>A second real paragraph where 5 > 3 appears mid-sentence and the
    text keeps flowing fine.</p>
    </body>
    """
    spans = extract_spans(html)
    assert len(spans) == 2
    assert "commented-out" not in main_text(spans)
    assert spans[0]["text"].startswith("Real content paragraph")
    assert "5 > 3" in spans[1]["text"]


def test_deep_chrome_nesting_and_reentry():
    """Chrome ancestry must survive nesting and re-entry: content after
    a nav-inside-header still counts as chrome while inside, and
    extraction resumes cleanly after BOTH close."""
    html = """
    <body>
    <header><div>Site slogan line that is quite long but still chrome
    here.</div><nav><a href="/">Home</a></nav>
    <div>Still inside the header so still chrome even though long
    enough.</div></header>
    <p>The actual article body finally begins after the chrome ends and
    is kept.</p>
    </body>
    """
    spans = extract_spans(html)
    assert len(spans) == 1
    assert spans[0]["text"].startswith("The actual article body")
