"""HTML main-content extraction: boilerplate strip + DOM heuristics —
the web-document half of the extraction pipeline (the north rule's
"HTML boilerplate strip, PDF/layout parse, DOM heuristics"; the PDF /
OCR-layout half lives in sources/pdf.py + plans/pipeline.py).

Algorithm (public lineage: the Readability / Boilerpipe / CETD family —
Kohlschütter et al., WSDM'10 "Boilerplate Detection using Shallow Text
Features"; Arc90 readability.js):

1. **Parse** with a lenient stdlib ``html.parser`` subclass — no
   external libs, survives unclosed tags and attribute soup.
2. **Hard strip**: ``script/style/noscript/template/iframe/svg`` —
   their text is never content — plus comments and doctype.
3. **Block segmentation**: text accumulates into blocks at block-level
   tag boundaries (p, h1-6, li, td, blockquote, pre, div, …); each
   block records its tag path, total text length, text length inside
   <a> (link chars), and document order. <img> emits a media block
   carrying its ``src``.
4. **Shallow-feature scoring** per block: ``link_density`` =
   link_chars / text_chars; a block is CONTENT when it is long enough
   and link-sparse, or a heading adjacent to content (gap smoothing:
   short blocks BETWEEN two content blocks survive — the
   Boilerpipe fusion rule). Blocks under nav/header/footer/aside/form
   ancestors are boilerplate regardless of length (DOM heuristic).
5. **Emit** the interleaved span sequence ``(kind, text, media_ref,
   offset)`` — exactly the corpus span shape — plus a stripped
   ``main_text``.

Spark shape: ONE ``mapInPandas`` over the docs table (narrow, zero
shuffle — the same plan as the OCR extraction kernel); per-row parse
failures quarantine the row, never the job.

Determinism: pure function of the HTML bytes; the synthetic-page
builder (:func:`synthesize_html`) is the closed-form inverse used by
the driver oracle — extraction over synthesized pages must recover the
original token stream and media refs exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

#: subtrees whose text is NEVER content (hard strip at parse time)
_STRIP_TAGS = frozenset(
    "script style noscript template iframe svg canvas object embed".split()
)
#: DOM-heuristic boilerplate ancestors: anything under these is chrome
_CHROME_TAGS = frozenset("nav header footer aside form menu".split())
#: tags that close the current text block
_BLOCK_TAGS = frozenset(
    "p div section article main h1 h2 h3 h4 h5 h6 li td th blockquote "
    "pre ul ol table tr body title figure figcaption".split()
)
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6 title".split())

#: content-selection thresholds (Kohlschütter-style shallow features)
MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.33


@dataclass
class TextBlock:
    """One segmented DOM block with the shallow features scoring needs."""

    order: int
    tag: str
    text: str = ""
    link_chars: int = 0
    in_chrome: bool = False
    is_media: bool = False
    media_ref: str = ""

    @property
    def link_density(self) -> float:
        n = len(self.text)
        return (self.link_chars / n) if n else 1.0


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[TextBlock] = []
        self._stack: list[str] = []
        self._strip_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0
        self._cur: list[str] = []
        self._cur_links = 0
        self._cur_tag = "body"

    # -- block management ---------------------------------------------
    def _flush(self) -> None:
        text = " ".join("".join(self._cur).split())
        if text:
            self.blocks.append(
                TextBlock(
                    order=len(self.blocks),
                    tag=self._cur_tag,
                    text=text,
                    link_chars=min(self._cur_links, len(text)),
                    in_chrome=self._chrome_depth > 0,
                )
            )
        self._cur = []
        self._cur_links = 0

    # -- parser events ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _STRIP_TAGS:
            self._strip_depth += 1
            return
        if self._strip_depth:
            return
        if tag == "img":
            self._flush()
            src = dict(attrs).get("src") or ""
            self.blocks.append(
                TextBlock(
                    order=len(self.blocks),
                    tag="img",
                    in_chrome=self._chrome_depth > 0,
                    is_media=True,
                    media_ref=src,
                )
            )
            return
        if tag == "br":
            self._cur.append(" ")
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag
        if tag in _CHROME_TAGS:
            # flush at the chrome boundary so text never inherits the
            # wrong ancestry (e.g. pre-<nav> text flushed inside it)
            self._flush()
            self._chrome_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._stack.append(tag)

    def handle_endtag(self, tag):
        if tag in _STRIP_TAGS:
            self._strip_depth = max(0, self._strip_depth - 1)
            return
        if self._strip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur_tag = "body"
        if tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth = max(0, self._chrome_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        # tolerate mismatched closes (lenient like the ALTO parser)
        if tag in self._stack:
            while self._stack and self._stack.pop() != tag:
                pass

    def handle_data(self, data):
        if self._strip_depth or not data:
            return
        self._cur.append(data)
        if self._link_depth:
            self._cur_links += len(" ".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def parse_html_blocks(html: str) -> list[TextBlock]:
    """Lenient DOM parse → ordered text/media blocks with shallow
    features (step 1-3 of the module algorithm)."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def classify_blocks(
    blocks: list[TextBlock],
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> list[bool]:
    """Content/boilerplate verdict per block (steps 4): chrome ancestry
    kills; long + link-sparse keeps; headings and short blocks survive
    only adjacent to / between kept blocks (gap smoothing)."""
    n = len(blocks)
    strong = [False] * n
    for i, b in enumerate(blocks):
        if b.in_chrome or b.is_media:
            continue
        if len(b.text) >= min_content_chars and b.link_density <= max_link_density:
            strong[i] = True
    keep = list(strong)
    # gap smoothing: a weak, link-sparse block BETWEEN two strong blocks
    # (headings, short paragraphs) is fused into the content run
    prev_strong = -1
    for i in range(n):
        if strong[i]:
            if prev_strong >= 0:
                for j in range(prev_strong + 1, i):
                    b = blocks[j]
                    if (
                        not b.in_chrome
                        and not b.is_media
                        and b.link_density <= max_link_density
                    ):
                        keep[j] = True
            prev_strong = i
    # headings immediately before content lead the run
    for i in range(n - 1):
        b = blocks[i]
        if (
            not keep[i]
            and b.tag in _HEADING_TAGS
            and not b.in_chrome
            and keep[i + 1]
        ):
            keep[i] = True
    # media: an image inside the content run (between kept blocks,
    # not chrome) is part of the interleaved payload
    prev_kept = -1
    for i in range(n):
        if keep[i]:
            if prev_kept >= 0:
                for j in range(prev_kept + 1, i):
                    if blocks[j].is_media and not blocks[j].in_chrome:
                        keep[j] = True
            prev_kept = i
    return keep


def extract_spans(
    html: str,
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> list[dict]:
    """Full per-document extraction: parse → classify → the interleaved
    span sequence [(kind, text, media_ref, offset)] with kind ∈
    {'heading', 'text', 'media'} — the corpus span shape."""
    blocks = parse_html_blocks(html)
    keep = classify_blocks(blocks, min_content_chars, max_link_density)
    spans: list[dict] = []
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if b.is_media:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": b.media_ref,
                    "offset": len(spans),
                }
            )
        else:
            spans.append(
                {
                    "kind": "heading" if b.tag in _HEADING_TAGS else "text",
                    "text": b.text,
                    "media_ref": "",
                    "offset": len(spans),
                }
            )
    return spans


def main_text(spans: list[dict]) -> str:
    return " ".join(s["text"] for s in spans if s["kind"] != "media")


# ------------------------------------------------------------ spark ops
SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, main_text string, n_spans int, "
    "n_media int, n_boilerplate int, status string, error string"
)


def html_extract(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_content_chars: int = MIN_CONTENT_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
):
    """Spark main-content extraction: one narrow ``mapInPandas`` over a
    (doc_id, html) table → (doc_id, spans, main_text, counts). Per-row
    parse failures produce status='error' rows (quarantine, reference
    degradation semantics); n_boilerplate counts the DROPPED text
    blocks so boilerplate volume is observable per document."""
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "spans", "main_text", "n_spans", "n_media",
                    "n_boilerplate", "status", "error",
                )
            }
            for doc_id, html in zip(b[id_col], b[html_col]):
                try:
                    blocks = parse_html_blocks(html or "")
                    keep = classify_blocks(
                        blocks, min_content_chars, max_link_density
                    )
                    spans = []
                    for blk, k in zip(blocks, keep):
                        if not k:
                            continue
                        if blk.is_media:
                            spans.append(
                                ("media", "", blk.media_ref, len(spans))
                            )
                        else:
                            kind = (
                                "heading"
                                if blk.tag in _HEADING_TAGS
                                else "text"
                            )
                            spans.append((kind, blk.text, "", len(spans)))
                    rows["doc_id"].append(doc_id)
                    rows["spans"].append(spans)
                    rows["main_text"].append(
                        " ".join(s[1] for s in spans if s[0] != "media")
                    )
                    rows["n_spans"].append(len(spans))
                    rows["n_media"].append(
                        sum(1 for s in spans if s[0] == "media")
                    )
                    rows["n_boilerplate"].append(
                        sum(
                            1
                            for blk, k in zip(blocks, keep)
                            if not k and not blk.is_media and blk.text
                        )
                    )
                    rows["status"].append("ok")
                    rows["error"].append(None)
                except Exception as exc:  # noqa: BLE001 — quarantine row
                    rows["doc_id"].append(doc_id)
                    rows["spans"].append([])
                    rows["main_text"].append("")
                    rows["n_spans"].append(0)
                    rows["n_media"].append(0)
                    rows["n_boilerplate"].append(0)
                    rows["status"].append("error")
                    rows["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=SPAN_SCHEMA)


def html_spans_to_doc_spans(df, spans_col: str = "spans",
                            id_col: str = "doc_id"):
    """Bridge the extracted HTML spans (heading/text/media) into the
    engine's document span vocabulary (block/line/word/space/media) —
    the exact input shape of the extraction pipeline
    (plans/pipeline.extract_text_df), so a web page flows through the
    SAME engine as an OCR page: each content span becomes a block with
    one line of word/space spans; media spans pass through.

    Pure JVM column expressions (transform/flatten over the span array,
    whole-stage codegen) — zero Python, zero shuffle.
    Returns (doc_id, spans) with offsets renumbered 0..n-1.

    Quarantine rows from :func:`html_extract` (status='error') are
    EXCLUDED — their empty span list would otherwise flow through the
    kernel as a successfully-extracted empty document, silently erasing
    the error signal; consumers route error rows from the extractor's
    own output.
    """
    from pyspark.sql import functions as F

    if "status" in df.columns:
        df = df.filter(F.col("status") == "ok")

    def _stru(kind, text, media_ref):
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            F.lit(0).alias("offset"),
        )

    null_s = F.lit(None).cast("string")

    def _content(s):
        # coalesce: html_extract never emits NULL text, but a NULL from
        # another producer would otherwise propagate through split/
        # transform/flatten and null out the ENTIRE document's span array
        words = F.filter(
            F.split(F.coalesce(s["text"], F.lit("")), " "), lambda x: x != ""
        )
        word_spans = F.flatten(
            F.transform(
                words,
                lambda w, i: F.when(
                    i == 0, F.array(_stru(F.lit("word"), w, null_s))
                ).otherwise(
                    F.array(
                        _stru(F.lit("space"), F.lit(" "), null_s),
                        _stru(F.lit("word"), w, null_s),
                    )
                ),
            )
        )
        return F.concat(
            F.array(
                _stru(F.lit("block"), null_s, null_s),
                _stru(F.lit("line"), null_s, null_s),
            ),
            word_spans,
        )

    per_span = F.transform(
        F.col(spans_col),
        lambda s: F.when(
            s["kind"] == "media",
            F.array(_stru(F.lit("media"), null_s, s["media_ref"])),
        ).otherwise(_content(s)),
    )
    renumbered = F.transform(
        F.flatten(per_span),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), renumbered.alias("spans")
    )


# -------------------------------------------- deterministic page builder
#: tokens per synthesized content paragraph
PARA_TOKENS = 12
#: one inline <img> before every Nth content paragraph (1-based)
IMG_EVERY = 3

_PAGE_TEMPLATE_HEAD = (
    "<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
    "<style>body {{ margin: 0 }}</style>"
    "<script>var t = 'tracking blob {doc_id}';</script></head><body>"
    "<header><h1>Site of {source}</h1>"
    "<nav><a href='/'>Home</a> <a href='/about'>About archive pages</a> "
    "<a href='/contact'>Contact the editors</a></nav></header>"
    "<aside><p>Subscribe to the newsletter for updates "
    "<a href='/sub'>subscribe now</a> <a href='/feed'>rss feed</a> "
    "<a href='/app'>get the app</a></p></aside>"
    "<main><article>"
)
_PAGE_TEMPLATE_TAIL = (
    "</article></main>"
    "<div><p>Related: <a href='/r1'>another story here</a> "
    "<a href='/r2'>second related story</a> "
    "<a href='/r3'>third related story link</a></p></div>"
    "<footer><p>Copyright the {source} archive. "
    "<a href='/terms'>Terms</a> <a href='/privacy'>Privacy</a></p>"
    "</footer></body></html>"
)


def synthesize_html(doc_id: str, text: str, source: str = "src") -> str:
    """Deterministic synthetic page: the doc's tokens in <p> paragraphs
    of :data:`PARA_TOKENS` inside <main><article>, one inline <img
    src='{doc_id}:m{k}'> before every :data:`IMG_EVERY`-th paragraph,
    wrapped in realistic chrome (header/nav/aside/footer/script/related
    links). Closed-form inverse: extraction recovers exactly the
    original token stream, paragraph count ceil(ntok/12), media count
    floor((nparas-1)/3) + title heading — the driver oracle recomputes
    all of it from the raw text column in SQL."""
    import html as _html

    toks = [t for t in (text or "").split(" ") if t]
    paras = [
        " ".join(toks[i : i + PARA_TOKENS])
        for i in range(0, len(toks), PARA_TOKENS)
    ]
    body = []
    for i, p in enumerate(paras):
        if i > 0 and i % IMG_EVERY == 0:
            body.append(
                f"<img src='{doc_id}:m{i // IMG_EVERY}' alt='figure'>"
            )
        # escape so tokens containing markup chars (<, &, >) round-trip:
        # the parser's convert_charrefs unescapes them back to the raw
        # token stream the closed-form oracle computes
        body.append(f"<p>{_html.escape(p)}</p>")
    return (
        _PAGE_TEMPLATE_HEAD.format(doc_id=doc_id, source=source)
        + "".join(body)
        + _PAGE_TEMPLATE_TAIL.format(source=source)
    )


def synthesize_html_corpus(df, id_col: str = "doc_id", text_col: str = "text",
                           source_col: str = "source"):
    """(doc_id, html) over the docs table — the no-external-data input
    for tests/benchmarks, built in the same narrow batch that consumes
    it downstream. ``source_col`` is optional (the documented corpus
    shape is (doc_id, text[, lang, source])): absent, pages use a
    constant site name."""
    import pandas as pd

    from jochre3_ocr_spark.plans.pipeline import _spread_small_input

    # per-ROW Python cost downstream (synthesize + the parse that
    # consumes this), but scan parallelism is per FILE SPLIT — a
    # compact docs table pins the whole chained Python stage to the
    # scan's 3-5 splits (measured 1.9 s for the sf0.1 parse on 32
    # slots). Spread once here; no-op at production split counts and
    # on streaming frames.
    df = _spread_small_input(df)
    has_source = source_col in df.columns

    def run(batches):
        for b in batches:
            sources = b[source_col] if has_source else ["src"] * len(b)
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype(str),
                    "html": [
                        synthesize_html(str(d), t or "", str(s))
                        for d, t, s in zip(b[id_col], b[text_col], sources)
                    ],
                }
            )

    return df.mapInPandas(run, schema="doc_id string, html string")
