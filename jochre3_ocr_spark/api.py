"""Single-document API facade — the analogs of the reference's REST
endpoints (api/.../analysis/AnalysisApp.scala:249-303) as plain Python
callables, so a Jochre3 API user can switch without Spark knowledge:

| reference endpoint | here |
|---|---|
| POST /ocr/file (analyze)        | :func:`analyze_spans` / :func:`analyze_layout` |
| GET /word-in-lexicon            | :func:`word_in_lexicon` |
| GET /standardize-words          | :func:`standardize_words` |
| POST /dehyphenate               | :func:`dehyphenate_text` |

Output formats mirror OutputFormat (Alto4 / Text / ProcessedText —
core/output/OutputFormat.scala). Serving (HTTP, zips) stays out of
scope; batch/cluster execution is plans/pipeline.
"""

from __future__ import annotations

from jochre3_ocr_spark.functions.dehyphenate import dehyphenate
from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.operators.kernel import process_document
from jochre3_ocr_spark.operators.ocr import ocr_document
from jochre3_ocr_spark.operators.spantree import parse_spans
from jochre3_ocr_spark.schema import PipelineConfig
from jochre3_ocr_spark.sources.alto_xml import emit_alto

FORMATS = ("Alto4", "Text", "ProcessedText")


def analyze_spans(
    doc_id: str,
    spans,
    lexicon: Lexicon,
    formats: tuple[str, ...] = ("Alto4",),
    config: PipelineConfig | None = None,
) -> dict[str, str]:
    """Run the full pipeline on one document's span list and render the
    requested output formats (AnalysisLogic.postAnalyzeFileLogic analog)."""
    out = process_document(doc_id, spans, lexicon, config)
    rendered: dict[str, str] = {}
    for fmt in formats:
        if fmt == "Text":
            rendered[fmt] = out["text"]
        elif fmt == "ProcessedText":
            rendered[fmt] = out["processed_text"]
        elif fmt == "Alto4":
            cfg = config or PipelineConfig()
            doc = parse_spans(doc_id, out["spans"])
            rendered[fmt] = emit_alto(doc)
        else:
            raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    return rendered


def analyze_layout(
    doc_id: str,
    page_layouts,
    glyph_lookups,
    lexicon: Lexicon,
    formats: tuple[str, ...] = ("Alto4",),
    config: PipelineConfig | None = None,
) -> dict[str, str]:
    """Vision-path analyze: layout boxes → OCR → rendered formats."""
    out = ocr_document(doc_id, page_layouts, glyph_lookups, lexicon, config)
    rendered: dict[str, str] = {}
    for fmt in formats:
        if fmt == "Text":
            rendered[fmt] = out["text"]
        elif fmt == "ProcessedText":
            rendered[fmt] = out["processed_text"]
        elif fmt == "Alto4":
            doc = parse_spans(doc_id, out["spans"])
            rendered[fmt] = emit_alto(doc)
        else:
            raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    return rendered


def word_in_lexicon(word: str, lexicon: Lexicon) -> int:
    """GET /word-in-lexicon: 1 known / 0 unknown / −1 impossible
    (Lexicon.getFrequency semantics)."""
    return lexicon.get_frequency(word)


def standardize_words(words: list[str], lexicon: Lexicon) -> list[str]:
    """GET /standardize-words: YIVO standardization per word."""
    return [lexicon.to_yivo(w) for w in words]


def dehyphenate_text(text: str, lexicon: Lexicon) -> str:
    """POST /dehyphenate."""
    return dehyphenate(text, lexicon)
