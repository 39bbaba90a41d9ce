"""The vision-path OCR flow: layout boxes → segmented page → span tree →
glyph classification → guess → ALTO transform → text.

Mirrors Jochre.processMatInternal (core/Jochre.scala:303-420) with the
sandbox's deterministic stand-ins: the layout oracle replaces the YOLO
DLA server and a max-overlap ground-truth lookup replaces the glyph CNN
(the reference's model files are 132-byte stubs — FIXTURES.md). The
Spark-side wrapper processes one document (many pages) per row inside
mapInPandas; pages are independent, so giant books can be page-salted
exactly like the spans path.
"""

from __future__ import annotations

from jochre3_ocr_spark.functions import geometry as G
from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.operators.kernel import process_tree
from jochre3_ocr_spark.operators.segmentation import PageLayout, segment_page
from jochre3_ocr_spark.operators.spantree import (
    ComposedBlock,
    Document,
    Glyph,
    Media,
    Rect,
    Space,
    TextBlock,
    TextLine,
    Word,
)
from jochre3_ocr_spark.schema import PipelineConfig


def make_overlap_classifier(glyph_lookup: dict):
    """Glyph-classifier stub: classify a glyph crop by the max-overlap
    ground-truth glyph (GlyphGuesser.scala:51-79 analog; a real deployment
    swaps in an ONNX batch forward over 28×28 crops)."""
    boxes = list(glyph_lookup.items())

    def classify(box) -> str:
        best, best_area = "", 0.0
        for gb, ch in boxes:
            a = G.area_of_intersection(box, gb)
            if a > best_area:
                best, best_area = ch, a
        return best

    return classify


def _to_rect(box) -> Rect:
    return Rect(*box)


def segmented_to_document(
    doc_id: str, pages: list[dict], classify_glyph
) -> Document:
    """Convert segment_page outputs (one per page) into the span tree,
    assigning glyph contents via the classifier (word content stays empty
    for the guesser — FullYoloSegmenter returns empty contents,
    Jochre.scala:351-364)."""
    blocks: list = []

    def build_line(line: dict) -> TextLine:
        items: list = []
        for kind, payload in line["items"]:
            if kind == "space":
                items.append(Space(_to_rect(payload)))
            else:
                glyphs = [
                    Glyph(classify_glyph(gb), _to_rect(gb), 1.0)
                    for gb in payload["glyphs"]
                ]
                items.append(
                    Word(
                        content="".join(g.content for g in glyphs),
                        rect=_to_rect(payload["box"]),
                        glyphs=glyphs,
                    )
                )
        return TextLine(items=items)

    for page in pages:
        for block in page["blocks"]:
            if block["kind"] == "illustration":
                blocks.append(Media(media_ref=f"illustration://{block['box']}"))
            elif block["kind"] == "composed":
                blocks.append(
                    ComposedBlock(
                        blocks=[
                            TextBlock(lines=[build_line(l) for l in p["lines"]])
                            for p in block["paras"]
                        ]
                    )
                )
            else:
                blocks.append(
                    TextBlock(lines=[build_line(l) for l in block["lines"]])
                )
    return Document(doc_id=doc_id, blocks=blocks)


def ocr_document(
    doc_id: str,
    page_layouts: list[PageLayout],
    glyph_lookups: list[dict] | dict,
    lexicon: Lexicon,
    config: PipelineConfig | None = None,
    alto_converter=None,
) -> dict:
    """Full per-document OCR: segment each page, classify (per page —
    glyph crops are page-local coordinates), guess, transform.

    ``config.segmenter_type`` selects the segmentation strategy
    ("full" | "block-only" | "non" — operators/strategies.py);
    "block-only"/"non" pages skip glyph classification (no word-level
    segments exist) and, when ``alto_converter`` is given, run the
    BlockTextGuesser / UnsegmentedPageTextGuesser instead of the beam."""
    config = config or PipelineConfig()
    if isinstance(glyph_lookups, dict):
        glyph_lookups = [glyph_lookups] * len(page_layouts)

    if config.segmenter_type != "full":
        from jochre3_ocr_spark.operators import strategies as S

        blocks = []
        for layout in page_layouts:
            if config.segmenter_type == "block-only":
                page_doc = S.block_only_segment(
                    doc_id, layout.width, layout.height, layout.blocks,
                    left_to_right=config.left_to_right,
                )
            elif config.segmenter_type == "non":
                page_doc = S.non_segment(doc_id, layout.width, layout.height)
            else:
                raise ValueError(f"unknown segmenter {config.segmenter_type!r}")
            if alto_converter is not None:
                import numpy as np

                img = np.full((layout.height, layout.width), 255, np.uint8)
                if config.guesser_type == "block":
                    page_doc = S.block_text_guess(
                        page_doc, img, alto_converter, config.left_to_right
                    )
                elif config.guesser_type == "unsegmented-page":
                    page_doc = S.unsegmented_page_text_guess(
                        page_doc, img, alto_converter
                    )
            blocks.extend(page_doc.blocks)
        doc = Document(doc_id=doc_id, blocks=blocks)
        return process_tree(doc, lexicon, config)

    blocks = []
    for layout, lookup in zip(page_layouts, glyph_lookups):
        page = segment_page(layout, left_to_right=config.left_to_right)
        page_doc = segmented_to_document(
            doc_id, [page], make_overlap_classifier(lookup)
        )
        blocks.extend(page_doc.blocks)
    doc = Document(doc_id=doc_id, blocks=blocks)
    return process_tree(doc, lexicon, config)
