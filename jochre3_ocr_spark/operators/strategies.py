"""Alternate segmenter / text-guesser strategies — the reference's
pluggable pipeline modes beyond the Full path:

* BlockOnlySegmenter (core/segmentation/BlockOnlySegmenter.scala:25-71):
  page with sorted top-level blocks only (text blocks empty,
  illustrations kept).
* NonSegmenter (core/segmentation/NonSegmenter.scala:22-43): empty page.
* BlockTextGuesser (core/text/BlockTextGuesser.scala:27-100): per
  pre-segmented block, crop the image, send to an ImageToAltoConverter
  (the legacy Jochre2 analyzer — here a pluggable callable), parse the
  returned ALTO, translate into page coordinates, re-sort.
* UnsegmentedPageTextGuesser (core/text/UnsegmentedPageTextGuesser
  .scala:25-49): whole page through the converter; analysis errors that
  are flagged ignorable return the original page unchanged.

The converter contract (core/alto/ImageToAltoConverter.scala): a
callable ``(ndarray) -> alto_xml_str`` that may raise
``AnalysisExceptionToIgnore``. Tests inject a deterministic fake;
production wires an HTTP client to the Jochre2 service.

Spark shape: each strategy is a per-document pure function, so the
distributed form is identical to the Full path — a mapInPandas kernel
over doc rows (plans/pipeline.py); no extra shuffle.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from jochre3_ocr_spark.functions.reading_order import sort_blocks
from jochre3_ocr_spark.operators.spantree import (
    Document,
    Media,
    Rect,
    TextBlock,
    translate_doc,
)

AltoConverter = Callable[[np.ndarray], str]


class AnalysisExceptionToIgnore(Exception):
    """core/text/package.scala AnalysisExceptionToIgnore: the converter
    failed in a way that should degrade, not abort."""


def _block_rect(b) -> Rect:
    return b.rect if b.rect is not None else Rect(0, 0, 1, 1)


def block_only_segment(
    doc_id: str,
    width: int,
    height: int,
    block_predictions,
    left_to_right: bool = False,
) -> Document:
    """BlockOnlySegmenter.segment: sort the DLA's top-level predictions
    (BlockSorter), then map label → empty TextBlock | Illustration
    (BlockOnlySegmenter.scala:40-70). Page confidence 1.0."""
    ordered = sort_blocks(
        list(block_predictions), left_to_right, box_of=lambda p: p.box
    )
    blocks: list = []
    for i, p in enumerate(ordered):
        rect = Rect(*p.box)
        if p.label == "illustration":
            blocks.append(Media(media_ref=f"ILL_{i + 1:05d}", rect=rect))
        else:
            blocks.append(TextBlock(lines=[], rect=rect))
    return Document(doc_id=doc_id, blocks=blocks, confidence=1.0)


def non_segment(doc_id: str, width: int, height: int) -> Document:
    """NonSegmenter.segment: an empty page (NonSegmenter.scala:22-43)."""
    return Document(doc_id=doc_id, blocks=[], confidence=1.0)


def _crop(img: np.ndarray, rect: Rect) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, rect.top)
    left = max(0, rect.left)
    bottom = min(h, rect.bottom)
    right = min(w, rect.right)
    return img[top:bottom, left:right]


def image_segments(img: np.ndarray, blocks: list):
    """ImageSegmentExtractor (core/text/ImageSegmentExtractor.scala:
    24-71): white out every illustration rectangle on a copy of the
    page, then cut one clamped sub-image per text container. Returns
    [("text", rect, sub_image) | ("illustration", rect)] in block
    order."""
    medias = [b for b in blocks if isinstance(b, Media) and b.rect is not None]
    # copy only when something must be whited out — the common
    # no-illustration page crops straight from the original
    cleaned = img.copy() if medias else img
    for b in medias:
        h, w = cleaned.shape[:2]
        r = b.rect
        cleaned[
            max(0, r.top) : min(h, r.bottom),
            max(0, r.left) : min(w, r.right),
        ] = 255
    out = []
    for b in blocks:
        if isinstance(b, Media):
            if b.rect is not None:
                out.append(("illustration", b.rect))
            continue
        rect = _block_rect(b)
        out.append(("text", rect, _crop(cleaned, rect)))
    return out


def block_text_guess(
    doc: Document,
    img: np.ndarray,
    converter: AltoConverter,
    left_to_right: bool = False,
) -> Document:
    """BlockTextGuesser.guess: ImageSegmentExtractor segments (text
    crops with illustrations whited out) → converter → parse ALTO →
    translate by (left, top); illustration segments pass through as
    Media; ignored analysis errors contribute no blocks; BlockSorter
    re-sort (BlockTextGuesser.scala:40-100)."""
    from jochre3_ocr_spark.sources.alto_xml import parse_alto

    out_blocks: list = []
    text_segs = iter(
        s for s in image_segments(img, doc.blocks) if s[0] == "text"
    )
    for block in doc.blocks:
        if isinstance(block, Media):
            # IllustrationSegment passes through (:77-78); the original
            # Media keeps its media_ref
            out_blocks.append(block)
            continue
        _, rect, sub_img = next(text_segs)
        try:
            alto_xml = converter(sub_img)
        except AnalysisExceptionToIgnore:
            continue
        sub = parse_alto(alto_xml, doc_id=doc.doc_id)
        translate_doc(sub, rect.left, rect.top)
        out_blocks.extend(sub.blocks)
    ordered = sort_blocks(
        out_blocks, left_to_right, box_of=lambda b: _as_box(_block_rect(b))
    )
    return Document(
        doc_id=doc.doc_id,
        blocks=ordered,
        language=doc.language,
        confidence=doc.confidence,
    )


def unsegmented_page_text_guess(
    doc: Document, img: np.ndarray, converter: AltoConverter
) -> Document:
    """UnsegmentedPageTextGuesser.guess: the whole page through the
    converter; an ignorable analysis error returns the input page
    (UnsegmentedPageTextGuesser.scala:36-49)."""
    from jochre3_ocr_spark.sources.alto_xml import parse_alto

    try:
        alto_xml = converter(img)
    except AnalysisExceptionToIgnore:
        return doc
    return parse_alto(alto_xml, doc_id=doc.doc_id)


def _as_box(rect: Rect):
    return (rect.left, rect.top, rect.width, rect.height)


# ------------------------------------------------------------ registries
# (the reference's SegmenterService / TextGuesserService ZLayers —
# reference.conf selects by name; PipelineConfig.segmenter_type /
# guesser_type select here)
SEGMENTERS = {
    "full": "jochre3_ocr_spark.operators.segmentation.segment_page",
    "block-only": block_only_segment,
    "non": non_segment,
}

GUESSERS = {
    "full-segmentation": "jochre3_ocr_spark.operators.guesser.guess_document",
    "block": block_text_guess,
    "unsegmented-page": unsegmented_page_text_guess,
}
