"""Corpus annotators — training-data export from an annotated corpus.

Spark-native rebuild of the reference's corpus extractor CLIs
(core/corpus/GlyphExtractor.scala:33-106, WordExtractor.scala:32-86,
TextLineExtractor.scala:29-79, base iteration + rotation prelude in
CorpusAnnotator.scala:30-77 and RotationTransformer.scala:8-17).

The reference walks a directory of (image, ALTO) pairs sequentially and
writes crop images plus tab-separated label files. Here the corpus IS a
DataFrame — one row per annotated page ``(doc_id, image, alto_xml)`` —
and extraction is a single ``mapInPandas`` stage: decode → unrotate →
walk the span tree → emit one row per training unit. No driver loops,
no filesystem fan-out; the label files and image trees are sinks over
the returned DataFrame (``sources/sinks.py``), so the same job scales
from a laptop corpus to a bucketed Iceberg table of page scans.

Fidelity notes (all formulas literal from the reference):

* Rotation prelude — the page image is un-rotated by ``-rotation``
  (ImageUtils.scala:45-46) and every rectangle re-mapped through the
  ``ImageInfo`` corner rotation (graphics/ImageInfo.scala:11-15,
  Rectangle.scala:172-177) exactly as ``Page.unrotate``
  (model/Page.scala:117-119) does.
* Glyph crops get a 10 % margin, width square-padded up to height,
  clamped to the page (GlyphExtractor.scala:66-82); the label line is
  ``imageFileName\\tcontent\\tleft,top,width,height`` against the FULL
  page image (GlyphExtractor.scala:90-102) — the reference never writes
  per-glyph crop files. ``with_crops=True`` additionally materializes
  the crop bytes (this repo's extension; the glyph CNN consumes crops).
* Word crops are the exact combined-word rectangle, file name
  ``{base}_%04d`` (WordExtractor.scala:55-82); line crops use the
  baseline-derived rectangles of ``TextBlock.textLinesWithRectangles``
  (TextBlock.scala:22-45), file name ``{base}_%03d``
  (TextLineExtractor.scala:51-76).
* train/val split: unit ``i`` goes to val iff
  ``(i + 1) % validation_one_every == 0`` (GlyphExtractor.scala:59-66).
* The default text simplifier is identity (TextSimplifier.scala:7-9);
  pass ``functions.simplify.simplify`` for the Yiddish corpus, matching
  YiddishTextSimpifier wiring (JochreYiddishFull.scala:20-22).
* ``alphabet`` — the extractors' running char-set union
  (GlyphExtractor.scala:85-87) becomes a distinct-aggregation over the
  crops DataFrame, combining-mark aware via ``string_to_chars``.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.spantree import (
    ComposedBlock,
    Document,
    Rect,
    TextBlock,
)

CROP_SCHEMA = (
    "doc_id string, unit string, idx int, split string, image_file string, "
    "content string, left int, top int, width int, height int, "
    "label_line string, crop binary"
)

IMAGE_EXTENSION = "npy"  # sandbox codec stand-in for the reference's png


# ------------------------------------------------------------- geometry
def unrotate_rect(rect: Rect, width: int, height: int, rotation: float) -> Rect:
    """Rectangle.rotate(ImageInfo(w, h, rotation)) — corner rotation about
    the page center with int truncation (ImageInfo.scala:11-15,
    Rectangle.scala:172-177)."""
    r = math.radians(rotation)
    cos_r, sin_r = math.cos(r), math.sin(r)
    cx, cy = width / 2.0, height / 2.0

    def rot(x: int, y: int) -> tuple[int, int]:
        return (
            int(cx + (x - cx) * cos_r - (y - cy) * sin_r),
            int(cy + (x - cx) * sin_r + (y - cy) * cos_r),
        )

    x1, y1 = rot(rect.left, rect.top)
    x2, y2 = rot(rect.right, rect.bottom)
    return Rect(x1, y1, x2 - x1, y2 - y1)


def unrotate_doc(doc: Document, width: int, height: int) -> None:
    """Page.unrotate (Page.scala:117-119): re-map every rectangle in the
    tree; the paired image is straightened with rotate(−rotation)
    (RotationTransformer.scala:8-17, ImageUtils.scala:45-46)."""
    from jochre3_ocr_spark.operators.spantree import map_rects

    if not doc.rotation:
        return
    rot = doc.rotation
    map_rects(doc, lambda r: unrotate_rect(r, width, height, rot))
    doc.rotation = 0.0


def glyph_crop_rect(glyph_rect: Rect, page_w: int, page_h: int) -> Rect:
    """GlyphExtractor.scala:66-82: 10 % margins, square-pad width up to
    height, center, clamp to the page."""
    height = int(glyph_rect.height * 1.1)
    width = int(glyph_rect.width * 1.1)
    adjusted_width = height if width < height else width
    left_margin = (adjusted_width - glyph_rect.width) // 2
    top_margin = (height - glyph_rect.height) // 2
    left = glyph_rect.left - left_margin
    top = glyph_rect.top - top_margin
    # Rectangle.intersection with the page (GlyphExtractor.scala:82)
    x1 = max(left, 0)
    y1 = max(top, 0)
    x2 = min(left + adjusted_width, page_w)
    y2 = min(top + height, page_h)
    return Rect(x1, y1, max(x2 - x1, 0), max(y2 - y1, 0))


def lines_with_rectangles_tree(block: TextBlock):
    """TextBlock.textLinesWithRectangles (TextBlock.scala:22-45) over a
    parsed span tree: line i spans [prev.bottom, baseline +
    0.25·(next.baseline − baseline)], x-span from the baseline. Lines
    parsed from ALTO without a BASELINE attribute fall back to
    baseline = rectangle bottom edge (jochre emits baselines at the
    line rect bottom, TextLine.scala:85)."""
    lines = block.lines
    rects: list[Rect] = []
    block_rect = block.rect or Rect(0, 0, 0, 0)
    for i, line in enumerate(lines):
        base = getattr(line, "baseline", None)
        if base is not None:
            bx1, by1, bx2, _by2 = base
        else:
            lr = line.rect or block_rect
            bx1, by1, bx2 = lr.left, lr.bottom, lr.right
        top = rects[-1].bottom if rects else block_rect.top
        if i + 1 < len(lines):
            nxt = lines[i + 1]
            nbase = getattr(nxt, "baseline", None)
            if nbase is not None:
                next_y = nbase[1]
            else:
                nlr = nxt.rect or block_rect
                next_y = nlr.bottom
            height = (by1 - top) + int((next_y - by1) * 0.25)
        else:
            height = block_rect.bottom - top
        rects.append(Rect(bx1, top, bx2 - bx1, height))
    return list(zip(lines, rects))


# --------------------------------------------------------- tree walkers
def _text_blocks(doc: Document) -> Iterator[TextBlock]:
    for block in doc.blocks:
        if isinstance(block, TextBlock):
            yield block
        elif isinstance(block, ComposedBlock):
            yield from block.blocks


def _split_for(i: int, validation_one_every: int | None) -> str:
    if validation_one_every and (i + 1) % validation_one_every == 0:
        return "val"
    return "train"


def _iter_units(doc: Document, unit: str, page_w: int, page_h: int):
    """Yields (idx, content, label_rect, crop_rect) per training unit in
    reference order (combinedWords document order)."""
    if unit == "line":
        i = 0
        for block in _text_blocks(doc):
            for line, rect in lines_with_rectangles_tree(block):
                yield i, line.content, rect, rect
                i += 1
        return
    words = []
    for block in _text_blocks(doc):
        for line in block.lines:
            words.extend(line.combined_words())
    if unit == "word":
        for i, w in enumerate(words):
            yield i, w.content, w.rect, w.rect
        return
    if unit == "glyph":
        i = 0
        for w in words:
            for g in w.glyphs:
                crop = glyph_crop_rect(g.rect, page_w, page_h)
                yield i, g.content, crop, crop
                i += 1
        return
    raise ValueError(f"unknown unit {unit!r}")


def _label_line(unit: str, image_file: str, content: str, rect: Rect) -> str:
    if unit == "glyph":
        # GlyphExtractor.scala:98-100
        return (
            f"{image_file}\t{content}\t"
            f"{rect.left},{rect.top},{rect.width},{rect.height}"
        )
    # WordExtractor.scala:72 / TextLineExtractor.scala:66
    return f"{image_file}\t{content}"


def _unit_file(unit: str, base: str, idx: int) -> str:
    if unit == "glyph":
        # the glyph label references the full page image
        return f"{base}.{IMAGE_EXTENSION}"
    if unit == "word":
        return f"{base}_{idx:04d}.{IMAGE_EXTENSION}"  # WordExtractor.scala:62
    return f"{base}_{idx:03d}.{IMAGE_EXTENSION}"  # TextLineExtractor.scala:55


# ------------------------------------------------------------ Spark op
def extract_crops(
    corpus: DataFrame,
    unit: str = "glyph",
    validation_one_every: int | None = None,
    simplifier: Callable[[str], str] | None = None,
    with_crops: bool = True,
) -> DataFrame:
    """CorpusAnnotator.annotate as one mapInPandas stage.

    ``corpus``: one row per annotated page — ``doc_id string``,
    ``image binary`` (any codec ``decode_image`` sniffs: npy/PNG/JPEG),
    ``alto_xml string``. Returns one row per training unit with the
    reference's label-file line pre-formatted (``label_line``) and,
    when ``with_crops``, the npy-encoded crop bytes.

    Pages are independent → embarrassingly parallel; at 100 TB this is
    the same zero-shuffle scan→Python-batch shape as the extraction
    pipeline (PLANS.md), partitioned by the input's doc_id bucketing.
    """
    if unit not in ("glyph", "word", "line"):
        raise ValueError(f"unknown unit {unit!r}")

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.operators.transforms import (
            crop as crop_img,
            decode_image,
            encode_image,
        )
        from jochre3_ocr_spark.sources.alto_xml import parse_alto

        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id image_file content left top width height "
                    "idx split label_line crop unit"
                ).split()
            }
            for doc_id, image, xml in zip(
                pdf["doc_id"], pdf["image"], pdf["alto_xml"]
            ):
                img = decode_image(bytes(image))
                page_h, page_w = img.shape[:2]
                doc = parse_alto(xml, doc_id=doc_id)
                if doc.rotation:
                    from jochre3_ocr_spark.operators.transforms import (
                        rotate_image,
                    )

                    img = rotate_image(img, -doc.rotation)
                    unrotate_doc(doc, page_w, page_h)
                for idx, content, label_rect, crop_rect in _iter_units(
                    doc, unit, page_w, page_h
                ):
                    if simplifier is not None:
                        content = simplifier(content)
                    image_file = _unit_file(unit, doc_id, idx)
                    out["doc_id"].append(doc_id)
                    out["unit"].append(unit)
                    out["idx"].append(idx)
                    out["split"].append(
                        _split_for(idx, validation_one_every)
                    )
                    out["image_file"].append(image_file)
                    out["content"].append(content)
                    out["left"].append(label_rect.left)
                    out["top"].append(label_rect.top)
                    out["width"].append(label_rect.width)
                    out["height"].append(label_rect.height)
                    out["label_line"].append(
                        _label_line(unit, image_file, content, label_rect)
                    )
                    if with_crops and crop_rect.width and crop_rect.height:
                        sub = crop_img(
                            img,
                            (
                                crop_rect.left,
                                crop_rect.top,
                                crop_rect.width,
                                crop_rect.height,
                            ),
                        )
                        out["crop"].append(encode_image(sub))
                    else:
                        out["crop"].append(None)
            yield pd.DataFrame(
                {
                    k: out[k]
                    for k in (
                        "doc_id unit idx split image_file content "
                        "left top width height label_line crop"
                    ).split()
                }
            )

    return corpus.select("doc_id", "image", "alto_xml").mapInPandas(
        gen, schema=CROP_SCHEMA
    )


def crop_alphabet(crops: DataFrame) -> DataFrame:
    """The extractors' alphabet accumulator (GlyphExtractor.scala:85-87:
    ``alphabet = alphabet.union(stringToChars(content))``) as a distinct
    aggregation — one row per combining-mark-aware character across all
    crop contents. Distributed set-union: map-side explode, one shuffle
    for the global distinct."""

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.functions.simplify import string_to_chars

        for pdf in batches:
            chars: set[str] = set()
            for content in pdf["content"]:
                if content:
                    chars.update(string_to_chars(content))
            yield pd.DataFrame({"char": sorted(chars)})

    return (
        crops.select("content")
        .mapInPandas(gen, schema="char string")
        .distinct()
    )


def label_file_lines(crops: DataFrame, split: str = "train") -> DataFrame:
    """The rows of ``glyph-to-text.txt`` / ``word-to-text.txt`` /
    ``line-to-text.txt`` for one split, in reference append order
    (doc_id, idx) — feed to the text sink (sources/sinks.py)."""
    return (
        crops.filter(F.col("split") == split)
        .orderBy("doc_id", "idx")
        .select("label_line")
    )
