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


def _map_baselines(doc: Document, pt_fn) -> None:
    """Apply a point map to every TextLine baseline — the reference's
    TextLine.translate/rotate carry the baseLine along with the
    rectangles (TextLine.scala:120-139); map_rects only sees Rects."""
    for block in _text_blocks(doc):
        for line in block.lines:
            if line.baseline is not None:
                x1, y1, x2, y2 = line.baseline
                line.baseline = (*pt_fn(x1, y1), *pt_fn(x2, y2))


def unrotate_doc(doc: Document, width: int, height: int) -> None:
    """Page.unrotate (Page.scala:117-119): re-map every rectangle in the
    tree; the paired image is straightened with rotate(−rotation)
    (RotationTransformer.scala:8-17, ImageUtils.scala:45-46)."""
    import math as _math

    from jochre3_ocr_spark.operators.spantree import map_rects

    if not doc.rotation:
        return
    rot = doc.rotation
    map_rects(doc, lambda r: unrotate_rect(r, width, height, rot))
    rad = _math.radians(rot)
    cos_r, sin_r = _math.cos(rad), _math.sin(rad)
    cx, cy = width / 2.0, height / 2.0
    _map_baselines(
        doc,
        lambda x, y: (
            int(cx + (x - cx) * cos_r - (y - cy) * sin_r),
            int(cy + (x - cx) * sin_r + (y - cy) * cos_r),
        ),
    )
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


def _page_idx(page_index, doc_id) -> int:
    """Validate a caller-supplied ``page_index`` value inside the Arrow
    batch: a null (None/NaN from a nullable int column) would otherwise
    raise a bare ``int(None)`` TypeError deep in the worker with an
    opaque traceback (ADVICE r2). Fails with the offending doc named —
    or drop the column entirely to use the derived doc_id rank."""
    if page_index is None or page_index != page_index:  # None or NaN
        raise ValueError(
            f"page_index is null for doc_id={doc_id!r}: supply non-null "
            "page_index values, or drop the column to use the derived "
            "doc_id-rank split key"
        )
    return int(page_index)


def _split_for(i: int, validation_one_every: int | None) -> str:
    if validation_one_every and (i + 1) % validation_one_every == 0:
        return "val"
    return "train"


def _with_page_index(corpus: DataFrame, cols: list[str]) -> DataFrame:
    """Project ``cols`` plus a ``page_index`` split key. When the input
    lacks the column, derive it as the doc_id rank — computed on a
    doc_id-ONLY projection (never shuffling image bytes through the
    single-partition window) and broadcast-joined back, so the heavy
    annotator stage keeps the input's parallelism; duplicate doc_ids
    get one shared index (deterministic under any partitioning). At
    scale, pass the column explicitly and this is a pure projection."""
    if "page_index" in corpus.columns:
        return corpus.select(*cols, "page_index")
    from pyspark.sql import Window

    idx = (
        corpus.select("doc_id")
        .distinct()
        .withColumn(
            "page_index",
            F.row_number().over(Window.orderBy("doc_id")).cast("int") - 1,
        )
    )
    return corpus.select(*cols).join(F.broadcast(idx), "doc_id")


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
                doc = parse_alto(xml, doc_id=doc_id)
                if image is None:
                    # labels-only mode: geometry from the Page attrs;
                    # a dimensionless page has no clampable geometry
                    img = None
                    page_w, page_h = doc.width, doc.height
                    if not page_w or not page_h:
                        continue
                else:
                    img = decode_image(bytes(image))
                    page_h, page_w = img.shape[:2]
                if doc.rotation:
                    if img is not None:
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
                    if (
                        with_crops
                        and img is not None
                        and crop_rect.width
                        and crop_rect.height
                    ):
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


# --------------------------------------------------------- YOLO export
# core/corpus/package.scala:6-45 — the annotation object types, in the
# enum's declaration order.
YOLO_OBJECT_TYPES = (
    "TopLevelTextBlock",
    "Illustration",
    "TextBlock",
    "BaseLine",
    "NonFinalBaseLine",
    "FinalBaseLine",
    "Word",
    "WordSeparator",
    "Glyph",
    "GlyphSeparator",
)

YOLO_SCHEMA = (
    "doc_id string, tile_idx int, split string, image_file string, "
    "label_file string, class_idx int, class_name string, "
    "x_center double, y_center double, box_width double, "
    "box_height double, label_line string"
)


def yolo_dataset_yaml(objects_to_include, root_name: str = "dataset") -> str:
    """The dataset-yaml the annotator writes (YoloAnnotator.scala:56-75)."""
    lines = [
        f"path: {root_name} # dataset root dir",
        "train: images/train # train images (relative to 'path')",
        "val: images/val # validation images (relative to 'path')",
        "test:  # test images (relative to 'path') - optional",
        "# Classes",
        "names:",
    ]
    lines += [f"  {i}: {name}" for i, name in enumerate(objects_to_include)]
    return "\n".join(lines) + "\n"


def _page_yolo_boxes(
    doc: Document,
    page_w: int,
    page_h: int,
    objects: set,
    left_to_right: bool,
    line_thickness: float,
    tb_h_margin: float,
    tb_v_margin: float,
):
    """All candidate YoloBoxes for one (possibly print-area-cropped)
    page, normalized to [0,1] — YoloAnnotator.scala:92-240 literally,
    including the reference quirk that GlyphSeparator boxes stay in
    PIXEL units (:167-187) and are therefore always dropped by the
    normalized tile-containment filter (:260-266)."""
    from jochre3_ocr_spark.functions.reading_order import sort_blocks

    width, height = float(page_w), float(page_h)
    boxes: list[tuple[str, float, float, float, float]] = []

    def rect_box(cls: str, r: Rect):
        boxes.append(
            (
                cls,
                (r.left + r.width / 2.0) / width,
                (r.top + r.height / 2.0) / height,
                r.width / width,
                r.height / height,
            )
        )

    # reading-order text blocks (Page.allTextBlocks, Page.scala:41-47)
    tops = [
        b for b in doc.blocks if isinstance(b, (TextBlock, ComposedBlock))
    ]
    sorted_tops = sort_blocks(
        tops,
        left_to_right,
        box_of=lambda b: (b.rect.left, b.rect.top, b.rect.width, b.rect.height)
        if b.rect
        else (0, 0, 0, 0),
    )
    all_text_blocks: list[TextBlock] = []
    for b in sorted_tops:
        if isinstance(b, ComposedBlock):
            all_text_blocks.extend(b.blocks)
        else:
            all_text_blocks.append(b)

    # per-line boxes (YoloAnnotator.scala:115-195)
    for block in all_text_blocks:
        pairs = lines_with_rectangles_tree(block)
        n_lines = len(pairs)
        for i, (line, line_rect) in enumerate(pairs):
            base = getattr(line, "baseline", None)
            if base is not None:
                bx1, by1, bx2, by2 = base
            else:
                lr = line.rect or line_rect
                bx1, by1, bx2, by2 = lr.left, lr.bottom, lr.right, lr.bottom
            baseline_y = (by1 + by2) / 2.0
            baseline_h_px = line_thickness * height
            base_box = (
                "BaseLine",
                ((bx1 + bx2) / 2.0) / width,
                baseline_y / height,
                (bx2 - bx1) / width,
                baseline_h_px / height,
            )
            typed = (
                "FinalBaseLine" if i == n_lines - 1 else "NonFinalBaseLine",
            ) + base_box[1:]
            boxes.append(base_box)
            boxes.append(typed)
            combined = line.combined_words()
            for word in combined:
                rect_box("Word", word.rect)
            for word in combined:
                for g in word.glyphs:
                    rect_box("Glyph", g.rect)
            from jochre3_ocr_spark.operators.spantree import Space

            for item in line.items:
                if isinstance(item, Space):
                    boxes.append(
                        (
                            "WordSeparator",
                            (item.rect.left + item.rect.width / 2.0) / width,
                            ((line_rect.top + baseline_y) / 2.0) / height,
                            item.rect.width / width,
                            ((baseline_y - line_rect.top) * 0.85) / height,
                        )
                    )
            if "GlyphSeparator" in objects:
                # pixel-valued, per the reference (:167-187)
                sep_h = int((baseline_y - line_rect.top) * 0.85)
                sep_w = int(line_thickness * width)
                for word in combined:
                    gs = sorted(
                        word.glyphs,
                        key=(lambda g: g.rect.left)
                        if left_to_right
                        else (lambda g: -g.rect.right),
                    )
                    for gi, g in enumerate(gs):
                        if gi > 0:
                            boxes.append(
                                (
                                    "GlyphSeparator",
                                    float(g.rect.left),
                                    (line_rect.top + baseline_y) / 2.0,
                                    float(sep_w),
                                    float(sep_h),
                                )
                            )

    # paragraph-level text blocks (:198-209)
    for block in all_text_blocks:
        if block.rect:
            rect_box("TextBlock", block.rect)

    # top-level blocks / illustrations on the uncropped page (:212-240)
    from jochre3_ocr_spark.operators.spantree import Media

    for b in doc.blocks:
        if isinstance(b, (TextBlock, ComposedBlock)) and b.rect:
            r = b.rect
            boxes.append(
                (
                    "TopLevelTextBlock",
                    (r.left + r.width / 2.0) / width,
                    (r.top + r.height / 2.0) / height,
                    r.width / width + tb_h_margin * 2.0,
                    r.height / height + tb_v_margin * 2.0,
                )
            )
        elif isinstance(b, Media) and b.rect:
            rect_box("Illustration", b.rect)

    return [b for b in boxes if b[0] in objects]


def yolo_annotations(
    corpus: DataFrame,
    objects_to_include,
    task: str = "detection",
    tile_count: int | None = None,
    validation_one_every: int | None = None,
    left_to_right: bool = False,
    line_thickness: float = 0.01,
    crop_to_print_area: bool = True,
    crop_margin: float = 0.01,
    tb_h_margin: float = 0.005,
    tb_v_margin: float = 0.0,
    tile_margin: float = 0.125,
) -> DataFrame:
    """YoloAnnotator.annotateOneFile (YoloAnnotator.scala:77-425) as a
    Spark stage: one output row per (page, tile, annotation box), with
    the YOLO label-file line pre-formatted (detection ``cls cx cy w h``
    or segmentation 4-corner polygon, :395-419; 6-decimal formatting and
    left-justified width-2 class index, :52-53).

    ``corpus`` rows: ``doc_id string, alto_xml string`` plus an optional
    ``page_index int`` used for the train/val split ((index+1) %
    validation_one_every, :246-254 — the reference splits by FILE index,
    not unit index). When ``page_index`` is absent it is derived as the
    doc_id rank — a narrow global sort; pass the column explicitly on
    big corpora. Config defaults mirror reference.conf:30-48.

    When ``crop_to_print_area`` and neither TopLevelTextBlock nor
    Illustration is requested, the page is first cropped to the print
    area + margin (Page.croppedPrintArea, Page.scala:86-111).
    """
    if task not in ("detection", "segmentation"):
        raise ValueError(f"unknown task {task!r}")
    objects_list = list(objects_to_include)
    for o in objects_list:
        if o not in YOLO_OBJECT_TYPES:
            raise ValueError(f"unknown YOLO object type {o!r}")
    class_idx = {name: i for i, name in enumerate(objects_list)}
    objects = set(objects_list)

    src = _with_page_index(corpus, ["doc_id", "alto_xml"])

    do_crop = crop_to_print_area and not (
        "TopLevelTextBlock" in objects or "Illustration" in objects
    )

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.functions.geometry import tile as tile_fn
        from jochre3_ocr_spark.operators.spantree import map_rects
        from jochre3_ocr_spark.sources.alto_xml import parse_alto

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id tile_idx split image_file label_file class_idx "
                    "class_name x_center y_center box_width box_height "
                    "label_line"
                ).split()
            }
            for doc_id, xml, page_index in zip(
                pdf["doc_id"], pdf["alto_xml"], pdf["page_index"]
            ):
                doc = parse_alto(xml, doc_id=doc_id)
                page_w, page_h = doc.width, doc.height
                if not page_w or not page_h:
                    # a page without WIDTH/HEIGHT has no normalizable
                    # geometry — contributes no boxes (reference pages
                    # always carry dims, Page.fromXML)
                    continue
                if doc.rotation:
                    # rotation prelude (CorpusAnnotator.scala:26-49:
                    # RotationTransformer runs before annotateOneFile)
                    unrotate_doc(doc, page_w, page_h)
                if do_crop and doc.blocks:
                    # Page.croppedPrintArea (Page.scala:86-111)
                    rects = [
                        b.rect
                        for b in doc.blocks
                        if getattr(b, "rect", None) is not None
                    ]
                    if rects:
                        min_l = min(r.left for r in rects)
                        min_t = min(r.top for r in rects)
                        max_r = max(r.right for r in rects)
                        max_b = max(r.bottom for r in rects)
                        xm = int(page_w * crop_margin)
                        ym = int(page_h * crop_margin)
                        nl = max(min_l - xm, 0)
                        nt = max(min_t - ym, 0)
                        nw = (max_r - min_l) + 2 * xm
                        nh = (max_b - min_t) + 2 * ym
                        nw = min(nw, page_w - nl)
                        nh = min(nh, page_h - nt)
                        # Page.crop (Page.scala:131-140)
                        map_rects(doc, lambda r: r.translate(-nl, -nt))
                        _map_baselines(
                            doc, lambda x, y: (x - nl, y - nt)
                        )
                        page_w, page_h = nw, nh
                boxes = _page_yolo_boxes(
                    doc,
                    page_w,
                    page_h,
                    objects,
                    left_to_right,
                    line_thickness,
                    tb_h_margin,
                    tb_v_margin,
                )
                split = _split_for(_page_idx(page_index, doc_id), validation_one_every)
                if tile_count:
                    tiles = tile_fn(
                        (0, 0, page_w, page_h),
                        tile_count,
                        tile_count,
                        tile_margin,
                    )
                else:
                    tiles = [(0, 0, page_w, page_h)]
                for ti, (tl, tt, tw, th) in enumerate(tiles):
                    t_l, t_t = tl / page_w, tt / page_h
                    t_r, t_b = (tl + tw) / page_w, (tt + th) / page_h
                    for cls, cx, cy, bw, bh in boxes:
                        # full-containment filter (:258-266)
                        if not (
                            cx - bw / 2 >= t_l
                            and cx + bw / 2 <= t_r
                            and cy - bh / 2 >= t_t
                            and cy + bh / 2 <= t_b
                        ):
                            continue
                        # remap to tile-relative normalized (:267-281)
                        ncx = (cx - t_l) * page_w / tw
                        ncy = (cy - t_t) * page_h / th
                        nbw = bw * page_w / tw
                        nbh = bh * page_h / th
                        if task == "segmentation":
                            xs = (ncx - nbw / 2, ncx - nbw / 2,
                                  ncx + nbw / 2, ncx + nbw / 2)
                            ys = (ncy - nbh / 2, ncy + nbh / 2,
                                  ncy + nbh / 2, ncy - nbh / 2)
                            body = " ".join(
                                f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys)
                            )
                        else:
                            body = (
                                f"{ncx:.6f} {ncy:.6f} {nbw:.6f} {nbh:.6f}"
                            )
                        ci = class_idx[cls]
                        out["doc_id"].append(doc_id)
                        out["tile_idx"].append(ti)
                        out["split"].append(split)
                        out["image_file"].append(
                            f"{doc_id}_{ti}.{IMAGE_EXTENSION}"
                        )
                        out["label_file"].append(f"{doc_id}_{ti}.txt")
                        out["class_idx"].append(ci)
                        out["class_name"].append(cls)
                        out["x_center"].append(ncx)
                        out["y_center"].append(ncy)
                        out["box_width"].append(nbw)
                        out["box_height"].append(nbh)
                        out["label_line"].append(f"{ci:<2} {body}")
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=YOLO_SCHEMA)


def word_to_glyph_annotations(
    corpus: DataFrame,
    validation_one_every: int | None = None,
) -> DataFrame:
    """YoloWordToGlyphAnnotator (core/corpus/YoloWordToGlyphAnnotator.
    scala:72-227): for training a word→glyph splitter — one row per
    (combined word, glyph) with the glyph box normalized RELATIVE TO THE
    WORD rectangle, width/height clamped to 1.0 (:115-123), label line
    ``0  cx cy w h`` (%.6f, :217-222), file names ``{base}_%04d``
    (:199,205), split by page index (:89-96). This op emits labels only, so the
    heavy pixel path is not duplicated; word crop images come from
    ``extract_crops(unit="word")`` — note that op's OWN split is
    per-word (WordExtractor semantics), so when pairing crops with
    these page-split labels, join this op's ``split`` by
    (doc_id, word_idx) instead of using the crop rows' split."""

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.sources.alto_xml import parse_alto

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id word_idx glyph_idx split image_file label_file "
                    "x_center y_center box_width box_height label_line"
                ).split()
            }
            for doc_id, xml, page_index in zip(
                pdf["doc_id"], pdf["alto_xml"], pdf["page_index"]
            ):
                doc = parse_alto(xml, doc_id=doc_id)
                if doc.rotation and doc.width and doc.height:
                    # rotation prelude (CorpusAnnotator.scala:26-49)
                    unrotate_doc(doc, doc.width, doc.height)
                split = _split_for(_page_idx(page_index, doc_id), validation_one_every)
                words = []
                for block in _text_blocks(doc):
                    for line in block.lines:
                        words.extend(line.combined_words())
                for wi, word in enumerate(words):
                    wl, wt = float(word.rect.left), float(word.rect.top)
                    ww = float(word.rect.width) or 1.0
                    wh = float(word.rect.height) or 1.0
                    for gi, g in enumerate(word.glyphs):
                        cx = (g.rect.left + g.rect.width / 2.0 - wl) / ww
                        cy = (g.rect.top + g.rect.height / 2.0 - wt) / wh
                        bw = min(g.rect.width / ww, 1.0)
                        bh = min(g.rect.height / wh, 1.0)
                        out["doc_id"].append(doc_id)
                        out["word_idx"].append(wi)
                        out["glyph_idx"].append(gi)
                        out["split"].append(split)
                        out["image_file"].append(
                            f"{doc_id}_{wi:04d}.{IMAGE_EXTENSION}"
                        )
                        out["label_file"].append(f"{doc_id}_{wi:04d}.txt")
                        out["x_center"].append(cx)
                        out["y_center"].append(cy)
                        out["box_width"].append(bw)
                        out["box_height"].append(bh)
                        out["label_line"].append(
                            f"{0:<2} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}"
                        )
            yield pd.DataFrame(out)

    src = _with_page_index(corpus, ["doc_id", "alto_xml"])
    return src.mapInPandas(
        gen,
        schema=(
            "doc_id string, word_idx int, glyph_idx int, split string, "
            "image_file string, label_file string, x_center double, "
            "y_center double, box_width double, box_height double, "
            "label_line string"
        ),
    )


# ------------------------------------------------ other corpus annotators
def alto_to_text(
    corpus: DataFrame,
    simplifier: Callable[[str], str] | None = "default",
) -> DataFrame:
    """YiddishAltoToText.extract (yiddish/corpus/YiddishAltoToText.scala:
    21-50): per ALTO document, the page content plus its simplified twin.
    The reference default simplifier is YiddishTextSimpifier with
    non-Hebrew replacement off. Pass ``simplifier=None`` to skip the
    simplified column (it comes back null)."""
    if simplifier == "default":
        from jochre3_ocr_spark.functions.simplify import simplify as _s

        simplifier = _s

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.sources.alto_xml import parse_alto

        for pdf in batches:
            out = {"doc_id": [], "content": [], "simplified_content": []}
            for doc_id, xml in zip(pdf["doc_id"], pdf["alto_xml"]):
                doc = parse_alto(xml, doc_id=doc_id)
                content = doc.content
                out["doc_id"].append(doc_id)
                out["content"].append(content)
                out["simplified_content"].append(
                    simplifier(content) if simplifier is not None else None
                )
            yield pd.DataFrame(out)

    return corpus.select("doc_id", "alto_xml").mapInPandas(
        gen, schema="doc_id string, content string, simplified_content string"
    )


def transform_corpus(
    corpus: DataFrame,
    pasekh_tsvey_yudn: bool = True,
    tsvey_yudn: bool = False,
    yud_khirik_yud: bool = False,
    tsvey_vovn: bool = False,
) -> DataFrame:
    """YiddishCorpusTransformer (yiddish/corpus/
    YiddishCorpusTransformer.scala:40-106): merge Yiddish ligature glyph
    pairs in every word and re-emit ALTO 4. Flag defaults mirror
    yiddish/reference.conf:29-34. Returns (doc_id, alto_xml)."""

    def gen(batches):
        import pandas as pd

        from jochre3_ocr_spark.operators.alto_rules import (
            merge_yiddish_glyph_pairs_doc,
        )
        from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto

        for pdf in batches:
            out = {"doc_id": [], "alto_xml": []}
            for doc_id, xml in zip(pdf["doc_id"], pdf["alto_xml"]):
                doc = parse_alto(xml, doc_id=doc_id)
                merge_yiddish_glyph_pairs_doc(
                    doc,
                    pasekh_tsvey_yudn=pasekh_tsvey_yudn,
                    tsvey_yudn=tsvey_yudn,
                    yud_khirik_yud=yud_khirik_yud,
                    tsvey_vovn=tsvey_vovn,
                )
                out["doc_id"].append(doc_id)
                out["alto_xml"].append(
                    emit_alto(doc, doc.width, doc.height)
                )
            yield pd.DataFrame(out)

    return corpus.select("doc_id", "alto_xml").mapInPandas(
        gen, schema="doc_id string, alto_xml string"
    )


def rotation_annotations(
    corpus: DataFrame,
    image_size: int = 1280,
    validation_one_every: int | None = None,
) -> DataFrame:
    """RotationAnnotator (core/corpus/RotationAnnotator.scala:30-101):
    per page, the image scaled so max(w, h) == image_size (the reference
    uses Java bilinear; here nearest-neighbor — deterministic, same
    geometry) and the skew label formatted ``%.2f`` — the page is NOT
    unrotated first (initialTransforms is empty, :28): the rotation is
    the training target. Split by file index like the YOLO annotator;
    supply ``page_index`` or inherit the doc_id-rank default."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        from jochre3_ocr_spark.operators.transforms import (
            decode_image,
            encode_image,
        )
        from jochre3_ocr_spark.sources.alto_xml import parse_alto

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id split image_file label_file rotation "
                    "rotation_label image"
                ).split()
            }
            for doc_id, image, xml, page_index in zip(
                pdf["doc_id"],
                pdf["image"],
                pdf["alto_xml"],
                pdf["page_index"],
            ):
                rotation = parse_alto(xml, doc_id=doc_id).rotation
                if image is None:
                    # label-only row: keep the %.2f target, no pixels
                    out["doc_id"].append(doc_id)
                    out["split"].append(
                        _split_for(_page_idx(page_index, doc_id), validation_one_every)
                    )
                    out["image_file"].append(
                        f"{doc_id}.{IMAGE_EXTENSION}"
                    )
                    out["label_file"].append(f"{doc_id}.txt")
                    out["rotation"].append(float(rotation))
                    out["rotation_label"].append(f"{rotation:.2f}")
                    out["image"].append(None)
                    continue
                img = decode_image(bytes(image))
                h, w = img.shape[:2]
                # RotationAnnotator.scala:52-67 keep-aspect to image_size
                if h > w:
                    sh, sw = image_size, int((w / h) * image_size)
                else:
                    sh, sw = int((h / w) * image_size), image_size
                rows = (np.arange(sh) * h / sh).astype(int).clip(0, h - 1)
                cols = (np.arange(sw) * w / sw).astype(int).clip(0, w - 1)
                scaled = img[np.ix_(rows, cols)]
                out["doc_id"].append(doc_id)
                out["split"].append(
                    _split_for(_page_idx(page_index, doc_id), validation_one_every)
                )
                out["image_file"].append(f"{doc_id}.{IMAGE_EXTENSION}")
                out["label_file"].append(f"{doc_id}.txt")
                out["rotation"].append(float(rotation))
                out["rotation_label"].append(f"{rotation:.2f}")
                out["image"].append(encode_image(scaled))
            yield pd.DataFrame(out)

    src = _with_page_index(corpus, ["doc_id", "image", "alto_xml"])
    return src.mapInPandas(
        gen,
        schema=(
            "doc_id string, split string, image_file string, "
            "label_file string, rotation double, rotation_label string, "
            "image binary"
        ),
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
