"""Deterministic layout oracle — the stand-in for the YOLO DLA server
(FIXTURES.md §4; reference: core/segmentation/YoloPredictor.scala:60-178,
model endpoints in core/segmentation/package.scala:39-91).

Generates, per page, ground-truth geometry (blocks → lines → words →
glyph boxes, RTL) plus the *predicted* boxes the segmenter consumes:
ground truth with controlled imperfections —

* duplicate word/line boxes at >25% mutual overlap (exercises the
  ordered NMS, FullYoloSegmenter.scala:993-1028),
* split high-confidence block pairs at >20% overlap (exercises the
  unordered merge, :1030-1276),
* line boxes re-centered on the baseline (the segmenter bumps them up
  by half a height, :252-258),
* low-confidence spurious boxes (dropped by confidence dominance).

Everything is seeded per (doc, page) so generation is order-independent.
"""

from __future__ import annotations

import random

from jochre3_ocr_spark.functions.geometry import PredictedBox
from jochre3_ocr_spark.functions.simplify import string_to_chars
from jochre3_ocr_spark.operators.segmentation import PageLayout
from jochre3_ocr_spark.sources.corpus import KNOWN_WORDS

PAGE_W, PAGE_H = 2000, 2800
GLYPH_W, GLYPH_H = 22, 30
LINE_GAP = 50
WORD_GAP = 14


def build_page(doc_index: int, page_index: int, seed: int = 42):
    """Returns (PageLayout with predicted boxes, ground_truth dict).

    ground_truth = {"blocks": [{"box", "lines": [{"baseline_y",
    "words": [{"box", "text", "glyphs": [(box, char)]}]}]}],
    "illustrations": [box]}
    """
    rng = random.Random((seed << 24) ^ (doc_index << 8) ^ page_index)
    n_columns = rng.choice((1, 1, 2))
    col_w = (PAGE_W - 200) // n_columns

    gt_blocks = []
    pred_blocks: list[PredictedBox] = []
    pred_lines: list[PredictedBox] = []
    pred_words: list[PredictedBox] = []
    pred_glyphs: list[PredictedBox] = []
    illustrations = []

    for col in range(n_columns):
        left = 100 + col * col_w
        top = 150
        n_blocks = rng.randint(1, 2)
        for _b in range(n_blocks):
            n_lines = rng.randint(2, 4)
            block_h = n_lines * LINE_GAP + 30
            block_box = (left, top, col_w - 60, block_h)
            lines = []
            for li in range(n_lines):
                baseline_y = top + 40 + li * LINE_GAP
                words = []
                cursor = left + (col_w - 60) - 10  # RTL: start at right edge
                n_words = rng.randint(2, 5)
                for _w in range(n_words):
                    text = rng.choice(KNOWN_WORDS)
                    chars = string_to_chars(text)
                    w_width = len(chars) * GLYPH_W
                    if cursor - w_width < left:
                        break
                    word_box = (
                        cursor - w_width,
                        baseline_y - GLYPH_H + 4,
                        w_width,
                        GLYPH_H,
                    )
                    glyphs = []
                    gx = cursor
                    for ch in chars:
                        gx -= GLYPH_W
                        glyphs.append(((gx, word_box[1], GLYPH_W, GLYPH_H), ch))
                    words.append({"box": word_box, "text": text, "glyphs": glyphs})
                    cursor -= w_width + WORD_GAP
                if words:
                    lines.append({"baseline_y": baseline_y, "words": words})
            gt_blocks.append({"box": block_box, "lines": lines})

            # predicted boxes, with injected imperfections
            if rng.random() < 0.2:
                # split block: two high-confidence overlapping halves → merge
                half = block_h // 2
                pred_blocks.append(
                    PredictedBox("text", (block_box[0], block_box[1], block_box[2], half + 20), 0.9)
                )
                pred_blocks.append(
                    PredictedBox(
                        "text",
                        (block_box[0], block_box[1] + half - 20, block_box[2], block_h - half + 20),
                        0.8,
                    )
                )
            else:
                pred_blocks.append(PredictedBox("text", block_box, 0.95))
                if rng.random() < 0.3:
                    # low-confidence duplicate → removed by dominance
                    dup = (
                        block_box[0] + 8,
                        block_box[1] + 8,
                        block_box[2],
                        block_box[3],
                    )
                    pred_blocks.append(PredictedBox("text", dup, 0.3))

            for line in lines:
                by = line["baseline_y"]
                lw = block_box[2]
                # predicted line boxes are baseline-CENTERED (bump-up undoes)
                line_box = (block_box[0] + 10, by - GLYPH_H // 2, lw - 20, GLYPH_H)
                pred_lines.append(PredictedBox("line", line_box, 0.9))
                for word in line["words"]:
                    pred_words.append(PredictedBox("word", word["box"], 0.9))
                    if rng.random() < 0.1:
                        # near-duplicate word box → ordered NMS keeps best
                        b = word["box"]
                        pred_words.append(
                            PredictedBox("word", (b[0] + 4, b[1] + 2, b[2], b[3]), 0.5)
                        )
                    for gbox, _ch in word["glyphs"]:
                        pred_glyphs.append(PredictedBox("glyph", gbox, 0.85))
            top += block_h + 60

        if rng.random() < 0.25:
            ibox = (left, top, col_w - 200, 180)
            illustrations.append(ibox)
            pred_blocks.append(PredictedBox("illustration", ibox, 0.9))
            top += 220

    layout = PageLayout(
        width=PAGE_W,
        height=PAGE_H,
        blocks=pred_blocks,
        paragraphs=[],  # single-paragraph blocks by default
        lines=pred_lines,
        words=pred_words,
        glyphs=pred_glyphs,
    )
    gt = {"blocks": gt_blocks, "illustrations": illustrations}
    return layout, gt


def build_pages_from_words(
    doc_index: int,
    words: list[str],
    seed: int = 42,
    words_per_line: int = 4,
    lines_per_block: int = 3,
    blocks_per_page: int = 4,
):
    """Lay out a GIVEN word sequence as RTL pages (one column), with the
    same injected prediction imperfections as :func:`build_page`.

    The deterministic geometry (fixed words-per-line / lines-per-block /
    blocks-per-page, glyph boxes of ``GLYPH_W``×``GLYPH_H``) makes the
    ground-truth text an exact function of the input words, so an
    end-to-end OCR run over a known document table is oracle-checkable:
    recovered processed text == input words re-chunked into blocks.
    Returns ``[(PageLayout, ground_truth), ...]``.

    Reference: the YOLO DLA endpoints the reference consumes
    (core/segmentation/YoloPredictor.scala:60-178); imperfection kinds as
    in :func:`build_page`.
    """
    rng = random.Random((seed << 24) ^ (doc_index << 8) ^ 0xB5)
    col_left = 100
    col_w = PAGE_W - 200

    # chunk words → lines → blocks → pages
    lines_w = [
        words[i : i + words_per_line]
        for i in range(0, len(words), words_per_line)
    ]
    blocks_w = [
        lines_w[i : i + lines_per_block]
        for i in range(0, len(lines_w), lines_per_block)
    ]
    pages_w = [
        blocks_w[i : i + blocks_per_page]
        for i in range(0, len(blocks_w), blocks_per_page)
    ]

    out = []
    for block_group in pages_w:
        gt_blocks = []
        pred_blocks: list[PredictedBox] = []
        pred_lines: list[PredictedBox] = []
        pred_words: list[PredictedBox] = []
        pred_glyphs: list[PredictedBox] = []
        top = 150
        for block_lines in block_group:
            n_lines = len(block_lines)
            block_h = n_lines * LINE_GAP + 30
            block_box = (col_left, top, col_w - 60, block_h)
            lines = []
            for li, line_words in enumerate(block_lines):
                baseline_y = top + 40 + li * LINE_GAP
                cursor = col_left + (col_w - 60) - 10  # RTL start
                wrows = []
                for text in line_words:
                    chars = string_to_chars(text)
                    w_width = len(chars) * GLYPH_W
                    word_box = (
                        cursor - w_width,
                        baseline_y - GLYPH_H + 4,
                        w_width,
                        GLYPH_H,
                    )
                    glyphs = []
                    gx = cursor
                    for ch in chars:
                        gx -= GLYPH_W
                        glyphs.append(((gx, word_box[1], GLYPH_W, GLYPH_H), ch))
                    wrows.append({"box": word_box, "text": text, "glyphs": glyphs})
                    cursor -= w_width + WORD_GAP
                lines.append({"baseline_y": baseline_y, "words": wrows})
            gt_blocks.append({"box": block_box, "lines": lines})

            # the same imperfection kinds as build_page
            if rng.random() < 0.2:
                half = block_h // 2
                pred_blocks.append(
                    PredictedBox(
                        "text", (block_box[0], block_box[1], block_box[2], half + 20), 0.9
                    )
                )
                pred_blocks.append(
                    PredictedBox(
                        "text",
                        (
                            block_box[0],
                            block_box[1] + half - 20,
                            block_box[2],
                            block_h - half + 20,
                        ),
                        0.8,
                    )
                )
            else:
                pred_blocks.append(PredictedBox("text", block_box, 0.95))
                if rng.random() < 0.3:
                    dup = (block_box[0] + 8, block_box[1] + 8, block_box[2], block_box[3])
                    pred_blocks.append(PredictedBox("text", dup, 0.3))

            for line in lines:
                by = line["baseline_y"]
                line_box = (block_box[0] + 10, by - GLYPH_H // 2, block_box[2] - 20, GLYPH_H)
                pred_lines.append(PredictedBox("line", line_box, 0.9))
                for word in line["words"]:
                    pred_words.append(PredictedBox("word", word["box"], 0.9))
                    if rng.random() < 0.1:
                        b = word["box"]
                        pred_words.append(
                            PredictedBox("word", (b[0] + 4, b[1] + 2, b[2], b[3]), 0.5)
                        )
                    for gbox, _ch in word["glyphs"]:
                        pred_glyphs.append(PredictedBox("glyph", gbox, 0.85))
            top += block_h + 60

        layout = PageLayout(
            width=PAGE_W,
            height=PAGE_H,
            blocks=pred_blocks,
            paragraphs=[],
            lines=pred_lines,
            words=pred_words,
            glyphs=pred_glyphs,
        )
        out.append((layout, {"blocks": gt_blocks, "illustrations": []}))
    return out


def glyph_content_lookup(gt: dict):
    """Map glyph box → character (the glyph-classifier oracle keyed by
    crop geometry, FIXTURES.md glyph_oracle)."""
    lookup = {}
    for block in gt["blocks"]:
        for line in block["lines"]:
            for word in line["words"]:
                for gbox, ch in word["glyphs"]:
                    lookup[gbox] = ch
    return lookup
