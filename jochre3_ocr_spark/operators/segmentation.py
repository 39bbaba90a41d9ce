"""Page segmentation: NMS, overlap-merge, spatial placement joins, space
inference, glyph boundaries, paragraph splitting — the geometry half of
the reference pipeline (core/segmentation/FullYoloSegmenter.scala).

Inputs are predicted layout boxes per page (in this sandbox produced by
the deterministic layout oracle, sources/layout_oracle.py — the
stand-in for the YOLO DLA server, YoloPredictor.scala:60-178); output
is the block→line→word→glyph tree of operators/spantree.py with empty
word contents, ready for the guesser.

All functions are per-page pure Python (10²–10⁴ boxes — SURVEY.md §4:
the reference's 4-order binary-search candidate pruning is replaced by
direct interval scans at this scale; on the Spark side pages are the
parallel axis, so none of this ever shuffles).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from jochre3_ocr_spark.functions import geometry as G
from jochre3_ocr_spark.functions.geometry import Box, PredictedBox
from jochre3_ocr_spark.functions.reading_order import sort_blocks


# ------------------------------------------------------------------ NMS
def remove_overlaps(rects: list[PredictedBox]) -> list[PredictedBox]:
    """Ordered overlap removal (FullYoloSegmenter.scala:993-1028): scan the
    sorted list; group the head with the longest PREFIX of followers
    overlapping it >25% (either direction); keep the max-confidence box
    (first wins ties — MathUtils.argMaxFirst); recurse."""
    rects = list(rects)
    out: list[PredictedBox] = []
    while rects:
        head, tail = rects[0], rects[1:]
        k = 0
        while k < len(tail):
            other = tail[k]
            inter = G.area_of_intersection(head.box, other.box)
            if (
                inter / G.area(head.box) > 0.25
                or inter / G.area(other.box) > 0.25
            ):
                k += 1
            else:
                break
        if k > 0:
            group = [head] + tail[:k]
            best = max(group, key=lambda r: r.confidence)
            # argMaxFirst: first of the max-confidence ones
            best = next(r for r in group if r.confidence == best.confidence)
            remainder = tail[k:]
            if best is head:
                out.append(best)
                rects = remainder
            else:
                rects = [best] + remainder
        else:
            out.append(head)
            rects = tail
    return out


# -------------------------------------------------- unordered NMS + merge
#: above this box count the pairwise overlap map switches from the
#: literal O(n²) scan to the x-sweep candidate generator (identical
#: output; the crossover keeps tiny pages on the allocation-free path)
_SWEEP_THRESHOLD = 256

#: candidate-pair chunk size for the sweep-line overlap map — a module
#: constant (not a local) so parity tests can shrink it to force
#: multi-chunk runs, which is where the front/tail trim interaction lives
_SWEEP_CHUNK = 2_000_000


def _overlap_map(rects: list[PredictedBox]) -> dict[int, set[int]]:
    """Pairs overlapping >20% in either direction
    (FullYoloSegmenter.scala:1058-1084). Dispatches to the sweep-line
    candidate generator past :data:`_SWEEP_THRESHOLD` boxes — the O(n²)
    all-pairs scan was the last superlinear per-page kernel (SCALE.md
    §7): fine to 10⁴ boxes, a stalled task at a 10⁵-box dense glyph
    tiling."""
    if len(rects) <= _SWEEP_THRESHOLD:
        return _overlap_map_quadratic(rects)
    return _overlap_map_sweep(rects)


def _overlap_map_quadratic(rects: list[PredictedBox]) -> dict[int, set[int]]:
    """The literal reference scan — also the property-test oracle for
    the sweep path."""
    overlaps: dict[int, set[int]] = {i: set() for i in range(len(rects))}
    for i, a in enumerate(rects):
        for j, b in enumerate(rects):
            if i == j:
                continue
            inter = G.area_of_intersection(a.box, b.box)
            if inter <= 0:
                continue
            if inter / G.area(b.box) > 0.2 or inter / G.area(a.box) > 0.2:
                overlaps[i].add(j)
    return overlaps


def _overlap_map_sweep(rects: list[PredictedBox]) -> dict[int, set[int]]:
    """Sweep-line overlap map: sort by left edge; a pair can only overlap
    if the later box STARTS before the earlier one ENDS in x, so each
    box's candidates are one searchsorted slice instead of the whole
    page. Candidate pairs are evaluated vectorized in bounded numpy
    chunks (intersection + the exact >20% either-direction ratio test of
    the quadratic path — integer geometry, float64 division, identical
    results). On a real page layout the x-slab of a box holds ~one box
    per text line, so work is ~n·lines rather than n²; the worst case
    (every box sharing an x-range AND >20%-overlapping) is output-bound
    for any algorithm, since the map itself is then O(n²)."""
    import numpy as np

    n = len(rects)
    x0 = np.fromiter((r.box[0] for r in rects), dtype=np.int64, count=n)
    y0 = np.fromiter((r.box[1] for r in rects), dtype=np.int64, count=n)
    w = np.fromiter((r.box[2] for r in rects), dtype=np.int64, count=n)
    h = np.fromiter((r.box[3] for r in rects), dtype=np.int64, count=n)
    x1, y1, area = x0 + w, y0 + h, w * h
    order = np.argsort(x0, kind="stable")
    sx0, sx1 = x0[order], x1[order]
    sy0, sy1, sarea = y0[order], y1[order], area[order]

    starts = np.arange(1, n + 1, dtype=np.int64)
    ends = np.searchsorted(sx0, sx1, side="left")
    cnt = np.maximum(ends - starts, 0)
    offsets = np.concatenate(([0], np.cumsum(cnt)))
    total = int(offsets[-1])

    overlaps: dict[int, set[int]] = {i: set() for i in range(n)}
    pos = 0
    while pos < total:
        hi = min(pos + _SWEEP_CHUNK, total)
        # positions p whose candidate ranges intersect [pos, hi)
        p_lo = int(np.searchsorted(offsets, pos, side="right") - 1)
        p_hi = int(np.searchsorted(offsets, hi, side="left"))
        p_cnt = cnt[p_lo:p_hi].copy()
        first_q = starts[p_lo:p_hi].copy()
        # trim the first/last partially-covered ranges — the front trim
        # must be computed BEFORE the tail trim and applied to first_q
        # directly: when one box's range spans the whole chunk
        # (p_hi == p_lo+1) the two trims hit the same p_cnt entry, and
        # deriving the front shift from cnt[p_lo] - p_cnt[0] after the
        # tail trim would shift the q-window by the tail trim too,
        # skipping some candidate slices and re-evaluating others
        front = pos - int(offsets[p_lo])
        p_cnt[0] -= front
        first_q[0] += front
        over = int(offsets[p_hi]) - hi
        if over > 0:
            p_cnt[-1] -= over
        p_idx = np.repeat(np.arange(p_lo, p_hi), p_cnt)
        base = np.concatenate(([0], np.cumsum(p_cnt)))[:-1]
        q_idx = (
            np.arange(hi - pos, dtype=np.int64)
            - np.repeat(base, p_cnt)
            + np.repeat(first_q, p_cnt)
        )
        iw = np.minimum(sx1[p_idx], sx1[q_idx]) - np.maximum(
            sx0[p_idx], sx0[q_idx]
        )
        ih = np.minimum(sy1[p_idx], sy1[q_idx]) - np.maximum(
            sy0[p_idx], sy0[q_idx]
        )
        inter = iw * ih
        # a zero-area box can never satisfy iw>0/ih>0, so the divisions
        # are masked out — silence the vectorized div-by-zero warning the
        # scalar path never reaches either
        with np.errstate(divide="ignore", invalid="ignore"):
            hit = (
                (iw > 0)
                & (ih > 0)
                & (
                    (inter / sarea[q_idx] > 0.2)
                    | (inter / sarea[p_idx] > 0.2)
                )
            )
        for p, q in zip(p_idx[hit], q_idx[hit]):
            i, j = int(order[p]), int(order[q])
            overlaps[i].add(j)
            overlaps[j].add(i)
        pos = hi
    return overlaps


def remove_overlaps_unordered(
    rects: list[PredictedBox], merge_min_confidence: float = 0.5
) -> list[PredictedBox]:
    """FullYoloSegmenter.removeOverlapsUnordered (:1030-1276): merge
    transitively-overlapping high-confidence boxes into a union bbox with
    geometric-mean confidence, then drop remaining overlaps by pairwise
    confidence dominance."""
    rects = list(rects)
    overlaps = _overlap_map(rects)

    # merge groups (fold semantics of :1086-1124)
    merge_groups: list[set[int]] = []
    for i, rect in enumerate(rects):
        if rect.confidence < merge_min_confidence:
            continue
        high_overlaps = {
            j for j in overlaps[i] if rects[j].confidence >= merge_min_confidence
        }
        if not high_overlaps:
            continue
        existing = next((g for g in merge_groups if i in g), None)
        if existing is not None:
            existing |= high_overlaps
        else:
            merge_groups.append(high_overlaps | {i})

    merged_idx = set().union(*merge_groups) if merge_groups else set()
    merged: list[PredictedBox] = [
        r for i, r in enumerate(rects) if i not in merged_idx
    ]
    for group in merge_groups:
        members = [rects[i] for i in sorted(group)]
        conf = math.exp(
            sum(math.log(m.confidence) for m in members) / len(members)
        )
        box = members[0].box
        for m in members[1:]:
            box = G.union(box, m.box)
        merged.append(PredictedBox(members[0].label, box, conf))

    # recompute overlaps over the merged set, then dominance removal
    # (:1214-1271): in list order, an un-removed box removes every
    # lower-confidence overlap; any higher-confidence overlap removes it
    overlaps2 = _overlap_map(merged)
    removed: set[int] = set()
    for i in range(len(merged)):
        if i in removed:
            continue
        candidates = overlaps2[i] - removed
        higher = {j for j in candidates if merged[j].confidence > merged[i].confidence}
        lower = {j for j in candidates if merged[j].confidence <= merged[i].confidence}
        if higher:
            removed.add(i)
        elif lower:
            removed |= lower
    return [r for i, r in enumerate(merged) if i not in removed]


# ----------------------------------------------------- placement joins
def place_in_blocks(
    block_boxes: list[Box],
    rects: list[PredictedBox],
    min_intersection: float = 0.5,
    split_horizontally: bool = False,
) -> dict[int, list[PredictedBox]]:
    """placeRectanglesInTextBlocks (FullYoloSegmenter.scala:581-709): assign
    each rect to the block with the greatest percentage intersection
    (> min_intersection); with ``split_horizontally``, assign to ALL
    blocks over the threshold, clipped horizontally to each (the
    line-placement mode, :266-272)."""
    out: dict[int, list[PredictedBox]] = {}
    for rect in rects:
        scored = sorted(
            (
                (G.area_of_intersection(bb, rect.box) / G.area(rect.box), bi)
                for bi, bb in enumerate(block_boxes)
            ),
            key=lambda t: (-t[0], t[1]),
        )
        if split_horizontally:
            for pct, bi in scored:
                if pct <= min_intersection:
                    break
                bb = block_boxes[bi]
                new_left = max(rect.box[0], bb[0])
                new_right = min(G.right(rect.box), G.right(bb))
                clipped = PredictedBox(
                    rect.label,
                    (new_left, rect.box[1], new_right - new_left, rect.box[3]),
                    rect.confidence,
                )
                out.setdefault(bi, []).append(clipped)
        else:
            if scored and scored[0][0] > min_intersection:
                out.setdefault(scored[0][1], []).append(rect)
    return out


def lines_with_rectangles(
    block_box: Box, baselines: list[tuple[int, int, int, int]]
) -> list[Box]:
    """TextBlock.textLinesWithRectangles (core/model/TextBlock.scala:22-45):
    line i spans [prev.bottom, baseline + 0.25·(next.baseline − baseline)].
    ``baselines`` are (x1, y1, x2, y2), vertically ordered."""
    rects: list[Box] = []
    for i, (x1, y1, x2, _y2) in enumerate(baselines):
        top = G.bottom(rects[-1]) if rects else block_box[1]
        if i + 1 < len(baselines):
            next_y1 = baselines[i + 1][1]
            height = (y1 - top) + int((next_y1 - y1) * 0.25)
        else:
            height = G.bottom(block_box) - top
        rects.append((x1, top, x2 - x1, height))
    return rects


def place_in_lines(
    line_rects: list[Box], rects: list[PredictedBox], left_to_right: bool
) -> dict[int, list[PredictedBox]]:
    """placeRectanglesInTextLines (:800-844): vertical-overlap containment
    (>50% of the item's area), then per line sort horizontally (BiDi) and
    remove overlaps."""
    out: dict[int, list[PredictedBox]] = {}
    for rect in rects:
        container = None
        for li, lr in enumerate(line_rects):
            if G.test_vertical_overlap(lr, rect.box) == 0:
                container = li
                break
        if container is not None:
            out.setdefault(container, []).append(rect)
    from functools import cmp_to_key

    return {
        li: remove_overlaps(
            sorted(
                items,
                key=cmp_to_key(
                    lambda a, b: G.horizontal_compare(a.box, b.box, left_to_right)
                ),
            )
        )
        for li, items in out.items()
    }


def place_in_words(
    word_boxes: list[Box], glyph_rects: list[PredictedBox], left_to_right: bool
) -> dict[int, list[PredictedBox]]:
    """placeRectanglesInWords (:846-895): horizontal-overlap containment
    with a last-container memo (glyphs arrive in reading order)."""
    out: dict[int, list[PredictedBox]] = {}
    last: int | None = None
    for rect in glyph_rects:
        container = None
        if last is not None and G.test_horizontal_overlap(
            word_boxes[last], rect.box, left_to_right
        ) == 0:
            container = last
        else:
            for wi, wb in enumerate(word_boxes):
                if G.test_horizontal_overlap(wb, rect.box, left_to_right) == 0:
                    container = wi
                    break
        if container is not None:
            out.setdefault(container, []).append(rect)
        last = container
    return out


# -------------------------------------------- glyph borders + spaces
def average_glyph_borders(
    glyph_rects: list[Box], word_box: Box
) -> list[Box]:
    """FullYoloSegmenter.scala:380-400 (RTL): borders between consecutive
    glyphs at the midpoint of (cur.left + next.right)/2; glyphs rebuilt
    spanning the word's full height."""
    if not glyph_rects:
        return []
    borders = [
        (cur[0] + G.right(nxt)) // 2
        for cur, nxt in zip(glyph_rects, glyph_rects[1:])
    ]
    rights = [G.right(glyph_rects[0])] + borders
    lefts = borders + [glyph_rects[-1][0]]
    return [
        (left, word_box[1], r - left, word_box[3])
        for r, left in zip(rights, lefts)
    ]


def infer_spaces(
    word_boxes: list[Box], left_to_right: bool
) -> list[tuple[str, Box]]:
    """Space inference (FullYoloSegmenter.scala:405-447): a space between
    consecutive words whenever the BiDi gap is positive. Returns
    ("word", box) / ("space", box) in reading order."""
    if len(word_boxes) <= 1:
        return [("word", b) for b in word_boxes]
    out: list[tuple[str, Box]] = []
    for cur, nxt in zip(word_boxes, word_boxes[1:]):
        out.append(("word", cur))
        if left_to_right:
            gap = nxt[0] - G.right(cur)
            if gap > 0:
                out.append(("space", (G.right(cur), cur[1], gap, cur[3])))
        else:
            gap = cur[0] - G.right(nxt)
            if gap > 0:
                out.append(("space", (G.right(nxt), cur[1], gap, cur[3])))
    out.append(("word", word_boxes[-1]))
    return out


# --------------------------------------------------- paragraph splitting
def split_paragraphs(
    line_entries: list[tuple[Box, int, object]],
    block_box: Box,
    paragraphs: list[Box],
) -> list[tuple[Box, list]]:
    """Paragraph splitting (FullYoloSegmenter.scala:458-551): walk lines in
    order; open a new group when the line's baseline y passes the current
    paragraph's bottom. Returns [(child_block_box, lines)] — one entry
    means no split. ``line_entries`` = [(line_rect, baseline_y, payload)]."""
    paragraphs = sorted(paragraphs, key=lambda b: (b[1], G.bottom(b)))
    if len(paragraphs) <= 1 or not line_entries:
        return [(block_box, [p for _, _, p in line_entries])]
    groups: list[list[tuple[Box, object]]] = [[]]
    p_idx = 0
    current: Box | None = paragraphs[0]
    for rect, baseline_y, payload in line_entries:
        if current is not None and baseline_y > G.bottom(current):
            if groups[-1]:
                groups.append([(rect, payload)])
            else:
                groups[-1] = [(rect, payload)]
            p_idx += 1
            current = paragraphs[p_idx] if p_idx < len(paragraphs) else None
        else:
            groups[-1].append((rect, payload))
    groups = [g for g in groups if g]
    if len(groups) <= 1:
        return [(block_box, [p for _, _, p in line_entries])]
    children: list[tuple[Box, list]] = []
    top = block_box[1]
    for g in groups:
        bot = G.bottom(g[-1][0])
        children.append(
            ((block_box[0], top, block_box[2], bot - top), [p for _, p in g])
        )
        top = bot
    # last child extends to the block's bottom (:542-545)
    last_box, last_lines = children[-1]
    children[-1] = (
        (last_box[0], last_box[1], last_box[2], G.bottom(block_box) - last_box[1]),
        last_lines,
    )
    return children



# ------------------------------------------------------- print-area crop
def print_area(block_boxes: list[Box], width: int, height: int) -> Box:
    """Page.printArea (core/model/Page.scala:72-84): bbox of all blocks."""
    if not block_boxes:
        return (0, 0, width, height)
    min_left = min(b[0] for b in block_boxes)
    min_top = min(b[1] for b in block_boxes)
    max_right = max(G.right(b) for b in block_boxes)
    max_bottom = max(G.bottom(b) for b in block_boxes)
    return (min_left, min_top, max_right - min_left, max_bottom - min_top)


def cropped_print_area(
    block_boxes: list[Box], width: int, height: int, crop_margin: float = 0.01
) -> Box:
    """Page.croppedPrintArea (:86-107): print area expanded by a relative
    margin, clamped to the page — the data-skipping step before the
    fine-grained predictions (FullYoloSegmenter.scala:110-129)."""
    pa = print_area(block_boxes, width, height)
    x_margin = int(width * crop_margin)
    y_margin = int(height * crop_margin)
    new_left = max(0, pa[0] - x_margin)
    new_top = max(0, pa[1] - y_margin)
    new_width = pa[2] + 2 * x_margin
    new_height = pa[3] + 2 * y_margin
    if new_left + new_width > width:
        new_width = width - new_left
    if new_top + new_height > height:
        new_height = height - new_top
    return (new_left, new_top, new_width, new_height)


# --------------------------------------------------------- page assembly
@dataclass
class PageLayout:
    """Predicted boxes for one page — the layout-oracle/DLA output
    (6 granularities, core/segmentation/package.scala:39-91)."""

    width: int
    height: int
    blocks: list[PredictedBox]  # labels: "text" | "illustration"
    paragraphs: list[PredictedBox] = field(default_factory=list)
    lines: list[PredictedBox] = field(default_factory=list)  # baseline-centered
    words: list[PredictedBox] = field(default_factory=list)
    glyphs: list[PredictedBox] = field(default_factory=list)


def segment_page(layout: PageLayout, left_to_right: bool = False,
                 always_retain_threshold: float = 0.5,
                 test_rectangle: "Box | None" = None) -> dict:
    """The full FullYoloSegmenter.segment flow (:61-579) on oracle boxes.

    Returns {"blocks": [...]} where each block is either
    {"kind": "illustration", "box": Box} or
    {"kind": "block", "box": Box, "paras": [{"box": Box, "lines": [...]}]}
    with lines = {"baseline_y", "box", "words": [{"box", "glyphs": [Box]},
    ("space", box) interleaved]} — structure mirrors the ALTO tree and is
    converted to spantree by the caller.
    """
    text_preds = [p for p in layout.blocks if p.label != "illustration"]
    image_preds = [p for p in layout.blocks if p.label == "illustration"]

    sorted_blocks = sort_blocks(text_preds, left_to_right, box_of=lambda p: p.box)
    without_overlaps = remove_overlaps_unordered(sorted_blocks)
    if test_rectangle is not None:
        # debug test-rectangle filter (FullYoloSegmenter.scala:193-201):
        # keep only text blocks with ANY intersection with the rectangle
        without_overlaps = [
            p
            for p in without_overlaps
            if G.area_of_intersection(p.box, test_rectangle) > 0
        ]
    block_boxes = [p.box for p in without_overlaps]

    # paragraphs: sort, de-overlap, place into blocks; orphans over the
    # retain threshold become their own blocks (:233-241)
    paras = sort_blocks(layout.paragraphs, left_to_right, box_of=lambda p: p.box)
    paras = remove_overlaps_unordered(paras)
    block_para_map = place_in_blocks(block_boxes, paras, 0.5)
    placed = {id(p) for ps in block_para_map.values() for p in ps}
    orphans = [
        p
        for p in paras
        if p.confidence > always_retain_threshold and id(p) not in placed
    ]
    all_block_boxes = block_boxes + [p.box for p in orphans]
    orphan_para_map = {
        len(block_boxes) + i: [] for i in range(len(orphans))
    }
    block_para_map.update(orphan_para_map)

    # lines: bump up by half height (baseline-centered), drop page-edge
    # violations, place split-horizontally with 1% threshold (:252-272)
    lines = [
        PredictedBox(
            p.label,
            (p.box[0], p.box[1] - p.box[3] // 2, p.box[2], p.box[3]),
            p.confidence,
        )
        for p in layout.lines
        if G.bottom(p.box) <= layout.height
    ]
    block_line_map = place_in_blocks(
        all_block_boxes, lines, 0.01, split_horizontally=True
    )

    # words: drop page-bottom words, place into blocks (:305-323)
    words = [w for w in layout.words if G.bottom(w.box) < layout.height - 1]
    block_word_map = place_in_blocks(all_block_boxes, words, 0.5)
    block_glyph_map = place_in_blocks(all_block_boxes, layout.glyphs, 0.5)

    out_blocks = []
    for bi, bb in enumerate(all_block_boxes):
        my_lines = sorted(
            (l for l in block_line_map.get(bi, [])),
            key=lambda p: (p.box[1], G.bottom(p.box)),
        )
        # clip lines to block width (:276-283), de-overlap (:287)
        clipped = [
            PredictedBox(l.label, (bb[0], l.box[1], bb[2], l.box[3]), l.confidence)
            for l in my_lines
        ]
        clipped = remove_overlaps(clipped)
        baselines = [
            (bb[0], G.bottom(l.box), G.right(bb), G.bottom(l.box)) for l in clipped
        ]
        line_rects = lines_with_rectangles(bb, baselines)

        line_word_map = place_in_lines(
            line_rects, block_word_map.get(bi, []), left_to_right
        )
        line_glyph_map = place_in_lines(
            line_rects, block_glyph_map.get(bi, []), left_to_right
        )

        line_entries = []
        for li, lrect in enumerate(line_rects):
            word_preds = line_word_map.get(li, [])
            if not word_preds:
                continue
            word_boxes = [w.box for w in word_preds]
            glyph_map = place_in_words(
                word_boxes, line_glyph_map.get(li, []), left_to_right
            )
            words_out = []
            for wi, wb in enumerate(word_boxes):
                grects = [g.box for g in glyph_map.get(wi, [])]
                if not grects:
                    continue  # drop glyph-less words (:378-381)
                words_out.append(
                    {"box": wb, "glyphs": average_glyph_borders(grects, wb)}
                )
            if not words_out:
                continue
            items = infer_spaces([w["box"] for w in words_out], left_to_right)
            by_box = {w["box"]: w for w in words_out}
            line_entries.append(
                (
                    lrect,
                    baselines[li][1],
                    {
                        "baseline_y": baselines[li][1],
                        "box": lrect,
                        "items": [
                            ("word", by_box[b]) if kind == "word" else ("space", b)
                            for kind, b in items
                        ],
                    },
                )
            )
        if not line_entries:
            continue  # drop empty blocks (:552-555)

        my_paras = [p.box for p in block_para_map.get(bi, [])]
        children = split_paragraphs(line_entries, bb, my_paras)
        if len(children) > 1:
            out_blocks.append(
                {
                    "kind": "composed",
                    "box": bb,
                    "paras": [
                        {"box": cb, "lines": lines_} for cb, lines_ in children
                    ],
                }
            )
        else:
            out_blocks.append(
                {"kind": "block", "box": bb, "lines": children[0][1]}
            )

    for p in image_preds:
        out_blocks.append({"kind": "illustration", "box": p.box})

    # final reading-order sort over text + illustration blocks (:557-561)
    out_blocks = sort_blocks(out_blocks, left_to_right, box_of=lambda b: b["box"])
    return {"width": layout.width, "height": layout.height, "blocks": out_blocks}
