"""Reading-order block sort (BlockSorter).

Port of core/graphics/BlockSorter.scala:37-139 — the non-total
comparator that orders page blocks for text extraction:

* if a "vertical break" exists between two blocks (a block horizontally
  overlapping both and vertically overlapping neither) → top-down;
* else horizontal overlap dominant → top-down;
* else vertical overlap → right-to-left (RTL scripts) / left-to-right;
* else top-down.

The Scala `.sorted` (TimSort) throws IllegalArgumentException when the
comparator turns out non-transitive and falls back to
``failSafeCompare`` (BlockSorter.scala:127-138). Python's sorted never
throws, so we run an explicit O(n²) total-order check on the result
and fall back identically — a deterministic version of the same
semantics (TimSort's detection depends on input order).
"""

from __future__ import annotations

from functools import cmp_to_key

from jochre3_ocr_spark.functions import geometry as G
from jochre3_ocr_spark.functions.geometry import Box


def _compare(a: Box, b: Box, boxes_by_top: list[Box], left_to_right: bool) -> int:
    top_block, bottom_block = (a, b) if a[1] < b[1] else (b, a)

    # blocks strictly between the two, vertically (BlockSorter.scala:49-54)
    between = [
        r
        for r in boxes_by_top
        if r[1] >= G.bottom(top_block) and r[1] < bottom_block[1]
    ]
    vertical_break = any(
        G.horizontal_overlap(r, top_block) > 0
        and G.horizontal_overlap(r, bottom_block) > 0
        and G.vertical_overlap(r, top_block) == 0
        and G.vertical_overlap(r, bottom_block) == 0
        for r in between
    )
    if vertical_break:
        return G.vertical_compare(a, b)
    h = G.horizontal_overlap(a, b)
    v = G.vertical_overlap(a, b)
    if h > 0 and h > v:
        return G.vertical_compare(a, b)
    if v > 0:
        return G.horizontal_compare(a, b, left_to_right)
    return G.vertical_compare(a, b)


def _is_total_order(items: list, cmp) -> bool:
    n = len(items)
    for i in range(n):
        for j in range(i + 1, n):
            if cmp(items[i], items[j]) > 0:
                return False
    return True


def sort_blocks(items: list, left_to_right: bool, box_of=lambda x: x) -> list:
    """BlockSorter.sort (:127-138): primary comparator, failsafe fallback.

    ``items`` may be any objects; ``box_of`` extracts their Box.
    """
    boxes_by_top = sorted((box_of(i) for i in items), key=lambda b: b[1])

    def cmp(x, y):
        return _compare(box_of(x), box_of(y), boxes_by_top, left_to_right)

    ordered = sorted(items, key=cmp_to_key(cmp))
    if _is_total_order(ordered, cmp):
        return ordered

    def fallback(x, y):
        return G.fail_safe_compare(box_of(x), box_of(y), left_to_right)

    return sorted(items, key=cmp_to_key(fallback))
