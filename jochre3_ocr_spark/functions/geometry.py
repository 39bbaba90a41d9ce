"""Rectangle algebra and box orderings.

Ports the semantics of core/graphics/Rectangle.scala:8-222 and
WithRectangle.scala:18-56. Boxes are (left, top, width, height) int
tuples; predicted boxes carry (label, box, confidence). Page-level box
counts are 10²–10⁴, so plain-Python/numpy-lite is fine inside per-doc
kernels (SURVEY.md §4: the reference's binary-search candidate pruning
is replaced by direct interval tests at this scale).
"""

from __future__ import annotations

from dataclasses import dataclass

Box = tuple[int, int, int, int]  # left, top, width, height


def right(b: Box) -> int:
    return b[0] + b[2]


def bottom(b: Box) -> int:
    return b[1] + b[3]


def area(b: Box) -> int:
    return b[2] * b[3]


def contains(a: Box, b: Box) -> bool:
    """Rectangle.contains (:23-25)."""
    return (
        a[0] <= b[0]
        and a[1] <= b[1]
        and right(a) >= right(b)
        and bottom(a) >= bottom(b)
    )


def intersection(a: Box, b: Box) -> Box | None:
    """Rectangle.intersection (:27-36) — strict inequality (zero-area
    touching boxes do not intersect)."""
    max_left = max(a[0], b[0])
    max_top = max(a[1], b[1])
    min_right = min(right(a), right(b))
    min_bottom = min(bottom(a), bottom(b))
    if max_top < min_bottom and max_left < min_right:
        return (max_left, max_top, min_right - max_left, min_bottom - max_top)
    return None


def union(a: Box, b: Box) -> Box:
    """Rectangle.union (:38-44)."""
    left = min(a[0], b[0])
    top = min(a[1], b[1])
    return (
        left,
        top,
        max(right(a), right(b)) - left,
        max(bottom(a), bottom(b)) - top,
    )


def area_of_intersection(a: Box, b: Box) -> float:
    i = intersection(a, b)
    return float(area(i)) if i else 0.0


def percentage_intersection(a: Box, b: Box) -> float:
    """Fraction of a's area covered by b (Rectangle.scala:49-50)."""
    return area_of_intersection(a, b) / float(area(a)) if area(a) else 0.0


def iou(a: Box, b: Box) -> float:
    inter = area_of_intersection(a, b)
    un = area(a) + area(b) - inter
    return inter / un if un else 0.0


def vertical_overlap(a: Box, b: Box) -> int:
    """WithRectangle.verticalOverlap (:18-27)."""
    v = min(bottom(a), bottom(b)) - max(a[1], b[1])
    return v if v > 0 else 0


def horizontal_overlap(a: Box, b: Box) -> int:
    """WithRectangle.horizontalOverlap (:29-38)."""
    h = min(right(a), right(b)) - max(a[0], b[0])
    return h if h > 0 else 0


def vertical_compare(a: Box, b: Box) -> int:
    """Rectangle.verticalCompare (:106-112): by top, then bottom."""
    if a[1] != b[1]:
        return -1 if a[1] < b[1] else 1
    ab, bb = bottom(a), bottom(b)
    if ab != bb:
        return -1 if ab < bb else 1
    return 0


def horizontal_compare(a: Box, b: Box, left_to_right: bool) -> int:
    """Rectangle.horizontalCompare (:90-104): LTR by left asc then right;
    RTL by right desc then left desc."""
    if left_to_right:
        if a[0] != b[0]:
            return 1 if a[0] > b[0] else -1
        ar, br = right(a), right(b)
        if ar != br:
            return -1 if ar < br else 1
        return 0
    ar, br = right(a), right(b)
    if ar != br:
        return -1 if ar > br else 1
    if a[0] != b[0]:
        return 1 if a[0] < b[0] else -1
    return 0


def fail_safe_compare(a: Box, b: Box, left_to_right: bool) -> int:
    """Rectangle.failSafeCompare (:114-120)."""
    v = vertical_compare(a, b)
    return v if v != 0 else horizontal_compare(a, b, left_to_right)


def test_vertical_overlap(a: Box, b: Box) -> int:
    """Rectangle.testVerticalOverlap (:125-134): 0 when a covers >50% of
    b's area; −1 check later candidates; 1 check earlier."""
    if a[1] >= bottom(b):
        return 1
    if bottom(a) <= b[1]:
        return -1
    if area_of_intersection(a, b) / float(area(b)) > 0.5:
        return 0
    if a[1] != b[1]:
        return -1 if a[1] < b[1] else 1
    if bottom(a) != bottom(b):
        return -1 if bottom(a) < bottom(b) else 1
    return -1


def test_horizontal_overlap(a: Box, b: Box, left_to_right: bool) -> int:
    """Rectangle.testHorizontalOverlap (:139-159)."""
    if left_to_right:
        if right(a) >= b[0]:
            return 1
        if a[0] <= right(b):
            return -1
        if area_of_intersection(a, b) / float(area(b)) > 0.5:
            return 0
        if a[0] != b[0]:
            return -1 if a[0] > b[0] else 1
        if right(a) != right(b):
            return 1 if right(a) < right(b) else -1
        return -1
    if a[0] >= right(b):
        return -1
    if right(a) <= b[0]:
        return 1
    if area_of_intersection(a, b) / float(area(b)) > 0.5:
        return 0
    if right(a) != right(b):
        return 1 if right(a) > right(b) else -1
    if a[0] != b[0]:
        return -1 if a[0] < b[0] else 1
    return -1


def tile(b: Box, horizontal_tiles: int, vertical_tiles: int, margin: float = 0.25):
    """Rectangle.tile (:181-202): overlapping tiles clipped to the box
    (used for glyph prediction fan-out)."""
    height_seg = b[3] // vertical_tiles
    v_margin = int(height_seg * margin)
    width_seg = b[2] // horizontal_tiles
    h_margin = int(width_seg * margin)
    out = []
    for i in range(horizontal_tiles):
        for j in range(vertical_tiles):
            t = (
                i * width_seg - h_margin,
                j * height_seg - v_margin,
                width_seg + 2 * h_margin,
                height_seg + 2 * v_margin,
            )
            clipped = intersection(t, b)
            if clipped:
                out.append(clipped)
    return out


@dataclass(frozen=True)
class PredictedBox:
    """core/graphics/PredictedRectangle.scala:3."""

    label: str
    box: Box
    confidence: float
