"""Segmentation operator tests: NMS, merge, placement joins, spaces,
glyph borders, paragraph split, BlockSorter — pinned by the reference's
documented behaviors (FullYoloSegmenter.scala, BlockSorter.scala)."""

import pytest

from jochre3_ocr_spark.functions import geometry as G
from jochre3_ocr_spark.functions.geometry import PredictedBox
from jochre3_ocr_spark.functions.reading_order import sort_blocks
from jochre3_ocr_spark.operators import segmentation as S
from jochre3_ocr_spark.sources.layout_oracle import (
    build_page,
    glyph_content_lookup,
)


def PB(label, l, t, w, h, c):
    return PredictedBox(label, (l, t, w, h), c)


# --- geometry (Rectangle.scala) ------------------------------------------
def test_rectangle_algebra():
    a, b = (0, 0, 100, 100), (50, 50, 100, 100)
    assert G.area_of_intersection(a, b) == 2500.0
    assert G.union(a, b) == (0, 0, 150, 150)
    assert G.iou(a, b) == 2500.0 / 17500.0
    assert G.percentage_intersection(a, b) == 0.25
    assert G.contains((0, 0, 200, 200), a)
    assert not G.contains(a, (0, 0, 200, 200))
    # zero-area touching boxes do not intersect (strict inequality)
    assert G.area_of_intersection((0, 0, 10, 10), (10, 0, 10, 10)) == 0.0


def test_tile_overlapping():
    tiles = G.tile((0, 0, 1000, 800), 2, 2, 0.125)
    assert len(tiles) == 4
    # tiles overlap: total area exceeds the box area
    assert sum(G.area(t) for t in tiles) > 1000 * 800


# --- ordered NMS (FullYoloSegmenter.scala:993-1028) ------------------------
def test_remove_overlaps_keeps_best():
    rects = [
        PB("w", 0, 0, 100, 30, 0.6),
        PB("w", 5, 2, 100, 30, 0.9),  # overlaps head — higher confidence wins
        PB("w", 200, 0, 100, 30, 0.8),
    ]
    out = S.remove_overlaps(rects)
    assert [r.confidence for r in out] == [0.9, 0.8]


def test_remove_overlaps_prefix_semantics():
    # the group is the longest overlapping PREFIX: a non-overlapping box
    # shields later overlaps (faithful to the reference's span())
    rects = [
        PB("w", 0, 0, 100, 30, 0.6),
        PB("w", 200, 0, 100, 30, 0.8),  # breaks the prefix
        PB("w", 5, 2, 100, 30, 0.9),  # overlaps rects[0] but not grouped
    ]
    out = S.remove_overlaps(rects)
    assert len(out) == 3


# --- unordered merge (:1030-1276) -------------------------------------------
def test_merge_high_confidence_overlaps():
    rects = [
        PB("b", 0, 0, 100, 100, 0.9),
        PB("b", 0, 75, 100, 100, 0.8),  # 25% overlap, both ≥0.5 → merged
    ]
    out = S.remove_overlaps_unordered(rects)
    assert len(out) == 1
    assert out[0].box == (0, 0, 100, 175)
    assert out[0].confidence == pytest.approx((0.9 * 0.8) ** 0.5)


def test_dominance_removes_low_confidence():
    rects = [
        PB("b", 0, 0, 100, 100, 0.9),
        PB("b", 10, 10, 100, 100, 0.3),  # overlap, low conf → removed
        PB("b", 500, 0, 100, 100, 0.7),
    ]
    out = S.remove_overlaps_unordered(rects)
    assert [r.confidence for r in out] == [0.9, 0.7]


# --- placement joins ----------------------------------------------------------
def test_place_in_blocks_max_overlap():
    blocks = [(0, 0, 100, 200), (120, 0, 100, 200)]
    rects = [PB("w", 10, 10, 50, 20, 0.9), PB("w", 130, 50, 50, 20, 0.9),
             PB("w", 300, 0, 50, 20, 0.9)]  # orphan
    placed = S.place_in_blocks(blocks, rects, 0.5)
    assert sorted(placed) == [0, 1]
    assert placed[0][0].box[0] == 10 and placed[1][0].box[0] == 130


def test_place_in_blocks_split_horizontally():
    blocks = [(0, 0, 100, 200), (100, 0, 100, 200)]
    # a line spanning both blocks is clipped into each
    placed = S.place_in_blocks(
        blocks, [PB("l", 10, 10, 180, 20, 0.9)], 0.01, split_horizontally=True
    )
    assert set(placed) == {0, 1}
    assert placed[0][0].box == (10, 10, 90, 20)
    assert placed[1][0].box == (100, 10, 90, 20)


def test_lines_with_rectangles():
    # TextBlock.scala:22-45: [prev.bottom, baseline + 0.25·gap]
    block = (0, 0, 100, 300)
    baselines = [(0, 50, 100, 50), (0, 150, 100, 150)]
    rects = S.lines_with_rectangles(block, baselines)
    assert rects[0] == (0, 0, 100, 75)  # 50-0 + 0.25*100 = 75
    assert rects[1] == (0, 75, 100, 225)  # extends to block bottom


def test_place_in_words_rtl_with_memo():
    # RTL words: word 0 on the right
    words = [(100, 0, 50, 30), (20, 0, 50, 30)]
    glyphs = [
        PB("g", 130, 0, 20, 30, 0.9),
        PB("g", 105, 0, 20, 30, 0.9),
        PB("g", 45, 0, 20, 30, 0.9),
        PB("g", 22, 0, 20, 30, 0.9),
    ]
    placed = S.place_in_words(words, glyphs, left_to_right=False)
    assert len(placed[0]) == 2 and len(placed[1]) == 2


# --- glyph borders / spaces ---------------------------------------------------
def test_average_glyph_borders_rtl():
    word = (0, 0, 60, 30)
    glyphs = [(40, 2, 20, 26), (20, 2, 20, 26), (0, 2, 20, 26)]
    out = S.average_glyph_borders(glyphs, word)
    # contiguous coverage of the word box, full height
    assert out[0][1] == 0 and out[0][3] == 30
    assert G.right(out[0]) == 60
    assert out[-1][0] == 0
    for cur, nxt in zip(out, out[1:]):
        assert cur[0] == G.right(nxt)


def test_infer_spaces_rtl():
    words = [(100, 0, 50, 30), (20, 0, 50, 30)]  # gap 100-70=30
    items = S.infer_spaces(words, left_to_right=False)
    kinds = [k for k, _ in items]
    assert kinds == ["word", "space", "word"]
    assert items[1][1] == (70, 0, 30, 30)


def test_infer_spaces_no_gap():
    words = [(50, 0, 50, 30), (0, 0, 50, 30)]
    assert [k for k, _ in S.infer_spaces(words, False)] == ["word", "word"]


# --- paragraph splitting --------------------------------------------------------
def test_split_paragraphs():
    block = (0, 0, 100, 300)
    lines = [((0, 0, 100, 50), 40, "l1"), ((0, 50, 100, 50), 90, "l2"),
             ((0, 100, 100, 50), 140, "l3")]
    paras = [(0, 0, 100, 100), (0, 100, 100, 200)]
    children = S.split_paragraphs(lines, block, paras)
    assert len(children) == 2
    assert children[0][1] == ["l1", "l2"]
    assert children[1][1] == ["l3"]
    assert G.bottom(children[1][0]) == 300  # last child extends to block bottom


def test_split_paragraphs_single():
    block = (0, 0, 100, 300)
    lines = [((0, 0, 100, 50), 40, "l1")]
    assert S.split_paragraphs(lines, block, [(0, 0, 100, 300)]) == [
        (block, ["l1"])
    ]


# --- BlockSorter (BlockSorter.scala doc example, :5-36) -------------------------
def test_block_sorter_doc_example():
    """The 9-block figure from the BlockSorter doc comment (RTL)."""
    b1 = (120, 0, 60, 40)
    b2 = (60, 0, 60, 40)
    b3 = (60, 40, 120, 40)   # vertical break over 2/4 region
    b4 = (120, 80, 60, 80)
    b5 = (60, 80, 60, 40)
    b6 = (0, 0, 60, 120)
    b7 = (0, 120, 120, 40)   # vertical break over 6/8
    b8 = (60, 160, 60, 40)
    b9 = (0, 160, 60, 40)
    blocks = [b4, b7, b1, b9, b3, b6, b8, b2, b5]
    ordered = sort_blocks(blocks, left_to_right=False)
    expect = [b1, b2, b3, b4, b5, b6, b7, b8, b9]
    assert ordered == expect


def test_block_sorter_fallback_is_deterministic():
    blocks = [(0, 0, 10, 10), (5, 5, 10, 10), (2, 2, 10, 10)]
    a = sort_blocks(blocks, left_to_right=False)
    b = sort_blocks(list(reversed(blocks)), left_to_right=False)
    assert a == b


# --- end-to-end page segmentation over the layout oracle -----------------------
@pytest.mark.parametrize("doc_index", [0, 1, 2, 3, 7])
def test_segment_page_reconstructs_ground_truth(doc_index):
    layout, gt = build_page(doc_index, 0)
    seg = S.segment_page(layout, left_to_right=False)
    text_blocks = [b for b in seg["blocks"] if b["kind"] in ("block", "composed")]
    illus = [b for b in seg["blocks"] if b["kind"] == "illustration"]
    assert len(illus) == len(gt["illustrations"])
    # block count preserved (merges/duplicates resolved back to truth)
    assert len(text_blocks) == len(gt["blocks"])

    lookup = glyph_content_lookup(gt)
    # align segmented blocks to ground truth by vertical order of boxes
    def key(b):
        return (b["box"][1], b["box"][0])

    gt_sorted = sorted(gt["blocks"], key=lambda b: (b["box"][1], b["box"][0]))
    seg_sorted = sorted(text_blocks, key=key)
    for gt_block, seg_block in zip(gt_sorted, seg_sorted):
        seg_lines = (
            seg_block["lines"]
            if seg_block["kind"] == "block"
            else [l for p in seg_block["paras"] for l in p["lines"]]
        )
        assert len(seg_lines) == len(gt_block["lines"])
        for gt_line, seg_line in zip(gt_block["lines"], seg_lines):
            seg_words = [it for it in seg_line["items"] if it[0] == "word"]
            assert len(seg_words) == len(gt_line["words"])
            # spaces between every pair of words (oracle uses uniform gaps)
            kinds = [k for k, _ in seg_line["items"]]
            assert kinds.count("space") == len(seg_words) - 1
            for gt_word, (_, seg_word) in zip(gt_line["words"], seg_words):
                assert len(seg_word["glyphs"]) == len(gt_word["glyphs"])


def test_segment_page_deterministic():
    layout, _ = build_page(5, 0)
    a = S.segment_page(layout, False)
    b = S.segment_page(layout, False)
    assert a == b


def test_cropped_print_area():
    """Page.croppedPrintArea (Page.scala:86-107): bbox of blocks + 1%
    margin, clamped to the page."""
    blocks = [(100, 200, 300, 400), (500, 100, 200, 300)]
    pa = S.print_area(blocks, 1000, 2000)
    assert pa == (100, 100, 600, 500)
    cropped = S.cropped_print_area(blocks, 1000, 2000, 0.01)
    assert cropped == (90, 80, 620, 540)
    # clamps at page edges
    assert S.cropped_print_area([(0, 0, 1000, 2000)], 1000, 2000, 0.01) == (
        0, 0, 1000, 2000,
    )
    # no blocks → full page
    assert S.print_area([], 1000, 2000) == (0, 0, 1000, 2000)


def test_segment_page_paragraph_split_to_composed():
    """A block whose paragraph predictions split it → ComposedBlock with
    one child per paragraph (FullYoloSegmenter.scala:458-551 e2e)."""
    from jochre3_ocr_spark.operators.segmentation import PageLayout, segment_page

    block = PB("text", 100, 100, 800, 400, 0.95)
    # two stacked paragraph boxes inside the block
    paras = [PB("para", 100, 100, 800, 200, 0.9), PB("para", 100, 300, 800, 200, 0.9)]
    lines, words, glyphs = [], [], []
    for i, baseline_y in enumerate((160, 240, 360, 440)):
        lines.append(PB("line", 110, baseline_y - 15, 780, 30, 0.9))
        wb = (700, baseline_y - 26, 60, 30)
        words.append(PredictedBox("word", wb, 0.9))
        for k in range(3):
            glyphs.append(PredictedBox("g", (700 + k * 20, wb[1], 20, 30), 0.9))
    layout = PageLayout(
        width=1000, height=600, blocks=[block], paragraphs=paras,
        lines=lines, words=words, glyphs=glyphs,
    )
    seg = segment_page(layout, left_to_right=False)
    composed = [b for b in seg["blocks"] if b["kind"] == "composed"]
    assert len(composed) == 1
    assert len(composed[0]["paras"]) == 2
    assert [len(p["lines"]) for p in composed[0]["paras"]] == [2, 2]


def test_para_spans_round_trip():
    """Input docs containing para spans (composed blocks) parse and
    flatten losslessly."""
    from jochre3_ocr_spark.operators.spantree import flatten, parse_spans

    spans = [
        ("block", None, None, 0),
        ("para", None, None, 1),
        ("line", None, None, 2),
        ("word", "אַ", None, 3),
        ("para", None, None, 4),
        ("line", None, None, 5),
        ("word", "בױם", None, 6),
    ]
    doc = parse_spans("d", spans)
    out = flatten(doc, remove_glyphs=True)
    assert [k for k, *_ in out] == [
        "block", "para", "line", "word", "para", "line", "word",
    ]
    assert doc.content.count("\n\n") == 1  # composed children joined \n\n


def test_segment_page_test_rectangle_filter():
    """Debug test-rectangle filter (FullYoloSegmenter.scala:193-201):
    only text blocks intersecting the rectangle survive."""
    from jochre3_ocr_spark.operators.segmentation import (
        PageLayout,
        PredictedBox,
        segment_page,
    )

    layout = PageLayout(
        width=400,
        height=400,
        blocks=[
            PredictedBox("text", (0, 0, 100, 100), 0.9),
            PredictedBox("text", (0, 200, 100, 100), 0.9),
        ],
        lines=[
            PredictedBox("line", (0, 60, 100, 20), 0.9),
            PredictedBox("line", (0, 260, 100, 20), 0.9),
        ],
        words=[
            PredictedBox("word", (10, 40, 40, 20), 0.9),
            PredictedBox("word", (10, 240, 40, 20), 0.9),
        ],
        glyphs=[
            PredictedBox("g", (12, 42, 10, 16), 0.9),
            PredictedBox("g", (12, 242, 10, 16), 0.9),
        ],
    )
    full = segment_page(layout)
    assert len(full["blocks"]) == 2
    filtered = segment_page(layout, test_rectangle=(0, 0, 50, 50))
    assert len(filtered["blocks"]) == 1
    assert filtered["blocks"][0]["box"][1] == 0  # the intersecting block


# ------------- sweep-line overlap map (VERDICT r3 item 6) -------------
def _rand_rects(n, W=2000, H=3000, maxw=120, maxh=60, seed=1):
    import random

    from jochre3_ocr_spark.functions.geometry import PredictedBox

    rng = random.Random(seed)
    return [
        PredictedBox(
            "b",
            (
                rng.randrange(0, W),
                rng.randrange(0, H),
                rng.randrange(1, maxw),
                rng.randrange(1, maxh),
            ),
            round(rng.random(), 3),
        )
        for _ in range(n)
    ]


def test_overlap_map_sweep_equals_quadratic():
    """The sweep-line candidate generator must reproduce the literal
    O(n²) reference scan exactly — random layouts plus the adversarial
    shapes (same-column stacks, identical boxes, exact edge-touching
    where intersection is zero-width)."""
    from jochre3_ocr_spark.functions.geometry import PredictedBox
    from jochre3_ocr_spark.operators.segmentation import (
        _overlap_map_quadratic,
        _overlap_map_sweep,
    )

    fixtures = {
        "random": _rand_rects(400),
        "dense": _rand_rects(500, W=300, H=300, seed=7),
        "vstack": [
            PredictedBox("b", (100, 30 * i, 200, 40), 0.5 + 0.001 * i)
            for i in range(300)
        ],
        "identical": [
            PredictedBox("b", (10, 10, 50, 50), 0.9) for _ in range(80)
        ],
        "touching": [
            PredictedBox("b", (50 * i, 10, 50, 50), 0.7) for i in range(300)
        ],
    }
    for name, rects in fixtures.items():
        assert _overlap_map_sweep(rects) == _overlap_map_quadratic(rects), name


def test_overlap_map_sweep_multi_chunk_parity(monkeypatch):
    """Force the chunked candidate evaluation to split every box's
    candidate range across several chunks (ADVICE r4: the front trim of
    a range spanning a whole chunk used to be derived AFTER the tail
    trim, shifting the q-window and silently dropping pairs when
    p_hi == p_lo + 1). Shrinking _SWEEP_CHUNK makes the production-only
    multi-chunk path run in-test; output must equal the quadratic oracle
    at every chunk size, including chunk=1 (one candidate per chunk,
    maximal trim interaction) and a hot-slab layout where single boxes
    own ranges much larger than the chunk."""
    from jochre3_ocr_spark.functions.geometry import PredictedBox
    from jochre3_ocr_spark.operators import segmentation as S

    fixtures = {
        "random": _rand_rects(200, seed=11),
        "dense": _rand_rects(250, W=300, H=300, seed=13),
        "identical": [
            PredictedBox("b", (10, 10, 50, 50), 0.9) for _ in range(60)
        ],
        # every box shares one x-slab → each box's candidate range is
        # ~the whole tail, far larger than the shrunken chunk
        "hot_slab": [
            PredictedBox("b", (100, 7 * i, 400, 30), 0.5) for i in range(120)
        ],
    }
    for name, rects in fixtures.items():
        want = S._overlap_map_quadratic(rects)
        for chunk in (1, 7, 64, 1000):
            monkeypatch.setattr(S, "_SWEEP_CHUNK", chunk)
            assert S._overlap_map_sweep(rects) == want, (name, chunk)


def test_remove_overlaps_unordered_identical_across_paths(monkeypatch):
    """remove_overlaps_unordered output must not depend on which overlap
    map implementation the size dispatch picks."""
    from jochre3_ocr_spark.operators import segmentation as S

    rects = _rand_rects(350, W=600, H=600, seed=3)
    monkeypatch.setattr(S, "_SWEEP_THRESHOLD", 10**9)
    via_quadratic = S.remove_overlaps_unordered(rects)
    monkeypatch.setattr(S, "_SWEEP_THRESHOLD", 0)
    via_sweep = S.remove_overlaps_unordered(rects)
    assert [
        (r.label, r.box, r.confidence) for r in via_quadratic
    ] == [(r.label, r.box, r.confidence) for r in via_sweep]


def test_overlap_map_sweep_scales_to_dense_tiling():
    """A 20k-box glyph tiling (the 10⁵-box stall case scaled for CI —
    the full 10⁵ micro-bench is recorded in SCALE.md §7) through the
    sweep path: correct sparse result, no quadratic blowup."""
    from jochre3_ocr_spark.functions.geometry import PredictedBox
    from jochre3_ocr_spark.operators.segmentation import _overlap_map_sweep

    rects = [
        PredictedBox("g", (g * 18, line * 24, 20, 22), 0.8)
        for line in range(50)
        for g in range(400)
    ]
    # neighbors overlap 2px of 20 → 10% < 20% threshold: map is empty
    m = _overlap_map_sweep(rects)
    assert sum(len(v) for v in m.values()) == 0
