"""Corpus extractor tests — GlyphExtractor / WordExtractor /
TextLineExtractor semantics (reference core/corpus/*.scala) over the
Spark mapInPandas rebuild (sources/extractors.py)."""

import numpy as np
import pytest

from jochre3_ocr_spark.operators.spantree import Rect
from jochre3_ocr_spark.operators.transforms import (
    decode_image,
    encode_image,
    rotate_image,
)
from jochre3_ocr_spark.sources.extractors import (
    crop_alphabet,
    extract_crops,
    glyph_crop_rect,
    label_file_lines,
    lines_with_rectangles_tree,
    unrotate_rect,
)

PAGE_W, PAGE_H = 400, 300


def _alto(rotation: float = 0.0) -> str:
    """Two-line page: line 1 = two words (one with 2 glyphs), line 2 =
    word + HYP (combined-word fusion), explicit BASELINEs."""
    rot = f' ROTATION="{rotation}"' if rotation else ""
    return f"""<alto><Layout>
  <Page WIDTH="{PAGE_W}" HEIGHT="{PAGE_H}" LANG="yi" PC="0.9"{rot}>
   <PrintSpace>
    <TextBlock HPOS="10" VPOS="20" WIDTH="380" HEIGHT="200">
     <TextLine HPOS="10" VPOS="20" WIDTH="380" HEIGHT="40" BASELINE="10,60 390,60">
      <String HPOS="300" VPOS="30" WIDTH="60" HEIGHT="24" CONTENT="אב" WC="0.9">
       <Glyph HPOS="330" VPOS="30" WIDTH="30" HEIGHT="24" CONTENT="א" GC="0.8"/>
       <Glyph HPOS="300" VPOS="30" WIDTH="30" HEIGHT="24" CONTENT="ב" GC="0.7"/>
      </String>
      <SP HPOS="280" VPOS="30" WIDTH="20" HEIGHT="24"/>
      <String HPOS="200" VPOS="30" WIDTH="80" HEIGHT="24" CONTENT="גד" WC="0.8">
       <Glyph HPOS="240" VPOS="30" WIDTH="40" HEIGHT="24" CONTENT="ג" GC="0.6"/>
       <Glyph HPOS="200" VPOS="30" WIDTH="40" HEIGHT="24" CONTENT="ד" GC="0.6"/>
      </String>
     </TextLine>
     <TextLine HPOS="10" VPOS="70" WIDTH="380" HEIGHT="40" BASELINE="10,110 390,110">
      <String HPOS="320" VPOS="80" WIDTH="40" HEIGHT="24" CONTENT="הו" WC="0.7">
       <Glyph HPOS="340" VPOS="80" WIDTH="20" HEIGHT="24" CONTENT="ה" GC="0.6"/>
       <Glyph HPOS="320" VPOS="80" WIDTH="20" HEIGHT="24" CONTENT="ו" GC="0.6"/>
      </String>
      <HYP HPOS="300" VPOS="80" WIDTH="20" HEIGHT="24" CONTENT="־"/>
     </TextLine>
    </TextBlock>
   </PrintSpace>
  </Page>
 </Layout></alto>"""


def _page_image() -> np.ndarray:
    img = np.zeros((PAGE_H, PAGE_W), dtype=np.uint8)
    img[:] = np.arange(PAGE_W, dtype=np.uint32).reshape(1, -1) % 251
    return img


def _corpus_df(spark, n_pages: int = 1, rotation: float = 0.0):
    img_bytes = encode_image(_page_image())
    rows = [(f"page{p:02d}", img_bytes, _alto(rotation)) for p in range(n_pages)]
    return spark.createDataFrame(rows, "doc_id string, image binary, alto_xml string")


# ------------------------------------------------------------ pure math
def test_glyph_crop_rect_margins():
    # GlyphExtractor.scala:66-82 on (100,200,20,30)
    r = glyph_crop_rect(Rect(100, 200, 20, 30), PAGE_W, PAGE_H)
    # height=33, width=22 -> adjusted=33; margins (33-20)//2=6, (33-30)//2=1
    assert (r.left, r.top, r.width, r.height) == (94, 199, 33, 33)


def test_glyph_crop_rect_clamps_to_page():
    r = glyph_crop_rect(Rect(2, 1, 10, 40), PAGE_W, PAGE_H)
    assert r.left == 0 and r.top == 0
    assert r.right <= PAGE_W and r.bottom <= PAGE_H


def test_lines_with_rectangles_tree_baseline_fold():
    from jochre3_ocr_spark.sources.alto_xml import parse_alto

    doc = parse_alto(_alto())
    block = doc.blocks[0]
    pairs = lines_with_rectangles_tree(block)
    assert len(pairs) == 2
    (_, r0), (_, r1) = pairs
    # line0: top=block.top=20, h=(60-20)+int((110-60)*0.25)=40+12=52
    assert (r0.left, r0.top, r0.width, r0.height) == (10, 20, 380, 52)
    # line1: top=72, h=block.bottom(220)-72=148
    assert (r1.left, r1.top, r1.width, r1.height) == (10, 72, 380, 148)


def test_unrotate_rect_zero_is_identity():
    r = Rect(10, 20, 30, 40)
    assert unrotate_rect(r, 400, 300, 0.0) == r


def test_unrotate_rect_matches_imageinfo_formula():
    import math

    rot = 5.0
    r = Rect(50, 60, 100, 20)
    out = unrotate_rect(r, PAGE_W, PAGE_H, rot)
    rad = math.radians(rot)
    cx, cy = PAGE_W / 2.0, PAGE_H / 2.0
    x1 = int(cx + (50 - cx) * math.cos(rad) - (60 - cy) * math.sin(rad))
    y1 = int(cy + (50 - cx) * math.sin(rad) + (60 - cy) * math.cos(rad))
    assert (out.left, out.top) == (x1, y1)


# -------------------------------------------------------------- Spark op
def test_extract_glyph_crops(spark):
    crops = extract_crops(_corpus_df(spark), unit="glyph").collect()
    # 2+2 glyphs line1, 2 glyphs word + 1 hyphen-glyph (combined word) line2
    assert len(crops) == 7
    by_idx = {r.idx: r for r in crops}
    # first glyph of first combined word: א at (330,30,30,24)
    g0 = by_idx[0]
    assert g0.content == "א"
    exp = glyph_crop_rect(Rect(330, 30, 30, 24), PAGE_W, PAGE_H)
    assert (g0.left, g0.top, g0.width, g0.height) == (
        exp.left, exp.top, exp.width, exp.height,
    )
    # label: pageFile \t content \t l,t,w,h (GlyphExtractor.scala:98-100)
    assert g0.label_line == (
        f"page00.npy\tא\t{exp.left},{exp.top},{exp.width},{exp.height}"
    )
    assert g0.image_file == "page00.npy"
    # crop bytes decode to the exact page slice
    img = _page_image()
    sub = decode_image(bytes(g0.crop))
    np.testing.assert_array_equal(
        sub, img[exp.top : exp.bottom, exp.left : exp.right]
    )


def test_extract_word_crops_and_split(spark):
    crops = extract_crops(
        _corpus_df(spark), unit="word", validation_one_every=2
    ).collect()
    # combined words: line1 -> 2 words; line2 -> 1 (word+hyphen fused)
    assert len(crops) == 3
    by_idx = {r.idx: r for r in crops}
    assert by_idx[0].content == "אב"
    assert by_idx[2].content == "הו־"  # hyphen fused into the combined word
    # (i+1) % 2 == 0 -> val (GlyphExtractor.scala:59-66)
    assert [by_idx[i].split for i in range(3)] == ["train", "val", "train"]
    assert by_idx[1].image_file == "page00_0001.npy"
    assert by_idx[1].label_line == "page00_0001.npy\tגד"
    img = _page_image()
    w0 = by_idx[0]
    sub = decode_image(bytes(w0.crop))
    np.testing.assert_array_equal(sub, img[30:54, 300:360])


def test_extract_line_crops(spark):
    crops = extract_crops(_corpus_df(spark), unit="line").collect()
    assert len(crops) == 2
    by_idx = {r.idx: r for r in crops}
    assert by_idx[0].image_file == "page00_000.npy"
    assert (by_idx[0].left, by_idx[0].top) == (10, 20)
    assert by_idx[0].height == 52
    assert by_idx[1].content == "הו־"


def test_extract_rotation_prelude(spark):
    rot = 4.0
    crops = extract_crops(
        _corpus_df(spark, rotation=rot), unit="word"
    ).collect()
    by_idx = {r.idx: r for r in crops}
    w0 = by_idx[0]
    # coords re-mapped through Page.unrotate (ImageInfo corner rotation)
    exp = unrotate_rect(Rect(300, 30, 60, 24), PAGE_W, PAGE_H, rot)
    assert (w0.left, w0.top, w0.width, w0.height) == (
        exp.left, exp.top, exp.width, exp.height,
    )
    # crop taken from the unrotated image
    img = rotate_image(_page_image(), -rot)
    sub = decode_image(bytes(w0.crop))
    np.testing.assert_array_equal(
        sub, img[exp.top : exp.bottom, exp.left : exp.right]
    )


def test_simplifier_applied(spark):
    crops = extract_crops(
        _corpus_df(spark), unit="word", simplifier=lambda s: s.replace("ב", "X")
    ).collect()
    assert {r.content for r in crops} == {"אX", "גד", "הו־"}


def test_alphabet_union(spark):
    crops = extract_crops(_corpus_df(spark), unit="word")
    chars = {r.char for r in crop_alphabet(crops).collect()}
    assert chars == {"א", "ב", "ג", "ד", "ה", "ו", "־"}


def test_label_file_lines_order(spark):
    crops = extract_crops(_corpus_df(spark, n_pages=2), unit="word")
    lines = [r.label_line for r in label_file_lines(crops, "train").collect()]
    assert lines[0].startswith("page00_0000.npy\t")
    assert lines == sorted(lines)  # (doc_id, idx) order == lexicographic here


def test_partitioning_invariance(spark):
    df = _corpus_df(spark, n_pages=6)
    a = sorted(
        (r.doc_id, r.idx, r.label_line, r.split)
        for r in extract_crops(df.repartition(1), unit="glyph").collect()
    )
    b = sorted(
        (r.doc_id, r.idx, r.label_line, r.split)
        for r in extract_crops(df.repartition(5), unit="glyph").collect()
    )
    assert a == b and len(a) == 6 * 7


def test_unknown_unit_raises(spark):
    with pytest.raises(ValueError):
        extract_crops(_corpus_df(spark), unit="paragraph")


def test_baseline_roundtrip():
    from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto

    doc = parse_alto(_alto())
    line = doc.blocks[0].lines[0]
    assert line.baseline == (10, 60, 390, 60)
    xml = emit_alto(doc, PAGE_W, PAGE_H)
    doc2 = parse_alto(xml)
    assert doc2.blocks[0].lines[0].baseline == (10, 60, 390, 60)


# ----------------------------------------------------------- YOLO export
def _yolo(spark, objects, **kw):
    from jochre3_ocr_spark.sources.extractors import yolo_annotations

    return yolo_annotations(_corpus_df(spark), objects, **kw).collect()


def test_yolo_word_boxes_print_area_crop(spark):
    rows = _yolo(spark, ["Word"])
    assert len(rows) == 3
    # croppedPrintArea: block (10,20,380,200) + 1% margins -> origin (6,17),
    # page 388x206 (Page.scala:86-111); word1 (300,30,60,24) -> (294,13)
    r0 = sorted(rows, key=lambda r: -r.x_center)[0]
    assert r0.class_idx == 0 and r0.class_name == "Word"
    assert abs(r0.x_center - 324 / 388) < 1e-9
    assert abs(r0.y_center - 25 / 206) < 1e-9
    assert abs(r0.box_width - 60 / 388) < 1e-9
    assert abs(r0.box_height - 24 / 206) < 1e-9
    assert r0.label_line == (
        f"{0:<2} {324/388:.6f} {25/206:.6f} {60/388:.6f} {24/206:.6f}"
    )


def test_yolo_baseline_classes(spark):
    rows = _yolo(spark, ["NonFinalBaseLine", "FinalBaseLine"])
    assert [(r.class_name) for r in sorted(rows, key=lambda r: r.y_center)] == [
        "NonFinalBaseLine",
        "FinalBaseLine",
    ]
    nf = min(rows, key=lambda r: r.y_center)
    assert abs(nf.y_center - 43 / 206) < 1e-9  # baseline 60 - crop top 17


def test_yolo_glyph_separator_reference_quirk(spark):
    # pixel-valued separators are dropped by the normalized containment
    # filter (YoloAnnotator.scala:167-187 vs :258-266) — reference parity
    rows = _yolo(spark, ["Glyph", "GlyphSeparator"])
    assert {r.class_name for r in rows} == {"Glyph"}
    assert len(rows) == 7


def test_yolo_top_level_uncropped_with_margins(spark):
    rows = _yolo(spark, ["TopLevelTextBlock"])
    assert len(rows) == 1
    r = rows[0]
    assert abs(r.x_center - 0.5) < 1e-9 and abs(r.y_center - 0.4) < 1e-9
    assert abs(r.box_width - (380 / 400 + 0.01)) < 1e-9
    assert abs(r.box_height - 200 / 300) < 1e-9


def test_yolo_word_separator_geometry(spark):
    rows = _yolo(spark, ["WordSeparator"])
    assert len(rows) == 1
    r = rows[0]
    assert abs(r.x_center - 284 / 388) < 1e-9
    assert abs(r.y_center - 23 / 206) < 1e-9
    assert abs(r.box_height - 34 / 206) < 1e-9


def test_yolo_tiling_remaps_to_unit_square(spark):
    rows = _yolo(spark, ["Glyph"], tile_count=2)
    assert rows and {r.tile_idx for r in rows} != {0}
    for r in rows:
        assert -1e-9 <= r.x_center - r.box_width / 2
        assert r.x_center + r.box_width / 2 <= 1 + 1e-9
        assert r.image_file == f"{r.doc_id}_{r.tile_idx}.npy"


def test_yolo_segmentation_polygon(spark):
    rows = _yolo(spark, ["Word"], task="segmentation")
    parts = rows[0].label_line.split()
    assert len(parts) == 9  # class + 4 corner points


def test_yolo_split_by_page_index(spark):
    from jochre3_ocr_spark.sources.extractors import yolo_annotations

    df = _corpus_df(spark, n_pages=4).withColumn(
        "page_index",
        __import__("pyspark.sql.functions", fromlist=["f"]).expr(
            "cast(substring(doc_id, 5, 2) as int)"
        ),
    )
    rows = yolo_annotations(df, ["Word"], validation_one_every=2).collect()
    splits = {r.doc_id: r.split for r in rows}
    assert splits == {
        "page00": "train", "page01": "val",
        "page02": "train", "page03": "val",
    }


def test_yolo_null_page_index_clear_error(spark):
    """ADVICE r2: a null in a caller-supplied page_index column must
    fail with a clear doc-naming ValueError, not an opaque int(None)
    TypeError inside the Arrow batch."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from jochre3_ocr_spark.sources.extractors import yolo_annotations

    df = _corpus_df(spark, n_pages=2).withColumn(
        "page_index",
        F.when(F.col("doc_id") == "page00", F.lit(0)).cast("int"),
    )
    with _pytest.raises(Exception, match="page_index is null for doc_id='page01'"):
        yolo_annotations(df, ["Word"], validation_one_every=2).collect()


def test_yolo_dataset_yaml():
    from jochre3_ocr_spark.sources.extractors import yolo_dataset_yaml

    y = yolo_dataset_yaml(["Word", "Glyph"])
    assert "  0: Word\n  1: Glyph\n" in y
    assert y.startswith("path: dataset")


# ------------------------------------------------- other corpus annotators
def test_alto_to_text(spark):
    from jochre3_ocr_spark.sources.extractors import alto_to_text

    rows = alto_to_text(_corpus_df(spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.content == "אב גד\nהו־"  # Page.content: lines joined by \n
    assert r.simplified_content is not None
    none_rows = alto_to_text(_corpus_df(spark), simplifier=None).collect()
    assert none_rows[0].simplified_content is None


def test_merge_yiddish_glyph_pairs():
    from jochre3_ocr_spark.operators.alto_rules import (
        merge_yiddish_glyph_pairs,
    )
    from jochre3_ocr_spark.operators.spantree import Glyph, Rect, Word

    w = Word(
        content="איַל",
        rect=Rect(0, 0, 30, 10),
        glyphs=[
            Glyph("א", Rect(20, 0, 10, 10), 0.9),
            Glyph("י", Rect(12, 0, 8, 10), 0.9),
            Glyph("יַ", Rect(4, 0, 8, 10), 0.9),
            Glyph("ל", Rect(0, 0, 4, 10), 0.9),
        ],
        confidence=0.9,
    )
    out = merge_yiddish_glyph_pairs(w)  # default: pasekh-tsvey-yudn only
    assert [g.content for g in out.glyphs] == ["א", "ײַ", "ל"]
    assert out.content == "אײַל"
    g = out.glyphs[1]
    assert (g.rect.left, g.rect.width, g.confidence) == (4, 16, 1.0)
    # flag off -> untouched
    same = merge_yiddish_glyph_pairs(w, pasekh_tsvey_yudn=False)
    assert same is w


def test_merge_tsvey_vovn_chain():
    from jochre3_ocr_spark.operators.alto_rules import (
        merge_yiddish_glyph_pairs,
    )
    from jochre3_ocr_spark.operators.spantree import Glyph, Rect, Word

    w = Word(
        content="וו",
        rect=Rect(0, 0, 20, 10),
        glyphs=[
            Glyph("ו", Rect(10, 0, 10, 10), 0.9),
            Glyph("ו", Rect(0, 0, 10, 10), 0.9),
        ],
        confidence=0.9,
    )
    out = merge_yiddish_glyph_pairs(w, tsvey_vovn=True)
    assert [g.content for g in out.glyphs] == ["װ"]
    assert out.content == "װ"


def test_transform_corpus_roundtrip(spark):
    from jochre3_ocr_spark.sources.extractors import transform_corpus
    from jochre3_ocr_spark.sources.alto_xml import parse_alto

    xml = """<alto><Layout><Page WIDTH="100" HEIGHT="50">
      <TextBlock HPOS="0" VPOS="0" WIDTH="100" HEIGHT="50">
       <TextLine HPOS="0" VPOS="0" WIDTH="100" HEIGHT="20">
        <String HPOS="10" VPOS="0" WIDTH="30" HEIGHT="20" CONTENT="איַ" WC="0.9">
         <Glyph HPOS="30" VPOS="0" WIDTH="10" HEIGHT="20" CONTENT="א" GC="0.9"/>
         <Glyph HPOS="20" VPOS="0" WIDTH="10" HEIGHT="20" CONTENT="י" GC="0.9"/>
         <Glyph HPOS="10" VPOS="0" WIDTH="10" HEIGHT="20" CONTENT="יַ" GC="0.9"/>
        </String>
       </TextLine>
      </TextBlock>
     </Page></Layout></alto>"""
    df = spark.createDataFrame(
        [("d0", xml)], "doc_id string, alto_xml string"
    )
    out = transform_corpus(df).collect()[0]
    doc = parse_alto(out.alto_xml)
    word = doc.blocks[0].lines[0].words[0]
    assert word.content == "אײַ"
    assert [g.content for g in word.glyphs] == ["א", "ײַ"]


def test_rotation_annotations(spark):
    from jochre3_ocr_spark.sources.extractors import rotation_annotations

    rows = rotation_annotations(
        _corpus_df(spark, n_pages=2, rotation=-1.094), image_size=100,
        validation_one_every=2,
    ).collect()
    assert len(rows) == 2
    by_id = {r.doc_id: r for r in rows}
    r = by_id["page00"]
    assert r.rotation_label == "-1.09"  # %.2f (RotationAnnotator.scala:86-100)
    assert r.split == "train" and by_id["page01"].split == "val"
    img = decode_image(bytes(r.image))
    # 400x300 -> w>h -> (75, 100)
    assert img.shape == (75, 100)
    assert r.label_file == "page00.txt"


def test_word_to_glyph_annotations(spark):
    from jochre3_ocr_spark.sources.extractors import word_to_glyph_annotations

    rows = word_to_glyph_annotations(_corpus_df(spark)).collect()
    # 7 glyphs over 3 combined words (hyphen glyph included in word 2)
    assert len(rows) == 7
    # word0 "אב" rect (300,30,60,24); glyph א (330,30,30,24)
    r = next(
        x for x in rows if x.word_idx == 0 and x.glyph_idx == 0
    )
    assert abs(r.x_center - (330 + 15 - 300) / 60) < 1e-9
    assert abs(r.y_center - 0.5) < 1e-9
    assert abs(r.box_width - 0.5) < 1e-9
    assert abs(r.box_height - 1.0) < 1e-9
    assert r.label_line == f"{0:<2} {45/60:.6f} {0.5:.6f} {0.5:.6f} {1.0:.6f}"
    assert r.image_file == "page00_0000.npy"
    # clamp: hyphen glyph exactly fills its word slice -> within [0,1]
    for x in rows:
        assert x.box_width <= 1.0 + 1e-12 and x.box_height <= 1.0 + 1e-12


def test_yolo_dimensionless_page_contributes_nothing(spark):
    from jochre3_ocr_spark.sources.extractors import yolo_annotations

    df = spark.createDataFrame(
        [("d0", "<alto/>", 0)],
        "doc_id string, alto_xml string, page_index int",
    )
    assert yolo_annotations(df, ["Word"]).count() == 0


# --------------------------------------------------- review-pass fixes
def test_yolo_rotation_prelude(spark):
    """CorpusAnnotator's default RotationTransformer applies to the YOLO
    annotator too: boxes are computed on the unrotated page."""
    from jochre3_ocr_spark.sources.extractors import (
        unrotate_rect,
        yolo_annotations,
    )

    rot = 3.0
    df = spark.createDataFrame(
        [("d0", _alto(rotation=rot), 0)],
        "doc_id string, alto_xml string, page_index int",
    )
    rows = yolo_annotations(df, ["TopLevelTextBlock"]).collect()
    assert len(rows) == 1
    r = rows[0]
    exp = unrotate_rect(Rect(10, 20, 380, 200), PAGE_W, PAGE_H, rot)
    assert abs(r.x_center - (exp.left + exp.width / 2.0) / PAGE_W) < 1e-9
    assert abs(r.box_width - (exp.width / PAGE_W + 0.01)) < 1e-9


def test_labels_only_dimensionless_page_skipped(spark):
    df = spark.createDataFrame(
        [("d0", None, "<alto><Layout><Page><PrintSpace>"
          '<TextBlock HPOS="0" VPOS="0" WIDTH="10" HEIGHT="10">'
          '<TextLine HPOS="0" VPOS="0" WIDTH="10" HEIGHT="10">'
          '<String HPOS="0" VPOS="0" WIDTH="5" HEIGHT="5" CONTENT="x" WC="1"/>'
          "</TextLine></TextBlock></PrintSpace></Page></Layout></alto>")],
        "doc_id string, image binary, alto_xml string",
    )
    assert extract_crops(df, unit="glyph").count() == 0


def test_rotation_annotations_null_image_row(spark):
    from jochre3_ocr_spark.sources.extractors import rotation_annotations

    df = spark.createDataFrame(
        [("d0", None, _alto(rotation=2.0), 0)],
        "doc_id string, image binary, alto_xml string, page_index int",
    )
    rows = rotation_annotations(df).collect()
    assert len(rows) == 1
    assert rows[0].rotation_label == "2.00" and rows[0].image is None


def test_default_page_index_shared_for_duplicate_doc_ids(spark):
    from jochre3_ocr_spark.sources.extractors import _with_page_index

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x")],
        "doc_id string, alto_xml string",
    )
    rows = _with_page_index(df.repartition(3), ["doc_id", "alto_xml"]).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.page_index)
    assert by_doc == {"a": {0}, "b": {1}}


def test_emit_line_box_attrs_roundtrip():
    from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto

    doc = parse_alto(_alto())
    xml = emit_alto(doc, PAGE_W, PAGE_H)
    doc2 = parse_alto(xml)
    l0 = doc2.blocks[0].lines[0]
    assert (l0.rect.left, l0.rect.top, l0.rect.width, l0.rect.height) == (
        10, 20, 380, 40,
    )
