"""Image transform + multimodal plumbing tests (SURVEY.md §2.2)."""

import numpy as np
import pytest

from jochre3_ocr_spark.operators import transforms as T
from jochre3_ocr_spark.operators.multimodal import make_text_image
from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto


def test_grayscale_weights():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[..., 2] = 255  # pure red (BGR)
    assert T.grayscale(img)[0, 0] == round(0.299 * 255)


def test_brightness_contrast_saturates():
    img = np.array([[100, 200]], dtype=np.uint8)
    out = T.brightness_contrast(img, 1.8, 20)
    assert out[0, 0] == 200  # 1.8*100+20
    assert out[0, 1] == 255  # saturated


def test_resize_keep_aspect():
    img = np.zeros((200, 400), dtype=np.uint8)
    out, scale = T.resize_keep_aspect(img, 100, 100)
    assert scale == 0.25
    assert out.shape == (50, 100)
    # no upscale
    out2, scale2 = T.resize_keep_aspect(img, 1000, 1000)
    assert scale2 == 1.0 and out2.shape == img.shape


def test_crop_clamped():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = T.crop(img, (8, 8, 5, 5))
    assert out.shape == (2, 2)


def test_pad_to_square():
    img = np.ones((10, 20), dtype=np.uint8)
    out = T.pad_to_square(img, 28)
    assert out.shape == (28, 28)
    assert out.sum() == 10 * 20 + 255 * (28 * 28 - 200)


def test_media_codec_roundtrip():
    img = make_text_image(3, 0.0)
    assert np.array_equal(T.decode_image(T.encode_image(img)), img)


def test_decode_image_dispatches_png():
    """decode_image recognizes real PNG bytes (pure-stdlib codec) and
    falls back to the .npy codec otherwise."""
    from jochre3_ocr_spark.sources.png_codec import encode_png

    img = (np.arange(20 * 30).reshape(20, 30) % 256).astype(np.uint8)
    assert np.array_equal(T.decode_image(encode_png(img)), img)
    assert np.array_equal(T.decode_image(T.encode_image(img)), img)
    assert np.array_equal(T.decode_png(encode_png(img)), img)


@pytest.mark.parametrize("true_skew", [-2.0, -1.09, 0.0, 1.5, 3.0])
def test_estimate_skew_tolerance(true_skew):
    """DeskewerTest analog (core/src/test/.../DeskewerTest.scala:10-17):
    estimated angle within ±0.15° of truth on a synthetic page."""
    img = make_text_image(n_lines=5, skew_deg=true_skew, width=600, height=400)
    est = T.estimate_skew(img)
    assert est is not None
    assert abs(est - true_skew) < 0.15


def test_deskew_straightens():
    img = make_text_image(n_lines=5, skew_deg=2.0, width=600, height=400)
    out, angle = T.deskew(img)
    residual = T.estimate_skew(out)
    assert abs(residual) < 0.2


def test_estimate_skew_blank_image():
    assert T.estimate_skew(np.full((50, 50), 255, dtype=np.uint8)) is None


# --- ALTO XML round trip (scan + sink, SURVEY §2.1) --------------------------
def test_alto_roundtrip_with_glyphs_and_alternatives():
    from jochre3_ocr_spark.operators.spantree import parse_spans

    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "דער", None, 2),
        ("space", " ", None, 3),
        ("word", "מעהר", None, 4),
    ]
    doc = parse_spans("t.png", spans)
    doc.blocks[0].lines[0].words[1].alternatives = [("YIVO", "מער")]
    xml = emit_alto(doc, 100, 100)
    doc2 = parse_alto(xml)
    assert doc2.doc_id == "t.png"
    assert doc2.content == doc.content
    w2 = doc2.blocks[0].lines[0].words[1]
    assert w2.alternatives == [("YIVO", "מער")]
    assert [g.content for g in w2.glyphs] == [g.content for g in doc.blocks[0].lines[0].words[1].glyphs]


def test_coordinate_maps_cascade():
    """translate/rescale cascade down the tree (Page.scala:121-141;
    Rectangle.scala:161-179) — the un-crop / un-scale step."""
    from jochre3_ocr_spark.operators.spantree import (
        Rect,
        parse_spans,
        rescale_doc,
        translate_doc,
    )

    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "ab", None, 2),
    ]
    doc = parse_spans("d", spans, with_geometry=True)
    w = doc.blocks[0].lines[0].words[0]
    before = (w.rect.left, w.rect.top)
    translate_doc(doc, 100, 50)
    assert (w.rect.left, w.rect.top) == (before[0] + 100, before[1] + 50)
    assert w.glyphs[0].rect.top == 50
    rescale_doc(doc, 0.5)
    assert w.rect.left == (before[0] + 100) // 2
    assert Rect(3, 3, 3, 3).rescale(0.5) == Rect(1, 1, 1, 1)  # truncation


def test_draw_boxes():
    img = np.full((50, 50), 255, dtype=np.uint8)
    out = T.draw_boxes(img, [(10, 10, 20, 20)])
    assert out[10, 15] == 0 and out[15, 10] == 0  # edges drawn
    assert out[20, 20] == 255  # interior untouched
    assert img[10, 15] == 255  # original untouched
