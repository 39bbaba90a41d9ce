"""Baseline JPEG decoder pinned on the reference's own artifacts:
nybc200089_0011_deskewered.jpg is the Deskewer's SAVED OUTPUT
(Deskewer.scala:31-38 writes it) — decoding it and comparing against
OUR deskew of the PNG original closes the loop on PNG codec, JPEG
codec, rotation convention, and the deskew chain simultaneously."""

import os

import numpy as np
import pytest

from jochre3_ocr_spark.sources.jpeg_codec import decode_jpeg

IMAGES = "/root/reference/modules/core/src/test/resources/images"
DESKEWERED = f"{IMAGES}/nybc200089_0011_deskewered.jpg"
ORIGINAL = f"{IMAGES}/nybc200089_0011.png"
COLOR_SAMPLE = "/root/reference/modules/yiddish/src/test/resources/yiddish_sample.jpg"
PROGRESSIVE = f"{IMAGES}/nybc201086_0022.jpg"


def test_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_decodes_grayscale_reference_output():
    if not os.path.exists(DESKEWERED):
        pytest.skip("reference image not present")
    img = decode_jpeg(open(DESKEWERED, "rb").read())
    assert img.shape == (5400, 3600) and img.dtype == np.uint8
    assert 200 < img.mean() < 255  # bright page


def test_decodes_color_420_sample():
    if not os.path.exists(COLOR_SAMPLE):
        pytest.skip("reference image not present")
    img = decode_jpeg(open(COLOR_SAMPLE, "rb").read())
    assert img.shape == (110, 353, 3)
    # near-grayscale scan: channels agree closely
    means = img.mean(axis=(0, 1))
    assert np.ptp(means) < 2.0


def test_reference_deskew_output_matches_our_deskew():
    """The reference's saved deskewered page ≈ our rotate_image of the
    PNG original by the golden angle: mean abs diff ≲ 2 grey levels
    (JPEG loss + interpolation), vs ≳ 10 against the UNROTATED page."""
    if not (os.path.exists(DESKEWERED) and os.path.exists(ORIGINAL)):
        pytest.skip("reference images not present")
    from jochre3_ocr_spark.operators.transforms import rotate_image
    from jochre3_ocr_spark.sources.png_codec import decode_png

    theirs = decode_jpeg(open(DESKEWERED, "rb").read())
    png = decode_png(open(ORIGINAL, "rb").read())
    ours = rotate_image(png, 1.09, fill=255)  # deskew = unrotate(−1.09)
    diff_deskewed = float(np.abs(theirs.astype(int) - ours.astype(int)).mean())
    diff_identity = float(np.abs(theirs.astype(int) - png.astype(int)).mean())
    assert diff_deskewed < 2.0
    assert diff_identity > 5 * diff_deskewed


def test_reference_deskew_output_has_no_residual_skew():
    if not os.path.exists(DESKEWERED):
        pytest.skip("reference image not present")
    from jochre3_ocr_spark.operators.contour_deskew import get_skew_angle

    img = decode_jpeg(open(DESKEWERED, "rb").read())
    residual = get_skew_angle(img)
    assert residual == pytest.approx(0.0, abs=0.15)


def test_decode_image_dispatches_jpeg():
    if not os.path.exists(COLOR_SAMPLE):
        pytest.skip("reference image not present")
    from jochre3_ocr_spark.operators import transforms as T

    img = T.decode_image(open(COLOR_SAMPLE, "rb").read())
    assert img.shape == (110, 353, 3)


@pytest.fixture(scope="module")
def golden_page():
    if not os.path.exists(PROGRESSIVE):
        pytest.skip("reference image not present")
    return decode_jpeg(open(PROGRESSIVE, "rb").read())


def test_progressive_decode_golden_page(golden_page):
    """nybc201086_0022.jpg (SOF2 progressive, 4:4:4): the SOURCE image
    of the 79-block ALTO golden decodes at its declared geometry."""
    assert golden_page.shape == (3224, 2474, 3)
    assert 200 < golden_page.mean() < 255


def test_progressive_page_skew_matches_alto_rotation(golden_page):
    """The golden ALTO records ROTATION="-0.17" (the reference's own
    Deskewer output for this page); our contour chain on our decoded
    pixels lands within 0.1°."""
    from jochre3_ocr_spark.operators.contour_deskew import get_skew_angle

    angle = get_skew_angle(golden_page)
    assert angle == pytest.approx(-0.17, abs=0.1)


def test_progressive_pixels_align_with_alto_geometry(golden_page):
    """Structural cross-check: the golden ALTO's word boxes must be far
    inkier than the page average in OUR decoded pixels."""
    import itertools
    import xml.etree.ElementTree as ET

    alto_path = (
        "/root/reference/modules/core/src/test/resources/alto/"
        "nybc201086_0022_alto4.xml"
    )
    if not os.path.exists(alto_path):
        pytest.skip("reference alto not present")
    img = golden_page
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.uint8)
    ink = gray < 128
    root = ET.fromstring(open(alto_path).read())
    ns = root.tag.split("}")[0] + "}"
    ratios = []
    for el in itertools.islice(root.iter(ns + "String"), 200):
        x, y, w, h = (int(el.get(a)) for a in ("HPOS", "VPOS", "WIDTH", "HEIGHT"))
        if w > 0 and h > 0:
            ratios.append(float(ink[y : y + h, x : x + w].mean()))
    assert np.mean(ratios) > 3 * ink.mean()
