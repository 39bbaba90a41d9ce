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


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    if os.path.exists(PROGRESSIVE):
        with pytest.raises(NotImplementedError):
            decode_jpeg(open(PROGRESSIVE, "rb").read())


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
