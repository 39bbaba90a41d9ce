"""Contour-deskew chain (Deskewer.scala:25-217 analog) pinned against the
reference's REAL golden image, decoded in place with the pure-stdlib PNG
codec — the same pin as DeskewerTest.scala:10-17 (−1.09 ± 0.1°)."""

import os
import struct
import zlib

import numpy as np
import pytest

from jochre3_ocr_spark.operators import contour_deskew as cd
from jochre3_ocr_spark.sources.png_codec import decode_png, encode_png

GOLDEN = (
    "/root/reference/modules/core/src/test/resources/images/nybc200089_0011.png"
)


# ------------------------------------------------------------ png codec
def _make_png(height, width, filters, pixels):
    """Hand-build a PNG whose scanlines use the given filter types, by
    applying the filters FORWARD to known pixels."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = [0] * width
    for y in range(height):
        f = filters[y % len(filters)]
        raw.append(f)
        line = [int(pixels[y][x]) for x in range(width)]
        enc = []
        for x in range(width):
            left = line[x - 1] if x > 0 else 0
            up = prev[x]
            upleft = prev[x - 1] if x > 0 else 0
            if f == 0:
                enc.append(line[x])
            elif f == 1:
                enc.append((line[x] - left) & 0xFF)
            elif f == 2:
                enc.append((line[x] - up) & 0xFF)
            elif f == 3:
                enc.append((line[x] - ((left + up) >> 1)) & 0xFF)
            elif f == 4:
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = upleft
                enc.append((line[x] - pred) & 0xFF)
        raw.extend(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types_decode(filters):
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, size=(12, 17)).astype(np.uint8)
    data = _make_png(12, 17, filters, px)
    out = decode_png(data)
    assert np.array_equal(out, px), f"filters {filters}"


def test_png_encode_decode_roundtrip_grey_and_rgb():
    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, size=(31, 23)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), g)
    c = rng.randint(0, 256, size=(9, 11, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(c)), c)


def test_png_decodes_reference_golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference image not present")
    img = decode_png(open(GOLDEN, "rb").read())
    assert img.shape == (5400, 3600)
    assert img.dtype == np.uint8
    # a scanned book page: bright background
    assert 200 < img.mean() < 255


# --------------------------------------------------------------- stages
def test_resize_keeps_aspect_long_side_1000():
    img = np.full((5400, 3600), 200, dtype=np.uint8)
    out = cd.resize_area_keep_aspect(img, 1000, 1000)
    assert out.shape == (1000, 666)  # 3600/5.4 truncated, as the reference
    assert np.all(out == 200)


def test_resize_area_is_exact_box_average():
    img = np.array([[0, 255], [255, 0]], dtype=np.uint8).repeat(2, 0).repeat(2, 1)
    out = cd.resize_area_keep_aspect(np.tile(img, (500, 500)), 1000, 1000)
    # integer 2× reduction of a checkerboard of 2×2 blocks
    assert out.shape == (1000, 1000)


def test_otsu_separates_bimodal():
    img = np.concatenate(
        [np.full(600, 30, np.uint8), np.full(400, 220, np.uint8)]
    ).reshape(40, 25)
    t = cd.otsu_threshold(img)
    assert 30 <= t < 220
    mask = cd.threshold_binary_inv(img, t)
    assert mask.sum() == 600  # dark pixels are ink


def test_dilate_rect_window():
    m = np.zeros((20, 40), dtype=bool)
    m[10, 20] = True
    out = cd.dilate_rect(m, 10, 3, 3)
    ys, xs = np.nonzero(out)
    # anchor (5,1): dst(x) reads src[x−5..x+4], so a source pixel spreads
    # to offsets −4..+5 per iteration → −12..+15 after 3; y symmetric ±3
    assert xs.min() == 20 - 12 and xs.max() == 20 + 15
    assert ys.min() == 10 - 3 and ys.max() == 10 + 3


def test_connected_components_8_connectivity():
    m = np.zeros((6, 6), dtype=bool)
    m[0, 0] = m[1, 1] = True  # diagonal touch → one component
    m[4, 4] = True
    comps, rows, xs, xe = cd.connected_components_runs(m)
    assert sorted(len(c) for c in comps) == [1, 2]


def test_min_area_rect_angle_of_rotated_strip():
    # long thin strip at +2° (y down): points along (cos2°, sin2°)
    t = np.deg2rad(2.0)
    xs = np.arange(0, 400, dtype=np.float64)
    pts = np.stack(
        [
            np.concatenate([xs * np.cos(t), xs * np.cos(t)]),
            np.concatenate([xs * np.sin(t), xs * np.sin(t) + 8]),
        ],
        axis=1,
    )
    hull = cd.convex_hull(pts)
    angle, _ = cd.min_area_rect_angle(hull)
    corrected = cd._corrected_angle(angle)
    assert corrected == pytest.approx(-2.0, abs=0.05)


def test_corrected_angle_folding():
    assert cd._corrected_angle(1.09) == -1.09
    assert cd._corrected_angle(88.91) == pytest.approx(1.09)
    assert cd._corrected_angle(90.0) == pytest.approx(0.0)
    assert cd._corrected_angle(45.0) == -45.0


# ---------------------------------------------------------- golden pin
def test_golden_deskew_matches_reference_tolerance():
    """DeskewerTest.scala:10-17: skewAngle shouldBe (−1.09 ± 0.1)."""
    if not os.path.exists(GOLDEN):
        pytest.skip("reference image not present")
    img = decode_png(open(GOLDEN, "rb").read())
    angle = cd.get_skew_angle(img)
    assert angle == pytest.approx(-1.09, abs=0.1)


def test_synthetic_rotated_page_recovers_angle():
    from jochre3_ocr_spark.operators.multimodal import make_text_image

    img = make_text_image(6, 1.5, seed=3, width=900, height=700)
    est = cd.get_skew_angle(img)
    assert est is not None
    assert est == pytest.approx(1.5, abs=0.5)


def test_png_palette_and_alpha_decode():
    """Palette (color type 3) and grey+alpha / RGBA (4, 6) decode."""
    import struct as st

    def chunk(ctype, body):
        return (
            st.pack(">I", len(body))
            + ctype
            + body
            + st.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # palette: 2×2, indices [[0,1],[1,0]], palette red/green
    ihdr = st.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])
    raw = bytes([0, 0, 1, 0, 1, 0])
    data = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2, 3)
    assert list(out[0, 0]) == [255, 0, 0] and list(out[0, 1]) == [0, 255, 0]

    # RGBA 1×2
    ihdr6 = st.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    raw6 = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])
    data6 = (
        sig + chunk(b"IHDR", ihdr6) + chunk(b"IDAT", zlib.compress(raw6)) + chunk(b"IEND", b"")
    )
    out6 = decode_png(data6)
    assert out6.shape == (1, 2, 4)
    assert list(out6[0, 0]) == [10, 20, 30, 255]
    assert list(out6[0, 1]) == [40, 50, 60, 128]

    # grey+alpha 1×2
    ihdr4 = st.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0)
    raw4 = bytes([0, 77, 255, 99, 0])
    data4 = (
        sig + chunk(b"IHDR", ihdr4) + chunk(b"IDAT", zlib.compress(raw4)) + chunk(b"IEND", b"")
    )
    out4 = decode_png(data4)
    assert out4.shape == (1, 2, 2)
    assert list(out4[0, 0]) == [77, 255]


def test_png_16bit_and_interlace_rejected():
    import struct as st

    def chunk(ctype, body):
        return (
            st.pack(">I", len(body))
            + ctype
            + body
            + st.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    for bd, il in ((16, 0), (8, 1)):
        ihdr = st.pack(">IIBBBBB", 1, 1, bd, 0, 0, 0, il)
        data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00")) + chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            decode_png(data)
