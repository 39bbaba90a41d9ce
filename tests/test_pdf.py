"""PDF page scan (PDFToImageConverter.scala:18-75 analog): real page
counting/windowing over real PDF bytes; rasterisation injected."""

import os

import numpy as np
import pytest

from jochre3_ocr_spark.sources import pdf as P
from jochre3_ocr_spark.sources.png_codec import decode_png


def test_make_test_pdf_is_valid_and_counted():
    data = P.make_test_pdf(5)
    assert data.startswith(b"%PDF-") and data.rstrip().endswith(b"%%EOF")
    assert P.count_pdf_pages(data) == 5
    assert P.pdf_media_box(data) == (612.0, 792.0)


def test_count_falls_back_to_page_objects():
    data = P.make_test_pdf(3)
    # strip the /Count entry to exercise the fallback
    data = data.replace(b" /Count 3", b"")
    assert P.count_pdf_pages(data) == 3


def test_count_rejects_non_pdf_and_objstm():
    with pytest.raises(ValueError):
        P.count_pdf_pages(b"not a pdf")
    objstm = b"%PDF-1.6\n1 0 obj\n<< /Type /ObjStm /N 2 >>\nstream\nendstream\nendobj\n%%EOF"
    with pytest.raises(NotImplementedError):
        P.count_pdf_pages(objstm)


def test_fake_renderer_geometry_and_identity():
    data = P.make_test_pdf(2, width_pt=72, height_pt=144)
    img0 = P.fake_renderer(data, 0, 300)
    assert img0.shape == (600, 300)  # 144pt→2in→600px, 72pt→1in→300px
    img1 = P.fake_renderer(data, 1, 300)
    # page 1 has one band, page 2 has two
    def bands(img):
        rows_dark = (img < 128).any(axis=1)
        return int(np.diff(rows_dark.astype(int)).clip(min=0).sum())

    assert bands(img0) == 1 and bands(img1) == 2


def test_pdf_pages_fan_out_and_window(spark):
    rows = [("doc_a", bytearray(P.make_test_pdf(4))), ("doc_b", bytearray(P.make_test_pdf(2)))]
    pdfs = spark.createDataFrame(rows, "doc_id string, content binary")
    out = P.pdf_pages(pdfs, renderer=P.fake_renderer, dpi=72).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.page_number for r in by_doc["doc_a"]) == [1, 2, 3, 4]
    assert sorted(r.page_number for r in by_doc["doc_b"]) == [1, 2]
    r = by_doc["doc_a"][0]
    assert r.status == "ok" and r.n_pages == 4
    img = decode_png(bytes(r.image))
    assert img.shape == (r.height, r.width) == (792, 612)

    # page window: startPage 2, endPage clamped to page count
    # (PDFToImageConverter.scala:48-56)
    win = P.pdf_pages(
        pdfs, renderer=P.fake_renderer, start_page=2, end_page=99, dpi=72
    ).collect()
    got = sorted((r.doc_id, r.page_number) for r in win)
    assert got == [("doc_a", 2), ("doc_a", 3), ("doc_a", 4), ("doc_b", 2)]


def test_pdf_pages_bad_bytes_yield_error_row(spark):
    pdfs = spark.createDataFrame(
        [("bad", bytearray(b"hello"))], "doc_id string, content binary"
    )
    out = P.pdf_pages(pdfs, renderer=P.fake_renderer).collect()
    assert len(out) == 1 and out[0].status.startswith("error:")


def test_pdf_scan_binary_file_source(spark, tmp_path):
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "book1.pdf").write_bytes(P.make_test_pdf(3))
    (d / "book2.pdf").write_bytes(P.make_test_pdf(1))
    (d / "ignore.txt").write_bytes(b"nope")
    out = P.pdf_scan(spark, str(d), renderer=P.fake_renderer, dpi=72)
    rows = out.collect()
    assert sorted((r.doc_id, r.page_number) for r in rows) == [
        ("book1", 1),
        ("book1", 2),
        ("book1", 3),
        ("book2", 1),
    ]


def test_pdf_pages_feed_deskew_chain(spark):
    """End-to-end plumbing: PDF → page PNG → contour deskew estimator."""
    from jochre3_ocr_spark.operators import contour_deskew as cd

    pdfs = spark.createDataFrame(
        [("doc", bytearray(P.make_test_pdf(1, width_pt=144, height_pt=144)))],
        "doc_id string, content binary",
    )
    rows = P.pdf_pages(pdfs, renderer=P.fake_renderer, dpi=150).collect()
    img = decode_png(bytes(rows[0].image))
    angle = cd.get_skew_angle(img)
    assert angle is not None and abs(angle) < 0.3  # unrotated synthetic page
