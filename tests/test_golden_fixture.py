"""Golden-fixture parity: the reference's own test page
(nybc201086_0022_alto4.xml, a real 3224×2475 scan with 743 elements) —
AltoTest."allTextBlocks" expects 79 leaf text blocks after reading-order
sort (core/src/test/.../model/AltoTest.scala:35-62). Read directly from
the read-only reference checkout; skipped if absent."""

import os

import pytest

FIXTURE = (
    "/root/reference/modules/core/src/test/resources/alto/"
    "nybc201086_0022_alto4.xml"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def page_doc():
    from jochre3_ocr_spark.sources.alto_xml import parse_alto

    with open(FIXTURE, encoding="utf-8") as f:
        return parse_alto(f.read())


def test_all_text_blocks_is_79(page_doc):
    """Page.allTextBlocks (Page.scala:41-47): BlockSorter over top-level
    blocks, composed blocks flattened to their children."""
    from jochre3_ocr_spark.functions.reading_order import sort_blocks
    from jochre3_ocr_spark.operators.spantree import ComposedBlock, Media

    top = [b for b in page_doc.blocks if not isinstance(b, Media)]
    assert all(b.rect is not None for b in top)
    ordered = sort_blocks(
        top,
        left_to_right=False,
        box_of=lambda b: (b.rect.left, b.rect.top, b.rect.width, b.rect.height),
    )
    leaves = []
    for b in ordered:
        if isinstance(b, ComposedBlock):
            leaves.extend(b.blocks)
        else:
            leaves.append(b)
    assert len(leaves) == 79


def test_fixture_content_assembles(page_doc):
    text = page_doc.content
    processed = page_doc.processed_content
    assert len(text) > 1000
    assert len(processed) > 1000
    assert "\n" in text


def test_fixture_roundtrips_through_alto_sink(page_doc):
    from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto

    xml = emit_alto(page_doc, 2475, 3224)
    doc2 = parse_alto(xml)
    assert doc2.content == page_doc.content
    assert doc2.processed_content == page_doc.processed_content
