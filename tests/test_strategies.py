"""Alternate segmenter/guesser strategies (BlockOnlySegmenter,
NonSegmenter, BlockTextGuesser, UnsegmentedPageTextGuesser analogs)."""

import numpy as np
import pytest

from jochre3_ocr_spark.operators import strategies as S
from jochre3_ocr_spark.operators.segmentation import PredictedBox
from jochre3_ocr_spark.operators.spantree import (
    Document,
    Media,
    Rect,
    TextBlock,
    parse_spans,
)
from jochre3_ocr_spark.sources.alto_xml import emit_alto, parse_alto


def test_non_segmenter_empty_page():
    doc = S.non_segment("d", 100, 200)
    assert doc.blocks == [] and doc.confidence == 1.0


def test_block_only_segmenter_sorts_and_maps_labels():
    """BlockOnlySegmenter.scala:40-70: BlockSorter order; text → empty
    TextBlock, illustration → Illustration."""
    preds = [
        PredictedBox("text", (10, 300, 200, 100), 0.9),  # lower block
        PredictedBox("illustration", (10, 10, 100, 80), 0.8),  # top
        PredictedBox("text", (10, 120, 200, 100), 0.95),  # middle
    ]
    doc = S.block_only_segment("d", 400, 500, preds, left_to_right=False)
    kinds = [type(b).__name__ for b in doc.blocks]
    tops = [b.rect.top for b in doc.blocks]
    assert kinds == ["Media", "TextBlock", "TextBlock"]
    assert tops == [10, 120, 300]
    assert all(tb.lines == [] for tb in doc.blocks if isinstance(tb, TextBlock))


def _fake_converter_for(texts_by_offset):
    """Fake ImageToAltoConverter: identifies the crop by its shape and
    returns block-local ALTO with one word."""

    def convert(img: np.ndarray) -> str:
        key = img.shape[:2]
        if key not in texts_by_offset:
            raise S.AnalysisExceptionToIgnore(f"unknown crop {key}")
        text = texts_by_offset[key]
        sub = parse_spans(
            "sub",
            [("block", None, None, 0), ("line", None, None, 1), ("word", text, None, 2)],
        )
        # give the word local geometry so translation is observable
        w = sub.blocks[0].lines[0].words[0]
        w.rect = Rect(5, 7, 30, 10)
        sub.blocks[0].rect = Rect(0, 0, key[1], key[0])
        return emit_alto(sub, key[1], key[0])

    return convert


def test_block_text_guesser_translates_and_sorts():
    """BlockTextGuesser.scala:40-100: crop per block, parse, translate by
    (left, top), illustrations pass through, re-sort."""
    img = np.full((500, 400), 255, dtype=np.uint8)
    doc = Document(
        doc_id="d",
        blocks=[
            TextBlock(lines=[], rect=Rect(10, 300, 200, 100)),
            Media(media_ref="ILL_1", rect=Rect(10, 10, 100, 80)),
            TextBlock(lines=[], rect=Rect(20, 120, 200, 50)),
        ],
    )
    conv = _fake_converter_for({(100, 200): "אבג", (50, 200): "דהו"})
    out = S.block_text_guess(doc, img, conv, left_to_right=False)
    kinds = [type(b).__name__ for b in out.blocks]
    assert kinds == ["Media", "TextBlock", "TextBlock"]
    mid = out.blocks[1]
    low = out.blocks[2]
    assert mid.lines[0].words[0].content == "דהו"
    # translated: local (5,7) + block origin (20,120)
    assert mid.lines[0].words[0].rect == Rect(25, 127, 30, 10)
    assert low.lines[0].words[0].content == "אבג"
    assert low.lines[0].words[0].rect == Rect(15, 307, 30, 10)


def test_block_text_guesser_skips_ignorable_failures():
    img = np.full((500, 400), 255, dtype=np.uint8)
    doc = Document(
        doc_id="d",
        blocks=[TextBlock(lines=[], rect=Rect(0, 0, 50, 50))],
    )
    out = S.block_text_guess(doc, img, _fake_converter_for({}), False)
    assert out.blocks == []


def test_unsegmented_page_text_guesser():
    img = np.full((80, 60), 255, dtype=np.uint8)
    conv = _fake_converter_for({(80, 60): "אבג"})
    base = Document(doc_id="d", blocks=[])
    out = S.unsegmented_page_text_guess(base, img, conv)
    assert out.blocks[0].lines[0].words[0].content == "אבג"
    # ignorable failure → original page unchanged
    # (UnsegmentedPageTextGuesser.scala:46-48)
    out2 = S.unsegmented_page_text_guess(base, np.zeros((9, 9), np.uint8), conv)
    assert out2 is base


def test_block_text_guesser_feeds_full_text_pipeline():
    """Strategy outputs plug into process_tree (the Full guesser's
    downstream transform chain runs unchanged)."""
    from jochre3_ocr_spark.functions.lexicon import Lexicon
    from jochre3_ocr_spark.operators.kernel import process_tree

    img = np.full((300, 300), 255, dtype=np.uint8)
    doc = Document(
        doc_id="d", blocks=[TextBlock(lines=[], rect=Rect(0, 0, 300, 100))]
    )
    conv = _fake_converter_for({(100, 300): "אבג"})
    guessed = S.block_text_guess(doc, img, conv, False)
    out = process_tree(guessed, Lexicon.from_words(["אבג"]))
    assert out["status"] == "ok" and out["n_words"] == 1


def test_ocr_document_strategy_dispatch():
    """segmenter_type/guesser_type selection flows through ocr_document."""
    from jochre3_ocr_spark.functions.lexicon import Lexicon
    from jochre3_ocr_spark.operators.ocr import ocr_document
    from jochre3_ocr_spark.schema import PipelineConfig
    from jochre3_ocr_spark.sources.layout_oracle import build_page

    layout, _gt = build_page(0, 0)
    lex = Lexicon.from_words(["אבג"])

    out_non = ocr_document(
        "d", [layout], {}, lex, PipelineConfig(segmenter_type="non")
    )
    assert out_non["status"] == "ok" and out_non["n_words"] == 0

    out_blocks = ocr_document(
        "d", [layout], {}, lex, PipelineConfig(segmenter_type="block-only")
    )
    assert out_blocks["status"] == "ok" and out_blocks["n_words"] == 0
    # block-only keeps top-level structure: spans exist but no words
    assert out_blocks["n_spans"] >= 0

    def conv(img):
        sub = parse_spans(
            "sub",
            [("block", None, None, 0), ("line", None, None, 1), ("word", "אבג", None, 2)],
        )
        sub.blocks[0].rect = Rect(0, 0, img.shape[1], img.shape[0])
        w = sub.blocks[0].lines[0].words[0]
        w.rect = Rect(1, 1, 10, 10)
        return emit_alto(sub, img.shape[1], img.shape[0])

    out_guessed = ocr_document(
        "d", [layout], {}, lex,
        PipelineConfig(segmenter_type="block-only", guesser_type="block"),
        alto_converter=conv,
    )
    assert out_guessed["status"] == "ok" and out_guessed["n_words"] >= 1


def test_image_segments_whiteout_illustrations():
    """ImageSegmentExtractor.scala:24-71: illustrations are whited out
    of every text crop; the original image is untouched."""
    import numpy as np

    from jochre3_ocr_spark.operators.spantree import Media, Rect, TextBlock
    from jochre3_ocr_spark.operators.strategies import image_segments

    img = np.full((100, 100), 7, dtype=np.uint8)
    blocks = [
        TextBlock(lines=[], rect=Rect(0, 0, 60, 60)),
        Media(media_ref="ill1", rect=Rect(20, 20, 30, 30)),
    ]
    segs = image_segments(img, blocks)
    kinds = [s[0] for s in segs]
    assert kinds == ["text", "illustration"]
    _, rect, sub = segs[0]
    assert sub.shape == (60, 60)
    assert sub[10, 10] == 7
    assert sub[30, 30] == 255  # whited-out illustration overlap
    assert img[30, 30] == 7  # original untouched
    assert segs[1][1] == Rect(20, 20, 30, 30)


def test_block_text_guess_keeps_media_and_whites_out(spark=None):
    import numpy as np

    from jochre3_ocr_spark.operators.spantree import Media, Rect, TextBlock
    from jochre3_ocr_spark.operators.strategies import block_text_guess
    from jochre3_ocr_spark.operators.spantree import Document

    seen = []

    def converter(sub):
        seen.append(sub.copy())
        return (
            '<alto><Layout><Page WIDTH="60" HEIGHT="60"><PrintSpace>'
            '<TextBlock HPOS="0" VPOS="0" WIDTH="60" HEIGHT="60">'
            '<TextLine HPOS="0" VPOS="0" WIDTH="60" HEIGHT="20">'
            '<String HPOS="0" VPOS="0" WIDTH="30" HEIGHT="20" CONTENT="x" WC="1"/>'
            "</TextLine></TextBlock></PrintSpace></Page></Layout></alto>"
        )

    img = np.full((100, 100), 7, dtype=np.uint8)
    doc = Document(
        doc_id="d",
        blocks=[
            TextBlock(lines=[], rect=Rect(0, 0, 60, 60)),
            Media(media_ref="ill1", rect=Rect(20, 20, 30, 30)),
        ],
    )
    out = block_text_guess(doc, img, converter)
    assert seen[0][30, 30] == 255  # converter saw the whited-out crop
    medias = [b for b in out.blocks if isinstance(b, Media)]
    assert len(medias) == 1 and medias[0].media_ref == "ill1"
