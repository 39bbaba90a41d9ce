"""End-to-end vision-path OCR: layout oracle → segmentation → glyph
classification → guess → text, verified against ground-truth words."""

import pytest

from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.functions.simplify import simplify
from jochre3_ocr_spark.operators.ocr import ocr_document
from jochre3_ocr_spark.sources.corpus import lexicon_words
from jochre3_ocr_spark.sources.layout_oracle import (
    build_page,
    glyph_content_lookup,
)


@pytest.fixture(scope="module")
def lex():
    return Lexicon.from_words(lexicon_words())


@pytest.mark.parametrize("doc_index", [0, 1, 2, 5, 9])
def test_ocr_recovers_ground_truth_text(lex, doc_index):
    layout, gt = build_page(doc_index, 0)
    lookup = glyph_content_lookup(gt)
    out = ocr_document(f"doc{doc_index}", [layout], lookup, lex)
    assert out["status"] == "ok"

    got_lines = [l for l in out["text"].split("\n") if l and l != ""]
    expected_lines = []
    for block in gt["blocks"]:
        for line in block["lines"]:
            expected_lines.append(
                simplify(" ".join(w["text"] for w in line["words"]))
            )
    got_joined = [l for l in got_lines if l.strip()]
    # every ground-truth line must appear verbatim in the OCR output
    # (reading order may reorder blocks between columns)
    assert sorted(got_joined) == sorted(expected_lines)


def test_ocr_multipage(lex):
    layouts, lookups = [], []
    for p in range(3):
        layout, gt = build_page(11, p)
        layouts.append(layout)
        lookups.append(glyph_content_lookup(gt))
    out = ocr_document("doc11", layouts, lookups, lex)
    assert out["status"] == "ok"
    assert out["n_words"] > 0
    kinds = {k for k, *_ in out["spans"]}
    assert "block" in kinds and "word" in kinds
