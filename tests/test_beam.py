"""Beam search with a confusion-injecting glyph oracle: the cases where
beam + lexicon rescoring change the argmax (FIXTURES.md glyph_oracle;
FullSegmentationGuesser.scala:562-586, rescoreGuess :208-220)."""

import unicodedata

import pytest

from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.operators.guesser import get_beam, guess_document, rescore_beam
from jochre3_ocr_spark.operators.spantree import parse_spans
from jochre3_ocr_spark.schema import PipelineConfig


def nfd(s):
    return unicodedata.normalize("NFD", s)


@pytest.fixture(scope="module")
def lex():
    return Lexicon.from_words(["דער", "געװאָרן", "גע", "װאָרן"])


def confusing_topk(confusions):
    table = {nfd(k): [(nfd(o), c) for o, c in v] for k, v in confusions.items()}

    def topk(g):
        return table.get(g, [(g, 1.0)])

    return topk


def test_beam_keeps_topk_sequences(lex):
    doc = parse_spans(
        "d", [("block", None, None, 0), ("line", None, None, 1), ("word", "דץר", None, 2)]
    )
    word = doc.blocks[0].lines[0].words[0]
    topk = confusing_topk({"ץ": [("ץ", 0.6), ("ע", 0.4)]})
    beam = get_beam(word, topk, beam_width=5)
    assert len(beam) == 2
    # raw top-1 is the impossible reading (higher glyph confidence)
    assert beam[0].guess.word == nfd("דץר")
    assert beam[1].guess.word == nfd("דער")


def test_rescoring_flips_argmax_to_known_word(lex):
    """The impossible reading (medial final letter) is crushed ×0.01;
    the known word wins despite lower glyph confidence."""
    doc = parse_spans(
        "d", [("block", None, None, 0), ("line", None, None, 1), ("word", "דץר", None, 2)]
    )
    topk = confusing_topk({"ץ": [("ץ", 0.6), ("ע", 0.4)]})
    guess_document(doc, lex, PipelineConfig(), topk)
    word = doc.blocks[0].lines[0].words[0]
    assert word.content == nfd("דער")
    assert word.confidence == pytest.approx(0.4 ** (1 / 3))


def test_unknown_word_factor_applies(lex):
    doc = parse_spans(
        "d", [("block", None, None, 0), ("line", None, None, 1), ("word", "דצר", None, 2)]
    )
    # both readings unknown (not impossible): higher raw confidence wins
    topk = confusing_topk({"צ": [("צ", 0.6), ("ס", 0.4)]})
    guess_document(doc, lex, PipelineConfig(), topk)
    assert doc.blocks[0].lines[0].words[0].content == nfd("דצר")


def test_beam_hyphenation_with_confusion_prefers_nonhyphen(lex):
    """Cross-line pairing engages when ANY beam guess ends with the hyphen
    glyph (FullSegmentationGuesser.scala:474-486). Faithful reference
    quirk (:505-507): the non-hyphen pairing's combined score is
    sqrt(rg2·rg2) — guess2's score alone — so when the next-line word is
    known, a non-hyphen reading of the last word always wins over the
    hyphenated interpretation."""
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "געX", None, 2),
        ("line", None, None, 3),
        ("word", "װאָרן", None, 4),
    ]
    doc = parse_spans("d", spans)
    topk = confusing_topk({"X": [("ר", 0.6), ("־", 0.4)]})
    guess_document(doc, lex, PipelineConfig(), topk)
    w1 = doc.blocks[0].lines[0].words[0]
    w2 = doc.blocks[0].lines[1].words[0]
    assert w1.content == nfd("גער")  # non-hyphen reading chosen
    assert w1.subs_content is None
    assert w2.subs_type is None


def test_beam_hyphenation_unambiguous_hyphen(lex):
    """When every beam guess ends with the hyphen, the pair logic picks
    the lexicon-preferred join (here: without hyphen — געװאָרן)."""
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "געX", None, 2),
        ("line", None, None, 3),
        ("word", "װאָרן", None, 4),
    ]
    doc = parse_spans("d", spans)
    topk = confusing_topk({"X": [("־", 0.9)]})
    guess_document(doc, lex, PipelineConfig(), topk)
    w1 = doc.blocks[0].lines[0].words[0]
    w2 = doc.blocks[0].lines[1].words[0]
    assert w1.subs_content == nfd("געװאָרן")
    assert w1.subs_type == "HypPart1"
    assert w2.subs_type == "HypPart2"


def test_rescore_beam_is_stable_sort(lex):
    from jochre3_ocr_spark.operators.guesser import Guess, GuessWithScore

    g1 = GuessWithScore(Guess((nfd("דער"),), (0.5,)), 0.5)
    g2 = GuessWithScore(Guess((nfd("גע"),), (0.5,)), 0.5)
    out = rescore_beam([g1, g2], lex, 0.5)
    assert [g.guess.outcomes for g in out] == [g1.guess.outcomes, g2.guess.outcomes]


# --- glyph tile fan-out + NMS dedup (FullYoloSegmenter.scala:148-182) --------
def test_tile_predict_dedup_pattern():
    """Overlapping tiles predict the same glyph twice; translation back +
    ordered NMS resolves the duplicate (Rectangle.tile + removeOverlaps)."""
    from jochre3_ocr_spark.functions import geometry as G
    from jochre3_ocr_spark.functions.geometry import PredictedBox
    from jochre3_ocr_spark.operators.segmentation import remove_overlaps

    page = (0, 0, 1000, 800)
    tiles = G.tile(page, 2, 2, 0.125)
    glyph = (480, 380, 30, 30)  # sits in the overlap margin of all tiles
    predictions = []
    for t in tiles:
        if G.contains(t, glyph):
            local = (glyph[0] - t[0], glyph[1] - t[1], glyph[2], glyph[3])
            # translate back (YoloPredictor rescale/translate step)
            predictions.append(
                PredictedBox("g", (local[0] + t[0], local[1] + t[1], 30, 30), 0.9)
            )
    assert len(predictions) >= 2  # duplicated across tiles
    assert len(remove_overlaps(predictions)) == 1


def test_default_hyphen_regex_is_exact_maqaf(lex):
    """Reference default hyphen-regex = "־" (yiddish reference.conf:77),
    FULL-matched against the last glyph outcome
    (FullSegmentationGuesser.scala:475). An ASCII '-' line-end glyph must
    NOT trigger cross-line pairing under defaults."""
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "גע-", None, 2),
        ("line", None, None, 3),
        ("word", "װאָרן", None, 4),
    ]
    doc = parse_spans("d", spans)
    guess_document(doc, lex, PipelineConfig())
    w1 = doc.blocks[0].lines[0].words[0]
    w2 = doc.blocks[0].lines[1].words[0]
    assert w1.subs_content is None and w1.subs_type is None
    assert w2.subs_type is None
    # and a broader pattern opts back in
    doc2 = parse_spans("d", spans)
    guess_document(doc2, lex, PipelineConfig(hyphen_regex=r"(?s).*[-־]"))
    assert doc2.blocks[0].lines[0].words[0].subs_type is not None


def test_page_language_vote(lex):
    """changePageLanguageIfRequired (FullSegmentationGuesser.scala:336-360):
    page language = majority vote over post-vote text-block languages."""
    from jochre3_ocr_spark.operators.guesser import apply_language_votes
    from jochre3_ocr_spark.operators.spantree import parse_spans

    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "אבג", None, 2),
        ("block", None, None, 3),
        ("line", None, None, 4),
        ("word", "דהו", None, 5),
        ("block", None, None, 6),
        ("line", None, None, 7),
        ("word", "זחט", None, 8),
    ]
    doc = parse_spans("d", spans)
    blocks = [b for b in doc.blocks]
    blocks[0].lines[0].words[0].language = "he"
    blocks[1].lines[0].words[0].language = "he"
    blocks[2].lines[0].words[0].language = "yi"
    apply_language_votes(doc)
    assert doc.language == "he"
