"""Standalone dehyphenator + combinedWords + multi-alphabet dispatch."""

import unicodedata

import pytest

from jochre3_ocr_spark.functions.dehyphenate import dehyphenate
from jochre3_ocr_spark.functions.lexicon import Lexicon, load_lexicon
from jochre3_ocr_spark.operators.guesser import (
    apply_language_votes,
    guess_with_other_alphabets,
)
from jochre3_ocr_spark.operators.spantree import parse_spans


def nfd(s):
    return unicodedata.normalize("NFD", s)


@pytest.fixture(scope="module")
def lex():
    return Lexicon.from_words(["געװאָרן", "ארץ", "ישראל", "דער", "זי"])


def test_dehyphenate_removes_hyphen_when_joined_known(lex):
    # joined form in lexicon → drop the hyphen, join the lines
    text = nfd("דער גע־\nװאָרן זי")
    out = dehyphenate(text, lex)
    assert out == nfd("דער געװאָרן זי\n")


def test_dehyphenate_keeps_hyphen_when_both_halves_known(lex):
    # both halves in lexicon separately → keep the hyphen
    text = nfd("ארץ־\nישראל דער")
    out = dehyphenate(text, lex)
    assert out == nfd("ארץ־ישראל דער\n")


def test_dehyphenate_paragraph_breaks(lex):
    # double line break = paragraph → single break in the output
    text = nfd("דער זי\n\nזי דער")
    out = dehyphenate(text, lex)
    assert out == nfd("דער זי\nזי דער\n")


def test_dehyphenate_single_line_passthrough(lex):
    assert dehyphenate("דער", lex) == "דער"


def test_dehyphenate_final_letter_keeps_hyphen(lex):
    # last word ends with a final letter → keep hyphen (branch 1)
    text = nfd("געװאָרן־\nדער")
    out = dehyphenate(text, lex)
    assert "־" in out


# --- combinedWords (TextLine.scala:38-57) ------------------------------------
def test_combined_words():
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "גע", None, 2),
        ("word", "װאָרן", None, 3),  # no space between → combined
        ("space", " ", None, 4),
        ("word", "דער", None, 5),
        ("hyphen", "־", None, 6),  # attached to previous word
    ]
    doc = parse_spans("d", spans)
    combined = doc.blocks[0].lines[0].combined_words()
    assert [w.content for w in combined] == [nfd("געװאָרן"), nfd("דער־")]


# --- lexicon file loader -------------------------------------------------------
def test_load_lexicon(tmp_path):
    f = tmp_path / "words.txt"
    f.write_text("דער\nמעהר\n\n", encoding="utf-8")
    lex = load_lexicon(str(f))
    assert lex.get_frequency("דער") == 1


# --- multi-alphabet dispatch -----------------------------------------------------
def test_other_alphabet_dispatch():
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "LLL", None, 2),
        ("space", " ", None, 3),
        ("word", "דער", None, 4),
    ]
    doc = parse_spans("d", spans)

    def latin_topk(g):
        return [("x", 0.9)]  # the "Latin model" reads every glyph as x

    guess_with_other_alphabets(doc, [("en", ".*L.*", latin_topk)])
    words = doc.blocks[0].lines[0].words
    assert words[0].content == "xxx"
    assert words[0].language == "en"
    assert words[1].content == nfd("דער")  # untouched
    apply_language_votes(doc)
    assert doc.blocks[0].lines[0].language == "en"
