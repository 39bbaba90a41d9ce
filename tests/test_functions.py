"""Exact-pair unit vectors lifted from the reference test suite
(FIXTURES.md §3 / SURVEY.md §5) — each pins one deterministic operator
against the reference's own expected outputs."""

import unicodedata

import pytest

from jochre3_ocr_spark.functions.lexicon import (
    Lexicon,
    is_impossible,
    remove_external_punct,
)
from jochre3_ocr_spark.functions.simplify import simplify, string_to_chars
from jochre3_ocr_spark.functions.translit import (
    detransliterate,
    replace_with_precombined,
    transliterate,
)


def nfd(s: str) -> str:
    return unicodedata.normalize("NFD", s)


# --- YiddishTextSimplifierTest.scala:6-21 ---------------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("זייַנען", "זײַנען"),
        ("פּרוּוון", "פּרוּװן"),
        ("איידער", "אײדער"),
        ("ברויט", "ברױט"),
        ("ווען", "װען"),
        ("כִּמְעַט", "כּמעט"),
        ("אֶרֶץ-יִשְׂרָאֵל", "ארץ־יִשׂראל"),
        (",,וואָס''", "„װאָס“"),
        ("''", "“"),
    ],
)
def test_simplifier(raw, expected):
    assert simplify(raw) == nfd(expected)


def test_simplifier_mask_latin():
    assert simplify("Hello", replace_non_hebrew_alphabets=True) == "LLLLL"


# --- YivoTransliteratorTest.scala:6-47 --------------------------------------
TRANSLIT_VECTORS = [
    ("ייִדן", "yidn"),
    ("אָװנט", "ovnt"),
    ("איך האָב געגנבֿעט אַ בוך.", "ikh hob geganvet a bukh."),
    ("דאָס איז ממש אַ מחיה.", "dos iz mamesh a mekhaye."),
    ("ניפֿטר", "nifter"),
]


@pytest.mark.parametrize("hebrew,roman", TRANSLIT_VECTORS)
def test_transliterate(hebrew, roman):
    assert transliterate(hebrew) == roman


@pytest.mark.parametrize("hebrew,roman", TRANSLIT_VECTORS)
def test_detransliterate(hebrew, roman):
    assert detransliterate(roman) == replace_with_precombined(nfd(hebrew))


def test_transliterate_no_loshn_koydesh():
    # without the LK dictionary ממש is transliterated letter-by-letter
    assert transliterate("ממש", loshn_koydesh=False) == "mmsh"


# --- YivoLexiconTest.scala:8-38 ----------------------------------------------
@pytest.fixture(scope="module")
def lex():
    return Lexicon.from_words(["דער", "זי", "מער", "בלײַ", "אַטאָם", "אַ", "געװאָרן"])


@pytest.mark.parametrize(
    "word,freq",
    [
        ("דער", 1),
        ("האָצנפּלאָץ", 0),
        ("ארץישראל", -1),  # medial final-letter ץ → impossible
        ("דער־זי", 1),
        ("דער־האָצנפּלאָץ", 0),
        ("דער־דץר", -1),
        ("“דער־זי", 1),
    ],
)
def test_lexicon_frequency(lex, word, freq):
    assert lex.get_frequency(word) == freq


def test_to_yivo_repair(lex):
    assert lex.to_yivo("מעהר") == nfd("מער")
    assert lex.to_yivo("בלײ") == nfd("בלײַ")


def test_impossible_regex():
    assert is_impossible("ארץישראל")
    assert not is_impossible("71טן")  # digits at start — fine
    assert is_impossible("דער5זי")  # interior digit run
    assert not is_impossible("123")
    assert is_impossible("LדערC") or is_impossible("Lדער")  # mask mixing


# --- FullSegmenationGuesserTest.scala:33-39 ----------------------------------
def test_remove_external_punct():
    assert remove_external_punct("„רבונו־של־עולם“,") == "רבונו־של־עולם"


# --- StringUtils.scala:7-20 --------------------------------------------------
def test_string_to_chars_keeps_combining_marks():
    chars = string_to_chars(nfd("אַזאַ"))
    assert chars == [nfd("אַ"), "ז", nfd("אַ")]
