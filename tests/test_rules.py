"""Span-tree rule tests: exact vectors from AltoTest /
YiddishAltoTransformerTest / FullSegmenationGuesserTest."""

import unicodedata

import pytest

from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.operators import alto_rules
from jochre3_ocr_spark.operators.guesser import (
    Guess,
    GuessWithScore,
    get_hyphenation_status,
)
from jochre3_ocr_spark.operators.kernel import process_document
from jochre3_ocr_spark.operators.spantree import flatten, parse_spans


def nfd(s):
    return unicodedata.normalize("NFD", s)


def make_spans(lines):
    """Build doc spans from a list of lines; each line is a list of
    (kind, text) with kinds word/space/hyphen; words auto-spaced if the
    entry is a plain string."""
    spans = []

    def emit(kind, text=None, media=None):
        spans.append((kind, text, media, len(spans)))

    emit("block")
    for line in lines:
        emit("line")
        for kind, text in line:
            emit(kind, text)
    return spans


# --- AltoTest."processedText" (core/src/test/.../AltoTest.scala:15-33) -----
def test_processed_content_hyphen_join():
    spans = make_spans(
        [
            [("word", "Jimi"), ("space", " "), ("word", "Hend"), ("hyphen", "-")],
            [("word", "rix"), ("space", " "), ("word", "Experience")],
        ]
    )
    doc = parse_spans("d", spans)
    # set SUBS_CONTENT like the reference fixture does
    line1 = doc.blocks[0].lines[0]
    line1.words[-1].subs_type = "HypPart1"
    line1.words[-1].subs_content = "Hendrix"
    doc.blocks[0].lines[1].words[0].subs_type = "HypPart2"
    assert doc.blocks[0].processed_content == "Jimi Hendrix Experience"
    assert doc.content == "Jimi Hend-\nrix Experience"


# --- FullSegmenationGuesserTest.scala:45-89 (hyphenation status) ------------
@pytest.fixture(scope="module")
def lex():
    return Lexicon.from_words(["געװאָרן", "ארץ", "ישראל"])


def _gws(text):
    chars = tuple(unicodedata.normalize("NFD", text))
    g = Guess(chars, tuple(1.0 for _ in chars))
    return GuessWithScore(g, g.score)


@pytest.mark.parametrize(
    "part1,part2,status,joined",
    [
        ("ארץ־", "ישראל", "with_hyphen", "ארץ־ישראל"),
        ("גע־", "װאָרן", "without_hyphen", "געװאָרן"),
        ("ארץ־", "כוש", "with_hyphen", "ארץ־כוש"),  # joined form impossible
        ("גע־", "שריבן", "without_hyphen", "געשריבן"),  # unknown but possible
    ],
)
def test_hyphenation_status(lex, part1, part2, status, joined):
    pair = get_hyphenation_status(_gws(part1), _gws(part2), lex, 0.5)
    assert pair.status == status
    assert pair.hyphenated_word == nfd(joined)


# --- YiddishAltoTransformerTest: number reversal ----------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [("24", "42"), ("123.45", "54.321"), ("71טן", "17טן"), ("5", "5")],
)
def test_reverse_numbers(raw, expected):
    doc = parse_spans("d", make_spans([[("word", raw)]]))
    alto_rules.reverse_number_rule(doc)
    assert doc.blocks[0].lines[0].words[0].content == nfd(expected)


# --- YiddishAltoTransformerTest: punctuation split ---------------------------
def word_contents(doc):
    return [w.content for w in doc.blocks[0].lines[0].words]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("עפּל,", ["עפּל", ","]),
        ("„װאָס“", ["„", "װאָס", "“"]),
        ("123.45", ["123.45"]),  # decimal number protected
        # abbreviation protected (content re-simplified by glyphsToWord: "→“)
        ('מײד"ל', ["מײד“ל"]),
        ("(ארץ)", ["(", "ארץ", ")"]),
        ("שלום.", ["שלום", "."]),
    ],
)
def test_punctuation_split(raw, expected):
    doc = parse_spans("d", make_spans([[("word", raw)]]))
    alto_rules.punctuation_split_rule(doc)
    assert word_contents(doc) == [nfd(e) for e in expected]


def test_punctuation_split_keeps_spaces():
    spans = make_spans([[("word", "דער"), ("space", " "), ("word", "זי")]])
    doc = parse_spans("d", spans)
    alto_rules.punctuation_split_rule(doc)
    kinds = [type(i).__name__ for i in doc.blocks[0].lines[0].items]
    assert kinds == ["Word", "Space", "Word"]


# --- YiddishAltoTransformerTest: hyphen split --------------------------------
def test_add_hyphen_rule_splits_trailing_hyphen():
    doc = parse_spans("d", make_spans([[("word", "גע־")]]))
    alto_rules.add_hyphen_rule(doc)
    items = doc.blocks[0].lines[0].items
    assert [type(i).__name__ for i in items] == ["Word", "Hyphen"]
    assert items[0].content == nfd("גע")
    assert items[1].content == "־"


def test_add_hyphen_rule_fused_glyph():
    # last glyph fuses a letter + hyphen ("ע־") — split it
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "גע־", None, 2),
        ("glyph", "ג", None, 3),
        ("glyph", "ע־", None, 4),
    ]
    doc = parse_spans("d", spans)
    alto_rules.add_hyphen_rule(doc)
    items = doc.blocks[0].lines[0].items
    assert [type(i).__name__ for i in items] == ["Word", "Hyphen"]
    assert items[0].content == nfd("גע")
    assert [g.content for g in items[0].glyphs] == ["ג", "ע"]
    assert items[1].content == "־"


def test_add_hyphen_rule_ignores_plain_word():
    doc = parse_spans("d", make_spans([[("word", "דער")]]))
    alto_rules.add_hyphen_rule(doc)
    assert [type(i).__name__ for i in doc.blocks[0].lines[0].items] == ["Word"]


# --- YiddishAltoTransformerTest.scala:22-84 (alternatives) -------------------
@pytest.fixture(scope="module")
def alt_lex():
    return Lexicon.from_words(["מער", "בלײַ", "אַ", "אַטאָם", "פֿליגל"])


@pytest.mark.parametrize(
    "content,expected",
    [
        ("מעהר", [("Roman", "mer"), ("YIVO", "מער")]),
        ("בלײ", [("Roman", "blay"), ("YIVO", "בלײַ")]),
        ("א", [("Roman", "a"), ("YIVO", "אַ")]),
        ("אטאם", [("Roman", "atom"), ("YIVO", "אַטאָם")]),
    ],
)
def test_alternatives(alt_lex, content, expected):
    doc = parse_spans("d", make_spans([[("word", content)]]))
    alto_rules.add_alternatives_rule(doc, alt_lex)
    got = doc.blocks[0].lines[0].words[0].alternatives
    assert got == [(p, nfd(c)) for p, c in expected]


def test_alternatives_hyphenated(alt_lex):
    doc = parse_spans("d", make_spans([[("word", "פלי")]]))
    w = doc.blocks[0].lines[0].words[0]
    w.subs_type = "HypPart1"
    w.subs_content = "פליגעל"
    alto_rules.add_alternatives_rule(doc, alt_lex)
    alts = dict(w.alternatives)
    assert alts.get("YIVOHyphenated") == nfd("פֿליגל")
    assert alts.get("RomanHyphenated") == "fligl"


# --- end-to-end kernel: span-sequence stability -------------------------------
def test_kernel_deterministic(lex):
    from jochre3_ocr_spark.sources.corpus import generate_doc, lexicon_words

    full_lex = Lexicon.from_words(lexicon_words())
    d = generate_doc(7)
    out1 = process_document(d["doc_id"], d["spans"], full_lex)
    out2 = process_document(d["doc_id"], list(d["spans"]), full_lex)
    assert out1["spans"] == out2["spans"]
    assert out1["text"] == out2["text"]
    assert out1["processed_text"] == out2["processed_text"]


def test_kernel_media_roundtrip():
    lex = Lexicon.from_words(["דער"])
    spans = [
        ("media", None, "img://d/0", 0),
        ("block", None, None, 1),
        ("line", None, None, 2),
        ("word", "דער", None, 3),
    ]
    out = process_document("d", spans, lex)
    assert out["spans"][0][0] == "media"
    assert out["spans"][0][2] == "img://d/0"
    assert out["text"] == nfd("דער")


# --- YiddishAltoTransformerTest additional vectors ---------------------------
def test_keep_spaces_fixed_point():
    """YiddishAltoTransformerTest."keep spaces" (:84-102): a plain page
    is a fixed point of the whole transformer pipeline."""
    from jochre3_ocr_spark.functions.lexicon import Lexicon
    from jochre3_ocr_spark.operators.kernel import process_document

    spans = make_spans(
        [[("word", "Jimi"), ("space", " "), ("word", "Hendrix")]]
    )
    out = process_document("d", spans, Lexicon(frozenset()))
    got = [(k, t) for k, t, m, o in out["spans"] if k in ("word", "space")]
    assert got == [("word", "Jimi"), ("space", " "), ("word", "Hendrix")]
    assert out["text"] == "Jimi Hendrix"


def test_possessive_apostrophe_not_split():
    """YiddishAltoTransformerTest (:305-322): an apostrophe between word
    characters is an abbreviation context — never split."""
    doc = parse_spans("d", make_spans([[("word", "A‛B")]]))
    alto_rules.punctuation_split_rule(doc)
    # one word (re-simplified ‛→’ by glyphsToWord, the pipeline default)
    assert [w.content for w in doc.blocks[0].lines[0].words] == ["A’B"]


def test_alternatives_strip_non_abbreviation_apostrophe():
    """YiddishAltoTransformer.getAlternatives (:38-43): apostrophes before
    2+ word chars are dropped before the YIVO lookup (:206-303 test)."""
    from jochre3_ocr_spark.functions.lexicon import Lexicon

    lex = Lexicon.from_words(["פּסחדיגען"])
    doc = parse_spans("d", make_spans([[("word", "פּסח'דיגען")]]))
    alto_rules.add_alternatives_rule(doc, lex)
    alts = dict(doc.blocks[0].lines[0].words[0].alternatives)
    assert alts.get("YIVO") == nfd("פּסחדיגען")


def test_guess_without_beam_path():
    """beam_width <= 1 → guessWithoutBeam (no hyphenation pairing)."""
    from jochre3_ocr_spark.functions.lexicon import Lexicon
    from jochre3_ocr_spark.operators.kernel import process_document
    from jochre3_ocr_spark.schema import PipelineConfig

    lex = Lexicon.from_words(["געװאָרן"])
    spans = make_spans([[("word", "גע־")], [("word", "װאָרן")]])
    out = process_document(
        "d", spans, lex, PipelineConfig(beam_width=1)
    )
    # hyphen still split into HYP by the transformer, but no SUBS_CONTENT
    kinds = [k for k, *_ in out["spans"]]
    assert "hyphen" in kinds
    assert out["processed_text"] == nfd("גע־ װאָרן")


def test_shtumer_alef_space_in_lookahead():
    """The reference char class is ^א(?![יוײ ַָ]) — a literal SPACE is in
    the negative lookahead (YiddishAltoTransformer.scala:24): word-initial
    alef followed by a space is NOT a shtumer alef."""
    assert alto_rules._SHTUMER_ALEF.search("א ב") is None
    assert alto_rules._SHTUMER_ALEF.search("אב") is not None


def test_worker_lexicon_cache_key_is_stable():
    """Cache key must be content-stable, not id()-based (ADVICE r1): two
    wrapper objects for the same broadcast share one entry; different
    entry sets never collide."""
    from jochre3_ocr_spark.plans.pipeline import _lexicon_cache_key

    class FakeBc:
        def __init__(self, words, bid=None):
            self.value = words
            if bid is not None:
                self._bid = bid

    a1, a2 = FakeBc(["x"], bid=7), FakeBc(["x"], bid=7)
    assert _lexicon_cache_key(a1) == _lexicon_cache_key(a2)
    b1, b2 = FakeBc(["x", "y"]), FakeBc(["x", "z"])
    assert _lexicon_cache_key(b1) != _lexicon_cache_key(b2)
    assert _lexicon_cache_key(FakeBc(["x", "y"])) == _lexicon_cache_key(b1)
