"""ALTO post-processing rules (the reference's AltoTransformer stage).

Pipeline order matches AltoTransformer.processPage
(core/alto/AltoTransformer.scala:40-57): simplify contents → specific
rules (hyphen split, punctuation split, number reverse —
yiddish/.../YiddishAltoTransformer.scala:97-103) → optional glyph
removal → spelling alternatives.

All functions are pure tree rewrites used inside pandas-UDF kernels and
by the golden oracle.
"""

from __future__ import annotations

import re

from jochre3_ocr_spark.functions import jtext
from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.functions.simplify import simplify, string_to_chars
from jochre3_ocr_spark.functions.translit import transliterate
from jochre3_ocr_spark.operators.spantree import (
    ComposedBlock,
    Document,
    Glyph,
    Media,
    Hyphen,
    Rect,
    Space,
    TextLine,
    Word,
    iter_lines,
    iter_words,
)


# ---------------------------------------------------------------- simplify
def simplify_contents(doc: Document) -> None:
    """AltoTransformer.simplifyContent (core/alto/AltoTransformer.scala:69-79):
    simplify word, glyph and hyphen contents in place."""
    for line in iter_lines(doc):
        for item in line.items:
            if isinstance(item, Word):
                item.content = simplify(item.content)
                for g in item.glyphs:
                    g.content = simplify(g.content)
            elif isinstance(item, Hyphen):
                item.content = simplify(item.content)


# ------------------------------------------------------------ glyphs→word
def glyphs_to_word(initial: Word, glyphs: list[Glyph], confidence: float) -> Word:
    """YiddishAltoTransformer.glyphsToWord (:194-231): rebuild a word from
    a glyph subsequence — bbox union, simplified content, mean glyph
    confidence for pure-punctuation fragments."""
    content = "".join(g.content for g in glyphs)
    simplified = simplify(content)
    rect = glyphs[0].rect
    for g in glyphs[1:]:
        rect = rect.union(g.rect)
    glyph_conf = (
        sum(g.confidence for g in glyphs) / len(glyphs) if glyphs else 0.0
    )
    conf = glyph_conf if jtext.is_all_punct(content) else confidence
    return Word(
        content=simplified,
        rect=rect,
        glyphs=glyphs,
        alternatives=list(initial.alternatives),
        confidence=conf,
        language=initial.language,
        subs_type=initial.subs_type,
        subs_content=initial.subs_content,
    )


# ------------------------------------------------------ punctuation split
def punctuation_split_rule(doc: Document) -> None:
    """YiddishAltoTransformer.punctuationSplitRule (:127-189): split words
    at punctuation/non-punctuation glyph boundaries, protecting
    abbreviations (quote between word runs) and decimal numbers
    (dot between digit runs) via triplet look-around."""
    for line in iter_lines(doc):
        new_items = []
        for item in line.items:
            if not isinstance(item, Word) or not jtext.has_punct_and_not(
                item.content
            ):
                new_items.append(item)
                continue
            # group glyphs into alternating punct / non-punct runs, testing
            # the accumulated run content like the reference fold (:137-151).
            # Groups are punct-homogeneous by construction, so the
            # accumulated content's is_all_punct equals the group's flag —
            # track the bool instead of re-joining the run per glyph.
            groups: list[list[Glyph]] = []
            last_flag: bool | None = None
            for glyph in item.glyphs:
                flag = jtext.is_all_punct(glyph.content)
                if not groups or flag != last_flag:
                    groups.append([glyph])
                    last_flag = flag
                else:
                    groups[-1].append(glyph)
            contents = ["".join(g.content for g in grp) for grp in groups]
            n = len(contents)

            def at(i: int) -> str:
                return contents[i] if 0 <= i < n else ""

            protected = set()
            for i in range(n):
                joined = at(i - 1) + at(i) + at(i + 1)
                if (jtext.is_quote(at(i)) and jtext.is_abbreviation(joined)) or (
                    at(i) == "." and jtext.is_decimal_number(joined)
                ):
                    protected.add(i)
            merged: list[list[Glyph]] = []
            for i, grp in enumerate(groups):
                if merged and (i in protected or (i - 1) in protected):
                    merged[-1] = merged[-1] + grp
                else:
                    merged.append(grp)
            new_items.extend(
                glyphs_to_word(item, grp, item.confidence) for grp in merged
            )
        line.items = new_items


# -------------------------------------------------------- number reversal
_NUMBER_RE = re.compile(r"(?a)\d+\.?\d+")
_NUMBER_HEBREW_RE = re.compile(
    r"(?a)(\d+)([\u0590-\u05ff\ufb1d-\ufb4f]+)"
)


def reverse_number_rule(doc: Document) -> None:
    """YiddishAltoTransformer.reverseNumberRule (:233-248): BiDi repair —
    reverse digit runs (24→42, 123.45→54.321, 71טן→17טן)."""
    for word in iter_words(doc):
        content = word.content
        if _NUMBER_RE.fullmatch(content):
            word.content = content[::-1]
        else:
            m = _NUMBER_HEBREW_RE.fullmatch(content)
            if m:
                word.content = m.group(1)[::-1] + m.group(2)


# ------------------------------------------------------------ hyphen split
_HYPHEN_SPLIT_RE = re.compile(r"^(.+)([-־])$", re.DOTALL)


def add_hyphen_rule(doc: Document) -> None:
    """YiddishAltoTransformer.addHyphenRule (:250-352): peel a trailing
    hyphen off the last word of each line into a HYP element, splitting a
    fused letters+hyphen last glyph by width arithmetic."""
    for line in iter_lines(doc):
        if not line.items or not isinstance(line.items[-1], Word):
            continue
        word = line.items[-1]
        m = _HYPHEN_SPLIT_RE.match(word.content)
        if not m:
            continue
        before_hyphen, hyphen_content = m.group(1), m.group(2)
        replacement: list = []
        if len(word.glyphs) > 1 and word.content.endswith(word.glyphs[-1].content):
            last_glyph = word.glyphs[-1]
            string_glyphs = word.glyphs[:-1]
            if len(last_glyph.content) <= 1:
                letter_glyph, hyphen_glyph = None, last_glyph
            else:
                # fused letters+hyphen glyph: split widths evenly (RTL)
                n_chars = len(last_glyph.content)
                width_hyphen = last_glyph.rect.width // n_chars
                width_letters = width_hyphen * (n_chars - 1)
                letter_glyph = Glyph(
                    last_glyph.content[: n_chars - 1],
                    Rect(
                        last_glyph.rect.left + width_hyphen,
                        last_glyph.rect.top,
                        width_letters,
                        last_glyph.rect.height,
                    ),
                    last_glyph.confidence,
                )
                hyphen_glyph = Glyph(
                    last_glyph.content[n_chars - 1 :],
                    Rect(
                        last_glyph.rect.left,
                        last_glyph.rect.top,
                        width_hyphen,
                        last_glyph.rect.height,
                    ),
                    last_glyph.confidence,
                )
            new_glyphs = string_glyphs + ([letter_glyph] if letter_glyph else [])
            if new_glyphs:
                replacement = [
                    glyphs_to_word(word, new_glyphs, word.confidence),
                    Hyphen(hyphen_glyph.content, hyphen_glyph.rect),
                ]
        else:
            # no hyphen glyph — split on content alone (:313-337); the odd
            # hyphen rectangle (top/height swapped) is faithful to the
            # reference and irrelevant since we never emit geometry
            n_total = len(string_to_chars(before_hyphen)) + 1
            width_hyphen = word.rect.width // n_total
            width_letters = width_hyphen * (n_total - 1)
            replacement = [
                Word(
                    content=before_hyphen,
                    rect=Rect(
                        word.rect.left - width_hyphen,
                        word.rect.top,
                        width_letters,
                        word.rect.height,
                    ),
                    glyphs=word.glyphs,
                    alternatives=list(word.alternatives),
                    confidence=word.confidence,
                    language=word.language,
                    subs_type=word.subs_type,
                    subs_content=word.subs_content,
                ),
                Hyphen(
                    hyphen_content,
                    Rect(word.rect.left, word.rect.height, width_hyphen, word.rect.top),
                ),
            ]
        if replacement:
            line.items = line.items[:-1] + replacement


# -------------------------------------------------------------- glyph drop
def glyph_remover(doc: Document) -> None:
    """AltoTransformer.glyphRemover (core/alto/AltoTransformer.scala:80-82)."""
    for word in iter_words(doc):
        word.glyphs = []


# ------------------------------------------------------------ alternatives
# shtumer alef: word-initial alef not followed by yud/vov/tsvey-yudn/SPACE/
# pasekh/komets, or medial alef not followed by pasekh/komets
# (YiddishAltoTransformer.scala:24 — the char class includes a literal space)
_SHTUMER_ALEF = re.compile("^א(?![יוײ ַָ])|(?<!^)א(?![ַָ])")
_NON_ABBREV_APOSTROPHE = re.compile("['‛’](\\w\\w+)", re.UNICODE)

PURPOSE_YIVO = "YIVO"
PURPOSE_ROMAN = "Roman"
PURPOSE_YIVO_HYPH = "YIVOHyphenated"
PURPOSE_ROMAN_HYPH = "RomanHyphenated"


def _alternatives_for(
    content: str, lexicon: Lexicon, hyphenated: bool
) -> set[tuple[str, str]]:
    """YiddishAltoTransformer.getAlternatives (:34-95)."""
    if jtext.has_punct_and_not(content):
        stripped = _NON_ABBREV_APOSTROPHE.sub(r"\1", content)
    else:
        stripped = content
    yivo = lexicon.to_yivo(stripped)

    if lexicon.get_frequency(yivo) > 0 and yivo != "א":
        fixed = yivo
    elif not _SHTUMER_ALEF.search(yivo):
        fixed = yivo
    else:
        # expand every shtumer alef to pasekh/komets alef, in match order
        positions = [m.start() for m in _SHTUMER_ALEF.finditer(yivo)]
        alternatives = [yivo]
        for pos in positions:
            alternatives = [
                a[:pos] + marker + a[pos + 1 :]
                for a in alternatives
                for marker in ("A", "O")
            ]
        expanded = [a.replace("A", "אַ").replace("O", "אָ") for a in alternatives]
        fixed = next(
            (a for a in expanded if lexicon.get_frequency(a) > 0), expanded[0]
        )

    out: set[tuple[str, str]] = set()
    if fixed != content:
        out.add((PURPOSE_YIVO_HYPH if hyphenated else PURPOSE_YIVO, fixed))
    romanized = transliterate(fixed)
    if romanized != content:
        out.add((PURPOSE_ROMAN_HYPH if hyphenated else PURPOSE_ROMAN, romanized))
    return out


def _alternatives_cached(content: str, lexicon: Lexicon, hyphenated: bool):
    """Per-lexicon memo: the alternatives of a CONTENT string are pure in
    (content, lexicon, hyphenated), and Zipfian corpora repeat words
    heavily — the cache lives on the Lexicon (stable per worker)."""
    cache = getattr(lexicon, "_alt_cache", None)
    if cache is None:
        cache = {}
        lexicon._alt_cache = cache
    key = (content, hyphenated)
    hit = cache.get(key)
    if hit is None:
        hit = frozenset(_alternatives_for(content, lexicon, hyphenated))
        if len(cache) < 262144:
            cache[key] = hit
    return hit


def add_alternatives_rule(doc: Document, lexicon: Lexicon) -> None:
    """AltoTransformer.addStringAlternatives (core/alto/AltoTransformer.scala:62-67)
    + Yiddish getAlternatives: merge, dedupe, canonical (purpose, content) sort."""
    for word in iter_words(doc):
        alts = set(_alternatives_cached(word.content, lexicon, False))
        if word.subs_content:
            alts |= _alternatives_cached(word.subs_content, lexicon, True)
        merged = alts | set(word.alternatives)
        word.alternatives = sorted(merged)


# ---------------------------------------------------- corpus glyph merge
# YiddishCorpusTransformer.annotateOneFile (yiddish/corpus/
# YiddishCorpusTransformer.scala:40-92): fold adjacent glyph pairs into
# the combined Yiddish ligature glyphs. Defaults mirror
# yiddish/reference.conf:29-34 (only pasekh-tsvey-yudn on).
_TSVEY_YUDN_SECOND = ("י", "יָ", "יַ", "יֵ", "יֶ")
_TSVEY_VOVN_SECOND = ("ו", "וִ", "וַ", "וָ", "וֶ", "וֵ", "וְ")


def merge_yiddish_glyph_pairs(
    word: Word,
    pasekh_tsvey_yudn: bool = True,
    tsvey_yudn: bool = False,
    yud_khirik_yud: bool = False,
    tsvey_vovn: bool = False,
) -> Word:
    """Returns the word with ligature glyph pairs combined (union bbox,
    confidence 1.0) and, when anything merged, the content rebuilt from
    the glyph sequence — the if-chain order matches the reference."""
    new_glyphs: list[Glyph] = []
    changed = False
    for glyph in word.glyphs:
        if new_glyphs:
            prev = new_glyphs[-1]
            merged = None
            if pasekh_tsvey_yudn and glyph.content == "יַ" and prev.content == "י":
                merged = "ײַ"
            elif (
                tsvey_yudn
                and glyph.content in _TSVEY_YUDN_SECOND
                and prev.content == "י"
            ):
                merged = "ײ"
            elif (
                yud_khirik_yud and glyph.content == "יִ" and prev.content == "י"
            ):
                merged = "ייִ"
            elif (
                tsvey_vovn
                and glyph.content in _TSVEY_VOVN_SECOND
                and prev.content == "ו"
            ):
                merged = "װ"
            if merged is not None:
                new_glyphs[-1] = Glyph(
                    merged, prev.rect.union(glyph.rect), 1.0
                )
                changed = True
                continue
        new_glyphs.append(glyph)
    if not changed:
        return word
    return Word(
        content="".join(g.content for g in new_glyphs),
        rect=word.rect,
        glyphs=new_glyphs,
        alternatives=word.alternatives,
        confidence=word.confidence,
        language=word.language,
        subs_type=word.subs_type,
        subs_content=word.subs_content,
    )


def merge_yiddish_glyph_pairs_doc(doc: Document, **flags) -> None:
    """Alto.transform over every word (YiddishCorpusTransformer.scala:40)."""
    for block in doc.blocks:
        if isinstance(block, Media):
            continue
        tbs = block.blocks if isinstance(block, ComposedBlock) else [block]
        for tb in tbs:
            for line in tb.lines:
                line.items = [
                    merge_yiddish_glyph_pairs(item, **flags)
                    if isinstance(item, Word)
                    else item
                    for item in line.items
                ]
