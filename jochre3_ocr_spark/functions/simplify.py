"""Yiddish text simplification to YIVO orthography.

Semantics match the reference YiddishTextSimpifier
(yiddish/.../YiddishTextSimpifier.scala:11-94): NFD normalize, then an
ordered chain of regex rewrites. All character classes below were
extracted codepoint-by-codepoint from the reference patterns; the rewrite
order is identical. Two faithful quirks:

* the reference's ``verticalBar`` pattern is the literal regex ``|``
  (an empty alternation — matches the empty string, replaced by the empty
  string), i.e. a no-op: stray vertical bars are NOT removed. We keep
  that behavior (YiddishTextSimpifier.scala:37, 66).
* output stays in NFD form (the reference never re-composes).

Runs row-at-a-time inside Arrow-batched pandas UDFs (pd.Series.map); the
regexes use only fixed-width lookarounds so Python ``re`` reproduces the
Java semantics exactly.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

# --- ordered rewrite chain (pattern, replacement) -------------------------
_NON_YIVO_NIKUD = re.compile("[ְֱֲֳֵֶֹֻׁ]")
_NON_YIVO_KOMETS = re.compile("(?<!א)ָ")
_PASEKH_TSVEY_YUDN = re.compile("ייַ")
_TSVEY_YUDN = re.compile("(יי)(?!ִ)")
_TSVEY_VOVN = re.compile("(וו)(?!ּ)")
_VOV_YUD = re.compile("(וי)(?!ִ)")
_NON_YIVO_PASEKH = re.compile("(?<![אײ])ַ")
_NON_YIVO_KHIRIK = re.compile("(?<!י)ִ")
_NON_YIVO_DAGESH = re.compile("(?<![וכפבת])ּ")
_NON_YIVO_RAFE = re.compile("(?<![בפכ])ֿ")
_NON_YIVO_SIN_DOT = re.compile("(?<!ש)ׂ")
_NON_STANDARD_MAQAF = re.compile("[-⸗]")
_NON_STANDARD_LONG_DASH = re.compile("[\U0001d199←–—]")
_NON_STANDARD_SINGLE_QUOTE = re.compile("['‛’׳]")
_NON_STANDARD_DOUBLE_QUOTE = re.compile("[\"“״]|(‛‛)|(’’)|('')")
_NON_STANDARD_LOWER_DOUBLE_QUOTE = re.compile("(,,)|(‚‚)")
_OTHER_SYMBOL = re.compile("[▼◦№⁂]")

# Script masking (YiddishTextSimpifier.scala:38-40, 69-75). Java's
# (?U)\p{IsLatin} etc. are script properties; Python re has no script
# classes, so we enumerate the block ranges that cover those scripts'
# letters (sufficient for OCR text; BMP + Latin extended blocks).
_LATIN = re.compile(
    "[A-Za-zÀ-ÿĀ-ɏḀ-ỿⱠ-Ɀ꜠-ꟿ]"
)
_CYRILLIC = re.compile("[Ѐ-ӿԀ-ԯⷠ-ⷿꙀ-ꚟ]")
_GREEK = re.compile("[Ͱ-Ͽἀ-῿]")

_CHAIN = (
    (_NON_YIVO_NIKUD, ""),
    (_NON_YIVO_KOMETS, ""),
    (_PASEKH_TSVEY_YUDN, "ײַ"),
    (_TSVEY_YUDN, "ײ"),
    (_TSVEY_VOVN, "װ"),
    (_VOV_YUD, "ױ"),
    (_NON_YIVO_PASEKH, ""),
    (_NON_YIVO_KHIRIK, ""),
    (_NON_YIVO_DAGESH, ""),
    (_NON_YIVO_RAFE, ""),
    (_NON_YIVO_SIN_DOT, ""),
    (_NON_STANDARD_MAQAF, "־"),
    (_NON_STANDARD_LONG_DASH, "—"),
    (_NON_STANDARD_SINGLE_QUOTE, "’"),
    (_NON_STANDARD_DOUBLE_QUOTE, "“"),
    (_NON_STANDARD_LOWER_DOUBLE_QUOTE, "„"),
    # verticalBar: intentionally omitted — no-op in the reference (see module doc)
    (_OTHER_SYMBOL, "•"),
)


@lru_cache(maxsize=65536)
def simplify(text: str, replace_non_hebrew_alphabets: bool = False) -> str:
    """Normalize to (decomposed) YIVO orthography.

    Reference: YiddishTextSimpifier.simplify, yiddish/.../YiddishTextSimpifier.scala:42-75.
    """
    s = unicodedata.normalize("NFD", text)
    for pattern, repl in _CHAIN:
        s = pattern.sub(repl, s)
    if replace_non_hebrew_alphabets:
        s = _LATIN.sub("L", s)
        s = _CYRILLIC.sub("C", s)
        s = _GREEK.sub("G", s)
    return s


# --- BiDi helpers (core/utils/StringUtils.scala:23-39) ---------------------
_RTL_LANGUAGES = frozenset(
    {"ar", "dv", "fa", "ha", "he", "iw", "ji", "ps", "sd", "ug", "ur", "yi"}
)


def is_left_to_right(language: str) -> bool:
    return language not in _RTL_LANGUAGES


def string_to_chars(string: str) -> list[str]:
    """Split into chars, keeping combining marks attached to their base.

    Reference: StringUtils.stringToChars, core/utils/StringUtils.scala:7-20
    (COMBINING_SPACING_MARK / ENCLOSING_MARK / NON_SPACING_MARK = Unicode
    categories Mc / Me / Mn).
    """
    out: list[str] = []
    for ch in string:
        if unicodedata.category(ch) in ("Mc", "Me", "Mn") and out:
            out[-1] += ch
        else:
            out.append(ch)
    return out
