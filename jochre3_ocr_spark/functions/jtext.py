"""Java-`(?U)` semantic character predicates and word/punct scanning.

The reference relies on Java regexes with UNICODE_CHARACTER_CLASS:
``\\p{Punct}`` = Unicode general category P, ``\\w`` = alpha + marks +
digits + connector punctuation. Python's ``re`` draws these classes
differently (e.g. combining marks are not ``\\w``), so the predicates are
implemented directly over ``unicodedata`` categories and the scans the
reference does with regexes are implemented as explicit scans. Used by
lexicon splitting (yiddish/.../lexicon/YivoLexicon.scala) and the
punctuation-split rule (yiddish/.../YiddishAltoTransformer.scala:118-189).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# quote chars used for abbreviation detection
# (YiddishAltoTransformer.scala:121: [‛“'"’])
QUOTE_CHARS = frozenset("‛“'\"’")


@lru_cache(maxsize=4096)
def is_punct_char(ch: str) -> bool:
    """Java (?U)\\p{Punct}: Unicode general category P*."""
    return unicodedata.category(ch).startswith("P")


@lru_cache(maxsize=4096)
def is_word_char(ch: str) -> bool:
    """Java (?U)\\w: [\\p{Alpha}\\p{gc=Mn}\\p{gc=Me}\\p{gc=Mc}\\p{Digit}\\p{gc=Pc}]."""
    cat = unicodedata.category(ch)
    return (
        ch.isalpha()
        or cat in ("Mn", "Me", "Mc", "Pc")
        or unicodedata.digit(ch, None) is not None
    )


def is_all_punct(s: str) -> bool:
    """matches (?U)\\p{Punct}+"""
    return bool(s) and all(is_punct_char(c) for c in s)


def is_all_word(s: str) -> bool:
    """matches (?U)\\w+"""
    return bool(s) and all(is_word_char(c) for c in s)


def is_all_digits(s: str) -> bool:
    """matches (?U)\\d+ (Java (?U)\\d = Unicode Nd)."""
    return bool(s) and all(unicodedata.category(c) == "Nd" for c in s)


# mutable memo sets: set-membership is ~4× cheaper than an lru_cache call
# in this hot path (has_punct_and_not runs once per word per document)
_PUNCT_CHARS: set = set()
_NONPUNCT_CHARS: set = set()


def has_punct_and_not(s: str) -> bool:
    """Java regex ``\\p{Punct}[^\\p{Punct}]|[^\\p{Punct}]\\p{Punct}``
    find-first: any adjacent (punct, non-punct) pair in either order —
    equivalent to "contains both a punct and a non-punct char" (any
    mixed string has an adjacent differing pair).
    Reference: YiddishAltoTransformer.scala:118-119."""
    seen_p = seen_np = False
    for c in s:
        if c in _NONPUNCT_CHARS:
            seen_np = True
        elif c in _PUNCT_CHARS:
            seen_p = True
        elif unicodedata.category(c).startswith("P"):
            _PUNCT_CHARS.add(c)
            seen_p = True
        else:
            _NONPUNCT_CHARS.add(c)
            seen_np = True
        if seen_p and seen_np:
            return True
    return False


def is_quote(s: str) -> bool:
    """matches [‛“'"’] (single char)."""
    return len(s) == 1 and s in QUOTE_CHARS


def is_abbreviation(s: str) -> bool:
    """matches (?U)\\w+[‛“'"’]\\w+ — a quote embedded between word runs."""
    for i, c in enumerate(s):
        if c in QUOTE_CHARS:
            return is_all_word(s[:i]) and is_all_word(s[i + 1 :])
    return False


def is_decimal_number(s: str) -> bool:
    """matches (?U)\\d+\\.\\d+"""
    i = s.find(".")
    return i > 0 and is_all_digits(s[:i]) and is_all_digits(s[i + 1 :])


def split_punct_runs(s: str) -> list[str]:
    """Split at boundaries between punct runs and non-punct runs, i.e.
    Java split on ``((?<=\\p{Punct}+)|(?=\\p{Punct}+))``.

    Java's lookbehind-with-quantifier boundary effectively splits between
    every punct/non-punct transition AND between consecutive punctuation
    chars (``(?=\\p{Punct}+)`` fires before each punct char; the quantified
    lookbehind in Java matches a bounded width, firing after each punct
    char). Empirically Java splits "ab-,cd" into [ab, -, ",", cd] —
    punctuation chars come out one by one; word runs stay whole.
    Reference: YivoLexicon.scala (punctuationSplitter).
    """
    if not s:
        return [s]
    out: list[str] = []
    cur = s[0]
    for prev, c in zip(s, s[1:]):
        p, q = is_punct_char(prev), is_punct_char(c)
        if q or (p and not q):
            # boundary before any punct char, and after a punct run
            out.append(cur)
            cur = c
        else:
            cur += c
    out.append(cur)
    return out
