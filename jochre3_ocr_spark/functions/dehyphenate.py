"""Standalone text dehyphenation (the /dehyphenate API operator).

Port of YiddishDehyphenator (yiddish/.../YiddishDehyphenator.scala:24-137):
input text has physical line breaks (single \\n) and paragraph breaks
(double \\n); output removes physical breaks, joining words hyphenated
across lines with or without the hyphen via a 4-branch lexicon rule:

1. last word ends in a final letter (ך ם ן ף ץ) → keep hyphen;
2. joined form in lexicon → drop hyphen;
3. both halves in lexicon → keep hyphen;
4. joined-with-hyphen in lexicon → keep hyphen;
else drop the hyphen. Paragraphs come out on single line breaks.
"""

from __future__ import annotations

from jochre3_ocr_spark.functions import jtext
from jochre3_ocr_spark.functions.lexicon import Lexicon

_FINAL_LETTERS = "ךםןףץ"


def _is_sep(ch: str) -> bool:
    """(?U)[\\p{Punct}\\s]"""
    return ch.isspace() or jtext.is_punct_char(ch)


def _last_word(line: str) -> str:
    """The token before the trailing hyphen: text after the last
    separator, excluding the hyphen itself (the reference drops the final
    separator match — the hyphen — then takes the previous one)."""
    seps = [i for i, c in enumerate(line) if _is_sep(c)]
    seps = seps[:-1]  # the trailing ־ is itself a separator match
    if seps:
        return line[seps[-1] + 1 : len(line) - 1]
    return line[: len(line) - 1]


def _first_word(line: str) -> str:
    for i, c in enumerate(line):
        if _is_sep(c):
            return line[:i]
    return line


def dehyphenate(text: str, lexicon: Lexicon) -> str:
    lines = text.split("\n")
    if len(lines) <= 1:
        return text
    out = []
    nexts = lines[1:] + [""]
    for line, next_line in zip(lines, nexts):
        if line.endswith("־"):
            last = _last_word(line)
            first = _first_word(next_line)
            full = f"{last}{first}"
            last_yivo = lexicon.to_yivo(last, presimplified=False)
            first_yivo = lexicon.to_yivo(first)
            full_yivo = lexicon.to_yivo(full)
            full_with_hyphen = f"{last_yivo}־{first_yivo}"

            if last_yivo and last_yivo[-1] in _FINAL_LETTERS and len(last_yivo) > 1:
                keep = True
            elif lexicon.get_frequency(full_yivo, presimplified=True) > 0:
                keep = False
            elif (
                lexicon.get_frequency(last_yivo, presimplified=True) > 0
                and lexicon.get_frequency(first_yivo, presimplified=True) > 0
            ):
                keep = True
            elif lexicon.get_frequency(full_with_hyphen, presimplified=True) > 0:
                keep = True
            else:
                keep = False

            if not keep:
                out.append(line[:-1])
            elif not next_line:
                out.append(line + "\n")
            else:
                out.append(line)
        elif not next_line:
            out.append(line + "\n")
        elif not line:
            out.append(line)
        else:
            out.append(line + " ")
    return "".join(out)
