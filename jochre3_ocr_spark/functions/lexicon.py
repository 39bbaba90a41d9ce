"""Lexicon semantics: known/unknown/impossible frequencies and YIVO repair.

Reimplements the reference's Lexicon / TextFileLexicon / YivoLexicon
(core/lexicon/Lexicon.scala:5-29, core/lexicon/TextFileLexicon.scala:16-57,
yiddish/.../lexicon/YivoLexicon.scala:34-200):

* ``get_frequency`` → 1 for a known word, 0 unknown, −1 impossible;
  words are split on punctuation and the minimum over parts is taken,
  punctuation/number parts count as 1 (YivoLexicon.scala:39-61).
* ``is_impossible`` → the reference's impossible-word regex
  (YivoLexicon.scala: medial final letter, mixed masked-Latin/Hebrew,
  interior digit run).
* ``to_yivo`` → simplify + orthographic repair. The reference delegates
  to an external artifact (com.joliciel.yivoTranscriber.YivoTranscriber,
  not part of the reference repo), so the repair here is a
  lexicon-guided candidate search over the classic daytshmerish→YIVO
  rewrites (silent ה deletion, ײ→ײַ), returning the first known
  candidate — reproducing the reference's documented test vectors
  (מעהר→מער, בלײ→בלײַ).

In Spark the entry set ships to executors as an ``sc.broadcast`` set via
:class:`Lexicon`; all lookups happen inside pandas-UDF kernels.
"""

from __future__ import annotations

from functools import lru_cache


from jochre3_ocr_spark.functions import jtext
from jochre3_ocr_spark.functions.simplify import simplify

# final (word-end-only) Hebrew letters
_FINAL_LETTERS = frozenset("ןםךץף")
_HEBREW = frozenset(chr(c) for c in range(0x05D0, 0x05EB))


def is_impossible(word: str) -> bool:
    """Impossible-word regex (YivoLexicon.scala impossibleWordRegex):
    ``(\\w*[ןםךץף]\\w+)|(\\w*[LC]\\w*[א-ת]\\w*)|(\\w*[א-ת]\\w*[LC]\\w*)|(\\w*\\D\\w*\\d\\w*\\D\\w*)``
    as a full match."""
    if not word:
        return False
    chars = list(word)
    all_word = all(jtext.is_word_char(c) for c in chars)
    if all_word:
        # a final letter anywhere except the last position
        if any(c in _FINAL_LETTERS for c in chars[:-1]):
            return True
        # masked Latin/Cyrillic marker mixed with Hebrew letters
        has_mask = any(c in "LC" for c in chars)
        has_hebrew = any(c in _HEBREW for c in chars)
        if has_mask and has_hebrew:
            return True
    # a digit with a non-digit somewhere before AND after (word chars around)
    digit_positions = [i for i, c in enumerate(chars) if c.isdigit()]
    if digit_positions:
        first_d, last_d = digit_positions[0], digit_positions[-1]
        if any(not c.isdigit() for c in chars[:first_d]) and any(
            not c.isdigit() for c in chars[last_d + 1 :]
        ):
            return True
    return False


# single-edit rewrites for the to_yivo repair (daytshmerish → YIVO):
#   drop interior silent ה (מעהר→מער), add pasekh to bare tsvey-yudn
#   (בלײ→בלײַ), add rafe to bare פ (פליגעל→פֿליגעל), drop interior silent ע
#   (פֿליגעל→פֿליגל). Candidates are explored breadth-first (≤3 edits) —
#   deterministic order, first lexicon hit wins.
_PASEKH = "ַ"
_RAFE = "ֿ"
_DAGESH = "ּ"


def _single_edits(word: str) -> list[str]:
    out: list[str] = []
    n = len(word)
    for i, c in enumerate(word):
        nxt = word[i + 1] if i + 1 < n else ""
        if c == "ה" and 0 < i < n - 1:
            out.append(word[:i] + word[i + 1 :])
        elif c == "ײ" and nxt != _PASEKH:
            out.append(word[: i + 1] + _PASEKH + word[i + 1 :])
        elif c == "פ" and nxt not in (_RAFE, _DAGESH):
            out.append(word[: i + 1] + _RAFE + word[i + 1 :])
        elif c == "ע" and 0 < i < n - 1:
            out.append(word[:i] + word[i + 1 :])
    return out


def _yivo_candidates(word: str, max_edits: int = 3, cap: int = 200) -> list[str]:
    seen = {word}
    frontier = [word]
    out = [word]
    for _depth in range(max_edits):
        nxt: list[str] = []
        for w in frontier:
            for cand in _single_edits(w):
                if cand not in seen:
                    seen.add(cand)
                    nxt.append(cand)
                    out.append(cand)
                    if len(out) >= cap:
                        return out
        frontier = nxt
    return out


class Lexicon:
    """Known-word set with the reference's frequency semantics.

    ``entries`` must already be simplified (the reference simplifies at
    load: TextFileLexicon.loadFromResource passes the text simplifier).
    """

    def __init__(self, entries: frozenset[str] | set[str]):
        self.entries = frozenset(entries)
        self._to_yivo_cached = lru_cache(maxsize=131072)(self._to_yivo)
        self._freq_cached = lru_cache(maxsize=131072)(self._get_frequency)

    @classmethod
    def from_words(cls, words) -> "Lexicon":
        return cls(frozenset(simplify(w) for w in words))

    # -- TextFileLexicon.getFrequency (base): 1 known / -1 impossible / 0 --
    def _base_frequency(self, word: str) -> int:
        if word in self.entries:
            return 1
        if is_impossible(word):
            return -1
        return 0

    def _to_yivo(self, word: str, presimplified: bool = False) -> str:
        w = word if presimplified else simplify(word)
        if self._base_frequency(w) > 0:
            return w
        for cand in _yivo_candidates(w):
            if cand in self.entries:
                return cand
        return w

    def to_yivo(self, word: str, presimplified: bool = False) -> str:
        return self._to_yivo_cached(word, presimplified)

    standardize = to_yivo

    def get_frequency(self, word: str, presimplified: bool = False) -> int:
        return self._freq_cached(word, presimplified)

    def _get_frequency(self, word: str, presimplified: bool = False) -> int:
        """YivoLexicon.getFrequency: min over punctuation-split parts."""
        freqs = []
        for kind, text in split_word_on_punctuation(word):
            if kind in ("punct", "number"):
                freqs.append(1)
            elif kind == "abbrev":
                no_quote = "".join(c for c in text if c not in jtext.QUOTE_CHARS)
                freqs.append(self._base_frequency(self.to_yivo(no_quote, presimplified)))
            else:
                freqs.append(self._base_frequency(self.to_yivo(text, presimplified)))
        return min(freqs) if freqs else 0


def split_word_on_punctuation(word: str) -> list[tuple[str, str]]:
    """Split into (kind, text) parts; kind ∈ {text, number, punct, abbrev}.

    Mirrors YivoLexicon.splitWordOnPunctuation: split at punct-run
    boundaries; a quote between word-runs re-joins into an abbreviation
    part; a dot between digit runs re-joins into a number part.
    """
    if not jtext.has_punct_and_not(word):
        if jtext.is_all_punct(word):
            return [("punct", word)]
        if jtext.is_all_digits(word):
            return [("number", word)]
        return [("text", word)]

    splits = jtext.split_punct_runs(word)
    n = len(splits)

    def at(i: int) -> str:
        return splits[i] if 0 <= i < n else ""

    abbrev_idx = set()
    decimal_idx = set()
    for i in range(n):
        prev, cur, nxt = at(i - 1), at(i), at(i + 1)
        joined = prev + cur + nxt
        if jtext.is_quote(cur) and jtext.is_abbreviation(joined):
            abbrev_idx.add(i)
        elif cur == "." and jtext.is_decimal_number(joined):
            decimal_idx.add(i)

    combined = abbrev_idx | decimal_idx
    parts: list[tuple[str, str]] = []
    for i, split in enumerate(splits):
        if i in abbrev_idx:
            parts.append(("abbrev", at(i - 1) + split + at(i + 1)))
        elif i in decimal_idx:
            parts.append(("number", at(i - 1) + split + at(i + 1)))
        elif (i - 1) in combined or (i + 1) in combined:
            continue
        elif jtext.is_all_punct(split):
            parts.append(("punct", split))
        elif jtext.is_all_digits(split):
            parts.append(("number", split))
        else:
            parts.append(("text", split))
    return parts


def remove_external_punct(word: str) -> str:
    """Strip leading/trailing punctuation runs
    (FullSegmentationGuesser.scala removeExternalPunct:
    ``(?U)^\\p{Punct}+|\\p{Punct}+$``)."""
    start, end = 0, len(word)
    while start < end and jtext.is_punct_char(word[start]):
        start += 1
    while end > start and jtext.is_punct_char(word[end - 1]):
        end -= 1
    return word[start:end]


def load_lexicon(paths, simplify_entries: bool = True) -> "Lexicon":
    """TextFileLexicon.load / loadFromResource
    (core/lexicon/TextFileLexicon.scala:62-135): read one word per line
    from each text file (a directory loads every *.txt inside), simplify
    entries at load like the reference does."""
    import os

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".txt")
            )
        else:
            files.append(p)
    words: set[str] = set()
    for f in files:
        if f.endswith(".zip"):
            # TextFileLexicon.deserialize analog (TextFileLexicon.scala:
            # 62-77): the reference zips a Java-serialized Set; the
            # portable form here is a zip of *.txt word files
            import io as _io
            import zipfile

            with zipfile.ZipFile(f) as zf:
                for name in sorted(zf.namelist()):
                    if name.endswith(".txt"):
                        with zf.open(name) as fh:
                            for line in _io.TextIOWrapper(fh, "utf-8"):
                                if line.strip():
                                    words.add(line.strip())
            continue
        with open(f, encoding="utf-8") as fh:
            words.update(w.strip() for w in fh if w.strip())
    return Lexicon.from_words(words) if simplify_entries else Lexicon(frozenset(words))


def serialize_lexicon(words, path: str) -> None:
    """Zip-serialized lexicon (the portable analog of
    TextFileLexicon.serialize): entries.txt inside a zip."""
    import zipfile

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("entries.txt", "\n".join(sorted(words)) + "\n")
