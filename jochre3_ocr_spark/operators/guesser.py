"""Text guessing: beam search over glyph predictions, lexicon rescoring,
and cross-line hyphenation.

Reimplements FullSegmentationGuesser
(core/text/FullSegmentationGuesser.scala:60-614):

* per-word beam: fold each glyph's top-k predictions through a priority
  queue keeping the ``beam_width`` best sequences; sequence score is the
  geometric mean of glyph confidences (exp(mean(log conf))) (:562-586);
* rescoring: ×1 known, ×0.01 impossible, ×unknown_word_factor unknown
  (:202-220, rescoreGuess);
* cross-line hyphenation: when any beam guess of a line's last word ends
  with the hyphen glyph, cross its beam with the next line's first-word
  beam, pick the best scored pair, and mark SUBS_TYPE/SUBS_CONTENT on
  both halves (:435-560, getHyphenationStatus :222-275). The chosen
  next-line word carries forward into the next fold step — an inherently
  sequential scan, which is why this runs inside the per-document kernel
  and not as a Spark window.

The glyph classifier is pluggable: ``topk_fn(glyph_content) ->
[(outcome, confidence), ...]``. The default is the deterministic
identity oracle (the sandbox has no CNN weights — the reference's model
files are stubs); tests inject controlled confusions.
"""

from __future__ import annotations

import heapq
import math
import re
from dataclasses import dataclass

from jochre3_ocr_spark.functions.lexicon import Lexicon, remove_external_punct
from jochre3_ocr_spark.functions.simplify import simplify
from jochre3_ocr_spark.operators.spantree import (
    Document,
    Space,
    TextLine,
    Word,
    iter_text_blocks,
)
from jochre3_ocr_spark.schema import PipelineConfig

HYP_PART_1 = "HypPart1"
HYP_PART_2 = "HypPart2"


def identity_topk(glyph_content: str) -> list[tuple[str, float]]:
    """Deterministic stand-in for the glyph CNN (GlyphGuesser.scala:51-79)."""
    return [(glyph_content, 1.0)]


# Deterministic look-alike confusion table (the FIXTURES.md glyph_oracle
# "controlled confusions": beam + lexicon rescoring must resolve these).
# Keys/values are decomposed (NFD) like all kernel-side text.
CONFUSION_TABLE: dict[str, list[tuple[str, float]]] = {
    "ו": [("ו", 0.7), ("י", 0.3)],
    "ב": [("ב", 0.8), ("כ", 0.2)],
    "ד": [("ד", 0.75), ("ר", 0.25)],
    "ח": [("ח", 0.8), ("ת", 0.2)],
}


def confusable_topk(glyph_content: str) -> list[tuple[str, float]]:
    """Glyph classifier with deterministic top-2 confusions."""
    return CONFUSION_TABLE.get(glyph_content, [(glyph_content, 1.0)])


class Guess:
    """FullSegmentationGuesser Guess (:105-119): a glyph-outcome sequence
    scored by the geometric mean of confidences (computed eagerly — it is
    read many times per beam step). The log-sum is carried so a beam
    extension scores in O(1); the left-to-right accumulation makes the
    incremental value bit-identical to recomputing the sum."""

    __slots__ = ("outcomes", "confidences", "score", "logsum", "_word")

    def __init__(self, outcomes: tuple[str, ...], confidences: tuple[float, ...]):
        self.outcomes = outcomes
        self.confidences = confidences
        if not outcomes:
            self.logsum = 0.0
            self.score = 1.0
        elif all(c == 1.0 for c in confidences):
            self.logsum = 0.0
            self.score = 1.0  # geo-mean of ones (identity-oracle fast path)
        else:
            ls = 0.0
            for c in confidences:
                ls += math.log(c)
            self.logsum = ls
            self.score = math.exp(ls / len(confidences))
        self._word: str | None = None

    @classmethod
    def extended(cls, parent: "Guess", out: str, conf: float) -> "Guess":
        """O(1)-scored beam extension of ``parent`` by one glyph outcome."""
        g = cls.__new__(cls)
        g.outcomes = parent.outcomes + (out,)
        g.confidences = parent.confidences + (conf,)
        ls = parent.logsum + (0.0 if conf == 1.0 else math.log(conf))
        g.logsum = ls
        g.score = 1.0 if ls == 0.0 else math.exp(ls / len(g.confidences))
        g._word = None
        return g

    @property
    def word(self) -> str:
        if self._word is None:
            self._word = simplify("".join(self.outcomes))
        return self._word

    def __eq__(self, other):
        return (
            isinstance(other, Guess)
            and self.outcomes == other.outcomes
            and self.confidences == other.confidences
        )

    def __repr__(self):
        return f"Guess({self.outcomes!r}, score={self.score:.3f})"


@dataclass
class GuessWithScore:
    guess: Guess
    score: float


def get_beam(
    word: Word, topk_fn, beam_width: int
) -> list[GuessWithScore]:
    """FullSegmentationGuesser.getBeam (:562-586)."""
    # ultra-fast path for the identity oracle: the beam IS the glyph
    # sequence at confidence 1.0 — skip the per-glyph topk plumbing
    if topk_fn is identity_topk:
        n = len(word.glyphs)
        g = Guess(tuple(gl.content for gl in word.glyphs), (1.0,) * n)
        return [GuessWithScore(g, g.score)]
    # fast path: every glyph has a single prediction → the beam is the one
    # deterministic sequence (common case with a confident oracle)
    preds = [topk_fn(g.content) or [(g.content, 1.0)] for g in word.glyphs]
    if all(len(p) == 1 for p in preds):
        g = Guess(
            tuple(p[0][0] for p in preds), tuple(p[0][1] for p in preds)
        )
        return [GuessWithScore(g, g.score)]
    beam: list[Guess] = [Guess((), ())]
    for predictions in preds:
        predictions = predictions[:beam_width]
        top = heapq.nlargest(
            min(beam_width, len(beam)),
            range(len(beam)),
            key=lambda i: (beam[i].score, -i),
        )
        beam = [
            Guess.extended(beam[i], out, conf)
            for i in top
            for out, conf in predictions
        ]
    top = heapq.nlargest(
        min(beam_width, len(beam)),
        range(len(beam)),
        key=lambda i: (beam[i].score, -i),
    )
    return [GuessWithScore(beam[i], beam[i].score) for i in top]


def rescore_guess(
    g: GuessWithScore, lexicon: Lexicon, unknown_word_factor: float
) -> GuessWithScore:
    """rescoreGuess (:208-220)."""
    freq = lexicon.get_frequency(g.guess.word, presimplified=True)
    if freq > 0:
        return g
    if freq < 0:
        return GuessWithScore(g.guess, g.score * 0.01)
    return GuessWithScore(g.guess, g.score * unknown_word_factor)


def rescore_beam(
    beam: list[GuessWithScore], lexicon: Lexicon, unknown_word_factor: float
) -> list[GuessWithScore]:
    """rescoreBeam (:202-206) — stable sort by descending score."""
    rescored = [rescore_guess(g, lexicon, unknown_word_factor) for g in beam]
    return sorted(rescored, key=lambda g: -g.score)


@dataclass
class ScoredPair:
    guess1: GuessWithScore
    guess2: GuessWithScore
    combined_score: float
    status: str  # "none" | "with_hyphen" | "without_hyphen"
    hyphenated_word: str | None


def get_hyphenation_status(
    last_with_hyphen: GuessWithScore,
    first_next_line: GuessWithScore,
    lexicon: Lexicon,
    unknown_word_factor: float,
) -> ScoredPair:
    """getHyphenationStatus (:222-275)."""
    g1 = last_with_hyphen.guess
    g2 = first_next_line.guess
    with_hyphen = Guess(g1.outcomes + g2.outcomes, g1.confidences + g2.confidences)
    without_hyphen = Guess(
        g1.outcomes[:-1] + g2.outcomes, g1.confidences[:-1] + g2.confidences
    )
    f_with = lexicon.get_frequency(with_hyphen.word, presimplified=True)
    f_without = lexicon.get_frequency(without_hyphen.word, presimplified=True)
    max_f = max(f_with, f_without)
    if f_with > f_without:
        status, hyph_word = "with_hyphen", with_hyphen.word
    else:
        status, hyph_word = "without_hyphen", without_hyphen.word
    initial = math.sqrt(last_with_hyphen.score * first_next_line.score)
    factor = 1.0 if max_f > 0 else (0.01 if max_f < 0 else unknown_word_factor)
    return ScoredPair(
        GuessWithScore(g1, last_with_hyphen.score * factor),
        GuessWithScore(g2, first_next_line.score * factor),
        initial * factor,
        status,
        hyph_word,
    )


def _apply_guess(word: Word, top: GuessWithScore, status: str, hyph_word: str | None):
    """guessToWordSingleAlphabet (:148-181): set content, glyph contents,
    confidence, SUBS_TYPE / SUBS_CONTENT."""
    for glyph, out, conf in zip(
        word.glyphs, top.guess.outcomes, top.guess.confidences
    ):
        glyph.content = out
        glyph.confidence = conf
    word.content = top.guess.word
    word.confidence = top.score
    if status == "none":
        word.subs_type = None
        word.subs_content = None
    else:
        word.subs_type = HYP_PART_2 if status.startswith("part2") else HYP_PART_1
        word.subs_content = remove_external_punct(hyph_word or "")


def _select_best(
    item, beam, lexicon: Lexicon, unknown_word_factor: float
):
    """WordWithBeam.selectBestGuess (:125-143)."""
    if isinstance(item, Word) and beam:
        if len(beam) == 1:  # identity-oracle fast path: nothing to sort
            _apply_guess(
                item, rescore_guess(beam[0], lexicon, unknown_word_factor),
                "none", None,
            )
            return item
        rescored = rescore_beam(beam, lexicon, unknown_word_factor)
        _apply_guess(item, rescored[0], "none", None)
    return item


def _last_glyph_is_hyphen(guess: Guess, hyphen_re: re.Pattern) -> bool:
    return bool(guess.outcomes) and bool(hyphen_re.fullmatch(guess.outcomes[-1]))


def guess_document(
    doc: Document,
    lexicon: Lexicon,
    config: PipelineConfig,
    topk_fn=identity_topk,
) -> None:
    """Apply guessTextBlockWithBeam (:435-560) to every leaf text block."""
    hyphen_re = re.compile(config.hyphen_regex)
    uwf = config.unknown_word_factor
    bw = config.beam_width

    if bw <= 1:
        # guessWithoutBeam (FullSegmentationGuesser.scala:381-385,
        # :398-433): top-1 per glyph, no hyphenation pairing
        for block in iter_text_blocks(doc):
            for line in block.lines:
                for item in line.items:
                    if isinstance(item, Word):
                        top = get_beam(item, topk_fn, 1)[0]
                        _apply_guess(item, top, "none", None)
        apply_language_votes(doc)
        return

    for block in iter_text_blocks(doc):
        lines_with_beams = [
            (
                line,
                [
                    (item, get_beam(item, topk_fn, bw) if isinstance(item, Word) else [])
                    for item in line.items
                ],
            )
            for line in block.lines
        ]
        if len(lines_with_beams) <= 1:
            for line, guesses in lines_with_beams:
                for item, beam in guesses:
                    _select_best(item, beam, lexicon, uwf)
            continue

        def finish_all(guesses, skip_first_select: bool):
            for j, (item, beam) in enumerate(guesses):
                if j == 0 and skip_first_select:
                    continue  # already guessed via previous line's pair
                _select_best(item, beam, lexicon, uwf)

        carry: Word | None = None  # pre-guessed first word of this line
        carried_flags: list[bool] = [False] * len(lines_with_beams)
        for idx, (line, guesses) in enumerate(lines_with_beams):
            nxt = lines_with_beams[idx + 1] if idx + 1 < len(lines_with_beams) else None
            carried = carry is not None
            carry_word = carry
            carry = None

            if nxt is None:
                finish_all(guesses, carried)
                continue

            last_word_hyphen = None
            if guesses:
                item, beam = guesses[-1]
                if isinstance(item, Word) and any(
                    _last_glyph_is_hyphen(g.guess, hyphen_re) for g in beam
                ):
                    last_word_hyphen = (item, beam)
            first_next = None
            _, next_guesses = nxt
            if next_guesses:
                n_item, n_beam = next_guesses[0]
                if isinstance(n_item, Word):
                    first_next = (n_item, n_beam)

            if last_word_hyphen is None or first_next is None:
                finish_all(guesses, carried)
                continue

            word1, beam1 = last_word_hyphen
            word2, beam2 = first_next
            scored_pairs: list[ScoredPair] = []
            for g1 in beam1:
                if _last_glyph_is_hyphen(g1.guess, hyphen_re):
                    for g2 in beam2:
                        scored_pairs.append(
                            get_hyphenation_status(g1, g2, lexicon, uwf)
                        )
                else:
                    rg1 = rescore_guess(g1, lexicon, uwf)
                    for rg2 in rescore_beam(beam2, lexicon, uwf):
                        # reference quirk (:505-507): combined score uses
                        # guess2's score twice — kept faithfully
                        scored_pairs.append(
                            ScoredPair(rg1, rg2, rg2.score, "none", None)
                        )
            scored_pairs.sort(key=lambda p: -p.combined_score)
            best = scored_pairs[0]

            # finish this line: all but last word normally, last word = best.guess1
            for j, (item, beam) in enumerate(guesses[:-1]):
                if j == 0 and carried:
                    continue
                _select_best(item, beam, lexicon, uwf)
            _apply_guess(word1, best.guess1, "part1_" + best.status if best.status != "none" else "none", best.hyphenated_word)

            # pre-guess next line's first word and carry it
            part2_status = (
                "part2_" + best.status if best.status != "none" else "none"
            )
            _apply_guess(word2, best.guess2, part2_status, best.hyphenated_word)
            carry = word2

    # language majority votes (:277-360) run as a post-pass
    apply_language_votes(doc)


def guess_with_other_alphabets(
    doc: Document, dispatch: list[tuple[str, str, object]]
) -> None:
    """Multi-alphabet dispatch (FullSegmentationGuesser.scala:588-614 +
    yiddish reference.conf glyph-guesser-for-other-alphabets): when a
    word's content matches a language's regex (e.g. ``.*L.*`` → Latin
    model), re-guess it with that alphabet's classifier, glyphs re-sorted
    LTR if the direction flips. ``dispatch`` = [(language, regex, topk_fn)].
    Runs as a post-pass over guessed words (the reference does it inline
    per word — same result for top-1 classifiers)."""
    from jochre3_ocr_spark.functions.simplify import is_left_to_right, simplify
    from jochre3_ocr_spark.operators.spantree import iter_lines

    compiled = [(lang, re.compile(rx), fn) for lang, rx, fn in dispatch]
    for line in iter_lines(doc):
        for word in line.words:
            for lang, rx, topk_fn in compiled:
                if not rx.fullmatch(word.content):
                    continue
                ltr = is_left_to_right(lang)
                glyphs = word.glyphs
                if ltr:  # Yiddish words store glyphs RTL; re-sort by left
                    glyphs = sorted(glyphs, key=lambda g: g.rect.left)
                outcomes, confs = [], []
                for g in glyphs:
                    preds = topk_fn(g.content) or [(g.content, 1.0)]
                    outcomes.append(preds[0][0])
                    confs.append(preds[0][1])
                for g, out, conf in zip(glyphs, outcomes, confs):
                    g.content = out
                    g.confidence = conf
                word.glyphs = glyphs
                word.content = simplify("".join(outcomes))
                word.confidence = (
                    math.exp(sum(math.log(c) for c in confs) / len(confs))
                    if confs
                    else word.confidence
                )
                word.language = lang
                break


def apply_language_votes(doc: Document) -> None:
    """changeTextLine/TextBlock/PageLanguageIfRequired
    (FullSegmentationGuesser.scala:277-360): majority vote over word
    languages at each level; only applied when the winning language is
    set (None never wins)."""
    from jochre3_ocr_spark.operators.spantree import (
        iter_lines,
        iter_text_blocks,
        iter_words,
    )

    def vote(languages):
        counts: dict = {}
        for lang in languages:
            counts[lang] = counts.get(lang, 0) + 1
        if not counts:
            return None
        ordered = sorted(counts.items(), key=lambda kv: -kv[1])
        return ordered[0][0]

    for line in iter_lines(doc):
        top = vote([w.language for w in line.words])
        if top is not None:
            line.language = top
    for block in iter_text_blocks(doc):
        top = vote([w.language for line in block.lines for w in line.words])
        if top is not None:
            block.language = top
    # changePageLanguageIfRequired (FullSegmentationGuesser.scala:336-360):
    # page-level vote over the (post-vote) TEXT-BLOCK languages
    top = vote([b.language for b in iter_text_blocks(doc)])
    if top is not None:
        doc.language = top
