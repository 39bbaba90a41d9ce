"""Deterministic synthetic docs corpus (FIXTURES.md §1 synthesis rules).

Generates the ``docs(doc_id, spans)`` input table: interleaved text +
media documents with hyphenated line breaks, attached punctuation,
digit runs and media spans — every feature the reference's rules react
to. Seeded per-document (seed=42 ⊕ doc index) so generation is
order-independent and reproducible at any parallelism, per the
determinism requirement in SURVEY.md §7.4.

No external data: the vocabulary is a fixed Yiddish word list whose
YIVO forms also seed the lexicon (mirroring how the reference ships
lexicons next to models, yiddish reference.conf lexicon-path).
"""

from __future__ import annotations

import random

from jochre3_ocr_spark.functions.simplify import simplify

# words the lexicon knows (stored simplified at load, like
# TextFileLexicon.loadFromResource with a simplifier)
KNOWN_WORDS = (
    "דער די דאָס אַ און איז איך האָב בוך מער בלײַ אַטאָם זי ער מיר װאָס "
    "הײנט מאַמע טאַטע קינד הױז גאַס שטאָט לאַנד װאַסער פֿײַער הימל ערד "
    "זון לבֿנה שטערן טאָג נאַכט יאָר צײַט מענטש פֿרױ מאַן ייִנגל מײדל "
    "בלום בױם פֿױגל פֿיש הונט קאַץ פֿערד קו ברױט מילך פֿלײש עפּל װײַן "
    "טיש שטול בעט טיר פֿענצטער בלאַט פּען שול לערער תּלמיד רבֿ שיל גאָט "
    "װעלט לעבן טױט ליבע פֿרײד צער חלום אמת שלום מלחמה געלט אַרבעט "
    "ברודער שװעסטער זײדע באָבע אין אױף מיט פֿון צו בײַ נאָך פֿאַר "
    "איבער אונטער װען װוּ װער װי יאָ נײן ניט נישט שױן נאָר אױך אַלע "
    "דו מען זײ עס געװאָרן געגאַנגען פֿאַרשטאַנען געשען ארץ ישראל"
).split()

# OCR-style old spellings whose YIVO repair is a *different* string —
# exercises to_yivo / alternatives (מעהר→מער, בלײ→בלײַ, אטאם→אַטאָם, א→אַ)
VARIANT_SPELLINGS = "מעהר בלײ אטאם א".split()

# not in the lexicon (frequency 0)
UNKNOWN_WORDS = "האָצנפּלאָץ קראַמבאַמבולי שניפּלדיק גראַמזיק פּלומפּערנאַס".split()

# digit-run words for the number-reversal rule
NUMBER_WORDS = ("24", "123.45", "71טן", "1938", "3.14")

# hyphenated line-break pairs: (part1, part2). Joined-without-hyphen is in
# the lexicon for the first group (→ HypPart wihtout hyphen), while the
# second group joins with the hyphen kept (joined form impossible:
# medial final letter — ארץ־ישראל)
HYPH_PAIRS_WITHOUT = (("גע", "װאָרן"), ("גע", "גאַנגען"), ("פֿאַר", "שטאַנען"))
HYPH_PAIRS_WITH = (("ארץ", "ישראל"),)


def lexicon_words() -> list[str]:
    return list(KNOWN_WORDS)


def _make_word(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.05:
        return rng.choice(NUMBER_WORDS)
    if r < 0.10:
        return rng.choice(UNKNOWN_WORDS)
    if r < 0.14:
        return rng.choice(VARIANT_SPELLINGS)
    return rng.choice(KNOWN_WORDS)


def _decorate(word: str, rng: random.Random) -> str:
    """Attach punctuation to ~10% of words (FIXTURES.md §1)."""
    r = rng.random()
    if r < 0.02:
        return "„" + word + "“"
    if r < 0.04:
        return word + ","
    if r < 0.06:
        return word + "."
    if r < 0.08 and len(word) > 2:
        # abbreviation with internal quote (ר"ת style) — must NOT split
        return word[:-1] + '"' + word[-1]
    if r < 0.10:
        return "(" + word + ")"
    return word


def generate_doc(doc_index: int, seed: int = 42) -> dict:
    """One document: dict(doc_id, spans=[(kind, text, media_ref, offset)])."""
    rng = random.Random((seed << 20) ^ doc_index)
    doc_id = f"doc{doc_index:08d}"
    spans: list[tuple[str, str | None, str | None, int]] = []

    def emit(kind: str, text: str | None = None, media_ref: str | None = None):
        spans.append((kind, text, media_ref, len(spans)))

    # skew knob: 1% of docs are giants (FIXTURES.md: 50-200 pages)
    if rng.random() < 0.01:
        n_pages = rng.randint(50, 200)
    else:
        n_pages = rng.randint(1, 4)

    media_count = 0
    for _page in range(n_pages):
        n_blocks = rng.randint(1, 3)
        for _b in range(n_blocks):
            if rng.random() < 0.03:
                emit("media", None, f"img://{doc_id}/{media_count}")
                media_count += 1
            emit("block", None, None)
            n_lines = rng.randint(1, 5)
            pending_continuation: str | None = None
            for li in range(n_lines):
                emit("line", None, None)
                words = [_decorate(_make_word(rng), rng) for _ in range(rng.randint(2, 7))]
                if pending_continuation is not None:
                    words[0] = pending_continuation
                    pending_continuation = None
                # 5% of non-final lines end in a hyphenated break
                if li + 1 < n_lines and rng.random() < 0.05:
                    pair = (
                        rng.choice(HYPH_PAIRS_WITHOUT)
                        if rng.random() < 0.7
                        else rng.choice(HYPH_PAIRS_WITH)
                    )
                    words[-1] = pair[0] + "־"
                    pending_continuation = pair[1]
                for wi, w in enumerate(words):
                    if wi > 0:
                        emit("space", " ", None)
                    emit("word", w, None)
    return {"doc_id": doc_id, "spans": spans}


def n_docs_for_sf(sf: float) -> int:
    return max(10, int(50_000 * sf))


def generate_docs(n_docs: int, seed: int = 42):
    for i in range(n_docs):
        yield generate_doc(i, seed)


def docs_to_arrow(n_docs: int, seed: int = 42):
    """Materialize as a pyarrow Table matching DOCS_SCHEMA."""
    import pyarrow as pa

    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    doc_ids, span_lists = [], []
    for doc in generate_docs(n_docs, seed):
        doc_ids.append(doc["doc_id"])
        span_lists.append(
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in doc["spans"]
            ]
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(span_lists, pa.list_(span_type)),
        }
    )


def write_docs_parquet(path: str, n_docs: int, seed: int = 42) -> None:
    import pyarrow.parquet as pq

    pq.write_table(docs_to_arrow(n_docs, seed), path)


def docs_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus generation: spark.range → mapInPandas, one doc per
    index. Per-doc seeding makes output independent of partitioning.

    Spans are emitted PRE-ENCODED as JSON (+ span count) — the transport
    form the extraction kernel consumes directly (`_prune_to_json` fast
    path). The array<struct> form paid an Arrow struct conversion out of
    Python plus a JVM ``to_json`` per downstream branch; A/B at sf0.1
    measured the JSON form ~11% faster end-to-end. ``docs_to_arrow``
    still materializes the struct-spans DOCS_SCHEMA shape for consumers
    that want it."""
    import pandas as pd

    from jochre3_ocr_spark.plans.pipeline import _tuples_to_json

    def gen(batches):
        for batch in batches:
            rows = []
            for i in batch["id"]:
                d = generate_doc(int(i), seed)
                rows.append(
                    {
                        "doc_id": d["doc_id"],
                        "spans_json": _tuples_to_json(d["spans"]),
                        "n_in_spans": len(d["spans"]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans_json", "n_in_spans"]
            )

    rng = spark.range(n_docs, numPartitions=partitions)
    return rng.mapInPandas(
        gen, schema="doc_id string, spans_json string, n_in_spans int"
    )


# ----------------------------------------------- adversarial-density corpus
#: the boilerplate text every member of the exact-duplicate group shares —
#: the "cookie banner / empty template page" class that dominates real web
#: crawls and inflates LSH buckets quadratically when not pre-collapsed
_BOILER = " ".join(f"boiler{i:03d}" for i in range(110))

#: vocabulary core of the NEAR-duplicate family (disjoint from _BOILER's
#: vocabulary so the two giant groups never merge)
_NEAR_BASE = [f"near{i:03d}" for i in range(110)]


def adversarial_corpus(
    spark,
    n_total: int = 1_000_000,
    n_exact: int = 100_000,
    n_near: int = 10_000,
    partitions: int | None = None,
):
    """The dedup soak corpus (VERDICT r4 next-round item 1): ``n_total``
    documents of which

    * docs 0..n_exact-1 share ONE identical boilerplate text — the
      giant exact-duplicate group whose b²/2 ≈ 5×10⁹ within-bucket pairs
      kill an uncapped LSH self-join, and which the exact pre-collapse
      reduces to 1 signature + n_exact star edges;
    * the next ``n_near`` docs are pairwise NEAR-duplicates — a shared
      110-token core with 2 deterministic per-doc token mutations
      (Jaccard ≈ 0.95 between any two members), exercising the
      hot-bucket cap on non-identical docs where pre-collapse cannot
      help;
    * the remainder are unique docs of 80 hash-derived tokens — the
      per-(doc, position) hash is xorshift-MIXED, not linear in the
      index: a linear construction makes whole token sequences of two
      docs align under a shift, manufacturing accidental
      shared-shingle near-dups among the "unique" docs.

    One text per index, seeded by the index alone — output independent
    of partitioning, matching the ``docs_df`` determinism contract.
    """
    import numpy as np
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism * 4, 32)

    vocab = np.array([f"w{v:05d}" for v in range(50_000)])

    def gen(batches):
        for batch in batches:
            ids, texts = [], []
            idx = batch["id"].to_numpy()
            # vectorized unique-doc token ids for the whole Arrow batch
            ii = idx.astype(np.uint64)
            kk = np.arange(80, dtype=np.uint64)
            v = (ii[:, None] * np.uint64(2654435761)
                 + kk[None, :] * np.uint64(1013904223)) & np.uint64(0xFFFFFFFF)
            v ^= v >> np.uint64(16)
            v = (v * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
            v ^= v >> np.uint64(13)
            tok = vocab[(v % np.uint64(50_000)).astype(np.int64)]
            for row, i in enumerate(idx):
                i = int(i)
                if i < n_exact:
                    text = _BOILER
                elif i < n_exact + n_near:
                    j = i - n_exact
                    toks = list(_NEAR_BASE)
                    toks[(j * 7) % 55] = f"m{j:05d}"
                    toks[55 + (j * 13) % 55] = f"x{j:05d}"
                    text = " ".join(toks)
                else:
                    text = " ".join(tok[row])
                ids.append(f"d{i:07d}")
                texts.append(text)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    rng = spark.range(n_total, numPartitions=partitions)
    return rng.mapInPandas(gen, schema="doc_id string, text string")
