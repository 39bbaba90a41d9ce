"""Count-min sketch + Bloom filter (operators/sketches.py).

The tests pin the two sketch contracts: CMS estimates are exact-or-over
(never under), both sketches are mergeable (partials built per split
combine into the whole-corpus sketch), and the Bloom probe has zero
false negatives against the exact shingle-join decontaminator.
"""

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.sketches import (
    bloom_bits,
    bloom_decontaminate,
    cms_estimate,
    cms_sketch,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id < 120")
        .cache()
    )


def _exact_counts(docs):
    return (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )


class TestCountMin:
    def test_never_underestimates(self, docs):
        """CMS point queries upper-bound the true count for EVERY token."""
        sk = cms_sketch(docs, depth=4, width_hex=1)  # 16 buckets → collisions
        exact = _exact_counts(docs)
        est = cms_estimate(sk, exact.select("token"), depth=4, width_hex=1)
        rows = exact.join(est, "token").collect()
        assert rows
        assert all(r.est_cnt >= r.exact_cnt for r in rows)
        # with 16 buckets and a shared vocabulary, SOME collision must
        # survive all 4 rows — otherwise the test isn't exercising min
        assert any(r.est_cnt > r.exact_cnt for r in rows)

    def test_wide_sketch_is_exact_on_heavy_hitters(self, docs):
        sk = cms_sketch(docs, depth=4, width_hex=2)
        exact = _exact_counts(docs).orderBy(F.desc("exact_cnt"), "token").limit(10)
        est = cms_estimate(sk, exact.select("token"), depth=4, width_hex=2)
        rows = exact.join(est, "token").collect()
        assert len(rows) == 10
        assert all(r.est_cnt == r.exact_cnt for r in rows)

    def test_mergeable(self, docs):
        """sketch(A ∪ B) == cellwise-sum(sketch(A), sketch(B)) — the
        property that makes the build one map-side-combinable agg."""
        a = docs.filter("doc_id % 2 = 0")
        b = docs.filter("doc_id % 2 = 1")
        whole = {
            (r.seed, r.bucket): r.counter
            for r in cms_sketch(docs, depth=2, width_hex=1).collect()
        }
        merged: dict = {}
        for part in (a, b):
            for r in cms_sketch(part, depth=2, width_hex=1).collect():
                merged[(r.seed, r.bucket)] = (
                    merged.get((r.seed, r.bucket), 0) + r.counter
                )
        assert merged == whole

    def test_unknown_token_estimates_from_collisions_only(self, docs):
        sk = cms_sketch(docs, depth=4, width_hex=2)
        cand = docs.sparkSession.createDataFrame(
            [("zzz-never-seen-zzz",)], "token string"
        )
        [row] = cms_estimate(sk, cand, depth=4, width_hex=2).collect()
        # not necessarily 0 (collisions), but bounded by the heaviest cell
        top = max(r.counter for r in sk.collect())
        assert 0 <= row.est_cnt <= top


class TestBloom:
    def test_no_false_negatives_vs_exact(self, docs):
        """Every doc the exact shingle join flags, the Bloom probe flags."""
        from jochre3_ocr_spark.operators.dedup import decontaminate

        bench = docs.filter("doc_id % 7 = 0")
        train = docs.filter("doc_id % 7 <> 0")
        exact_ids = {
            r.doc_id for r in decontaminate(train, bench, n=4).collect()
        }
        assert exact_ids  # fixture must exercise the positive path
        bits = bloom_bits(bench, n=4, k=3, width_hex=3)
        bd = bloom_decontaminate(train, bits, n=4, k=3, width_hex=3)
        bloom_ids = {r.doc_id for r in bd.filter("contaminated").collect()}
        assert exact_ids <= bloom_ids

    def test_bits_capped(self, docs):
        k, w = 3, 2
        bits = bloom_bits(docs, n=4, k=k, width_hex=w)
        rows = bits.collect()
        assert len(rows) <= k * 16**w
        assert len(rows) == len({(r.seed, r.slot) for r in rows})
        assert all(0 <= r.seed < k and len(r.slot) == w for r in rows)

    def test_disjoint_benchmark_low_fp(self, spark, docs):
        """Grams that share nothing with the benchmark stay clean at a
        3-hex-slot width (FP prob ~ (bits/4096)^3 per gram)."""
        bench = spark.createDataFrame(
            [("b1", "q w e r t y u i o p")], "doc_id string, text string"
        )
        bits = bloom_bits(bench, n=4, k=3, width_hex=3)
        bd = bloom_decontaminate(docs, bits, n=4, k=3, width_hex=3)
        flagged = bd.filter("contaminated").count()
        assert flagged == 0

    def test_short_docs_have_zero_grams(self, spark):
        bits = bloom_bits(
            spark.createDataFrame([("b", "a b c d")], "doc_id string, text string"),
            n=4,
        )
        out = bloom_decontaminate(
            spark.createDataFrame(
                [("1", "a b c"), ("2", ""), ("3", "a b c d")],
                "doc_id string, text string",
            ),
            bits,
            n=4,
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id["1"].n_grams == 0 and not by_id["1"].contaminated
        assert by_id["2"].n_grams == 0 and not by_id["2"].contaminated
        assert by_id["3"].n_grams == 1 and by_id["3"].contaminated
        assert by_id["3"].n_hits == 1


class TestPackedBloom:
    def test_packed_equals_row_form(self, spark, docs):
        """The bitmap probe must be ROW-IDENTICAL to the oracle-checked
        broadcast-join form at the same (n, k, width)."""
        from jochre3_ocr_spark.operators.sketches import (
            bloom_bitmap,
            bloom_decontaminate_packed,
        )

        bench = docs.filter("doc_id % 7 = 0")
        train = docs.filter("doc_id % 7 <> 0")
        kw = dict(n=4, k=3, width_hex=3)
        bits = bloom_bits(bench, **kw)
        row_form = {
            r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
            for r in bloom_decontaminate(train, bits, **kw).collect()
        }
        bm = bloom_bitmap(bench, **kw)
        packed = {
            r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
            for r in bloom_decontaminate_packed(train, bm, **kw).collect()
        }
        assert packed == row_form

    def test_bitmap_matches_bits_table(self, spark, docs):
        """Every (seed, slot) row sets exactly its bit; nothing else."""
        from jochre3_ocr_spark.operators.sketches import bloom_bitmap

        bench = docs.filter("doc_id % 11 = 0")
        w, k = 3, 3
        m = 16**w
        bm = bloom_bitmap(bench, n=4, k=k, width_hex=w)
        assert len(bm) == (k * m + 7) // 8
        expected = {
            r.seed * m + int(r.slot, 16)
            for r in bloom_bits(bench, n=4, k=k, width_hex=w).collect()
        }
        got = {
            i * 8 + b for i, byte in enumerate(bm) for b in range(8)
            if (byte >> b) & 1
        }
        assert got == expected

    def test_multi_chunk_assembly(self, spark, docs, monkeypatch):
        """Shrink the chunk size so the pack runs multi-chunk — the
        assembled bitmap must not change (chunk-boundary regression
        guard)."""
        import jochre3_ocr_spark.operators.sketches as sk

        bench = docs.filter("doc_id % 11 = 0")
        one = sk.bloom_bitmap(bench, n=4, k=3, width_hex=3)
        monkeypatch.setattr(sk, "BITMAP_CHUNK_BITS", 1 << 10)  # 49 chunks
        many = sk.bloom_bitmap(bench, n=4, k=3, width_hex=3)
        assert many == one

    def test_packed_null_and_short_text(self, spark):
        from jochre3_ocr_spark.operators.sketches import (
            bloom_bitmap,
            bloom_decontaminate_packed,
        )

        bench = spark.createDataFrame(
            [("b", "a b c d")], "doc_id string, text string"
        )
        bm = bloom_bitmap(bench, n=4, k=3, width_hex=3)
        df = spark.createDataFrame(
            [("1", None), ("2", "a b c d e")],
            "doc_id string, text string",
        )
        out = {r.doc_id: r for r in
               bloom_decontaminate_packed(df, bm, n=4, k=3, width_hex=3).collect()}
        assert out["1"].n_grams == 0 and not out["1"].contaminated
        assert out["2"].n_grams == 2 and out["2"].n_hits == 1

    def test_partitioning_invariance(self, spark, docs):
        from jochre3_ocr_spark.operators.sketches import (
            bloom_bitmap,
            bloom_decontaminate_packed,
        )

        bench = docs.filter("doc_id % 7 = 0")
        bm = bloom_bitmap(bench, n=4, k=3, width_hex=3)
        train = docs.filter("doc_id % 7 <> 0")
        a = sorted(map(tuple, bloom_decontaminate_packed(
            train, bm, n=4, k=3, width_hex=3).collect()))
        b = sorted(map(tuple, bloom_decontaminate_packed(
            train.repartition(7), bm, n=4, k=3, width_hex=3).collect()))
        assert a == b
