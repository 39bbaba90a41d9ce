"""Product quantization (operators/similarity.py: pq_codebooks /
pq_encode / pq_adc_topk — Jégou et al., TPAMI 2011): exact-regime
equality with brute force, compressed-regime recall on clustered data,
the code-table compression contract, and partitioning invariance."""

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)


def _clustered(spark, n_per=6, dim=16, n_clusters=3):
    """Deterministic clustered vectors WITHOUT exact ties (each vector
    gets its own md5-derived jitter — the argpartition lesson from the
    IVF fixtures)."""
    import hashlib

    rows = []
    vid = 0
    for c in range(n_clusters):
        for i in range(n_per):
            v = [0.05] * dim
            v[c * 4] = 10.0  # cluster direction
            for p in range(dim):
                h = hashlib.md5(f"{vid}:{p}".encode()).hexdigest()
                v[p] += int(h[:4], 16) / 65535.0 * 0.2
            rows.append((vid, v, c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_pq_exact_regime_equals_brute_force(spark):
    """ksub >= n distinct subvectors -> lossless reconstruction -> ADC
    ranking identical to exact cosine top-k."""
    df = _clustered(spark)
    exact = {tuple(r) for r in cosine_topk(df, "vec_id < 4", k=3).collect()}
    pq = {
        tuple(r)
        for r in pq_adc_topk(
            df, "vec_id < 4", k=3, m=4, ksub=32, iters=1, sample_size=64
        ).collect()
    }
    assert pq == exact


def test_pq_compressed_regime_recall_on_clusters(spark):
    """ksub = n_clusters-ish: codes collapse to cluster ids, yet
    same-cluster neighbors still rank on top (the structure PQ
    exploits in production)."""
    df = _clustered(spark)
    out = pq_adc_topk(
        df, "vec_id < 4", k=3, m=4, ksub=4, iters=5, sample_size=64
    ).collect()
    labels = {r.vec_id: r.label for r in df.collect()}
    hits = sum(1 for r in out if labels[r.qid] == labels[r.cid])
    assert hits >= len(out) * 2 // 3  # most neighbors from own cluster


def test_pq_encode_compression_contract(spark):
    """Codes are m ints < ksub; exact-regime reconstruction norm is 1
    (unit-normalized input, lossless codebook)."""
    df = _clustered(spark)
    books = pq_codebooks(df, m=4, ksub=32, iters=1, sample_size=64)
    assert len(books) == 4 and all(len(b) == 32 for b in books)
    rows = pq_encode(df, books).collect()
    assert all(len(r.codes) == 4 for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r.codes)
    assert all(abs(r.cnorm - 1.0) < 1e-9 for r in rows)


def test_pq_partitioning_invariance(spark):
    df = _clustered(spark)
    a = sorted(
        tuple(r)
        for r in pq_adc_topk(
            df, "vec_id < 4", k=3, m=4, ksub=4, iters=3, sample_size=64
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in pq_adc_topk(
            df.repartition(7, "vec_id"),
            "vec_id < 4",
            k=3,
            m=4,
            ksub=4,
            iters=3,
            sample_size=64,
        ).collect()
    )
    assert a == b


def test_pq_rejects_indivisible_dim(spark):
    df = _clustered(spark, dim=16)
    with pytest.raises(ValueError):
        pq_codebooks(df, m=5, ksub=4, sample_size=64)


def test_ivfpq_exhaustive_equals_brute_force(spark):
    """IVF stage composed on: exhaustive probe + lossless codebooks ==
    exact cosine top-k (the ann_ivfpq_topk oracle regime)."""
    df = _clustered(spark)
    exact = {tuple(r) for r in cosine_topk(df, "vec_id < 4", k=3).collect()}
    got = {
        tuple(r)
        for r in pq_adc_topk(
            df, "vec_id < 4", k=3, m=4, ksub=32, iters=1,
            sample_size=64, n_cells=3, n_probe=3,
        ).collect()
    }
    assert got == exact


def test_ivfpq_pruned_searches_own_cluster(spark):
    """n_probe=1 on clustered data: neighbors come from the query's own
    cluster and match the exact ranking within it."""
    df = _clustered(spark)
    out = pq_adc_topk(
        df, "vec_id < 4", k=3, m=4, ksub=32, iters=3,
        sample_size=64, n_cells=3, n_probe=1,
    ).collect()
    labels = {r.vec_id: r.label for r in df.collect()}
    assert len(out) == 12  # 4 queries x k
    assert all(labels[r.qid] == labels[r.cid] for r in out)
