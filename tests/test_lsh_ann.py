"""Random-hyperplane LSH ANN: determinism, rank order, plane properties."""

import numpy as np
import pytest

from jochre3_ocr_spark.operators.similarity import lsh_planes, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_planes_are_integral_and_symmetric_range(spark):
    rows = lsh_planes(spark, n_tables=2, n_bits=4, dim=8).collect()
    assert len(rows) == 2 * 4 * 8
    ws = [r.w for r in rows]
    assert all(w == int(w) and -255 <= w <= 255 and int(w) % 2 == 1 for w in ws)
    # md5-derived weights shouldn't collapse to a few values
    assert len(set(ws)) > 20


def test_lsh_topk_deterministic_under_partitioning(emb):
    a = sorted(map(tuple, lsh_topk(emb, "vec_id < 5").collect()))
    b = sorted(map(tuple, lsh_topk(emb.repartition(7), "vec_id < 5").collect()))
    assert a == b and len(a) > 0


def test_lsh_topk_rank_is_exact_cosine_order(emb):
    out = lsh_topk(emb, "vec_id < 5", k=3).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_q = {}
    for r in out:
        assert r.qid != r.cid and 1 <= r.rank <= 3
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        cosines = [cos(vecs[qid], vecs[r.cid]) for r in rows]
        assert cosines == sorted(cosines, reverse=True)
