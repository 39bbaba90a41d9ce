"""Text-metrics operators: chunking window arithmetic pinned against
a python reference (the SQL twin is oracle-checked by the driver
gate via corpus_chunking)."""


def test_chunk_documents_edge_cases(spark):
    """Sliding-window chunking vs a python reference on the window
    boundary cases: empty, 1, exactly max, max+1, multi-stride."""
    from jochre3_ocr_spark.operators.text_metrics import chunk_documents

    max_tokens, overlap = 8, 2
    stride = max_tokens - overlap
    cases = {
        "empty": 0, "one": 1, "exact": 8, "plus1": 9,
        "two_full": 14, "boundary": 15, "long": 40,
    }
    rows = [
        (name, " ".join(f"w{i}" for i in range(n)))
        for name, n in cases.items()
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r.doc_id, r.chunk_index): (
            r.begin_token, r.n_chunk_tokens, r.chunk_text
        )
        for r in chunk_documents(df, max_tokens, overlap).collect()
    }

    expected = {}
    for name, n in cases.items():
        toks = [f"w{i}" for i in range(n)]
        if n == 0:
            continue
        nc = 1 if n <= max_tokens else 1 + (n - max_tokens + stride - 1) // stride
        for ci in range(nc):
            b = ci * stride
            sl = toks[b : b + max_tokens]
            expected[(name, ci)] = (b, len(sl), " ".join(sl))
    assert got == expected
    # overlap property: consecutive chunks share exactly `overlap`
    # tokens wherever the next chunk is full-length
    long_chunks = [v for k, v in sorted(got.items()) if k[0] == "long"]
    for a, b in zip(long_chunks, long_chunks[1:]):
        assert a[2].split(" ")[stride:] == b[2].split(" ")[: overlap]
