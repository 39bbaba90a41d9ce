"""Streaming facade: AvailableNow incremental extraction with
exactly-once file semantics across restarts."""

from jochre3_ocr_spark.schema import DOCS_SCHEMA
from jochre3_ocr_spark.sources.corpus import generate_docs, lexicon_words
from jochre3_ocr_spark.streaming.stream import stream_extract


def _write_batch(spark, docs, path):
    rows = [
        (
            d["doc_id"],
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in d["spans"]
            ],
        )
        for d in docs
    ]
    spark.createDataFrame(rows, schema=DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_extract_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = list(generate_docs(20))

    _write_batch(spark, docs[:10], inp)
    stream_extract(spark, inp, out, ckpt, lexicon_words())
    first = spark.read.parquet(out)
    assert first.count() == 10

    # new files arrive; re-trigger processes ONLY them
    _write_batch(spark, docs[10:], inp)
    stream_extract(spark, inp, out, ckpt, lexicon_words())
    final = spark.read.parquet(out)
    assert final.count() == 20
    assert final.select("doc_id").distinct().count() == 20
    assert final.filter("status = 'ok'").count() == 20


def test_stream_extract_reads_json_spans_shape(spark, tmp_path):
    """round-6 regression: docs_df now writes (doc_id, spans_json,
    n_in_spans) parquet; stream_extract must read THAT shape too (a
    fixed DOCS_SCHEMA read returned NULL spans for every row and
    crashed the kernel), and its output must equal the struct-shape
    run on the same docs."""
    from jochre3_ocr_spark.sources.corpus import docs_df

    inp_json = str(tmp_path / "in_json")
    inp_struct = str(tmp_path / "in_struct")
    docs_df(spark, 8).coalesce(1).write.parquet(inp_json)
    _write_batch(spark, list(generate_docs(8)), inp_struct)

    # MIXED dir: both encodings side by side (mid-migration) — the
    # merged-schema probe + row-wise coalesce must handle every file
    inp_mixed = str(tmp_path / "in_mixed")
    docs_df(spark, 8).coalesce(1).write.parquet(inp_mixed)
    _write_batch(
        spark,
        [dict(d, doc_id=d["doc_id"] + "_s") for d in generate_docs(8)],
        inp_mixed,
    )

    outs = []
    for inp, n_expect in ((inp_json, 8), (inp_struct, 8), (inp_mixed, 16)):
        tag = inp.rsplit("_", 1)[1]
        out = str(tmp_path / f"out_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        stream_extract(spark, inp, out, ckpt, lexicon_words())
        got = spark.read.parquet(out)
        assert got.count() == n_expect
        assert got.filter("status = 'ok'").count() == n_expect
        outs.append(
            sorted(
                (r.doc_id, r.processed_text, r.n_spans, r.n_words)
                for r in got.collect()
            )
        )
    assert outs[0] == outs[1]
    # the mixed run contains the json-shape docs' rows verbatim
    assert set(outs[0]).issubset(set(outs[2]))


def test_stream_predict_layout_incremental(spark, tmp_path):
    """Continuous-ingest DLA inference: the batched predictor slot
    behind readStream/writeStream — exactly-once across re-triggers,
    rows equal to the batch twin, decode quarantine preserved."""
    import io

    import numpy as np

    from jochre3_ocr_spark.operators.predictor import (
        NumpyLayoutModel,
        RetryingBatchPredictor,
        predict_layout_boxes,
    )
    from jochre3_ocr_spark.streaming.stream import stream_predict_layout

    def _npy(rects):
        img = np.full((640, 640), 255, np.uint8)
        for left, top, w, h in rects:
            img[top : top + h, left : left + w] = 0
        buf = io.BytesIO()
        np.save(buf, img)
        return bytearray(buf.getvalue())

    inp = str(tmp_path / "pages")
    out = str(tmp_path / "boxes")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        ("p0", _npy([(10, 10, 50, 40)])),
        ("bad", bytearray(b"not npy")),
    ]
    batch2 = [("p1", _npy([(100, 100, 80, 30), (300, 200, 40, 40)]))]
    schema = "doc_id string, image binary"

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_predict_layout(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.filter("status = 'ok'").count() == 1
    assert first.filter("status = 'error'").count() == 1

    # new pages arrive; re-trigger processes ONLY them
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    stream_predict_layout(spark, inp, out, ckpt)
    final = spark.read.parquet(out)
    assert final.filter("status = 'ok'").count() == 3  # no reprocessing

    # row-equality with the batch twin over the same input
    batch_rows = {
        tuple(r)
        for r in predict_layout_boxes(
            spark.read.parquet(inp),
            lambda: RetryingBatchPredictor(NumpyLayoutModel()),
        ).collect()
    }
    assert {tuple(r) for r in final.collect()} == batch_rows


def test_stream_predict_layout_over_real_http(spark, tmp_path):
    """Round 5: the streaming inference slot against the REAL-socket
    model server — readStream micro-batches forward over live TCP with
    an injected 503 on the first request (retried through), output
    row-equal to the in-process-model batch twin. The full production
    shape: scanner feed → micro-batch → per-task HTTP client →
    exactly-once sink."""
    from jochre3_ocr_spark.operators.model_server import (
        serve_background,
        synthesize_page_table,
    )
    from jochre3_ocr_spark.operators.predictor import (
        HttpLayoutModel,
        NumpyLayoutModel,
        RetryingBatchPredictor,
        predict_layout_boxes,
    )
    from jochre3_ocr_spark.streaming.stream import stream_predict_layout

    server, _ = serve_background(fail_first=1)
    url = f"http://127.0.0.1:{server.server_address[1]}/predict"
    inp = str(tmp_path / "pages")
    out = str(tmp_path / "boxes")
    ckpt = str(tmp_path / "ckpt")
    try:
        synthesize_page_table(spark, 12, partitions=2).write.mode(
            "append"
        ).parquet(inp)

        def make_predictor():
            return RetryingBatchPredictor(
                HttpLayoutModel(url), sleep=lambda s: None
            )

        stream_predict_layout(spark, inp, out, ckpt, make_predictor)
        got = spark.read.parquet(out)
        assert got.filter("status = 'error'").count() == 0
        want = {
            tuple(r)
            for r in predict_layout_boxes(
                spark.read.parquet(inp),
                lambda: RetryingBatchPredictor(NumpyLayoutModel()),
            ).collect()
        }
        assert {tuple(r) for r in got.collect()} == want
        assert server.jochre_state.requests >= 2  # 503 + ≥1 served
    finally:
        server.shutdown()


def test_stream_events_hourly_watermark(spark, tmp_path):
    """Watermarked tumbling windows in append mode: closed windows match
    the batch aggregation exactly; a re-trigger with no new files emits
    nothing (exactly-once); the final (unclosed) windows are withheld
    until more data arrives — bounded state at infinite scale."""
    import shutil

    from jochre3_ocr_spark.streaming.stream import stream_events_hourly

    src = tmp_path / "events_in"
    src.mkdir()
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src))
    outp = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "events_ckpt")

    stream_events_hourly(spark, str(src), outp, ckpt, watermark="2 hours")
    got = spark.read.parquet(outp)
    n_first = got.count()
    assert n_first > 0

    # batch twin over the same input, restricted to CLOSED windows
    from pyspark.sql import functions as F

    ev = spark.read.parquet(str(src))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .filter(
            F.col("window_start")
            < F.lit(max_ts) - F.expr("INTERVAL 3 HOURS")
        )
    )
    got_rows = {tuple(r) for r in got.collect()}
    # every closed batch window appears in the stream output with equal values
    for r in batch.collect():
        assert tuple(r) in got_rows

    # re-trigger with no new data → no new rows
    stream_events_hourly(spark, str(src), outp, ckpt, watermark="2 hours")
    assert spark.read.parquet(outp).count() == n_first


def test_stream_sessions_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): streaming
    sessionization equals the batch window-gap computation on closed
    sessions; only the session containing the global max ts is withheld
    (event-time timeout can't pass it). State bounded by active users."""
    from pyspark.sql import functions as F

    from jochre3_ocr_spark.streaming.stream import stream_sessions

    src = tmp_path / "sess_in"
    src.mkdir()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        "user_id < 20"
    )
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))
    outp = str(tmp_path / "sess_out")
    stream_sessions(
        spark, str(src), outp, str(tmp_path / "sess_ckpt"), gap_sec=1800
    )
    got = spark.read.parquet(outp)

    ev.createOrReplaceTempView("ev_sess_test")
    batch = spark.sql(
        """
        WITH gaps AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM ev_sess_test
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM sess GROUP BY user_id, session_id
        """
    )
    batch_rows = {tuple(r) for r in batch.collect()}
    got_rows = [tuple(r) for r in got.collect()]
    assert got_rows and all(r in batch_rows for r in got_rows)
    # every closed session emitted: only sessions still inside the final
    # watermark horizon may be withheld
    assert len(got_rows) >= batch.count() - 20


def test_stream_score_documents_matches_batch_twin(spark, tmp_path):
    """Stateless scorer stream (redact -> quality): incremental files,
    row-for-row equality with the batch composition."""
    from jochre3_ocr_spark.operators.redaction import redact_pii
    from jochre3_ocr_spark.operators.text_metrics import quality_features
    from jochre3_ocr_spark.streaming.stream import stream_score_documents

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _batch(rows):
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).coalesce(1).write.mode("append").parquet(inp)

    rows1 = [
        (0, "the quick fox mail a@b.io end", "en", "s0", 29),
        (1, "plain words only here", "de", "s1", 21),
    ]
    rows2 = [(2, "ping 10.0.0.7 the the a", "en", "s0", 23)]

    _batch(rows1)
    stream_score_documents(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 2

    _batch(rows2)
    stream_score_documents(spark, inp, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    batch_docs = spark.read.parquet(inp)
    red = redact_pii(batch_docs)
    want = sorted(
        map(
            tuple,
            quality_features(
                red.withColumnRenamed("clean_text", "text"),
                text_col="text",
                extra_cols=("n_redactions",),
            ).collect(),
        )
    )
    assert got == want
    # the redaction really happened upstream of scoring
    by_id = {t[0]: t for t in got}
    assert by_id["0"][-1] == 1 and by_id["2"][-1] == 1


def test_stream_dedup_exact_state_survives_reruns(spark, tmp_path):
    """Stateful streaming dedup: the MIN-doc_id keeper wins within a
    batch (deterministic), state survives across AvailableNow re-runs
    (state store), benchmark texts dropped by the stream-static
    anti-join, and the sink schema is the input doc schema."""
    from jochre3_ocr_spark.streaming.stream import stream_dedup_exact

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _batch(rows):
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).coalesce(1).write.mode("append").parquet(inp)

    bench = spark.createDataFrame([("leaked text",)], "text string")

    _batch([
        (0, "alpha beta", "en", "s", 10),
        (1, "alpha beta", "en", "s", 10),   # dup within run
        (2, "leaked text", "en", "s", 11),  # benchmark hit
        (3, "gamma", "en", "s", 5),
    ])
    stream_dedup_exact(spark, inp, out, ckpt, benchmark=bench)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    # DETERMINISTIC keeper: min doc_id per text hash (batch-twin rule)
    assert first == {0, 3}
    assert sorted(spark.read.parquet(out).columns) == [
        "doc_id", "lang", "n_chars", "source", "text",
    ]  # input schema; the internal hash never leaks

    # a LATER run: the dup of "alpha beta" must still be suppressed by
    # restored state; a genuinely new text passes
    _batch([
        (4, "alpha beta", "en", "s", 10),
        (5, "delta", "en", "s", 5),
    ])
    stream_dedup_exact(spark, inp, out, ckpt, benchmark=bench)
    final = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 5 in final and 4 not in final
    assert len(final) == 3


def test_stream_web_ingest_matches_batch_twin(spark, tmp_path):
    """Crawl-policy ingest stream (canonicalize -> robots verdicts):
    incremental url files, row-for-row equality with the batch
    operator over the same static rules table."""
    from jochre3_ocr_spark.operators.urls import robots_verdicts
    from jochre3_ocr_spark.streaming.stream import stream_web_ingest

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rules = spark.createDataFrame(
        [
            ("ex.com", "disallow", "/a/"),
            ("ex.com", "allow", "/a/b/"),
        ],
        "host string, rule_type string, path_prefix string",
    )

    def _batch(rows):
        spark.createDataFrame(rows, "doc_id string, url string").coalesce(
            1
        ).write.mode("append").parquet(inp)

    _batch([("1", "https://EX.com/a/x"), ("2", "https://ex.com/a/b/y")])
    stream_web_ingest(spark, inp, rules, out, ckpt)
    assert spark.read.parquet(out).count() == 2

    _batch([("3", "https://other.com/p"), ("4", "https://ex.com/ok")])
    stream_web_ingest(spark, inp, rules, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(
            tuple,
            robots_verdicts(spark.read.parquet(inp), rules).collect(),
        )
    )
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id["1"][5] is False  # /a/x disallowed
    assert by_id["2"][5] is True   # deeper allow overrides
    assert by_id["3"][5] is True   # no rules for host
