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
