"""Spark pipeline integration: distributed result == pure-Python oracle,
at any parallelism; salting preserves results; resume is idempotent."""

import glob
import os

import pytest

from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.operators.kernel import process_document
from jochre3_ocr_spark.plans import pipeline
from jochre3_ocr_spark.schema import DOCS_SCHEMA
from jochre3_ocr_spark.sources.corpus import (
    generate_docs,
    lexicon_words,
)

N_DOCS = 40


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (
            d["doc_id"],
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in d["spans"]
            ],
        )
        for d in generate_docs(N_DOCS)
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA).cache()


@pytest.fixture(scope="module")
def oracle():
    lex = Lexicon.from_words(lexicon_words())
    return {
        d["doc_id"]: process_document(d["doc_id"], d["spans"], lex)
        for d in generate_docs(N_DOCS)
    }


def rows_to_dict(rows):
    import json as _json

    def spans_of(r):
        if "spans" in r.__fields__:
            return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        return [tuple(s[k] for k in ("kind", "text", "media_ref", "offset"))
                for s in _json.loads(r["spans_json"])]

    return {
        r["doc_id"]: {
            "spans": spans_of(r),
            "text": r["text"],
            "processed_text": r["processed_text"],
            "status": r["status"],
        }
        for r in rows
    }


def assert_matches_oracle(rows, oracle):
    got = rows_to_dict(rows)
    assert set(got) == set(oracle)
    for doc_id, exp in oracle.items():
        g = got[doc_id]
        assert g["status"] == "ok", g
        assert g["spans"] == exp["spans"], f"span mismatch for {doc_id}"
        assert g["text"] == exp["text"]
        assert g["processed_text"] == exp["processed_text"]


def test_extract_matches_oracle(docs_df, oracle):
    out = pipeline.extract(docs_df, lexicon_words(), materialize_spans=True)
    assert_matches_oracle(out.collect(), oracle)


def test_extract_parallelism_invariant(docs_df, oracle):
    """Same results regardless of partitioning (determinism under
    parallelism — SURVEY.md §7.4)."""
    out = pipeline.extract(docs_df.repartition(7), lexicon_words(), materialize_spans=True)
    assert_matches_oracle(out.collect(), oracle)


def test_extract_with_salting_matches_oracle(docs_df, oracle):
    """Force even small docs through the chunk/split/reassemble path."""
    out = pipeline.extract_with_salting(
        docs_df, lexicon_words(), giant_threshold=60, materialize_spans=True
    )
    assert_matches_oracle(out.collect(), oracle)


def test_resume_is_idempotent(spark, docs_df, oracle, tmp_path):
    inp = str(tmp_path / "docs.parquet")
    outp = str(tmp_path / "out.parquet")
    docs_df.write.parquet(inp)

    # first run: process only half the docs (simulate an interrupted run)
    half = spark.read.parquet(inp).limit(N_DOCS // 2)
    pipeline.extract(half, lexicon_words()).write.mode("append").parquet(outp)

    # resume: should process only the remainder
    n = pipeline.run_job(spark, inp, outp, lexicon_words())
    assert n == N_DOCS
    final = spark.read.parquet(outp)
    assert final.count() == N_DOCS  # no duplicates
    assert_matches_oracle(final.collect(), oracle)


def test_partition_metrics_and_lineage(spark, docs_df, tmp_path):
    """north_rule: per-partition checkpointed lineage + metrics. Metrics
    rows are per committed task file, incremental across resumes (no
    double-count), and exactly consistent with the committed output."""
    inp = str(tmp_path / "docs.parquet")
    outp = str(tmp_path / "out.parquet")
    mp = str(tmp_path / "metrics.parquet")
    docs_df.write.parquet(inp)

    # interrupted first run: half the docs, metrics checkpointed
    half = spark.read.parquet(inp).limit(N_DOCS // 2)
    pipeline.extract(half, lexicon_words()).write.mode("append").parquet(outp)
    pipeline.write_partition_metrics(spark, outp, mp)
    m1 = spark.read.parquet(mp)
    files1 = {r["file"] for r in m1.collect()}
    assert m1.agg({"n_docs": "sum"}).collect()[0][0] == N_DOCS // 2

    # resume with metrics: only NEW files get appended
    n = pipeline.run_job(spark, inp, outp, lexicon_words(), metrics_path=mp)
    assert n == N_DOCS
    m2 = spark.read.parquet(mp)
    assert m2.select("file").distinct().count() == m2.count()  # one row/file
    assert files1 < {r["file"] for r in m2.collect()}
    # totals exactly consistent with the committed output
    out = spark.read.parquet(outp)
    assert m2.agg({"n_docs": "sum"}).collect()[0][0] == out.count()
    assert (
        m2.agg({"total_spans": "sum"}).collect()[0][0]
        == out.agg({"n_spans": "sum"}).collect()[0][0]
    )
    assert m2.agg({"n_error": "sum"}).collect()[0][0] == 0

    # lineage: every doc maps to exactly one committed file, and the
    # file set agrees with the metrics checkpoint
    lin = pipeline.doc_lineage(spark, outp)
    assert lin.count() == N_DOCS
    assert lin.select("doc_id").distinct().count() == N_DOCS
    assert {r["file"] for r in lin.select("file").distinct().collect()} == {
        r["file"] for r in m2.collect()
    }


def test_partition_metrics_corrupt_table_raises(spark, docs_df, tmp_path):
    """ADVICE r2 (medium): a read failure on an EXISTING metrics table
    must propagate — treating it as 'no metrics yet' would re-append all
    files and double-count totals on resume."""
    import pytest as _pytest

    inp = str(tmp_path / "docs.parquet")
    outp = str(tmp_path / "out.parquet")
    mp = str(tmp_path / "metrics.parquet")
    docs_df.write.parquet(inp)
    pipeline.extract(
        spark.read.parquet(inp), lexicon_words()
    ).write.mode("append").parquet(outp)
    pipeline.write_partition_metrics(spark, outp, mp)
    total1 = spark.read.parquet(mp).agg({"n_docs": "sum"}).collect()[0][0]

    # corrupt every parquet part file in the metrics table
    import glob as _glob

    parts = _glob.glob(mp + "/part-*.parquet")
    assert parts
    for p in parts:
        with open(p, "wb") as f:
            f.write(b"not a parquet file")
    with _pytest.raises(Exception):
        pipeline.write_partition_metrics(spark, outp, mp)
    # and nothing was appended by the failed attempt
    ok = [p for p in _glob.glob(mp + "/part-*.parquet")]
    assert set(ok) == set(parts)

    # sanity: the happy path stays incremental (0 new files on re-run)
    import shutil as _shutil

    _shutil.rmtree(mp)
    pipeline.write_partition_metrics(spark, outp, mp)
    pipeline.write_partition_metrics(spark, outp, mp)
    assert (
        spark.read.parquet(mp).agg({"n_docs": "sum"}).collect()[0][0]
        == total1
    )


def test_error_quarantine(spark):
    """A malformed doc must produce an error row, not fail the job."""
    rows = [("bad", [{"kind": "word", "text": None, "media_ref": None, "offset": 0}])]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = pipeline.extract(df, ["דער"]).collect()
    assert len(out) == 1
    assert out[0]["status"] in ("ok", "error")  # never raises


def test_extract_with_beam_confusions_matches_oracle(spark, docs_df):
    """Distributed beam search with the confusion classifier must equal
    the pure-Python oracle doc for doc (the non-trivial beam path)."""
    from jochre3_ocr_spark.operators.guesser import confusable_topk
    from jochre3_ocr_spark.schema import PipelineConfig

    cfg = PipelineConfig(glyph_confusions=True)
    lex = Lexicon.from_words(lexicon_words())
    expected = {
        d["doc_id"]: process_document(
            d["doc_id"], d["spans"], lex, cfg, confusable_topk
        )
        for d in generate_docs(N_DOCS)
    }
    out = pipeline.extract(
        docs_df, lexicon_words(), config=cfg, materialize_spans=True
    )
    assert_matches_oracle(out.collect(), expected)


def test_run_job_clears_stale_staging(spark, docs_df, tmp_path):
    """A killed attempt leaves `_temporary` staging under the output dir;
    v1 job commits would resurrect those files as duplicate rows (found
    by the kill-resume drive). run_job must clear stale staging and the
    v2 committer keeps task commits atomic."""
    import os

    inp = str(tmp_path / "docs.parquet")
    outp = str(tmp_path / "out.parquet")
    docs_df.write.parquet(inp)
    # simulate a dead attempt's staging with a bogus task file
    stale = os.path.join(outp, "_temporary", "0", "task_000", "part-zombie.parquet")
    os.makedirs(os.path.dirname(stale))
    with open(stale, "wb") as f:
        f.write(b"zombie")
    n = pipeline.run_job(spark, inp, outp, lexicon_words())
    assert n == N_DOCS
    final = spark.read.parquet(outp)
    assert final.count() == N_DOCS  # the zombie never surfaced
    assert not os.path.exists(os.path.join(outp, "_temporary", "0", "task_000"))


def test_output_has_page_confidence_and_language(spark, docs_df):
    """Per-page mean word confidence (Jochre.scala:365-386) and the
    voted page language ride the output schema."""
    out = pipeline.extract(docs_df.limit(8), lexicon_words(), materialize_spans=True)
    rows = out.collect()
    assert all(0.0 <= r.mean_confidence <= 1.0 for r in rows)
    ok = [r for r in rows if r.status == "ok" and r.n_words > 0]
    assert ok and all(r.mean_confidence > 0.0 for r in ok)
    assert "language" in out.columns


def test_run_job_raises_on_incompatible_output_not_reprocess(spark, tmp_path):
    """Second-review finding: a failure while computing the resume
    TODO set must PROPAGATE — swallowing it (the old broad except)
    silently reprocessed everything and appended duplicates. An output
    dir whose schema lacks doc_id is such a failure: analysis raises,
    run_job must not treat it as 'no output yet'."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    from jochre3_ocr_spark.plans.pipeline import run_job
    from jochre3_ocr_spark.sources.corpus import docs_df, lexicon_words

    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "out.parquet")
    docs_df(spark, 5).write.parquet(inp)
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(out)
    with _pytest.raises(AnalysisException):
        run_job(spark, inp, out, lexicon_words(), metrics_path=None)


def test_spread_small_input_probe_discipline(spark):
    """_spread_small_input must (a) spread a compact scan, (b) be a
    no-op on a subtree an upstream caller already spread, and (c)
    decide for derived (wide-topped) frames WITHOUT scheduling a job —
    under AQE, df.rdd on a frame with an upstream shuffle executes the
    shuffle's map stages at construction time (one full job per probe,
    corpus-sized at scale)."""
    from pyspark.sql import functions as F

    from jochre3_ocr_spark.plans.pipeline import _spread_small_input

    slots = spark.sparkContext.defaultParallelism
    small = spark.range(0, 100, 1, 1).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("text"),
    )

    # (a) narrow/compact: explicit repartition(slots) added
    spread = _spread_small_input(small)
    assert f"Repartition {slots}" in (
        spread._jdf.queryExecution().optimizedPlan().toString()
    )

    # (b) already spread upstream, only narrow ops above: unchanged
    again = _spread_small_input(spread.filter("doc_id != '-1'"))
    plan = again._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Repartition") == 1

    # (c) aggregate-topped: no job may run during the decision, and a
    # byte-small aggregate still gets the explicit spread
    agg = small.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = _spread_small_input(agg)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "spread probe scheduled a Spark job"
    assert f"Repartition {slots}" in (
        out._jdf.queryExecution().optimizedPlan().toString()
    )

    # (d) a coalesce ABOVE a qualifying repartition pins the frame —
    # the already-spread skip must not fire; the size path re-spreads
    pinned = spread.filter("doc_id != '-1'").coalesce(1)
    replan = _spread_small_input(pinned)._jdf.queryExecution()
    assert f"Repartition {slots}" in (
        replan.optimizedPlan().toString().splitlines()[0]
    ), "coalesce-pinned frame was not re-spread"

    # (e) rebalance-topped frames must not reach the rdd probe (it
    # would execute the rebalance's map stages as a job)
    before = len(tracker.getJobIdsForGroup(None) or [])
    _spread_small_input(small.hint("rebalance"))
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "rebalance probe scheduled a Spark job"

    # (f) a keyed repartition(n >= slots) is already spread — no
    # round-robin may be stacked on top (it would destroy the caller's
    # co-partitioning)
    keyed = small.repartition(slots, F.col("doc_id")).filter(
        "doc_id != '-1'"
    )
    plan = (
        _spread_small_input(keyed)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Repartition") == 1
