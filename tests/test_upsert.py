"""Copy-on-write upsert + compaction over the bucket-partitioned
corpus table (sources/upsert.py).

Pins MERGE semantics (replace existing keys, insert new), the
copy-on-write guarantee (untouched bucket directories keep their
exact files), point-lookup partition pruning, compaction, and the
Spark↔Python bucket-function agreement.
"""

import os

import pytest
from pyspark.sql import functions as F

from jochre3_ocr_spark.sources.upsert import (
    bucket_of,
    compact_partitions,
    merge_upsert,
    read_for_keys,
    write_partitioned,
)

N_BUCKETS = 8


def _rows(spark, ids, tag):
    return spark.createDataFrame(
        [(f"d{i}", f"{tag}{i}") for i in ids],
        "doc_id string, payload string",
    )


def _snapshot(path):
    """(relative file, size, mtime_ns) for every data file."""
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "corpus")
    write_partitioned(
        _rows(spark, range(200), "v1_"), path, n_buckets=N_BUCKETS
    )
    return path


class TestUpsert:
    def test_merge_replaces_and_inserts(self, spark, table):
        stats = merge_upsert(
            spark,
            table,
            _rows(spark, [3, 7, 300, 301], "v2_"),
            n_buckets=N_BUCKETS,
        )
        got = {
            r.doc_id: r.payload
            for r in spark.read.parquet(table).collect()
        }
        assert len(got) == 202
        assert got["d3"] == "v2_3" and got["d300"] == "v2_300"
        assert got["d4"] == "v1_4"  # untouched key keeps its version
        assert stats["rows_written"] >= 4
        assert stats["buckets_rewritten"] <= 4

    def test_untouched_buckets_keep_their_files(self, spark, table):
        """The copy-on-write contract, by file identity."""
        before = _snapshot(table)
        upd_ids = [3, 300]
        touched = {bucket_of(f"d{i}", N_BUCKETS) for i in upd_ids}
        merge_upsert(
            spark, table, _rows(spark, upd_ids, "v2_"), n_buckets=N_BUCKETS
        )
        after = _snapshot(table)
        for rel, sig in before.items():
            b = int(rel.split("=", 1)[1].split("/", 1)[0].split(os.sep)[0])
            if b not in touched:
                assert after[rel] == sig, rel  # byte-for-byte same file
        assert before != after  # the touched buckets DID change

    def test_point_lookup_prunes_partitions(self, spark, table):
        df = read_for_keys(
            spark, table, ["d5", "d42"], n_buckets=N_BUCKETS
        )
        got = {r.doc_id for r in df.collect()}
        assert got == {"d5", "d42"}
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
        assert "bucket" in pf

    def test_bucket_expr_matches_python(self, spark, table):
        rows = (
            _rows(spark, range(50), "x")
            .select(
                "doc_id",
                F.conv(F.substring(F.md5("doc_id"), 1, 4), 16, 10)
                .cast("int")
                .alias("h"),
            )
            .collect()
        )
        for r in rows:
            assert r.h % N_BUCKETS == bucket_of(r.doc_id, N_BUCKETS)

    def test_compaction_merges_fragments(self, spark, table):
        """Repeated upserts fragment hot buckets; compaction rewrites
        only those, preserving rows and cold buckets' files."""
        hot = [i for i in range(200) if bucket_of(f"d{i}", N_BUCKETS) == 0]
        for v in range(3):
            merge_upsert(
                spark, table, _rows(spark, hot[:5], f"u{v}_"),
                n_buckets=N_BUCKETS,
            )
        rows_before = sorted(
            map(tuple, spark.read.parquet(table).collect())
        )
        before = _snapshot(table)
        frag = sum(1 for rel in before if rel.startswith("bucket=0"))
        assert frag > 4  # genuinely fragmented
        stats = compact_partitions(
            spark, table, max_files_per_bucket=4
        )
        assert stats["buckets_compacted"] >= 1
        after = _snapshot(table)
        assert sum(1 for rel in after if rel.startswith("bucket=0")) < frag
        # rows byte-identical, cold buckets file-identical
        assert sorted(
            map(tuple, spark.read.parquet(table).collect())
        ) == rows_before
        cold = {bucket_of(f"d{i}", N_BUCKETS) for i in hot[:5]}
        for rel, sig in before.items():
            b = int(rel.split("=", 1)[1].split(os.sep)[0])
            if b not in cold and b != 0:
                assert after.get(rel) == sig, rel
