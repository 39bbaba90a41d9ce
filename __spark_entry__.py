"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction over sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the training-data-pipeline operators (dedup / similarity / text
analysis); ``oracle_sql()`` gives the DuckDB-dialect equivalent for
every SQL-expressible query (extraction queries over the synthesized
Yiddish corpus are rows-only checks).

Column aliases are kept identical between the Spark SQL and the DuckDB
SQL; double aggregates are rounded on both sides so value-hashes match
despite float summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _sql(statement: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(statement)

    return run


# --------------------------------------------------------------------------
# Extraction-engine queries (the flagship): the full Jochre3-equivalent
# pipeline over the documents table. For the clean [a-z ] driver corpus the
# engine's output is independently derivable in SQL, so these get oracles.
# --------------------------------------------------------------------------
def _extract_processed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jochre3_ocr_spark.plans.pipeline import extract_text_df
    from jochre3_ocr_spark.sources.corpus import lexicon_words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_text_df(docs, lexicon_words())
    return out.selectExpr("doc_id", "processed_text")


def _extract_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jochre3_ocr_spark.plans.pipeline import extract_text_df
    from jochre3_ocr_spark.sources.corpus import lexicon_words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_text_df(docs, lexicon_words())
    return out.selectExpr("doc_id", "n_spans", "n_words")


def _extract_yiddish_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction with the confusion glyph classifier: non-trivial beams,
    lexicon rescoring deciding the argmax (rows-only; pinned by
    tests/test_pipeline_spark.py::test_extract_with_beam_confusions...)."""
    from jochre3_ocr_spark.plans.pipeline import extract
    from jochre3_ocr_spark.schema import DOCS_SCHEMA, PipelineConfig
    from jochre3_ocr_spark.sources.corpus import generate_docs, lexicon_words

    rows = [
        (
            d["doc_id"],
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in d["spans"]
            ],
        )
        for d in generate_docs(100)
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = extract(docs, lexicon_words(), config=PipelineConfig(glyph_confusions=True))
    return out.selectExpr(
        "doc_id", "n_words", "status", "length(processed_text) AS n_chars"
    )


def _extract_yiddish_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Yiddish pipeline (beam + hyphenation + ALTO rules) over the
    synthesized corpus — semantics not SQL-expressible (rows-only check);
    pinned instead by tests/ against the pure-Python oracle."""
    from jochre3_ocr_spark.plans.pipeline import extract_with_salting
    from jochre3_ocr_spark.schema import DOCS_SCHEMA
    from jochre3_ocr_spark.sources.corpus import generate_docs, lexicon_words

    rows = [
        (
            d["doc_id"],
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in d["spans"]
            ],
        )
        for d in generate_docs(120)
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = extract_with_salting(docs, lexicon_words(), giant_threshold=2000)
    return out.selectExpr(
        "doc_id", "n_spans", "n_words", "status", "length(processed_text) AS n_chars"
    )


# oracle for span stats: n_spans = 1 block + lines + words + glyphs + spaces
#   lines = ceil(W/12); spaces = W - lines; glyphs = total chars
#   → n_spans = 1 + ceil(W/12) + W + (W - ceil(W/12)) + G = 1 + 2W + G
_ORACLE_SPAN_STATS = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       CAST(1 + 2 * len(t) + list_sum(list_transform(t, x -> length(x)))
            AS INTEGER) AS n_spans,
       CAST(len(t) AS INTEGER) AS n_words
FROM toks
"""

_ORACLE_PROCESSED_TEXT = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ')
         AS processed_text
FROM documents
"""

# --------------------------------------------------------------------------
# Relational operator coverage (scan/filter/agg/join/window/sort/setop) —
# the same SQL runs on both engines unless noted.
# --------------------------------------------------------------------------
_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 3)                                   AS avg_qty,
       round(avg(l_extendedprice), 3)                              AS avg_price,
       round(avg(l_discount), 3)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q3_SPARK = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       date_format(o_orderdate, 'yyyy-MM-dd')            AS orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""
_Q3_DUCK = _Q3_SPARK.replace(
    "date_format(o_orderdate, 'yyyy-MM-dd')", "strftime(o_orderdate, '%Y-%m-%d')"
)

_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

_Q_WINDOW = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
) t
WHERE rn <= 3
"""

_Q_SEMI_ANTI = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
  AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      )
ORDER BY c_custkey
"""

_Q_EVENTS_SPARK = """
SELECT event_type,
       date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""
_Q_EVENTS_DUCK = _Q_EVENTS_SPARK.replace(
    "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')",
    "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')",
)

# --------------------------------------------------------------------------
# Training-data pipeline operators over documents / embeddings
# --------------------------------------------------------------------------
_Q_DEDUP_EXACT_SPARK = """
SELECT prefix_hash,
       count(*)                      AS n_docs,
       min(CAST(doc_id AS STRING))   AS keeper
FROM (SELECT doc_id, md5(substr(text, 1, 40)) AS prefix_hash FROM documents) t
GROUP BY prefix_hash
HAVING count(*) >= 2
"""
_Q_DEDUP_EXACT_DUCK = _Q_DEDUP_EXACT_SPARK.replace("AS STRING", "AS VARCHAR")

_Q_NGRAM_JACCARD_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id,
         filter(split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, shingle
  FROM toks
  LATERAL VIEW explode(
    array_distinct(
      transform(sequence(0, size(t) - 3),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
    )
  ) x AS shingle
  WHERE size(t) >= 3
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- doc-frequency cap: stop-phrase shingles are quadratic hot keys at scale
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
  FROM sh a
  JOIN rare r ON a.shingle = r.shingle
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc1, p.doc2, p.common,
       round(p.common / (ca.n + cb.n - p.common), 4) AS jaccard
FROM pairs p
JOIN counts ca ON p.doc1 = ca.doc_id
JOIN counts cb ON p.doc2 = cb.doc_id
WHERE p.common >= 3
"""
_Q_NGRAM_JACCARD_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         )) AS shingle
  FROM toks
  WHERE len(t) >= 3
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- doc-frequency cap: stop-phrase shingles are quadratic hot keys at scale
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
  FROM sh a
  JOIN rare r ON a.shingle = r.shingle
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc1, p.doc2, p.common,
       round(p.common / (ca.n + cb.n - p.common), 4) AS jaccard
FROM pairs p
JOIN counts ca ON p.doc1 = ca.doc_id
JOIN counts cb ON p.doc2 = cb.doc_id
WHERE p.common >= 3
"""

_Q_MINHASH_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id,
         filter(split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, shingle
  FROM toks
  LATERAL VIEW explode(
    array_distinct(
      transform(sequence(0, size(t) - 3),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
    )
  ) x AS shingle
  WHERE size(t) >= 3
),
seeds AS (SELECT explode(sequence(0, 7)) AS s),
mh AS (
  SELECT doc_id, s, min(md5(concat(CAST(s AS STRING), ':', shingle))) AS mh
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, s
)
SELECT doc_id,
       md5(array_join(transform(sort_array(collect_list(struct(s, mh))),
                                x -> x.mh), ',')) AS signature
FROM mh
GROUP BY doc_id
"""
_Q_MINHASH_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         )) AS shingle
  FROM toks
  WHERE len(t) >= 3
),
mh AS (
  SELECT doc_id, s, min(md5(CAST(s AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh CROSS JOIN range(0, 8) r(s)
  GROUP BY doc_id, s
)
SELECT doc_id, md5(string_agg(mh, ',' ORDER BY s)) AS signature
FROM mh
GROUP BY doc_id
"""

# SimHash near-dup pairs (operators/dedup.simhash_neardup_pairs): 32-bit
# signature, 4×8-bit bands (pigeonhole: hamming ≤ 1 ⇒ ≥3 identical bands),
# bucket-join then bit_count(xor) verify — banded, not all-pairs.
_Q_SIMHASH_ND_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id, token
  FROM documents
  LATERAL VIEW explode(array_distinct(filter(split(text, ' '), x -> x <> '')))
    x AS token
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN substr(md5(token), b + 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM toks CROSS JOIN (SELECT explode(sequence(0, 31)) AS b)
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id, sum(bit * CAST(pow(2, b) AS BIGINT)) AS simhash
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band,
         shiftright(simhash, band * 8) & 255 AS band_val
  FROM sigs LATERAL VIEW explode(sequence(0, 3)) x AS band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
         a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc1, doc2, CAST(bit_count(s1 ^ s2) AS INT) AS hamming
FROM cand WHERE bit_count(s1 ^ s2) <= 1
"""
_Q_SIMHASH_ND_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(list_distinct(list_filter(string_split(text, ' '),
                                          x -> x <> ''))) AS token
  FROM documents
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN substr(md5(token), b + 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM toks CROSS JOIN range(0, 32) r(b)
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id, CAST(sum(bit * CAST(pow(2, b) AS BIGINT)) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * 8)) & 255 AS band_val
  FROM sigs CROSS JOIN range(0, 4) rb(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
         a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc1, doc2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= 1
"""

# MinHash LSH banding (operators/dedup.minhash_lsh_candidates): 8 min-hashes
# in 4 bands of 2; docs sharing any band hash become candidate pairs —
# the bucketed (non-all-pairs) 100 TB dedup shape.
_Q_LSH_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id,
         filter(split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, shingle
  FROM toks
  LATERAL VIEW explode(
    array_distinct(
      transform(sequence(0, size(t) - 3),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
    )
  ) x AS shingle
  WHERE size(t) >= 3
),
seeds AS (SELECT explode(sequence(0, 7)) AS s),
mh AS (
  SELECT doc_id, s, min(md5(concat(CAST(s AS STRING), ':', shingle))) AS mh
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(s / 2 AS INT) AS band,
         md5(array_join(transform(sort_array(collect_list(struct(s, mh))),
                                  x -> x.mh), ',')) AS band_hash
  FROM mh
  GROUP BY doc_id, CAST(s / 2 AS INT)
)
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""
_Q_LSH_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         )) AS shingle
  FROM toks
  WHERE len(t) >= 3
),
mh AS (
  SELECT doc_id, s, min(md5(CAST(s AS VARCHAR) || ':' || shingle)) AS mh
  FROM sh CROSS JOIN range(0, 8) r(s)
  GROUP BY doc_id, s
),
bands AS (
  SELECT doc_id, CAST(s // 2 AS INT) AS band,
         md5(string_agg(mh, ',' ORDER BY s)) AS band_hash
  FROM mh
  GROUP BY doc_id, CAST(s // 2 AS INT)
)
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
"""

_Q_SIMHASH_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id, token
  FROM documents
  LATERAL VIEW explode(array_distinct(filter(split(text, ' '), x -> x <> '')))
    x AS token
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN substr(md5(token), b + 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM toks CROSS JOIN (SELECT explode(sequence(0, 15)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id, sum(bit * CAST(pow(2, b) AS BIGINT)) AS simhash
FROM bits
GROUP BY doc_id
"""
_Q_SIMHASH_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(list_distinct(list_filter(string_split(text, ' '),
                                          x -> x <> ''))) AS token
  FROM documents
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN substr(md5(token), b + 1, 1)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN 1 ELSE -1 END) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM toks CROSS JOIN range(0, 16) r(b)
  GROUP BY doc_id, b
)
SELECT doc_id, CAST(sum(bit * CAST(pow(2, b) AS BIGINT)) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
"""

_Q_ANN_SPARK = """
WITH q AS (
  SELECT vec_id AS qid, pos, CAST(val AS DOUBLE) AS v
  FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
  WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS cid, pos, CAST(val AS DOUBLE) AS v
  FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
),
dots AS (
  SELECT q.qid, c.cid,
         sum(q.v * c.v) AS dot,
         sqrt(sum(q.v * q.v)) AS nq,
         sqrt(sum(c.v * c.v)) AS nc
  FROM q JOIN c ON q.pos = c.pos
  GROUP BY q.qid, c.cid
)
SELECT qid, cid, rank FROM (
  SELECT qid, cid,
         row_number() OVER (
           PARTITION BY qid ORDER BY dot / (nq * nc) DESC, cid
         ) AS rank
  FROM dots WHERE qid <> cid
) t WHERE rank <= 5
"""
_Q_ANN_DUCK = """
WITH q AS (
  SELECT vec_id AS qid,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS cid,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
dots AS (
  SELECT q.qid, c.cid,
         sum(q.v * c.v) AS dot,
         sqrt(sum(q.v * q.v)) AS nq,
         sqrt(sum(c.v * c.v)) AS nc
  FROM q JOIN c ON q.pos = c.pos
  GROUP BY q.qid, c.cid
)
SELECT qid, cid, rank FROM (
  SELECT qid, cid,
         row_number() OVER (
           PARTITION BY qid ORDER BY dot / (nq * nc) DESC, cid
         ) AS rank
  FROM dots WHERE qid <> cid
) t WHERE rank <= 5
"""

_Q_CENTROIDS_SPARK = """
SELECT label, pos + 1 AS dim, round(avg(CAST(val AS DOUBLE)), 4) + 0.0 AS centroid
FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
GROUP BY label, pos
"""
_Q_CENTROIDS_DUCK = """
SELECT label,
       CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
       CAST(unnest(embedding) AS DOUBLE) AS v
FROM embeddings
"""
_Q_CENTROIDS_DUCK = """
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT label, CAST(dim AS INTEGER) AS dim, round(avg(v), 4) + 0.0 AS centroid
FROM e GROUP BY label, dim
"""

_Q_QUALITY_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id, lang, text,
         filter(split(text, ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, lang,
       size(t) AS n_tokens,
       round(length(replace(text, ' ', '')) / size(t), 4) AS avg_token_len,
       round(size(filter(t, x -> x IN ('the', 'a'))) / size(t), 4)
         AS stopword_ratio,
       round(size(array_distinct(t)) / size(t), 4) AS distinct_ratio
FROM toks
"""
_Q_QUALITY_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(t) AS INTEGER) AS n_tokens,
       round(length(replace(text, ' ', '')) / len(t), 4) AS avg_token_len,
       round(len(list_filter(t, x -> x IN ('the', 'a'))) / len(t), 4)
         AS stopword_ratio,
       round(len(list_distinct(t)) / len(t), 4) AS distinct_ratio
FROM toks
"""

_Q_FINGERPRINT_SPARK = """
SELECT CAST(doc_id AS STRING) AS doc_id,
       md5(text) AS exact_fp,
       md5(array_join(array_sort(array_distinct(
           filter(split(text, ' '), x -> x <> ''))), ' ')) AS bag_fp
FROM documents
"""
_Q_FINGERPRINT_DUCK = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       md5(text) AS exact_fp,
       md5(array_to_string(list_sort(list_distinct(
           list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS bag_fp
FROM documents
"""

_Q_TOKEN_STATS = """
SELECT source,
       count(*)            AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 3) AS avg_chars
FROM documents
GROUP BY source
"""


_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q_SETOPS = """
SELECT c_custkey, 'both' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
)
UNION ALL
SELECT c_custkey, 'building_only' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders
)
"""

_Q_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

_Q_PERCENTILES_SPARK = """
SELECT l_returnflag,
       round(percentile(l_quantity, 0.5), 2) AS p50,
       round(percentile(l_quantity, 0.9), 2) AS p90,
       round(percentile(l_extendedprice, 0.99), 2) AS price_p99
FROM lineitem
GROUP BY l_returnflag
"""
_Q_PERCENTILES_DUCK = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 2) AS p50,
       round(quantile_cont(l_quantity, 0.9), 2) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 2) AS price_p99
FROM lineitem
GROUP BY l_returnflag
"""

_Q_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# sessionization: 30-minute-gap sessions per user over the events stream
# (the batch analog of Structured Streaming session windows)
_Q_SESSIONS_SPARK = """
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR unix_timestamp(ts) - unix_timestamp(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       CAST(max(unix_timestamp(ts)) - min(unix_timestamp(ts)) AS BIGINT)
         AS duration_sec
FROM sess
GROUP BY user_id, session_id
"""
_Q_SESSIONS_DUCK = """
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS duration_sec
FROM sess
GROUP BY user_id, session_id
"""

# evaluation metrics (core/evaluation/CharacterErrorRate.scala:5-15,
# BagOfWords.scala:9-28, TextEvaluationMetric.scala:9-13): pair each doc
# with its successor as pred/gold and compute CER + bag-of-words cosine
_Q_EVAL_SPARK = """
WITH pairs AS (
  SELECT a.doc_id AS doc_id, a.text AS pred, b.text AS gold
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
toks AS (
  SELECT doc_id, token, side, count(*) AS c
  FROM (
    SELECT doc_id, explode(filter(split(pred, ' '), x -> x <> '')) AS token,
           'p' AS side FROM pairs
    UNION ALL
    SELECT doc_id, explode(filter(split(gold, ' '), x -> x <> '')) AS token,
           'g' AS side FROM pairs
  ) t GROUP BY doc_id, token, side
),
vec AS (
  SELECT doc_id,
         sum(CASE WHEN side = 'p' THEN c ELSE 0 END)
           * sum(CASE WHEN side = 'g' THEN c ELSE 0 END) AS dot_part,
         token
  FROM toks GROUP BY doc_id, token
),
cos AS (
  SELECT v.doc_id,
         sum(v.dot_part) /
         (sqrt(sum(CASE WHEN t.side='p' THEN t.c*t.c ELSE 0 END)) *
          sqrt(sum(CASE WHEN t.side='g' THEN t.c*t.c ELSE 0 END))) AS cosine
  FROM vec v JOIN toks t ON v.doc_id = t.doc_id AND v.token = t.token
  GROUP BY v.doc_id
)
SELECT p.doc_id,
       round(levenshtein(p.pred, p.gold) / length(p.gold), 4) AS cer,
       length(p.gold) AS char_count,
       round(c.cosine, 4) AS bow_cosine
FROM pairs p JOIN cos c ON p.doc_id = c.doc_id
"""
_Q_EVAL_DUCK = """
WITH pairs AS (
  SELECT a.doc_id AS doc_id, a.text AS pred, b.text AS gold
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
toks AS (
  SELECT doc_id, token, side, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(pred, ' '), x -> x <> '')) AS token,
           'p' AS side FROM pairs
    UNION ALL
    SELECT doc_id,
           unnest(list_filter(string_split(gold, ' '), x -> x <> '')) AS token,
           'g' AS side FROM pairs
  ) t GROUP BY doc_id, token, side
),
vec AS (
  SELECT doc_id,
         sum(CASE WHEN side = 'p' THEN c ELSE 0 END)
           * sum(CASE WHEN side = 'g' THEN c ELSE 0 END) AS dot_part,
         token
  FROM toks GROUP BY doc_id, token
),
cos AS (
  SELECT v.doc_id,
         sum(v.dot_part) /
         (sqrt(sum(CASE WHEN t.side='p' THEN t.c*t.c ELSE 0 END)) *
          sqrt(sum(CASE WHEN t.side='g' THEN t.c*t.c ELSE 0 END))) AS cosine
  FROM vec v JOIN toks t ON v.doc_id = t.doc_id AND v.token = t.token
  GROUP BY v.doc_id
)
SELECT p.doc_id,
       round(levenshtein(p.pred, p.gold) / length(p.gold), 4) AS cer,
       length(p.gold) AS char_count,
       round(c.cosine, 4) AS bow_cosine
FROM pairs p JOIN cos c ON p.doc_id = c.doc_id
"""




_Q_LANGID_SPARK = """
WITH toks AS (
  SELECT CAST(doc_id AS STRING) AS doc_id, lang,
         filter(split(text, ' '), x -> x <> '') AS t
  FROM documents
),
counts AS (
  SELECT doc_id, lang,
         size(filter(t, x -> x IN ('the', 'a', 'of'))) AS c_en,
         size(filter(t, x -> x IN ('der', 'die', 'und'))) AS c_de,
         size(filter(t, x -> x IN ('le', 'la', 'et'))) AS c_fr,
         size(filter(t, x -> x IN ('el', 'los', 'y'))) AS c_es
  FROM toks
)
SELECT doc_id, lang AS true_lang,
       CASE greatest(c_en, c_de, c_fr, c_es)
            WHEN c_en THEN 'en' WHEN c_de THEN 'de'
            WHEN c_fr THEN 'fr' ELSE 'es' END AS predicted_lang,
       c_en, c_de, c_fr, c_es
FROM counts
"""
_Q_LANGID_DUCK = """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
counts AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(t, x -> x IN ('the', 'a', 'of'))) AS INTEGER) AS c_en,
         CAST(len(list_filter(t, x -> x IN ('der', 'die', 'und'))) AS INTEGER) AS c_de,
         CAST(len(list_filter(t, x -> x IN ('le', 'la', 'et'))) AS INTEGER) AS c_fr,
         CAST(len(list_filter(t, x -> x IN ('el', 'los', 'y'))) AS INTEGER) AS c_es
  FROM toks
)
SELECT doc_id, lang AS true_lang,
       CASE greatest(c_en, c_de, c_fr, c_es)
            WHEN c_en THEN 'en' WHEN c_de THEN 'de'
            WHEN c_fr THEN 'fr' ELSE 'es' END AS predicted_lang,
       c_en, c_de, c_fr, c_es
FROM counts
"""


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal path: binary image columns -> decode -> grayscale ->
    ink stats + skew estimate (operators/multimodal.py). Geometry/vision
    semantics, rows-only check; pinned by tests/test_transforms.py."""
    from jochre3_ocr_spark.operators.multimodal import (
        extract_image_features,
        synthesize_media_df,
    )

    media = synthesize_media_df(spark, 40)
    out = extract_image_features(media)
    return out.selectExpr(
        "media_ref", "width", "height",
        "round(ink_ratio, 4) AS ink_ratio",
        "round(skew_deg, 2) AS skew_deg", "status",
    )




# IVF-style ANN: coarse quantize every vector to its nearest of the first
# 8 embeddings (the "centroids"), probe only the query's cell — the scale
# path next to brute-force ann_cosine_topk. Portable SQL on both engines.
_Q_IVF_SPARK = """
WITH e AS (
  SELECT vec_id, pos, CAST(val AS DOUBLE) AS v
  FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
),
cent AS (SELECT vec_id AS cid, pos, v FROM e WHERE vec_id < 8),
dots AS (
  SELECT e.vec_id, c.cid,
         sum(e.v * c.v) / (sqrt(sum(e.v * e.v)) * sqrt(sum(c.v * c.v))) AS cos
  FROM e JOIN cent c ON e.pos = c.pos
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM dots
  ) t WHERE rn = 1
),
q AS (SELECT vec_id AS qid, pos, CAST(val AS DOUBLE) AS v
      FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
      WHERE vec_id < 5),
c AS (SELECT vec_id AS cid2, pos, CAST(val AS DOUBLE) AS v
      FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val),
pair AS (
  SELECT q.qid, c.cid2 AS cid,
         sum(q.v * c.v) / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS cos
  FROM q JOIN c ON q.pos = c.pos
  JOIN assign aq ON aq.vec_id = q.qid
  JOIN assign ac ON ac.vec_id = c.cid2 AND ac.cell = aq.cell
  GROUP BY q.qid, c.cid2
)
SELECT qid, cid, rank FROM (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
  FROM pair WHERE qid <> cid
) t WHERE rank <= 3
"""
_Q_IVF_DUCK = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, pos, v FROM e WHERE vec_id < 8),
dots AS (
  SELECT e.vec_id, c.cid,
         sum(e.v * c.v) / (sqrt(sum(e.v * e.v)) * sqrt(sum(c.v * c.v))) AS cos
  FROM e JOIN cent c ON e.pos = c.pos
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM dots
  ) t WHERE rn = 1
),
q AS (SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cid2, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
pair AS (
  SELECT q.qid, c.cid2 AS cid,
         sum(q.v * c.v) / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))) AS cos
  FROM q JOIN c ON q.pos = c.pos
  JOIN assign aq ON aq.vec_id = q.qid
  JOIN assign ac ON ac.vec_id = c.cid2 AND ac.cell = aq.cell
  GROUP BY q.qid, c.cid2
)
SELECT qid, cid, rank FROM (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
  FROM pair WHERE qid <> cid
) t WHERE rank <= 3
"""

# embedding-cosine near-duplicate pairs over a label-blocked candidate set
_Q_EMB_NEARDUP_SPARK = """
WITH e AS (
  SELECT vec_id, label, pos, CAST(val AS DOUBLE) AS v
  FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, val
),
pair AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         sum(a.v * b.v) / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))) AS cos
  FROM e a JOIN e b
    ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT v1, v2, round(cos, 4) AS cosine
FROM pair WHERE cos > 0.3
"""
_Q_EMB_NEARDUP_DUCK = """
WITH e AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
pair AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         sum(a.v * b.v) / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))) AS cos
  FROM e a JOIN e b
    ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT v1, v2, round(cos, 4) AS cosine
FROM pair WHERE cos > 0.3
"""


def _dehyphenate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone dehyphenation over the synthesized Yiddish corpus text
    (the /dehyphenate API operator, YiddishDehyphenator.scala:24-137) —
    rows-only (lexicon-driven semantics)."""
    import pandas as pd

    from jochre3_ocr_spark.plans.pipeline import (
        _get_worker_lexicon,
        extract,
    )
    from jochre3_ocr_spark.schema import DOCS_SCHEMA
    from jochre3_ocr_spark.sources.corpus import generate_docs, lexicon_words

    rows = [
        (
            d["doc_id"],
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in d["spans"]
            ],
        )
        for d in generate_docs(80)
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    extracted = extract(docs, lexicon_words())
    bc = spark.sparkContext.broadcast(lexicon_words())

    def run(batches):
        from jochre3_ocr_spark.functions.dehyphenate import dehyphenate

        lex = _get_worker_lexicon(bc)
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "dehyphenated_len": [
                        len(dehyphenate(t or "", lex)) for t in b["text"]
                    ],
                    "n_breaks_in": [
                        (t or "").count("\n") for t in b["text"]
                    ],
                }
            )

    return extracted.select("doc_id", "text").mapInPandas(
        run, schema="doc_id string, dehyphenated_len int, n_breaks_in int"
    )


def _word_frequency_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word-in-lexicon + standardize-words API operators
    (api/.../AnalysisApp.scala:158-176, Lexicon.getFrequency /
    standardize) over the corpus vocabulary — rows-only."""
    import pandas as pd

    from jochre3_ocr_spark.plans.pipeline import _get_worker_lexicon
    from jochre3_ocr_spark.sources.corpus import (
        KNOWN_WORDS,
        NUMBER_WORDS,
        UNKNOWN_WORDS,
        VARIANT_SPELLINGS,
        lexicon_words,
    )

    words = list(KNOWN_WORDS) + list(UNKNOWN_WORDS) + list(VARIANT_SPELLINGS) + list(NUMBER_WORDS)
    bc = spark.sparkContext.broadcast(lexicon_words())
    df = spark.createDataFrame([(w,) for w in words], "word string")

    def run(batches):
        lex = _get_worker_lexicon(bc)
        for b in batches:
            yield pd.DataFrame(
                {
                    "word": b["word"],
                    "frequency": [lex.get_frequency(w) for w in b["word"]],
                    "standardized": [lex.to_yivo(w) for w in b["word"]],
                }
            )

    return df.mapInPandas(
        run, schema="word string, frequency int, standardized string"
    )




def _skew_eval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deskew evaluation (Deskewer.scala:250-282 + MathUtils.scala:36-45):
    mean and stddev of estimated-vs-true skew over synthetic pages —
    vision semantics, rows-only; tolerance pinned in test_transforms."""
    import pandas as pd

    def run(batches):
        import random

        from jochre3_ocr_spark.operators import contour_deskew as CD
        from jochre3_ocr_spark.operators import transforms as T
        from jochre3_ocr_spark.operators.multimodal import make_text_image

        for b in batches:
            rows = []
            for i in b["id"]:
                rng = random.Random(1000 + int(i))
                true = rng.uniform(-3, 3)
                img = make_text_image(5, true, seed=int(i), width=600, height=400)
                est = T.estimate_skew(img)
                cont = CD.get_skew_angle(img)
                rows.append(
                    {"page_id": int(i), "true_skew": true,
                     "est_skew": est, "abs_err": abs(est - true) if est is not None else None,
                     "contour_abs_err": abs(cont - true) if cont is not None else None}
                )
            yield pd.DataFrame(rows)

    per_page = spark.range(40).mapInPandas(
        run,
        schema="page_id long, true_skew double, est_skew double, "
        "abs_err double, contour_abs_err double",
    )
    return per_page.selectExpr(
        "count(*) AS n_pages",
        "round(avg(abs_err), 4) AS mean_abs_err",
        "round(stddev(abs_err), 4) AS stddev_abs_err",
        "round(max(abs_err), 4) AS max_abs_err",
        "round(avg(contour_abs_err), 4) AS contour_mean_abs_err",
        "round(max(contour_abs_err), 4) AS contour_max_abs_err",
    )


def _ocr_layout_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-path OCR (layout oracle → segment → classify → guess →
    transform) — geometry semantics not SQL-expressible (rows-only);
    pinned by tests/test_ocr.py against ground truth instead."""
    from jochre3_ocr_spark.plans.pipeline import ocr_corpus
    from jochre3_ocr_spark.sources.corpus import lexicon_words, n_docs_for_sf

    sf = 0.001 if "0.001" in sf_dir else (0.01 if "0.01" in sf_dir else 0.1)
    n = max(20, n_docs_for_sf(sf) // 10)
    out = ocr_corpus(spark, n, lexicon_words())
    return out.selectExpr(
        "doc_id", "n_spans", "n_words", "status", "length(text) AS n_chars"
    )


def _ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over deterministic spherical k-means cells with
    multi-probe (operators/similarity.ivf_kmeans_topk) — rows-only
    (iterative algorithm; the first-k-centroid variant ann_ivf_topk
    carries the SQL oracle)."""
    from jochre3_ocr_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_kmeans_topk(
        emb, "vec_id < 5", k=3, n_cells=8, kmeans_iters=3, n_probe=2
    )


def _media_av_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio + video multimodal paths (operators/multimodal.py): WAV
    waveform features and video-frame fan-out counts over a synthesized
    media table — rows-only (binary semantics)."""
    import io as _io
    import math
    import wave

    import numpy as np
    import pandas as pd

    from jochre3_ocr_spark.operators import multimodal as M

    def wav_bytes(i: int) -> bytes:
        sr = 8000
        t = np.arange(sr // 2) / sr
        sig = np.sin(2 * math.pi * (220 + 20 * i) * t)
        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((sig * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    def video_bytes(i: int) -> bytes:
        frames = np.stack(
            [
                np.full((16, 16), (7 * i + 3 * f) % 256, dtype=np.uint8)
                for f in range(10 + i % 5)
            ]
        )
        buf = _io.BytesIO()
        np.save(buf, frames, allow_pickle=False)
        return buf.getvalue()

    rows = []
    for i in range(10):
        rows.append((f"aud_{i}", "audio/wav", bytearray(wav_bytes(i))))
        rows.append((f"vid_{i}", "video/npy", bytearray(video_bytes(i))))
    media = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary"
    )
    audio = M.audio_features(media.filter("media_type = 'audio/wav'")).select(
        "media_ref",
        F.lit("audio").alias("kind"),
        F.col("n_samples").alias("n_units"),
        F.col("rms").alias("metric"),
        "status",
    )
    frames = (
        M.sample_frames_df(media.filter("media_type = 'video/npy'"), every_n=5)
        .groupBy("media_ref")
        .agg(
            F.count("*").alias("n_units"),
            F.round(F.avg("width"), 2).alias("metric"),
        )
        .select(
            "media_ref",
            F.lit("video").alias("kind"),
            "n_units",
            "metric",
            F.lit("ok").alias("status"),
        )
    )
    return audio.unionByName(frames)


def _token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish pretokenizer token counts per doc — the
    token-budget estimator (operators/text_metrics.bpe_token_counts);
    pure JVM regexp, no UDF."""
    from jochre3_ocr_spark.operators.text_metrics import bpe_token_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_counts(docs)


# the pattern's leading ' is doubled for the SQL literal
_Q_BPE_DUCK = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id,\n"
    "       CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))\n"
    "            AS INTEGER) AS n_ws_tokens,\n"
    "       CAST(len(regexp_extract_all(text,\n"
    "            '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|"
    " ?[^\\s\\p{L}\\p{N}]+|\\s+'))\n"
    "            AS INTEGER) AS n_bpe_tokens\n"
    "FROM documents\n"
)


def _pdf_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF ingestion (PDFToImageConverter.scala:18-75): synthesize PDFs
    deterministically, fan out one row per rendered page via mapInPandas,
    report per-page geometry + ink — rows-only (vision semantics)."""
    from jochre3_ocr_spark.sources import pdf as P

    rows = [
        (f"pdf_{i:03d}", bytearray(P.make_test_pdf(1 + i % 5)))
        for i in range(20)
    ]
    pdfs = spark.createDataFrame(rows, "doc_id string, content binary")
    pages = P.pdf_pages(pdfs, renderer=P.fake_renderer, dpi=72)

    import pandas as pd

    def ink(batches):
        from jochre3_ocr_spark.sources.png_codec import decode_png

        for b in batches:
            out = []
            for doc_id, page_no, n_pages, img, w, h, status in zip(
                b["doc_id"], b["page_number"], b["n_pages"], b["image"],
                b["width"], b["height"], b["status"],
            ):
                arr = decode_png(bytes(img)) if img is not None else None
                out.append(
                    {
                        "doc_id": doc_id,
                        "page_number": page_no,
                        "n_pages": n_pages,
                        "width": w,
                        "height": h,
                        "ink_ratio": float((arr < 128).mean()) if arr is not None else None,
                        "status": status,
                    }
                )
            yield pd.DataFrame(out)

    return pages.mapInPandas(
        ink,
        schema="doc_id string, page_number int, n_pages int, width int, "
        "height int, ink_ratio double, status string",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the extraction engine over sf0.001 documents."""
    return _extract_processed_text(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_processed_text": _extract_processed_text,
        "extract_span_stats": _extract_span_stats,
        "extract_yiddish_corpus": _extract_yiddish_corpus,
        "extract_yiddish_beam": _extract_yiddish_beam,
        "q1_pricing_summary": _sql(_Q1),
        "q3_shipping_priority": _sql(_Q3_SPARK),
        "q5_local_supplier_volume": _sql(_Q5),
        "q_window_top_lineitems": _sql(_Q_WINDOW),
        "q_semi_anti_customers": _sql(_Q_SEMI_ANTI),
        "q6_forecast_revenue": _sql(_Q6),
        "q_setops_customers": _sql(_Q_SETOPS),
        "q_rollup_lineitem": _sql(_Q_ROLLUP),
        "q_grouping_sets": _sql(_Q_GROUPING_SETS),
        "q_percentiles": _sql(_Q_PERCENTILES_SPARK),
        "q_events_hourly": _sql(_Q_EVENTS_SPARK),
        "q_events_sessions": _sql(_Q_SESSIONS_SPARK),
        "dedup_exact": _sql(_Q_DEDUP_EXACT_SPARK),
        "dedup_ngram_jaccard": _sql(_Q_NGRAM_JACCARD_SPARK),
        "dedup_minhash_signature": _sql(_Q_MINHASH_SPARK),
        "dedup_simhash": _sql(_Q_SIMHASH_SPARK),
        "ann_cosine_topk": _sql(_Q_ANN_SPARK),
        "embedding_centroids": _sql(_Q_CENTROIDS_SPARK),
        "text_quality": _sql(_Q_QUALITY_SPARK),
        "doc_fingerprint": _sql(_Q_FINGERPRINT_SPARK),
        "token_stats_by_source": _sql(_Q_TOKEN_STATS),
        "eval_text_metrics": _sql(_Q_EVAL_SPARK),
        "lang_id_heuristic": _sql(_Q_LANGID_SPARK),
        "ocr_layout_end_to_end": _ocr_layout_end_to_end,
        "media_image_features": _media_features,
        "skew_eval_stats": _skew_eval_stats,
        "ann_ivf_topk": _sql(_Q_IVF_SPARK),
        "dedup_embedding_neardup": _sql(_Q_EMB_NEARDUP_SPARK),
        "dehyphenate_corpus": _dehyphenate_corpus,
        "word_frequency_corpus": _word_frequency_corpus,
        "dedup_minhash_lsh": _sql(_Q_LSH_SPARK),
        "dedup_simhash_neardup": _sql(_Q_SIMHASH_ND_SPARK),
        "pdf_page_scan": _pdf_page_scan,
        "token_counts_bpe": _token_counts_bpe,
        "ann_ivf_kmeans_topk": _ann_ivf_kmeans_topk,
        "media_av_features": _media_av_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_processed_text": _ORACLE_PROCESSED_TEXT,
        "extract_span_stats": _ORACLE_SPAN_STATS,
        # extract_yiddish_corpus: intentionally omitted (non-SQL semantics)
        "q1_pricing_summary": _Q1,
        "q3_shipping_priority": _Q3_DUCK,
        "q5_local_supplier_volume": _Q5,
        "q_window_top_lineitems": _Q_WINDOW,
        "q_semi_anti_customers": _Q_SEMI_ANTI,
        "q6_forecast_revenue": _Q6,
        "q_setops_customers": _Q_SETOPS,
        "q_rollup_lineitem": _Q_ROLLUP,
        "q_grouping_sets": _Q_GROUPING_SETS,
        "q_percentiles": _Q_PERCENTILES_DUCK,
        "q_events_hourly": _Q_EVENTS_DUCK,
        "q_events_sessions": _Q_SESSIONS_DUCK,
        "dedup_exact": _Q_DEDUP_EXACT_DUCK,
        "dedup_ngram_jaccard": _Q_NGRAM_JACCARD_DUCK,
        "dedup_minhash_signature": _Q_MINHASH_DUCK,
        "dedup_simhash": _Q_SIMHASH_DUCK,
        "ann_cosine_topk": _Q_ANN_DUCK,
        "embedding_centroids": _Q_CENTROIDS_DUCK,
        "text_quality": _Q_QUALITY_DUCK,
        "doc_fingerprint": _Q_FINGERPRINT_DUCK,
        "token_stats_by_source": _Q_TOKEN_STATS,
        "eval_text_metrics": _Q_EVAL_DUCK,
        "lang_id_heuristic": _Q_LANGID_DUCK,
        "ann_ivf_topk": _Q_IVF_DUCK,
        "dedup_embedding_neardup": _Q_EMB_NEARDUP_DUCK,
        "dedup_minhash_lsh": _Q_LSH_DUCK,
        "dedup_simhash_neardup": _Q_SIMHASH_ND_DUCK,
        "token_counts_bpe": _Q_BPE_DUCK,
        # rows-only (non-SQL semantics): ocr_layout_end_to_end,
        # media_image_features, dehyphenate_corpus, word_frequency_corpus,
        # pdf_page_scan
    }
