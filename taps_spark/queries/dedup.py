"""Deduplication query inventory (SURVEY.md §2c — LLM-pipeline
extensions over the documents fixture)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taps_spark.io.tables import load_tables, parallelize_cpu
from taps_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_stats,
    jaccard,
    lsh_band_clusters,
    minhash_signatures,
    simhash64,
    simhash_candidates,
)
from taps_spark.operators.text import tokens
from taps_spark.queries import query

EXACT_ORACLE = """
SELECT MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fp,
       COUNT(*)     AS n_copies,
       MIN(doc_id)  AS keep_id
FROM documents
GROUP BY 1
ORDER BY fp
"""


@query("dedup_exact", oracle=EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup stats: one row per distinct normalized content
    (fingerprint, copy count, surviving doc id).

    Scale: the shuffle key is the 32-byte md5 fingerprint, never the
    document text; min/count combine map-side.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return exact_dedup_stats(docs, "doc_id", "text").orderBy("fp")


EXACT_DOCS_ORACLE = """
SELECT doc_id, lang, source
FROM documents
WHERE doc_id IN (
  SELECT MIN(doc_id)
  FROM documents
  GROUP BY MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))))
)
ORDER BY doc_id
"""


@query("dedup_exact_keep_first", oracle=EXACT_DOCS_ORACLE)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving document set under keep-first exact dedup
    (deterministic survivor choice, unlike dropDuplicates)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return exact_dedup(docs, "doc_id", "text").select("doc_id", "lang", "source").orderBy(
        "doc_id"
    )


MINHASH_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
sig AS (
  SELECT doc_id, s.seed, MIN(MD5(CAST(s.seed AS VARCHAR) || '|' || tok)) AS mh
  FROM tok
  CROSS JOIN (SELECT unnest(range(8)) AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, seed // 2 AS band, STRING_AGG(mh, '|' ORDER BY seed) AS band_sig
  FROM sig
  GROUP BY doc_id, seed // 2
)
SELECT CAST(band AS BIGINT) AS band, band_sig,
       COUNT(*)   AS n_docs,
       MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id
FROM bands
GROUP BY band, band_sig
HAVING COUNT(*) > 1
ORDER BY band, band_sig
"""


@query("dedup_minhash_lsh", oracle=MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH banding (4 bands × 2 rows) near-duplicate
    candidate clusters.

    The hash family is md5-as-string (engine-portable — the oracle
    computes the *identical* signature in SQL); output is per-bucket
    cluster stats, not pairs, so result size stays linear in docs.
    See operators/dedup.py for the 100 TB plan shape.
    """
    docs = parallelize_cpu(load_tables(spark, sf_dir, ("documents",))["documents"])
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    return lsh_band_clusters(sigs, "doc_id", rows_per_band=2).orderBy("band", "band_sig")


@query("dedup_simhash")  # rows-only: xxhash64 is Spark-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(63-bit) near-dup candidate clusters via 16-bit band
    collisions. No SQL oracle (hash family is engine-specific); the
    driver records a rows-only check and unit tests pin the semantics
    (tests/test_dedup.py).
    """
    docs = parallelize_cpu(load_tables(spark, sf_dir, ("documents",))["documents"])
    sim = simhash64(docs, "doc_id", "text")
    return simhash_candidates(sim, "doc_id").orderBy("band_idx", "band_val")


JACCARD_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks,
         LAG(doc_id) OVER (PARTITION BY lang, source ORDER BY doc_id) AS prev_id,
         LAG(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
             OVER (PARTITION BY lang, source ORDER BY doc_id) AS prev_toks
  FROM documents
)
SELECT doc_id, prev_id,
       ROUND(CAST(LEN(list_intersect(toks, prev_toks)) AS DOUBLE)
             / LEN(list_distinct(list_concat(toks, prev_toks))), 4) AS jaccard_sim
FROM t
WHERE prev_id IS NOT NULL
ORDER BY doc_id
"""


@query("dedup_ngram_jaccard_neighbors", oracle=JACCARD_ORACLE)
def dedup_ngram_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard between each doc and its predecessor
    within (lang, source) — the verification kernel that LSH candidate
    pairs feed at scale (blocking here is the neighbor pair, so the
    oracle stays all-SQL; the LSH query provides scalable blocking).
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    t = docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(tokens("text")).alias("toks"),
    ).select(
        "doc_id",
        F.lag("doc_id").over(w).alias("prev_id"),
        "toks",
        F.lag("toks").over(w).alias("prev_toks"),
    )
    return (
        t.filter(F.col("prev_id").isNotNull())
        .select(
            "doc_id",
            "prev_id",
            F.round(jaccard(F.col("toks"), F.col("prev_toks")), 4).alias("jaccard_sim"),
        )
        .orderBy("doc_id")
    )
