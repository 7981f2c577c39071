"""Vector similarity search over ArrayType(FloatType) embeddings.

Two paths:
- brute-force cosine top-k: exact baseline; broadcast the (small)
  query set against the full corpus — one pass over the candidates,
  per-query top-k via window. Linear in corpus size.
- LSH-bucketed ANN (random hyperplanes): the scale path — sign-bit
  bucket per vector, candidates only within the query's bucket. One
  shuffle on the bucket key; corpus never cross-joins the query set.

Cosine math is pure column expressions (zip_with + aggregate fold in
doubles, left-to-right — the same order the DuckDB oracle uses), so
everything stays in whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    da, db = as_double(a), as_double(b)
    return dot(da, db) / F.sqrt(dot(da, da) * dot(db, db))


def topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "q_id",
    qvec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k: every query against every candidate.

    Scale: broadcast(queries) × corpus — the corpus is scanned once,
    partial top-k happens inside each partition's window sort; only
    (|queries| × k)-ish rows survive to the final shuffle.
    """
    scored = (
        emb.join(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            F.col(qid_col),
            F.col(id_col),
            cosine(F.col(qvec_col), F.col(vec_col)).alias("_score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("_score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qid_col,
            F.col(id_col).alias("neighbor_id"),
            F.round("_score", 4).alias("score"),
            F.col("rank").alias("rank"),
        )
    )


def hyperplane_bucket(vec: Column, num_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id (sign bits packed into an int).

    Plane weights are deterministic ±1 derived from xxhash64(plane,
    dim-index) — reproducible across runs/executors without shipping a
    weight matrix; the 'random projection with Rademacher weights'
    family preserves cosine locality.
    """
    dv = as_double(vec)
    bucket = F.lit(0)
    for j in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                dv,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: F.when(
                    F.xxhash64(F.lit(j), i).bitwiseAND(F.lit(1)) == 1, x
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "q_id",
    qvec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: exact cosine but only within the query's
    hyperplane bucket.

    Scale: corpus bucketed once (map-only), equi-join on bucket id
    replaces the cross join — with 2^planes buckets the candidate set
    per query drops by that factor; AQE handles bucket skew.
    """
    cand = emb.withColumn("bucket", hyperplane_bucket(F.col(vec_col), num_planes, dim))
    qb = queries.withColumn("bucket", hyperplane_bucket(F.col(qvec_col), num_planes, dim))
    scored = (
        cand.join(F.broadcast(qb), "bucket")
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            F.col(qid_col),
            F.col(id_col),
            cosine(F.col(qvec_col), F.col(vec_col)).alias("_score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("_score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qid_col,
            F.col(id_col).alias("neighbor_id"),
            F.round("_score", 4).alias("score"),
            F.col("rank").alias("rank"),
        )
    )
