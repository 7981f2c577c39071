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


def _topk_reduce(scored: DataFrame, qid_col: str, id_col: str, k: int) -> DataFrame:
    """Exact per-query top-k over a scored (qid, id, _score) frame.

    Expressed as row_number-over-window + rank filter ON PURPOSE:
    Spark ≥3.5 compiles this to WindowGroupLimit in Partial mode
    BEFORE the exchange — each input partition keeps only its local
    top-k per query map-side, so the shuffle ships ≤ k×partitions
    rows per query instead of the whole scored candidate set. That is
    the per-partition partial top-k a manual salted two-stage
    (groupBy shard → slice(sort(collect_list))) would build by hand,
    with one fewer shuffle; tests/test_plans.py pins the
    WindowGroupLimit(Partial) shape so a regression (or a Spark
    behavior change) fails CI rather than melting at corpus scale.
    """
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

    Scale: broadcast(queries) × corpus — the corpus is scanned once;
    the scored pairs reduce map-side via WindowGroupLimit(Partial)
    (see _topk_reduce), so the shuffle carries ≤ k×partitions rows
    per query, never the whole candidate set.
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
    return _topk_reduce(scored, qid_col, id_col, k)


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


def train_ivf_centroids(
    emb: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means-lite (Lloyd) centroid training, pure
    DataFrame ops — the coarse quantizer of an IVF index.

    Init = the nlist lowest-id vectors (reproducible across engines
    and runs; no RNG). Each iteration: assign every vector to its
    nearest centroid (broadcast centroids, argmin via min(struct)),
    then recompute centroids as element-wise means (posexplode →
    per-(centroid, dim) avg → re-assemble array).

    Scale: at 100 TB you train on a ~1M-row sample (centroids
    converge on a sample; `emb.sample(frac)` upstream) so each Lloyd
    iteration is minutes, then assign the full corpus ONCE. Returns
    DataFrame[centroid_id int, cv array<double>].
    """
    dv = emb.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("v"))
    # Rank the nlist seed vectors WITHOUT a global unpartitioned
    # window (that pattern serializes on one reducer as nlist grows):
    # sort the nlist ids into one broadcast array and take each row's
    # 1-based position in it.
    seeds = dv.orderBy("_id").limit(nlist)
    seed_ids = seeds.agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
    cents = seeds.join(F.broadcast(seed_ids)).select(
        F.array_position(F.col("_ids"), F.col("_id")).cast("int").alias("centroid_id"),
        F.col("v").alias("cv"),
    )
    for _ in range(iters):
        assigned = assign_nearest_centroid(dv, cents, vec_col="v")
        cents = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "x"))), lambda s: s["x"]
                ).alias("cv")
            )
        )
    return cents


def assign_nearest_centroid(dv: DataFrame, cents: DataFrame, vec_col: str = "v") -> DataFrame:
    """Nearest centroid per vector by L2: broadcast the (tiny)
    centroid table against the corpus, argmin with min(struct(dist,
    id)) — ties break on centroid_id, so assignment is deterministic.
    One map-side broadcast join + one shuffle on the vector id."""
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    other = [c for c in dv.columns if c != vec_col]
    return (
        dv.join(F.broadcast(cents))
        .select(*other, vec_col, F.struct(d2.alias("d"), F.col("centroid_id").alias("c")).alias("_dc"))
        .groupBy(*other)
        .agg(F.min("_dc").alias("_m"), F.first(vec_col).alias(vec_col))
        .select(*other, vec_col, F.col("_m.c").alias("centroid_id"))
    )


def topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "q_id",
    qvec_col: str = "q_vec",
) -> DataFrame:
    """IVF approximate top-k: exact cosine, but only against the
    inverted lists of the query's nprobe nearest centroids.

    Scale: the corpus is assigned once (map-only after training) and
    in production would be WRITTEN partitioned by centroid_id —
    searches then touch nprobe/nlist of the data (partition pruning
    on the centroid key). Candidates reach each query via an
    equi-join on centroid_id, never a cross join. nprobe/nlist is the
    recall/cost dial: nprobe=nlist degenerates to brute force.
    """
    cents = train_ivf_centroids(emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col)
    cents = cents.persist()
    corpus = assign_nearest_centroid(
        emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")).withColumnRenamed(
            id_col, "_id"
        ),
        cents,
    ).select(F.col("_id").alias(id_col), "v", "centroid_id")

    qv = queries.select(F.col(qid_col), as_double(F.col(qvec_col)).alias("qv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wprobe = Window.partitionBy(qid_col).orderBy(F.col("_d"), F.col("centroid_id"))
    probes = (
        qv.join(F.broadcast(cents))
        .select(qid_col, "qv", F.col("centroid_id"), d2.alias("_d"))
        .withColumn("_pr", F.row_number().over(wprobe))
        .filter(F.col("_pr") <= nprobe)
        .select(qid_col, "qv", "centroid_id")
    )
    scored = (
        corpus.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            F.col(qid_col),
            F.col(id_col),
            (dot(F.col("qv"), F.col("v")) / F.sqrt(dot(F.col("qv"), F.col("qv")) * dot(F.col("v"), F.col("v")))).alias("_score"),
        )
    )
    return _topk_reduce(scored, qid_col, id_col, k)


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
    return _topk_reduce(scored, qid_col, id_col, k)
