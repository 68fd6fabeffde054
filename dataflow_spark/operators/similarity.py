"""Similarity search over embedding columns (array<float>).

Reference analogue: SemDeduplicateFilter's embedding+cosine near-dup
(sem_deduplicate_filter.py:47-59 builds a full cosine matrix) and the
EmbeddingGenerator / RAG retrieval shape (core_text/generate).  At 100 TB a
full matrix is impossible — we ship:

* brute-force cosine top-k (exact baseline): broadcast the (small) query set,
  score JVM-side with zip_with/aggregate HOFs, rank with a window — one scan;
* random-hyperplane LSH buckets (scale path): 16-bit sign sketch per vector,
  candidates only within matching buckets (optionally multi-probe), exact
  cosine re-rank inside buckets;
* embedding near-dup: LSH bucket join + exact cosine >= 1-eps -> cluster ->
  min-id survivor (SemDeduplicateFilter semantics without the O(n²) matrix).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataflow_spark.core.stage import Stage, register
from dataflow_spark.operators.dedup import keep_cluster_min


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product: aggregate(zip_with(a, b, *), sum).  Inputs are
    cast to double so float32 embeddings accumulate in f64 (and match any
    f64 oracle bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the query set (small side),
    score every (corpus, query) pair JVM-side, window-rank within query.
    Plan: one corpus scan, broadcast-nested-loop join, no corpus shuffle
    except the final per-query top-k (tiny)."""
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q)).select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int = 16, seed: int = 7) -> list[list[float]]:
    gen = np.random.RandomState(seed)
    return gen.normal(size=(n_bits, dim)).astype(float).tolist()


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign sketch as an int bucket id: bit i = (v · plane_i) >= 0 — pure
    Catalyst (aggregate HOF per plane), no UDF."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: equi-join corpus and queries on the LSH sign bucket, exact
    cosine re-rank inside buckets.  At 10^12 vectors the bucket join replaces
    the broadcast-nested-loop full scan with a hash-partitioned equi-join;
    recall is tunable via n_bits (fewer bits = bigger buckets = higher
    recall).  Returns (query_id, vec_id, cosine_sim, rank)."""
    planes = _hyperplanes(dim, n_bits, seed)
    cb = corpus.withColumn("_bucket", lsh_bucket_expr(vec_col, planes))
    qb = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", lsh_bucket_expr("_qvec", planes))
    scored = cb.join(F.broadcast(qb), "_bucket").select(
        F.col("_qid").alias(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup(
    df: DataFrame,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 12,
    bucket_cap: int = 2000,
    seed: int = 7,
) -> DataFrame:
    """SemDeduplicateFilter (sem_deduplicate_filter.py:62-155) at scale: LSH
    sign-bucket candidate pairs -> exact cosine >= 1-eps -> connected
    components -> min-id survivor."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)
    b = df.select(
        F.col(id_col).alias("_seq"), F.col(vec_col).alias("_v")
    ).withColumn("_bucket", lsh_bucket_expr("_v", planes))
    sizes = b.groupBy("_bucket").agg(F.count("*").alias("_n"))
    b = b.join(sizes.where(F.col("_n") <= bucket_cap), "_bucket")
    left = b.select("_bucket", F.col("_seq").alias("a"), F.col("_v").alias("va"))
    right = b.select("_bucket", F.col("_seq").alias("b"), F.col("_v").alias("vb"))
    pairs = (
        left.join(right, "_bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("sim"))
    )
    edges = pairs.where(F.col("sim") >= 1.0 - eps).select("a", "b").distinct()
    return keep_cluster_min(df, edges, seq_col=id_col)


@register("SemDeduplicateFilter")
def sem_dedup_stage(id_col: str = "vec_id", vec_col: str = "embedding", eps: float = 0.05, **kw) -> Stage:
    return Stage(
        "SemDeduplicateFilter",
        lambda df: embedding_near_dup(df, eps, id_col, vec_col, **kw),
        (id_col, vec_col),
        (),
        "filter",
    )
