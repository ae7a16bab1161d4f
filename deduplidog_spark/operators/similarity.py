"""Embedding similarity search (task brief: ANN over array<float>).

Two paths:
- brute-force cosine top-k — correctness baseline, JVM-side
  zip_with/aggregate dot products (no UDF), O(Q·N) pairs: fine for a
  query set vs a corpus when Q is bounded, exact by construction;
- LSH-bucketed ANN (random-hyperplane signatures) — the scale path:
  sign-pattern buckets shrink the candidate set to near-neighbors, one
  equi-join on the bucket key instead of a cross join.

Both cast float32 arrays to double before arithmetic so results are
bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self). The corpus side
    of the join is broadcast when small; for a big corpus prefer
    lsh_ann_topk. Returns (query_id, neighbor_id, cosine_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    pairs = q.join(c, F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def with_lsh_bucket(
    df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) bucket id: bit b = sign of
    ⟨vec, plane_b⟩. Near-identical directions share buckets; bucket key
    is one long → equi-joinable. Pure column expressions: the planes are
    literal arrays folded by Catalyst (constant per query plan)."""
    v = _as_double(F.col(vec_col))
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(v, plane_col) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, b)
    return df.withColumn("ann_bucket", bucket)


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (recall grows
    with fewer planes / multiple tables). One equi-join on ann_bucket —
    at 100 TB this is the difference between a shuffle join on ~N·N/2^p
    candidate pairs and an impossible cross join."""
    qb = with_lsh_bucket(queries, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
        "ann_bucket",
    )
    cb = with_lsh_bucket(corpus, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        "ann_bucket",
    )
    pairs = qb.join(cb, "ann_bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn(
        "cosine_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
