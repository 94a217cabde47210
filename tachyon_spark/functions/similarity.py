"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector + one JVM-side zip_with/aggregate dot product per row + a
TakeOrderedAndProject — fully distributed, no Python in the hot path.

The scale path (lsh_cosine_topk) buckets vectors by random-hyperplane signs
so each query probes only its bucket (and optionally neighboring buckets):
at 100 TB the bucket column is a partition/cluster key and a query touches
1/2^p of the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k rows by cosine similarity to query_vec: (id, score)."""
    q = F.lit(query_vec).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(F.col(id_col), cosine(v, q).alias("score"))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy dependency)."""
    state = seed
    out = []
    for _ in range(planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_bucket(vec_col, dim: int, planes: int = 8, seed: int = 7) -> F.Column:
    """Random-hyperplane LSH bucket id (0..2^planes-1) for a vector column."""
    v = vec_col.cast("array<double>")
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes(dim, planes, seed)):
        sign = F.when(_dot(v, F.lit(plane).cast("array<double>")) >= 0, 1).otherwise(0)
        bucket = bucket + sign * (1 << i)
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    At scale, persist the table bucketed/partitioned by the bucket column so
    the probe is a partition-pruned scan instead of a full pass.
    """
    dim = len(query_vec)
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, planes, seed))
    # query bucket computed driver-side with the same hyperplanes
    hp = _hyperplanes(dim, planes, seed)
    qb = 0
    for i, plane in enumerate(hp):
        dot = sum(x * y for x, y in zip(query_vec, plane))
        qb |= (1 if dot >= 0 else 0) << i
    probe = bucketed.where(F.col("__bucket") == qb)
    return brute_force_cosine_topk(probe, query_vec, k, id_col, vec_col)
