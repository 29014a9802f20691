"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:

* brute-force cosine top-k — the exactness baseline. One broadcast of the
  (small) query set against the full vector table; per-partition partial
  top-k via window rank. Linear in corpus size, no n² anywhere.
* sign-LSH bucketed top-k — the 100 TB path. Bucket key = sign bits of the
  first B embedding coordinates (coordinate-hyperplane LSH — deterministic,
  engine-portable: no RNG to keep in sync with the oracle). Probing joins
  only same-bucket vectors: the shuffle is keyed on the 2^B buckets and
  each bucket's candidate set is ~n/2^B. An IVF variant would swap the
  bucket fn for learned centroids; the join shape is identical.

All math is double-precision sequential folds (dedup.cosine) so the DuckDB
oracle agrees to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikifrontier.dedup import cosine

SIGN_BITS = 6  # 64 buckets


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of each query over the vector table.

    `queries` (small) is broadcast — the big side never shuffles; ranking
    is a window partitioned by query id over the scored rows.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec_col, bits: int = SIGN_BITS):
    """Deterministic LSH bucket id: bit i = sign(vec[i]) for the first
    `bits` coordinates."""
    return sum(
        F.when(F.element_at(vec_col, i + 1).cast("double") > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(bits)
    ).cast("int")


def bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = SIGN_BITS,
) -> DataFrame:
    """ANN top-k probing only the query's own sign-LSH bucket.

    Same output schema as brute_force_topk; recall < 1 by design (that is
    the approximation). The join is an equi-join on bucket — at 10^10
    vectors it shuffles each side once on a small int key instead of
    broadcasting anything.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        q.join(v, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
