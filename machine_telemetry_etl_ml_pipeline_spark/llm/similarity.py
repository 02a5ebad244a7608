"""Vector similarity search over an embedding column (array<float>)
(north-star extension; no reference implementation — SURVEY §2B).

Two paths:
- brute-force cosine top-k: exact baseline; broadcast the (small) query
  set against the corpus — one pass, no shuffle of the corpus;
- sign-LSH bucketing: coordinate-hyperplane signs compress each vector
  to a small bucket id; candidate generation is an equi-join on the
  bucket (the IVF/LSH scale path — at 100 TB only same-bucket pairs
  are scored).

All arithmetic is done in float64 after an explicit cast — float32
accumulation order would diverge across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> "F.Column":
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> "F.Column":
    """Left-to-right fold — matches DuckDB list_dot_product ordering."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> "F.Column":
    return F.sqrt(dot(a, a))


def cosine(a, b) -> "F.Column":
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query id. The query side is broadcast;
    the corpus is scanned once with no shuffle until the final
    per-query top-k (TakeOrdered per partition + merge)."""
    from pyspark.sql import Window

    base = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q")
    )
    scored = base.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("__q"), F.col("__v")), 4).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def sign_bucket(vec_col, dims: Sequence[int]) -> "F.Column":
    """Coordinate-hyperplane sign LSH: bit j = sign(vec[dims[j]]).
    1-indexed element_at to match SQL array semantics."""
    total = F.lit(0)
    for j, d in enumerate(dims):
        bit = F.when(F.element_at(vec_col, d) > 0, F.lit(2**j)).otherwise(F.lit(0))
        total = total + bit
    return total.cast("int")


def lsh_bucket_counts(
    embeddings: DataFrame,
    dims: Sequence[int] = (1, 9, 17, 25),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket occupancy — the candidate-set size each query would score
    under sign-LSH (the ANN scale path's selectivity diagnostic)."""
    b = embeddings.select(
        F.col(id_col), sign_bucket(F.col(vec_col), list(dims)).alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.min(id_col).alias("min_vec_id")
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 3,
    dims: Sequence[int] = (1, 9, 17, 25),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__v"),
        sign_bucket(F.col(vec_col), list(dims)).alias("bucket"),
    )
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col("__v").alias("__q"), "bucket"
    )
    cand = base.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("__q"), F.col("__v")), 4).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )
