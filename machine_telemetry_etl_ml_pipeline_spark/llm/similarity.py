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

    # norms hoisted out of the pair expression (r5): cosine() inline
    # would re-fold the corpus norm once per QUERY and the query norm
    # once per corpus row; precomputed they ride the projection/
    # broadcast, leaving one dot fold per scored pair. Same floats
    # (sqrt of the identical in-order self-dot).
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__n", norm(F.col("__v")))
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__q"),
        F.col("__n").alias("__qn"),
    )
    scored = base.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__n")), 4
        ).alias("cosine_sim"),
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


# Coordinate hyperplanes for the ADAPTIVE sign-LSH: up to 16 bits
# over the 64-dim embedding at stride 4 (1-indexed SQL positions).
# Fixed order so bit j means the same hyperplane at every corpus size
# — growing `bits` REFINES buckets (each 2^b bucket splits in two at
# b+1) instead of reshuffling them.
ADAPTIVE_SIGN_DIMS: tuple = tuple(range(1, 65, 4))


def adaptive_bits_expr(n_col, target_bucket_size: int = 64, max_bits: int = 16):
    """bits = clamp(ceil(log2(n / target_bucket_size)), 2, max_bits):
    the corpus-size-derived bucket-count knob (B = 2^bits) that holds
    expected per-bucket population — and so scored pairs per row —
    ~constant as n grows. This is the SemDeDup paper's k ∝ n cluster
    scaling re-expressed for sign-LSH; the fixed-4-bit family
    (sign_bucket) is quadratic-over-constant-buckets by comparison
    (measured 11.3x wall at 10x rows, SCALE.md). Pure column
    arithmetic over a 1-row count aggregate — broadcast it, never
    collect it. The oracle mirrors the same formula; log2/ceil are
    IEEE-identical on both engines."""
    return F.least(
        F.lit(max_bits),
        F.greatest(
            F.lit(2),
            F.ceil(F.log2(n_col.cast("double") / F.lit(float(target_bucket_size)))).cast(
                "int"
            ),
        ),
    ).cast("int")


def adaptive_sign_bucket(vec_col, bits_col, dims: Sequence[int] = ADAPTIVE_SIGN_DIMS):
    """Sign-LSH bucket using the first `bits_col` hyperplanes of
    `dims`: bit j contributes 2^j iff j < bits and vec[dims[j]] > 0.
    bits rides as a COLUMN (from the broadcast corpus-stats row), so
    one whole-stage-codegen expression serves every corpus size — no
    per-size plan rebuild, no UDF."""
    total = F.lit(0)
    for j, d in enumerate(dims):
        bit = F.when(
            (bits_col > j) & (F.element_at(vec_col, d) > 0), F.lit(2**j)
        ).otherwise(F.lit(0))
        total = total + bit
    return total.cast("int")


def random_hyperplanes(
    dim: int, n_planes: int, n_tables: int, seed: int = 7
) -> list[list[list[float]]]:
    """Seeded Gaussian hyperplanes for sign-LSH, shaped
    (n_tables, n_planes, dim). Uses the legacy numpy RandomState
    generator (bit-stream stability is guaranteed across numpy
    versions) and rounds to 6 decimals so the same values can be
    embedded as short exact literals in both Spark columns and DuckDB
    oracle SQL."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).round(6).tolist()


def hyperplane_bucket(vec_col, planes_for_table: Sequence[Sequence[float]]) -> "F.Column":
    """Random-hyperplane sign LSH: bit j = sign(<vec, plane_j>). The
    planes ride along as literal arrays (broadcast with the plan), so
    bucketing is pure whole-stage-codegen column arithmetic — no UDF,
    no shuffle."""
    total = F.lit(0)
    for j, p in enumerate(planes_for_table):
        d = dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        total = total + F.when(d > 0, F.lit(2**j)).otherwise(F.lit(0))
    return total.cast("int")


def multiprobe_lsh_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 3,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 2,
    probe_bits: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ANN top-k with tunable recall (round-2 upgrade over the fixed
    coordinate hyperplanes): n_tables independent random-hyperplane
    tables (band-OR: a candidate needs to collide in ANY table) plus
    Hamming-1 multi-probe on the query side (each query also probes the
    buckets that differ in one of the first probe_bits sign bits).

    Scale shape: the corpus is tagged with (table, bucket) via one
    posexplode (n_tables rows per vector); candidates come from an
    equi-join on (table, bucket) against the tiny broadcast query side;
    duplicate candidates from multiple tables/probes are collapsed by a
    partial-aggregable groupBy max (scores are deterministic, so max ==
    first). Recall rises with n_tables and probe_bits, candidate cost
    stays ~bucket-occupancy * tables — never O(n^2)."""
    from pyspark.sql import Window

    if planes is None:
        planes = random_hyperplanes(dim, n_planes, n_tables, seed)
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__n", norm(F.col("__v")))  # hoisted: one norm fold per vector
    tagged = base.select(
        id_col,
        "__v",
        "__n",
        F.posexplode(
            F.array(*[hyperplane_bucket(F.col("__v"), t) for t in planes])
        ).alias("tbl", "bucket"),
    )
    q = tagged.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__q"),
        F.col("__n").alias("__qn"),
        "tbl",
        "bucket",
    )
    offsets = [0] + [1 << j for j in range(probe_bits)]
    q_probed = q.select(
        "query_id",
        "__q",
        "__qn",
        "tbl",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(off)) for off in offsets])
        ).alias("bucket"),
    )
    cand = tagged.join(F.broadcast(q_probed), ["tbl", "bucket"]).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__n")), 4
        ).alias("cosine_sim"),
    )
    dedup = scored.groupBy("query_id", "neighbor_id").agg(
        F.max("cosine_sim").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        dedup.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
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
    ).withColumn("__n", norm(F.col("__v")))
    q = base.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("__q"),
        F.col("__n").alias("__qn"),
        "bucket",
    )
    cand = base.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__n")), 4
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: Sequence[int],
    k: int = 3,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: a seeded KMeans coarse quantizer assigns every
    corpus vector to its nearest cell (inverted list); each query
    probes its n_probe closest cells and scores only those lists.

    Scale shape: the quantizer fit samples/iterates distributed (MLlib
    KMeans); cell assignment is pure column arithmetic against the
    broadcast centroid literals (no model UDF on the hot path);
    candidate generation is a (cell) equi-join against the broadcast
    probe set — candidates ~ n_probe/n_cells of the corpus per query.
    Recall rises with n_probe; the tested bound lives in
    tests/test_llm_ops.py."""
    from pyspark.sql import Window
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__n", norm(F.col("__v")))
    train = base.withColumn("__feat", array_to_vector("__v"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__feat", predictionCol="__cell").fit(train)
    centers = [c.tolist() for c in km.clusterCenters()]

    def dist2(center):
        return F.aggregate(
            F.zip_with(
                F.col("__v"),
                F.array(*[F.lit(float(x)) for x in center]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dists = F.array(*[dist2(c) for c in centers])
    # corpus: nearest cell only (1-based array_position -> 0-based)
    tagged = base.select(
        id_col,
        "__v",
        "__n",
        (F.array_position(dists, F.array_min(dists)) - 1).alias("cell"),
    )
    # queries: n_probe closest cells via sort on (dist, idx) structs
    idxd = F.arrays_zip(dists, F.sequence(F.lit(0), F.lit(len(centers) - 1)))
    probes = (
        base.filter(F.col(id_col).isin(list(query_ids)))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("__v").alias("__q"),
            F.col("__n").alias("__qn"),
            F.explode(F.slice(F.sort_array(idxd), 1, n_probe)).alias("p"),
        )
        .select("query_id", "__q", "__qn", F.col("p.1").cast("long").alias("cell"))
    )
    cand = tagged.join(F.broadcast(probes), "cell").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("__q"), F.col("__v")) / (F.col("__qn") * F.col("__n")), 4
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )
