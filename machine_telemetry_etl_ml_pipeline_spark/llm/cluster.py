"""Dedup cluster formation: connected components over near-duplicate
pairs (north-star extension — the transitive-closure stage that turns
pairwise LSH/Jaccard hits into keep-one-per-cluster decisions).

Spark-first algorithm: iterative min-label propagation (the Pregel /
large-star idea expressed in DataFrame joins):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one join + one aggregation —
both partial-aggregable — and converges in O(component diameter)
rounds (near-dup components are shallow: diameters of a handful).
Every round's result is checkpointed via localCheckpoint() so the
lineage does not grow unboundedly across iterations — the classic
iterative-algorithm failure mode on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """nodes: one column `id_col`; edges: columns (a, b), undirected.

    Returns (id_col, component) where component = min node id reachable
    — deterministic, so oracle-comparable against a recursive-CTE
    transitive closure.
    """
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .distinct()
        # materialize once: the edge list is re-joined every round, and
        # without this its full upstream lineage (e.g. the MinHash-LSH
        # pipeline that produced the pairs) re-executes per iteration
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("u"), F.col(id_col).cast("long").alias("label"))
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("new_label"),
                "label",
            )
            # checkpoint BEFORE the convergence check so the round's
            # join runs once (counting first would recompute it)
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = updated.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))


def dedup_by_component(components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep-one-per-cluster: the representative is the component label
    itself (min id), so this is a pure distinct on the label column."""
    return components.select(F.col("component").alias(id_col)).distinct()
