"""Spark-side 10x validation of llm_dedup_components without the
recursive-CTE oracle (which is oracle-cost-bound at the replica's
near-dup density): connected components output is a correct CC
labeling iff (a) it's a total labeling, (b) every star edge joins
rows with EQUAL labels (edge consistency), and (c) each label equals
the minimum member id of its component (canonical min-label — which
pointer jumping guarantees reaches the true min only through
connected paths, so (b)+(c) over the full edge set pin the result)."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from machine_telemetry_etl_ml_pipeline_spark.session import get_spark
from machine_telemetry_etl_ml_pipeline_spark.registry import _t
from machine_telemetry_etl_ml_pipeline_spark.llm.dedup import lsh_star_edges, minhash_from_docs
from machine_telemetry_etl_ml_pipeline_spark.llm.cluster import connected_components

spark = get_spark("cc10x")
sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
d = _t(spark, sf, "documents")
n_docs = d.count()
edges = lsh_star_edges(minhash_from_docs(d)).localCheckpoint()
n_edges = edges.count()
comp = connected_components(d.select("doc_id"), edges).localCheckpoint()
n_rows = comp.count()
n_distinct = comp.select("doc_id").distinct().count()

cl = comp.withColumnRenamed("doc_id", "u").withColumnRenamed("component", "lu")
cr = comp.withColumnRenamed("doc_id", "v").withColumnRenamed("component", "lv")
e = edges.toDF("u", "v")
mismatch = e.join(cl, "u").join(cr, "v").filter(F.col("lu") != F.col("lv")).count()

canon_bad = (
    comp.groupBy("component").agg(F.min("doc_id").alias("mn"))
    .filter(F.col("component") != F.col("mn")).count()
)
n_components = comp.select("component").distinct().count()

# Over-merge check (the three invariants above only catch SPLIT
# components: a degenerate labeling assigning every doc the global min
# id satisfies (a)-(c), since edge endpoints agree and the one merged
# component's min member equals its label). Independent ground truth:
# a driver-side union-find over the edge list — component count must
# equal singleton docs + distinct roots among edge-touched docs.
parent = {}


def find(x):
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:  # path compression
        parent[x], x = r, parent[x]
    return r


for row in e.toLocalIterator():
    u, v = row[0], row[1]
    parent.setdefault(u, u)
    parent.setdefault(v, v)
    ru, rv = find(u), find(v)
    if ru != rv:
        parent[max(ru, rv)] = min(ru, rv)

n_edge_nodes = len(parent)
n_roots = sum(1 for x in parent if find(x) == x)
expected_components = (n_docs - n_edge_nodes) + n_roots
print(f"docs={n_docs} rows={n_rows} distinct={n_distinct} edges={n_edges}")
print(f"edge_label_mismatches={mismatch} non_canonical_labels={canon_bad}")
print(f"n_components={n_components} union_find_expected={expected_components}")
ok = (
    n_rows == n_docs == n_distinct
    and mismatch == 0
    and canon_bad == 0
    and n_components == expected_components
)
print("INVARIANTS:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
