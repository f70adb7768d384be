"""Connected components over a pair graph — the final step of a dedup
pipeline: near-dup PAIRS (from MinHash/SimHash/Jaccard joins) become
CLUSTERS, and every document gets a canonical id (the smallest doc id
in its component) so a keep/drop pass is a single filter.

Algorithm: min-label propagation to fixpoint (the relational form of
connected components; GraphX/Pregel does the same joins under the
hood). Each iteration is one equi-join + one map-side-combinable
min() aggregation; the label sum is monotone non-increasing, so the
fixpoint test is an exact scalar comparison, and the CONVERGED result
is a pure function of the graph — independent of iteration count,
partitioning, or engine. That makes the whole iterative computation
oracle-able: DuckDB reproduces it with a recursive CTE.

Scale notes (100 TB): iterations = graph diameter, and near-dup graphs
are overwhelmingly tiny star/clique components (diameter 2-3), so the
loop runs ~3-5 rounds. Each round's lineage is truncated with an eager
``localCheckpoint`` — without it the plan doubles per round and the
job dies at iteration ~20 regardless of data size. The driver sees
only one scalar per round (the convergence test), never data. For
pathological long-chain graphs, swap in the large-star/small-star
variant (same join primitives, O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    vertex: str = "v",
    max_iter: int = 50,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it
    (undirected) -> ``(v, canonical_id)``. ``edges`` may be directed
    pairs; symmetry is added here. Isolated vertices keep themselves.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)

    labels = vertices.select(
        F.col(vertex).alias("v"), F.col(vertex).cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("lbl")).first()[0]

    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["b"] == labels["v"])
            .select(F.col("a").alias("v"), F.col("lbl"))
            .unionByName(labels)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=True)
        new_sum = prop.agg(F.sum("lbl")).first()[0]
        labels = prop
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    return labels.select(F.col("v"), F.col("lbl").alias("canonical_id"))
