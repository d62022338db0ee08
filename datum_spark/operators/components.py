"""Distributed connected components over a pair list — the step that turns
near-duplicate PAIRS (MinHash/SimHash/Jaccard/cosine output) into duplicate
CLUSTERS with one canonical document each.

Not in the reference (CityOfPhiladelphia/datum has no graph ops anywhere in
its 15 files); this is a north-star training-pipeline extension alongside
the dedup family it completes.

Algorithm: alternating *large-star* / *small-star* (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Each round is a
groupBy over the (symmetrized) edge list; the edge set converges to stars
rooted at each component's minimum node id in O(log n) rounds — unlike
naive min-label propagation, which needs O(diameter) rounds and dies on
long chains at scale.

Scale posture (100 TB corpus → billions of pair edges):
- every round is one shuffle on the node key (partial aggregation applies:
  ``min`` combines map-side);
- lineage is truncated every round with ``localCheckpoint`` — iterative
  plans otherwise grow unboundedly and re-execute the whole history;
- convergence is detected from the round's edge checksum (count + XOR-ish
  sum of hashed edges), one lightweight job per round — no ``collect`` of
  edge data to the driver;
- skew note: the root of a giant component becomes a hot key in the final
  star.  large-star handles it (only larger-neighbor edges are regrouped);
  the per-round combine keeps the hot key's map-side traffic bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    a, b = edges.columns[0], edges.columns[1]
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    return (e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
             .filter(F.col("u") != F.col("v"))
             .distinct())


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: link every STRICTLY LARGER neighbor to
    min(N(u) ∪ {u}).  Emitted directed (child > parent) unless equal-min."""
    grouped = (sym.groupBy("u")
               .agg(F.min("v").alias("mn"), F.collect_set("v").alias("nbrs")))
    m = F.least(F.col("u"), F.col("mn"))
    return (grouped.select(
                F.explode(F.filter("nbrs", lambda v: v > F.col("u")))
                 .alias("child"),
                m.alias("parent"))
            .filter(F.col("child") != F.col("parent"))
            .distinct())


def _small_star(directed: DataFrame) -> DataFrame:
    """Edges arrive directed child→parent (child > parent).  For each
    child u: link all its parents AND u itself to the minimum parent."""
    grouped = (directed.groupBy("child")
               .agg(F.min("parent").alias("mn"),
                    F.collect_set("parent").alias("ps")))
    bigger = F.filter("ps", lambda p: p != F.col("mn"))
    pairs = F.array_union(bigger, F.array(F.col("child")))
    return (grouped.select(F.explode(pairs).alias("child"),
                           F.col("mn").alias("parent"))
            .filter(F.col("child") != F.col("parent"))
            .distinct())


def _checksum(directed: DataFrame) -> tuple[int, int]:
    row = (directed
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("child", "parent").cast("decimal(38,0)"))
                 .alias("s"))
           .first())
    return int(row["n"]), int(row["s"] or 0)


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum node
    id in the node's connected component.  ``edges`` is any two-column
    DataFrame of undirected pairs (both ids of one orderable type);
    isolated nodes don't appear (callers union singletons if needed).
    """
    cur = _small_star(_large_star(_symmetrize(edges))).localCheckpoint()
    prev_sum = _checksum(cur)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(_symmetrize(cur))).localCheckpoint()
        new_sum = _checksum(nxt)
        converged = new_sum == prev_sum
        cur, prev_sum = nxt, new_sum
        if converged:
            break
    return cur.select(F.col("child").alias("node"),
                      F.col("parent").alias("component"))


def dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 20) -> DataFrame:
    """Duplicate clusters from a near-dup pair list: ``(node, cluster_id)``
    with ``cluster_id`` = the minimum member id (the canonical document).
    Every node that appears in a pair is present, including the canonical
    one (mapped to itself)."""
    comp = connected_components(pairs.select(id_a, id_b), max_iter=max_iter)
    roots = comp.select(F.col("component").alias("node"),
                        F.col("component")).distinct()
    return comp.union(roots).distinct()
