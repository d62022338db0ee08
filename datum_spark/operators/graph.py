"""PageRank over a pair list — ranking documents inside near-duplicate /
citation / link graphs (e.g. picking the canonical page among mirrors by
centrality instead of min-id).

Not in the reference (no graph ops in its 15 files); north-star extension
alongside ``components.py``, same scale discipline:

- one shuffle per iteration (contributions grouped by destination, with
  map-side partial sums);
- ranks and degrees ride (node, value) rows — edge data never collects to
  the driver; the only driver-side values are the dangling-mass and
  convergence scalars (one tiny aggregate per iteration);
- lineage truncated with ``localCheckpoint`` every iteration, like
  ``components.py`` — otherwise the iterative plan re-executes history;
- dangling nodes (no out-edges) redistribute their mass uniformly, so the
  rank vector stays a probability distribution (sums to 1) — the standard
  PageRank completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _both_directions(edges: DataFrame, a: str, b: str,
                     extra: list[str] | None = None) -> DataFrame:
    """``(src, dst[, extra...])`` rows for BOTH directions of each edge
    in ONE scan: explode per row instead of unioning the frame with its
    swapped self, which executes the (usually expensive, usually
    uncached) upstream edge-generation subtree twice."""
    carry = [F.col(c).alias(c) for c in (extra or [])]
    return (edges.select(F.explode(F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst"),
                         *carry),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst"),
                         *carry))).alias("__sd"))
            .select("__sd.*"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             max_iter: int = 20, tol: float = 1e-6,
             directed: bool = False) -> DataFrame:
    """Rank nodes of the graph given as a 2-column edge DataFrame.

    Returns ``(node, rank)`` with ranks summing to 1.  ``directed=False``
    (the near-dup-graph default) symmetrizes the edge list first.

    ``tol <= 0`` disables the convergence probe entirely: exactly
    ``max_iter`` iterations run, with NO driver action inside the loop —
    the lazy checkpoints fuse into one job triggered by the caller's
    action.  That is the deterministic spelling (used by the
    oracle-checked x83, whose DuckDB twin unrolls the same fixed
    iteration count) and also the fastest one when the iteration budget
    is known up front.
    """
    a, b = edges.columns[0], edges.columns[1]
    if directed:
        e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    else:
        # symmetrize by exploding each edge into both directions in ONE
        # scan — the union-of-swapped-selves spelling executed the
        # upstream edge generation (an n-gram inverted-index self-join)
        # twice before the checkpoint could memoize it
        e = _both_directions(edges, a, b)
    # checkpoint the edge list ONCE: upstream edge generation would
    # otherwise re-execute inside every iteration's join.  LAZY
    # checkpoints everywhere (r14): the plan truncates at the
    # LogicalRDD immediately either way, but eager materialization was
    # one scheduled job per frame — e, nodes, ed, dang, ranks plus the
    # count and the dangling head(1) made ~7 driver round trips before
    # the first iteration; the persisted blocks materialize once
    # inside the first job that needs them and every later stage reads
    # them back (same compute-once guarantee, minus the scheduling)
    e = (e.filter(F.col("src") != F.col("dst")).distinct()
          .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node")))
              .distinct()).localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree table rides the iteration unchanged; fold it onto the
    # edge list ONCE instead of re-joining it inside every iteration
    # (the join is loop-invariant: deg is a function of e alone)
    ed = (e.join(deg, "src")
           .select("src", "dst", "deg").localCheckpoint(eager=False))
    # the dangling-node SET is loop-invariant too (nodes with no
    # out-edge); for a SYMMETRIZED graph it is empty BY CONSTRUCTION
    # (every node appearing in e has an out-edge), so the undirected
    # path skips the anti-join probe entirely — identical arithmetic:
    # the per-iteration mass term is exactly 0.0 and adding 0.0/n
    # leaves every double unchanged.  Only directed graphs pay the
    # probe.
    if directed:
        dang = (nodes.join(deg, nodes.node == deg.src, "left_anti")
                     .localCheckpoint(eager=False))
        has_dangling = bool(dang.head(1))
    else:
        has_dangling = False

    ranks = (nodes.withColumn("rank", F.lit(1.0 / n))
                  .localCheckpoint(eager=False))
    base = (1.0 - damping) / n
    check_every = 5  # convergence probe cadence (each probe is a job)
    for it in range(max_iter):
        contribs = (ed.join(ranks.withColumnRenamed("node", "src"),
                            "src")
                      .select("dst",
                              (F.col("rank") / F.col("deg")).alias("c"))
                      .groupBy("dst")
                      .agg(F.sum("c").alias("contrib")))
        new_ranks = nodes.join(contribs, nodes.node == contribs.dst,
                               "left")
        if has_dangling:
            # dangling mass rides the SAME job as the rank update via a
            # broadcast 1-row cross join — no driver-side collects
            dangling = (ranks.join(dang, "node", "semi")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                             .alias("__dm")))
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            dm = F.col("__dm") / n
        else:
            dm = F.lit(0.0)
        # lazy checkpoint: lineage still truncates at materialization,
        # but iterations BETWEEN convergence probes fuse into one job
        # instead of paying a scheduling round trip each (5 iterations
        # of a small graph: ~10 s eager → ~2 s lazy at sf0.1)
        new_ranks = (new_ranks
                     .select(
                         "node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("contrib"), F.lit(0.0))
                             + dm)).alias("rank"))
                     ).localCheckpoint(eager=False)
        old = ranks
        ranks = new_ranks
        if tol > 0 and (it % check_every == check_every - 1
                        or it == max_iter - 1):
            delta = (ranks.join(old.withColumnRenamed("rank", "old"),
                                "node")
                     .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                     .collect()[0][0])
            if delta is not None and delta < tol:
                break
    return ranks


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle census of an undirected graph given as a canonical pair
    list (2 columns, ``src < dst``, deduplicated): one row with
    ``(n_vertices, n_edges, n_triangles, clustering_coeff)`` where the
    global clustering coefficient is ``3·triangles / wedges``.

    Scale shape is the degree-ordered orientation (node-iterator of
    Schank & Wagner): each edge is directed from its lower-``(deg, id)``
    endpoint to the higher one, so every triangle is counted exactly once
    as ``a→b, b→c, a→c`` and the wedge join's fan-out per node is
    bounded by its ORIENTED out-degree — ``O(m^{3/2})`` total work
    instead of the ``Σ deg²`` of the naive wedge join; a celebrity node
    with 10⁶ neighbors contributes almost no oriented wedges.  Three
    hash joins on node keys, no driver-side data.
    """
    a, b = edges.columns[0], edges.columns[1]
    e = (edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=False))
    deg = (e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=False))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low-(deg, id) → high-(deg, id)
    o = (e.join(du, "u").join(dv, "v")
          .select(F.when((F.col("du") < F.col("dv"))
                         | ((F.col("du") == F.col("dv"))
                            & (F.col("u") < F.col("v"))),
                         F.struct(F.col("u").alias("s"),
                                  F.col("v").alias("d")))
                  .otherwise(F.struct(F.col("v").alias("s"),
                                      F.col("u").alias("d")))
                  .alias("o"))
          .select(F.col("o.s").alias("s"), F.col("o.d").alias("d"))
          .localCheckpoint(eager=False))
    o1 = o.select(F.col("s").alias("x"), F.col("d").alias("y"))
    o2 = o.select(F.col("s").alias("y"), F.col("d").alias("z"))
    wedges = o1.join(o2, "y").select("x", "z")
    closing = o.select(F.col("s").alias("x"), F.col("d").alias("z"))
    tri = wedges.join(closing, ["x", "z"]).agg(
        F.count(F.lit(1)).alias("n_tri"))
    summary = (deg.agg(F.count(F.lit(1)).alias("n_vertices"),
                       (F.sum("deg") / 2).cast("long").alias("n_edges"),
                       F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
                        .alias("wedges"))
               .crossJoin(F.broadcast(tri)))
    return summary.select(
        "n_vertices", "n_edges",
        F.col("n_tri").cast("long").alias("n_triangles"),
        F.round(3.0 * F.col("n_tri") / F.nullif(F.col("wedges"), F.lit(0)),
                6).alias("clustering_coeff"))


def bfs_min_hops(edges: DataFrame, seeds: DataFrame,
                 max_hops: int = 3) -> DataFrame:
    """Minimum hop distance from a seed set over an undirected canonical
    pair list (2 columns): frontier-expanding BFS, returning
    ``(node, hops)`` for every node within ``max_hops`` of any seed
    (seeds themselves at hop 0).  ``seeds`` is a 1-column DataFrame.

    One hash join + distinct per level — the frontier is joined against
    the edge list keyed on src, and already-visited nodes are pruned with
    a left-anti join so the frontier never re-expands (the visited set
    grows monotonically; lineage truncated per level).  No driver-side
    data; the loop is depth-bounded, not data-bounded.
    """
    a, b = edges.columns[0], edges.columns[1]
    e = (_both_directions(edges, a, b)
         .filter(F.col("src") != F.col("dst")).distinct()
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node")).distinct())
    frontier = (nodes.join(
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct(),
        "node", "semi")
        .withColumn("hops", F.lit(0)).localCheckpoint(eager=False))
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (e.join(frontier.select(F.col("node").alias("src")), "src")
                .select(F.col("dst").alias("node")).distinct()
                .join(visited, "node", "anti")
                .withColumn("hops", F.lit(h))
                .localCheckpoint(eager=False))
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited.select("node", F.col("hops").cast("long").alias("hops"))


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation over an undirected pair list
    (columns id_a, id_b): community detection for near-dup graphs —
    coarser than connected components (a hub bridging two dense blobs
    ends up in ONE of them, components would merge both).

    Deterministic: labels start as node ids; each round every node takes
    the most frequent neighbor label, ties broken toward the SMALLEST
    label, all nodes updating simultaneously — so a fixed ``iters`` is
    exactly replayable (the x129 oracle unrolls it).  One shuffle per
    iteration (join on src + count on (node, label)), lineage truncated
    with lazy localCheckpoint like pagerank; no driver-side data.
    """
    e = (_both_directions(edges, "id_a", "id_b")
         .distinct()
         .localCheckpoint(eager=False))
    labels = (e.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(iters):
        nbr = (e.join(labels.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node"), "label"))
        cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (cnt.groupBy("node")
                  .agg(F.max_by("label",
                                F.struct(F.col("c"), (-F.col("label"))
                                         .alias("nl"))).alias("label"))
                  .localCheckpoint(eager=False))
    return labels


def shortest_paths(edges: DataFrame, weight_col: str,
                   seeds: DataFrame, rounds: int = 8,
                   directed: bool = False) -> DataFrame:
    """Bounded Bellman–Ford single-source (source-SET) shortest paths:
    ``(node, dist)`` = minimum path weight from any seed reachable
    within ``rounds`` relaxations (paths of ≤ ``rounds`` edges; pick
    ``rounds`` ≥ the graph's weighted-path hop diameter for the exact
    fixpoint).  ``edges``: (src, dst, weight) columns in that order,
    symmetrized unless ``directed``; ``seeds``: 1-column, distance 0.

    Scale shape — the textbook distributed SSSP: each round is ONE hash
    join (frontier × edges keyed on src) and ONE map-combined min
    aggregation; distances ride (node, dist) rows, nothing collects to
    the driver, lineage truncates per round (``localCheckpoint``, the
    ``pagerank``/``components`` discipline).  Relaxation is
    ``dist + weight`` then ``MIN`` — a fixed fold along each path with
    no reassociation, so the result is bit-deterministic and an oracle
    can replay the rounds as chained CTEs (the x108 k-means replay
    discipline applied to a graph loop).
    """
    # NOTE: this symmetrize keeps the union-of-swapped spelling on
    # purpose — the weighted edge list has no distinct barrier after it,
    # and the A/B showed the explode form 1.2× slower here (the union's
    # second branch reuses the upstream radius join's exchanges, so it
    # costs little, while explode halves the materialized parallelism
    # for the relaxation rounds)
    a, b, w = edges.columns[0], edges.columns[1], weight_col
    e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"),
                     F.col(w).cast("double").alias("w"))
    if not directed:
        e = e.union(edges.select(F.col(b).alias("src"),
                                 F.col(a).alias("dst"),
                                 F.col(w).cast("double").alias("w")))
    e = e.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=False)
    dist = (seeds.select(F.col(seeds.columns[0]).alias("node"))
                 .distinct()
                 .withColumn("dist", F.lit(0.0))
                 .localCheckpoint(eager=False))
    for _ in range(rounds):
        relaxed = (e.join(dist.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                    .groupBy("node").agg(F.min("dist").alias("dist"))
                    .localCheckpoint(eager=False))
    return dist
