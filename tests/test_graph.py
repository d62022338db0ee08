"""PageRank invariants (operators/graph.py): probability-distribution
output, symmetry, and centrality ordering on hand-analyzable graphs."""

import pytest

from datum_spark.operators.graph import pagerank


def _ranks(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "u long, v long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_ranks_sum_to_one(spark):
    r = _ranks(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_uniform_cycle_uniform_ranks(spark):
    r = _ranks(spark, [(1, 2), (2, 3), (3, 1)])
    vals = list(r.values())
    assert max(vals) - min(vals) < 1e-9
    assert abs(sum(vals) - 1.0) < 1e-6


def test_star_center_ranks_highest(spark):
    r = _ranks(spark, [(0, i) for i in range(1, 6)])
    assert r[0] == max(r.values())
    leaves = [r[i] for i in range(1, 6)]
    assert max(leaves) - min(leaves) < 1e-9


def test_directed_dangling_mass_conserved(spark):
    # 1 -> 2 -> 3, node 3 dangles; ranks must still sum to 1
    r = _ranks(spark, [(1, 2), (2, 3)], directed=True)
    assert abs(sum(r.values()) - 1.0) < 1e-6
    assert r[3] > r[2] > r[1]


def test_empty_graph(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert pagerank(df).count() == 0


def test_label_propagation_hand_computed(spark):
    """Triangle {1,2,3} + pendant 4—1: after 3 synchronous rounds with
    the count-then-min-label tie rule, every node lands in community 1
    (worked by hand: l1 = {1:2, 2:1, 3:1, 4:1}; l2 = {1:1, 2:1, 3:1,
    4:2}; l3 = all 1)."""
    from datum_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "id_a long, id_b long")
    got = {r.node: r.label
           for r in label_propagation(pairs, iters=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_label_propagation_two_iter_intermediate(spark):
    from datum_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "id_a long, id_b long")
    got = {r.node: r.label
           for r in label_propagation(pairs, iters=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2}


# ---------------------------------------------------------------------------
# triangle_stats / bfs_min_hops (x135 / x136)

from datum_spark.operators.graph import bfs_min_hops, triangle_stats  # noqa: E402


def _tri(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return triangle_stats(df).collect()[0].asDict()


def test_triangle_k4_has_four_triangles(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, coeff 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4)
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert abs(r["clustering_coeff"] - 1.0) < 1e-9


def test_triangle_path_has_none(spark):
    r = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert r["n_triangles"] == 0
    assert r["clustering_coeff"] == 0.0


def test_triangle_orientation_matches_naive_on_star_plus_tri(spark):
    # hub with many leaves (degree skew) plus one triangle off to the side:
    # degree-ordered orientation must still count exactly 1
    pairs = [(0, i) for i in range(1, 9)] + [(10, 11), (11, 12), (10, 12)]
    r = _tri(spark, pairs)
    assert r["n_triangles"] == 1


def test_triangle_input_order_and_dupes_ignored(spark):
    # duplicate + self edges are scrubbed before counting
    pairs = [(1, 2), (1, 2), (2, 3), (1, 3), (2, 2)]
    r = _tri(spark, pairs)
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def _hops(spark, pairs, seeds, max_hops=3):
    e = spark.createDataFrame(pairs, "u long, v long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {r["node"]: r["hops"]
            for r in bfs_min_hops(e, s, max_hops).collect()}


def test_bfs_path_graph_hops(spark):
    h = _hops(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1])
    assert h == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away: excluded


def test_bfs_min_over_multiple_seeds(spark):
    # node 3 reachable from both ends; min hop wins
    h = _hops(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 5], max_hops=2)
    assert h[3] == 2 and h[2] == 1 and h[4] == 1


def test_bfs_undirected_and_cycle_terminates(spark):
    h = _hops(spark, [(1, 2), (2, 3), (3, 1)], [2], max_hops=3)
    assert h == {1: 1, 2: 0, 3: 1}


def test_bfs_seed_not_in_graph_ignored(spark):
    h = _hops(spark, [(1, 2)], [99])
    assert h == {}


def test_shortest_paths_prefers_cheaper_multi_hop(spark):
    from datum_spark.operators.graph import shortest_paths
    from pyspark.sql import functions as F

    # 1-3 direct costs 10; 1-2-3 costs 3; 4 unreachable
    edges = spark.createDataFrame(
        [(1, 3, 10.0), (1, 2, 1.0), (2, 3, 2.0), (4, 5, 1.0)],
        "src bigint, dst bigint, w double")
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(edges, "w", seeds, rounds=4).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 3.0}


def test_shortest_paths_directed_respects_orientation(spark):
    from datum_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame([(1, 2, 5.0), (3, 2, 1.0)],
                                  "src bigint, dst bigint, w double")
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(edges, "w", seeds, rounds=3,
                                   directed=True).collect()}
    assert got == {1: 0.0, 2: 5.0}     # 3 unreachable along direction


def test_shortest_paths_multi_seed_takes_nearest(spark):
    from datum_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(1, 2, 4.0), (5, 2, 1.0)], "src bigint, dst bigint, w double")
    seeds = spark.createDataFrame([(1,), (5,)], "id bigint")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(edges, "w", seeds, rounds=2).collect()}
    assert got[2] == 1.0
