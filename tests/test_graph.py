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
