"""apply_changes (operators/cdc.py): MERGE-with-last-wins semantics."""

import pytest
from pyspark.sql import functions as F

from datum_spark.operators.cdc import apply_changes, last_wins


@pytest.fixture(scope="module")
def snap(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")


def _apply(snap, changes_df):
    return apply_changes(snap, changes_df, keys=["k"], seq_cols=["seq"],
                         op_col="op")


def test_untouched_rows_survive(spark, snap):
    ch = spark.createDataFrame([(9, 1, "U", "z")], "k int, seq int, "
                               "op string, v string")
    out = {r.k: r.v for r in _apply(snap, ch).collect()}
    assert out == {1: "a", 2: "b", 3: "c", 9: "z"}


def test_update_insert_delete(spark, snap):
    ch = spark.createDataFrame(
        [(1, 1, "U", "a2"),     # update existing
         (3, 1, "D", None),     # delete existing
         (4, 1, "U", "d"),      # insert new
         (5, 1, "D", None)],    # delete never-present key -> absent
        "k int, seq int, op string, v string")
    out = {r.k: r.v for r in _apply(snap, ch).collect()}
    assert out == {1: "a2", 2: "b", 4: "d"}


def test_last_wins_within_key(spark, snap):
    ch = spark.createDataFrame(
        [(1, 1, "D", None), (1, 2, "U", "a9"),   # later upsert revives
         (2, 2, "D", None), (2, 1, "U", "b9")],  # later delete wins
        "k int, seq int, op string, v string")
    out = {r.k: r.v for r in _apply(snap, ch).collect()}
    assert out == {1: "a9", 3: "c"}


def test_idempotent_reapply(spark, snap):
    ch = spark.createDataFrame(
        [(1, 1, "U", "a2"), (3, 1, "D", None)],
        "k int, seq int, op string, v string")
    once = _apply(snap, ch)
    twice = _apply(once, ch)
    assert sorted((r.k, r.v) for r in once.collect()) == \
        sorted((r.k, r.v) for r in twice.collect())


def test_last_wins_tie_break_order(spark):
    ch = spark.createDataFrame(
        [(1, 1, 5, "x"), (1, 2, 5, "y"), (1, 2, 7, "z")],
        "k int, seq int, seq2 int, v string")
    eff = last_wins(ch, ["k"], ["seq", "seq2"]).collect()
    assert len(eff) == 1 and eff[0].v == "z"


def test_no_extra_shuffle_between_window_and_join(spark, snap):
    """The last-wins window and the outer join hash on the same key, so
    the changelog side must not be exchanged twice."""
    ch = spark.createDataFrame([(1, 1, "U", "a2")],
                               "k int, seq int, op string, v string")
    plan = _apply(snap, ch)._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window partitioning, one for the snapshot side
    assert plan.count("Exchange hashpartitioning(k") <= 2


def test_rollup_fold_abelian_and_zero_drop(spark):
    """Folding change batches in ANY batching equals the recompute
    over the net rows; fully-deleted keys leave the rollup; updates
    ride as D+I."""
    from pyspark.sql import functions as F

    from datum_spark.operators.cdc import rollup_fold

    rows = [("a", 10.0, "I"), ("a", 20.0, "I"), ("b", 5.0, "I"),
            ("c", 7.0, "I"), ("c", 7.0, "D"),        # c net-deleted
            ("a", 10.0, "D"), ("a", 11.0, "I")]      # update 10 -> 11
    df = spark.createDataFrame(rows, "k string, v double, op string")

    def fold(batches):
        r = None
        for b in batches:
            r = rollup_fold(r, b, ["k"], ["v"])
        return {t["k"]: (t["n"], round(t["sum_v"], 6))
                for t in r.collect()}

    one = fold([df])
    per_row = fold([df.filter(F.monotonically_increasing_id() >= 0)
                    .limit(7)])          # same frame, one batch
    split = fold([df.filter(F.col("v") <= 7.0),
                  df.filter(F.col("v") > 7.0)])
    assert one == split == per_row
    assert one == {"a": (2, 31.0), "b": (1, 5.0)}    # c dropped
