"""Curriculum / corpus-ordering operators (operators/curriculum.py).

Oracle parity for the wired queries lives in x66–x69; these tests pin the
operator-level contracts: positions form a permutation, determinism across
reruns and repartitionings, budget and percentile semantics.
"""

import pytest
from pyspark.sql import functions as F

from datum_spark.operators import curriculum


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", f"lang{i % 2}", 10 + (i * 37) % 90)
            for i in range(60)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long")


def test_epoch_shuffle_is_permutation(docs):
    out = curriculum.epoch_shuffle(docs, "doc_id", epoch=0)
    pos = sorted(r["position"] for r in out.select("position").collect())
    assert pos == list(range(60))


def test_epoch_shuffle_deterministic_across_partitioning(docs):
    a = curriculum.epoch_shuffle(docs, "doc_id", epoch=0)
    b = curriculum.epoch_shuffle(docs.repartition(7), "doc_id", epoch=0)
    ma = {r["doc_id"]: r["position"] for r in a.collect()}
    mb = {r["doc_id"]: r["position"] for r in b.collect()}
    assert ma == mb


def test_epoch_shuffle_epochs_differ(docs):
    m0 = {r["doc_id"]: r["position"]
          for r in curriculum.epoch_shuffle(docs, "doc_id", epoch=0).collect()}
    m1 = {r["doc_id"]: r["position"]
          for r in curriculum.epoch_shuffle(docs, "doc_id", epoch=1).collect()}
    assert m0 != m1
    assert sorted(m0.values()) == sorted(m1.values())


def test_interleave_round_robin(docs):
    out = curriculum.interleave_sources(docs, "source", "doc_id", epoch=0)
    rows = sorted(out.collect(), key=lambda r: r["position"])
    assert [r["position"] for r in rows] == list(range(60))
    # 3 equal-sized sources → every consecutive block of 3 holds 3 sources
    for blk in range(20):
        srcs = {r["source"] for r in rows[blk * 3:blk * 3 + 3]}
        assert len(srcs) == 3


def test_token_budget_prefix_semantics(docs):
    out = curriculum.token_budget_sample(docs, 200, token_col="n_chars",
                                         group_col="source",
                                         key_col="doc_id")
    rows = out.collect()
    assert rows, "budget should keep at least one doc per source"
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    full = curriculum.token_budget_sample(docs, 10**9,
                                          token_col="n_chars",
                                          group_col="source",
                                          key_col="doc_id").collect()
    order = {}
    for r in sorted(full, key=lambda r: r["cum_tokens"]):
        order.setdefault(r["source"], []).append(r["doc_id"])
    for src, kept in by_src.items():
        kept_sorted = sorted(kept, key=lambda r: r["cum_tokens"])
        assert kept_sorted[-1]["cum_tokens"] <= 200
        # the kept set is exactly a prefix of the group's budget order
        assert [r["doc_id"] for r in kept_sorted] == \
            order[src][:len(kept_sorted)]


def test_quality_percentile_keeps_top(spark):
    rows = [(i, "en", float(i)) for i in range(10)] + \
           [(100 + i, "fr", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q double")
    out = curriculum.quality_percentile_filter(df, "q", keep_top=0.5,
                                               group_col="lang",
                                               key_col="doc_id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # percent_rank = (rank-1)/(n-1) <= 0.5 keeps rank <= 5 of 10 (top 5)
    assert by_lang["en"] == {5, 6, 7, 8, 9}
    assert by_lang["fr"] == {102, 103}
    assert all(0.0 <= r["pctile"] <= 0.5 for r in out)


def test_quality_percentile_validates_fraction(docs):
    with pytest.raises(ValueError):
        curriculum.quality_percentile_filter(docs, "n_chars", keep_top=0.0)


def test_global_position_uses_multiple_partitions(docs):
    """The scale contract: positions come from a range-partitioned prefix
    sum, not a single-partition global window."""
    out = curriculum.epoch_shuffle(docs.repartition(8), "doc_id", epoch=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_grouped_global_position_matches_window(docs):
    """Per-group positions from the grouped prefix sum must equal the
    plain Window.partitionBy row_number (the semantics it replaces)."""
    from pyspark.sql import Window

    got = curriculum.grouped_global_position(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "pos", size_col="sz")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(),
                                             F.col("doc_id").asc())
    want = docs.withColumn("pos", F.row_number().over(w) - 1)
    g = {(r["source"], r["doc_id"]): (r["pos"], r["sz"])
         for r in got.collect()}
    for r in want.collect():
        pos, sz = g[(r["source"], r["doc_id"])]
        assert pos == r["pos"]
        assert sz == 20


def test_grouped_global_position_keeps_null_groups(spark):
    """Rows whose group value is NULL must not be dropped (the offsets
    join is null-safe); they form their own group like Window.partitionBy."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None), (5, "b")],
        "id long, grp string")
    out = curriculum.grouped_global_position(
        df, ["grp"], [F.col("id").asc()], "pos", size_col="sz").collect()
    assert len(out) == 5
    nulls = sorted((r["id"], r["pos"], r["sz"])
                   for r in out if r["grp"] is None)
    assert nulls == [(2, 0, 2), (4, 1, 2)]
