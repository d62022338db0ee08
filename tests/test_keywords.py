"""TF-IDF / BM25 semantics on a tiny hand-computable corpus."""

import math

from datum_spark.operators.keywords import bm25_scores, tf_idf_terms


DOCS = [
    (1, "cat cat dog"),
    (2, "dog bird"),
    (3, "fish fish fish cat"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tf_idf_top_terms(spark):
    out = tf_idf_terms(_df(spark), top_k=1).collect()
    best = {r["doc_id"]: (r["term"], r["tf"], r["df"]) for r in out}
    # doc 1: cat tf=2 (beats dog tf=1); doc 3: fish tf=3
    assert best[1] == ("cat", 2, 2)
    assert best[2][0] == "bird"  # tf ties at 1 → smaller df wins (bird df=1)
    assert best[3] == ("fish", 3, 1)
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[3] == round(3 * math.log(3 / 1), 4)
    assert scores[1] == round(2 * math.log(3 / 2), 4)


def test_bm25_matches_hand_formula(spark):
    out = {r["doc_id"]: r["score"]
           for r in bm25_scores(_df(spark), ["cat"]).collect()}
    assert set(out) == {1, 3}  # doc 2 has no query term
    n, avgdl, df = 3, (3 + 2 + 4) / 3, 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)

    def score(tf, dl, k1=1.2, b=0.75):
        return round(idf * tf * (k1 + 1)
                     / (tf + k1 * (1 - b + b * dl / avgdl)), 4)

    assert out[1] == score(2, 3)
    assert out[3] == score(1, 4)


def test_bm25_multi_term_sums(spark):
    one = {r["doc_id"]: r["score"]
           for r in bm25_scores(_df(spark), ["cat"]).collect()}
    two = {r["doc_id"]: r["score"]
           for r in bm25_scores(_df(spark), ["cat", "bird"]).collect()}
    # adding a term only adds non-negative contributions and new matches
    assert set(two) == {1, 2, 3}
    assert two[3] == one[3]  # doc 3 has no 'bird'


def test_ranking_metrics_hand_computed(spark):
    import math

    from pyspark.sql import functions as F  # noqa: F401
    from datum_spark.operators.keywords import ranking_metrics

    # q1: relevant docs {10, 30, 99}; ranked top-3 = [10, 20, 30]
    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3),
         (2, 10, 1), (2, 20, 2)],         # q2 has no relevant docs
        "query_id int, doc_id int, rnk int")
    rel = spark.createDataFrame([(1, 10), (1, 30), (1, 99)],
                                "query_id int, doc_id int")
    got = {r["query_id"]: r
           for r in ranking_metrics(ranked, rel, k=3).collect()}
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert got[1]["n_rel"] == 3
    assert got[1]["ndcg"] == round(dcg / idcg, 4)
    assert got[1]["mrr"] == 1.0
    assert got[1]["recall"] == round(2 / 3, 4)
    assert (got[2]["n_rel"], got[2]["ndcg"], got[2]["mrr"],
            got[2]["recall"]) == (0, 0.0, 0.0, 0.0)


def test_ranking_metrics_first_hit_rank(spark):
    from datum_spark.operators.keywords import ranking_metrics

    ranked = spark.createDataFrame([(1, 5, 1), (1, 6, 2), (1, 7, 3)],
                                   "query_id int, doc_id int, rnk int")
    rel = spark.createDataFrame([(1, 7)], "query_id int, doc_id int")
    row = ranking_metrics(ranked, rel, k=3).collect()[0]
    assert row["mrr"] == round(1 / 3, 4)


def test_ranking_metrics_duplicate_relevance_pairs(spark):
    """Duplicate (query, doc) rows in the relevance table must not
    inflate dcg/hits (via join fan-out) or n_rel (ADVICE r8)."""
    from datum_spark.operators.keywords import ranking_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id int, doc_id int, rnk int")
    rel = spark.createDataFrame([(1, 10), (1, 30), (1, 99)],
                                "query_id int, doc_id int")
    dup = rel.union(rel).union(rel.filter("doc_id = 10"))
    clean = {r["query_id"]: r.asDict()
             for r in ranking_metrics(ranked, rel, k=3).collect()}
    noisy = {r["query_id"]: r.asDict()
             for r in ranking_metrics(ranked, dup, k=3).collect()}
    assert noisy == clean
    assert noisy[1]["n_rel"] == 3


def test_hard_negatives_excludes_relevant(spark):
    """No relevant doc ever appears; output is the score-ordered top-k
    of the non-relevant shortlist."""
    from datum_spark.operators.keywords import bm25_topk, hard_negatives

    docs = spark.createDataFrame(
        [(1, "cat dog fish"), (2, "cat dog bird"), (3, "cat mouse"),
         (4, "dog wolf"), (5, "tree rock")],
        "doc_id int, text string")
    qs = spark.createDataFrame([(10, "cat dog")],
                               "query_id int, query_text string")
    rel = spark.createDataFrame([(10, 1), (10, 1)],  # dup pair tolerated
                                "query_id int, doc_id int")
    out = hard_negatives(docs, qs, rel, k=3, candidates=5).collect()
    got = [(r["doc_id"], r["rnk"]) for r in sorted(out,
                                                   key=lambda r: r["rnk"])]
    assert all(d != 1 for d, _ in got)        # positive excluded
    # same order as the full ranking with doc 1 removed
    full = {r["doc_id"]: r["score"]
            for r in bm25_topk(docs, qs, k=5).collect()}
    expect = sorted((d for d in full if d != 1),
                    key=lambda d: (-full[d], d))[:3]
    assert [d for d, _ in got] == expect


def test_negative_samples_group_exclusion_and_determinism(spark):
    from datum_spark.operators.sampling import negative_samples

    anchors = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(4)], "doc_id long, source string")
    pool = spark.createDataFrame(
        [(100 + i, f"s{i % 3}") for i in range(30)],
        "doc_id long, source string")
    out = negative_samples(anchors, pool, k=5).collect()
    groups = {r["doc_id"]: r["source"] for r in pool.collect()}
    agroup = {r["doc_id"]: r["source"] for r in anchors.collect()}
    assert len(out) == 20                     # 4 anchors × 5
    for r in out:
        assert groups[r["neg_id"]] != agroup[r["anchor_id"]]
    # deterministic and partition-invariant
    again = negative_samples(anchors.repartition(7), pool.coalesce(1),
                             k=5).collect()
    key = lambda rows: sorted((r["anchor_id"], r["rnk"], r["neg_id"])
                              for r in rows)
    assert key(out) == key(again)
    # slate bounds the candidate side and stays deterministic
    slated = negative_samples(anchors, pool, k=5, slate=10).collect()
    assert len({r["neg_id"] for r in slated}) <= 10
    assert key(slated) == key(negative_samples(anchors, pool, k=5,
                                               slate=10).collect())
