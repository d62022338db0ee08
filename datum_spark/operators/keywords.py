"""Corpus keyword scoring: TF-IDF top terms per document and BM25 query
scoring — the ranking half of a training-data text pipeline (topic tagging,
near-duplicate triage, retrieval-based decontamination).

Not in the reference (CityOfPhiladelphia/datum's SQL surface has no text
ranking anywhere in its 15 files); north-star extension beside
``operators/text.py``.

Scale posture (100 TB corpus):
- tokenization + per-(doc, term) counting is ONE shuffle with map-side
  combine (``groupBy(doc, term).count``) — the dominant exchange, sized by
  the distinct (doc, term) pairs, not raw token volume;
- document frequency re-aggregates that output on ``term`` only — second,
  much smaller shuffle (vocabulary-sized);
- corpus scalars (N, avgdl) ride along as a broadcast 1-row cross join,
  keeping the whole computation a single declarative plan (no driver-side
  ``collect`` feeding literals back in);
- BM25 filters to the query's terms BEFORE the count shuffle, so only
  matching tokens are exchanged, and its per-term document frequencies
  (|query| rows) broadcast back onto the counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_PATTERN),
                    lambda t: t != "")


def tf_idf_terms(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", top_k: int = 3) -> DataFrame:
    """Top-``top_k`` terms per document by TF-IDF.

    Returns ``(id_col, rk, term, tf, df, score)`` with
    ``score = round(tf * ln(N / df), 4)``.  Ranking is on the INTEGER key
    ``(tf DESC, df ASC, term ASC)`` — deterministic across engines, no
    float comparisons in the ordering — and the float score is reported as
    a value column only.
    """
    tf = (docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
              .groupBy(id_col, "term")
              .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (Window.partitionBy(id_col)
               .orderBy(F.col("tf").desc(), F.col("df").asc(),
                        F.col("term").asc()))
    return (tf.join(df_, "term")
              .crossJoin(F.broadcast(n))
              .withColumn("score",
                          F.round(F.col("tf")
                                  * F.log(F.col("n").cast("double")
                                          / F.col("df")), 4))
              .withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= top_k)
              .select(id_col, "rk", "term", "tf", "df", "score"))


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_text_col: str = "query_text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Bulk BM25 retrieval: the top-``k`` documents for EVERY query in a
    query table — the batch search-evaluation shape (rerank candidates,
    mine hard negatives, build retrieval training pairs) rather than
    :func:`bm25_scores`'s single ad-hoc query.

    Returns ``(query_id, id_col, score, rnk)`` with ``rnk`` 1-based by
    (rounded score desc, id asc) — rounding BEFORE the rank keeps the
    order reproducible across engines (the x140 parity discipline).
    Query-term multiplicity is ignored (standard Okapi practice): each
    distinct query term contributes once.

    Scale shape: the corpus tokenization keeps only terms that occur in
    SOME query (one broadcast semi-filter over the exploded postings —
    query vocabularies are small even when the query count is large), so
    the only corpus-sized exchange is the (doc, term) partial count; the
    per-query fan-out then touches matched postings only, and the top-k
    window partitions by query — thousands of queries spread across the
    cluster, never a global sort.
    """
    d = docs.select(F.col(id_col), _tokens(text_col).alias("ws"))
    stats = d.agg(F.count(F.lit(1)).alias("n"),
                  F.avg(F.size("ws")).alias("avgdl"))
    qt = (queries.select(F.col(query_id_col),
                         F.explode(F.array_distinct(
                             _tokens(query_text_col))).alias("term")))
    tf = (d.select(id_col, F.size("ws").alias("dl"),
                   F.explode("ws").alias("term"))
           .join(F.broadcast(qt.select("term").distinct()), "term")
           .groupBy(id_col, "term")
           .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    part = (idf * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(df_), "term")
                .crossJoin(F.broadcast(stats))
                .join(F.broadcast(qt), "term")
                .groupBy(query_id_col, id_col)
                .agg(F.round(F.sum(part), 4).alias("score")))
    w = (Window.partitionBy(query_id_col)
               .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k))


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 score of every document that matches ≥1 query term.

    Returns ``(id_col, score)`` with the standard formulation
    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` summed over query terms.
    Only tokens matching the query survive to the count shuffle; document
    length and corpus stats (N, avgdl) come from array length, not a second
    tokenization pass.
    """
    d = docs.select(F.col(id_col), _tokens(text_col).alias("ws"))
    stats = d.agg(F.count(F.lit(1)).alias("n"),
                  F.avg(F.size("ws")).alias("avgdl"))
    tf = (d.select(id_col, F.size("ws").alias("dl"),
                   F.explode("ws").alias("term"))
           .filter(F.col("term").isin(list(query_terms)))
           .groupBy(id_col, "term")
           .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    part = (idf * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    return (tf.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy(id_col)
              .agg(F.round(F.sum(part), 4).alias("score")))


def ranking_metrics(ranked: DataFrame, relevant: DataFrame,
                    query_col: str = "query_id", doc_col: str = "doc_id",
                    rank_col: str = "rnk", k: int = 10) -> DataFrame:
    """Retrieval-evaluation metrics per query from a ranked result table
    and a (query, doc) relevance table (binary relevance):

    - ``n_rel`` — relevant docs in the corpus for the query;
    - ``ndcg`` — DCG@k over the binary gains (1/log2(rank+1)) divided
      by the ideal DCG of min(n_rel, k) relevant docs at the top;
    - ``mrr`` — 1 / rank of the first relevant hit within the top k
      (0 when none);
    - ``recall`` — relevant hits in the top k / n_rel.

    Queries with ``n_rel = 0`` report all-zero metrics (they stay in
    the output — silently dropping them inflates averages).

    Scale shape: one left join of the (≤ k per query) ranked rows onto
    the relevance pairs, then two map-combined per-query aggregations
    — evaluation cost rides on the ranked table's size, never the
    corpus.  All arithmetic is closed-form (log2 via ln ratios), so a
    SQL oracle replays it term-for-term (x184).
    """
    # binary relevance: duplicate (query, doc) pairs would multiply
    # ranked rows through the left join (dcg/hits > 1 per rank) and
    # inflate n_rel — dedup once, used by both the join and the count
    relevant = relevant.select(query_col, doc_col) \
                       .dropDuplicates([query_col, doc_col])
    r = (ranked.filter(F.col(rank_col) <= k)
         .join(relevant.select(F.col(query_col), F.col(doc_col),
                               F.lit(1).alias("__rel")),
               [query_col, doc_col], "left")
         .withColumn("__rel", F.coalesce("__rel", F.lit(0))))
    per_q = (r.groupBy(query_col)
             .agg(F.sum(F.col("__rel") * F.log(F.lit(2.0))
                        / F.log(F.col(rank_col) + 1.0)).alias("__dcg"),
                  F.max(F.col("__rel") / F.col(rank_col)).alias("__mrr"),
                  F.sum("__rel").alias("__hits")))
    n_rel = (relevant.groupBy(query_col)
             .agg(F.count(F.lit(1)).alias("n_rel")))
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + F.log(F.lit(2.0)) / F.log(i + 1.0))
    qs = ranked.select(query_col).distinct()
    return (qs.join(per_q, query_col, "left")
              .join(n_rel, query_col, "left")
              .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
              .select(query_col, "n_rel",
                      F.round(F.when(F.col("n_rel") > 0,
                                     F.coalesce("__dcg", F.lit(0.0))
                                     / ideal).otherwise(0.0), 4)
                       .alias("ndcg"),
                      F.round(F.coalesce("__mrr", F.lit(0.0)), 4)
                       .alias("mrr"),
                      F.round(F.when(F.col("n_rel") > 0,
                                     F.coalesce("__hits", F.lit(0))
                                     / F.col("n_rel"))
                               .otherwise(0.0), 4).alias("recall")))


def hard_negatives(docs: DataFrame, queries: DataFrame,
                   relevant: DataFrame, k: int = 5,
                   candidates: int | None = None,
                   id_col: str = "doc_id", text_col: str = "text",
                   query_id_col: str = "query_id",
                   query_text_col: str = "query_text",
                   k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Hard-negative mining for retrieval training: per query, the
    top-``k`` BM25-scored documents that are NOT in the relevance
    table — the mine-with-the-current-ranker loop (DPR/contriever
    recipe: the strongest non-answers make the best training
    negatives; random negatives are too easy).

    ``candidates`` is the BM25 shortlist width (default ``3·k``):
    positives inside the shortlist are anti-joined away, so up to
    ``candidates − k`` positives per query are tolerated before the
    negative list comes up short — size it to the expected positives
    per query.  Scale shape: one :func:`bm25_topk` pass (query vocab
    broadcast, per-query ranking window), one broadcast-able anti-join
    against the relevance pairs, one k-bounded re-rank.  Returns
    ``(query_id_col, id_col, score, rnk)``.
    """
    cand = bm25_topk(docs, queries, k=(candidates or 3 * k),
                     id_col=id_col, text_col=text_col,
                     query_id_col=query_id_col,
                     query_text_col=query_text_col, k1=k1, b=b)
    rel = (relevant.select(query_id_col, id_col)
                   .dropDuplicates([query_id_col, id_col]))
    neg = cand.join(rel, [query_id_col, id_col], "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (neg.select(query_id_col, id_col, "score")
               .withColumn("rnk", F.row_number().over(w))
               .filter(F.col("rnk") <= k))
