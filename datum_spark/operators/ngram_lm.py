"""Word n-gram language model (bigram, interpolated) for corpus
quality scoring — the CCNet direction one order above the unigram LM
(``operators/unigram.py``): CCNet's published filter is a 5-gram
KenLM; this is the deterministic, fully-replayable 2-gram member of
that family, trained distributed from counts alone.

Not in the reference (no ML/text ops in its 15 files); north-star
extension (SURVEY §2-C).

Model: interpolated bigram with add-one unigram backoff,

    p(w2 | w1) = lam * c(w1 w2) / c(w1)  +  (1 - lam) * (c(w2) + 1) / (N + V)

with a per-document BOS token ``<s>`` as the first context (its
"count" is the number of scored documents).  Every quantity is an
exact integer count, so the only float step is the final
``round(-ln(p), 6)`` per distinct bigram — the same 6-dp log
discipline the unigram chain (x200/x204) has replayed hash-stable
across engines since r10.

Scale posture: training is two partial-aggregated count shuffles
(unigram, bigram) — the corpus text never shuffles, only (word) and
(word, word) keys.  Scoring runs the cost arithmetic ONCE PER
DISTINCT document-bigram (vocabulary-squared-bounded, corpus-
independent), joins back onto the exploded corpus bigrams through a
size-gated broadcast, and the only corpus-sized exchange is the final
per-document aggregation — the same shape as
``unigram_doc_scores``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str,
                 max_word_len: int) -> DataFrame:
    """Per-document adjacent word pairs ``(id, w1, w2)`` over the
    lowercase ``[^a-z]+``-split word sequence (words longer than
    ``max_word_len`` are dropped BEFORE pairing — adjacency is over
    the filtered sequence), with ``<s>`` prepended per document.
    Map-side explode; no shuffle."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda w: (w != "") & (F.length(w) <= max_word_len))
    seq = F.concat(F.array(F.lit(BOS)), words)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(seq) - 1),
        lambda i: F.struct(F.element_at(seq, i).alias("w1"),
                           F.element_at(seq, i + 1).alias("w2")))
    return (docs.select(F.col(id_col), F.explode(pairs).alias("__p"))
                .select(id_col, F.col("__p.w1").alias("w1"),
                        F.col("__p.w2").alias("w2")))


def bigram_lm_train(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_word_len: int = 16):
    """Train the interpolated bigram LM: returns ``(uni, bi, n, v)``
    where ``uni`` is ``(word, c)`` word counts (``<s>`` included with
    its document count — the BOS context count), ``bi`` is
    ``(w1, w2, c)`` adjacent-pair counts, ``n`` the total non-BOS
    word count and ``v`` the non-BOS vocabulary size.  Two
    partial-aggregated count shuffles; nothing corpus-sized ever
    reaches the driver (the count FRAMES stay distributed)."""
    from ..util import retain_cache

    pairs = _doc_bigrams(docs, id_col, text_col, max_word_len)
    # the bigram count table is the ONLY corpus-sized aggregation the
    # model needs: unigram counts, BOS context counts and the totals
    # are all exact folds OF it (every token appears exactly once as
    # w2 — BOS never does — so Σ_w1 c(w1,w2) = c(w2); BOS contexts are
    # Σ_w2 c(BOS,w2)).  Cache it so training is ONE corpus pass and
    # every derived table re-aggregates the vocabulary²-bounded counts
    # instead of re-exploding the corpus.
    bi = retain_cache(pairs.groupBy("w1", "w2")
                           .agg(F.count(F.lit(1)).alias("c")))
    uni = (bi.groupBy(F.col("w2").alias("word"))
             .agg(F.sum("c").alias("c")))
    bos = (bi.filter(F.col("w1") == BOS)
             .agg(F.coalesce(F.sum("c"), F.lit(0).cast("long"))
                   .alias("c"))
             .select(F.lit(BOS).alias("word"), "c"))
    uni = uni.unionByName(bos)
    totals = (uni.filter(F.col("word") != BOS)
                 .agg(F.sum("c").alias("n"),
                      F.count(F.lit(1)).alias("v")).first())
    return uni, bi, int(totals["n"] or 0), int(totals["v"] or 0)


def bigram_doc_scores(docs: DataFrame, model,
                      id_col: str = "doc_id", text_col: str = "text",
                      lam: float = 0.7,
                      max_word_len: int = 16) -> DataFrame:
    """Per-document interpolated-bigram cost: ``(id_col, n_bigrams,
    total_cost, nats_per_token)`` where each document's cost sums
    ``round(-ln(p(w2|w1)), 6)`` over its (BOS-prefixed) adjacent
    pairs.  Documents with no valid words produce no row (no pairs to
    score — the same exclusion rule as ``unigram_doc_scores``).

    ``model`` is ``bigram_lm_train``'s ``(uni, bi, n, v)``; unseen
    pairs and words degrade smoothly (``c12 -> 0`` drops the bigram
    term, ``c2 -> 0`` leaves the add-one unigram floor), so the model
    scores any corpus, not just its training one."""
    from ..util import _GATED_BROADCAST_BYTES, estimated_bytes

    uni, bi, n, v = model
    pairs = _doc_bigrams(docs, id_col, text_col, max_word_len)
    c1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.filter(F.col("word") != BOS) \
            .select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    big = F.when(
        F.coalesce(F.col("c1"), F.lit(0)) > 0,
        F.coalesce(F.col("c"), F.lit(0))
        / F.col("c1").cast("double")).otherwise(F.lit(0.0))
    unig = ((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
            / F.lit(float(n + v)))
    # integer MICRO-nats per pair: summing exact integers makes the
    # per-document totals independent of float summation order (a
    # double-cost sum flipped a 6-dp rounding tie between engines on
    # the first x218 diff run), and the per-token mean is an exact
    # integer division at micro precision
    cost = F.round(-F.log(F.lit(float(lam)) * big
                          + F.lit(1.0 - float(lam)) * unig)
                   * F.lit(1_000_000.0), 0).cast("long")
    out_cols = [F.col(id_col), F.col("n_bigrams"),
                (F.col("__cms") / F.lit(1_000_000.0))
                .alias("total_cost"),
                (F.expr("__cms div n_bigrams")
                 / F.lit(1_000_000.0)).alias("nats_per_token")]
    if estimated_bytes(bi) < _GATED_BROADCAST_BYTES:
        # the count tables fit a broadcast: score each pair OCCURRENCE
        # inline — three map-side broadcast joins and the cost
        # expression in the same stage, so the only corpus-sized
        # exchange is the per-document partial aggregation (the
        # distinct() pre-shuffle of the whole pair stream is gone).
        # ``cost`` is a pure function of (c, c1, c2, n, v): evaluating
        # it per occurrence yields the exact long the distinct-pair
        # path attaches by join — value-identical totals.
        return (pairs.join(F.broadcast(bi), ["w1", "w2"], "left")
                .join(F.broadcast(c1), "w1", "left")
                .join(F.broadcast(c2), "w2", "left")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_bigrams"),
                     F.sum(cost).alias("__cms"))
                .select(*out_cols))
    # vocabulary too large to broadcast (the 100 TB posture): run the
    # cost arithmetic once per DISTINCT pair, shuffle-join it back
    dp = pairs.select("w1", "w2").distinct()
    scored = (dp.join(bi, ["w1", "w2"], "left")
                .join(c1, "w1", "left").join(c2, "w2", "left")
                .select("w1", "w2", cost.alias("__cm")))
    return (pairs.join(scored, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("__cm").alias("__cms"))
            .select(*out_cols))
