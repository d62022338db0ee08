"""Benchmark-contamination check: flag corpus documents that share word
n-grams with a benchmark/eval set (the standard decontamination pass before
a corpus is used for training).

Scale posture (100 TB corpus, small benchmark set): benchmark n-grams are
generated map-side and deduplicated once — the result is tiny relative to
the corpus and is broadcast into the probe join, so the corpus side never
shuffles its grams; the only corpus shuffle is the final per-doc count
aggregation (partial+final).  Gram generation itself is native array exprs
(``split``/``sequence``/``slice``/``transform``) — no UDF, whole-stage
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_grams(col: Column, n: int) -> Column:
    """Array of word n-grams (space-joined, lowercased) for a text column.

    NOTE: Spark's ``sequence(1, m)`` generates a DESCENDING sequence when
    ``m < 1``, so short texts must be guarded to an empty array explicitly.
    """
    ws = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    idx = F.when(F.size(ws) >= n,
                 F.sequence(F.lit(1), F.size(ws) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))


def ngram_overlap(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Per corpus document, the number of DISTINCT word ``n``-grams it
    shares with any benchmark document.  Returns ``(id_col, n_shared)``
    for contaminated docs only (inner join — clean docs drop out).
    """
    grams = F.explode(_word_grams(F.col(text_col), n)).alias("gram")
    # Join BEFORE deduplicating the corpus side: the broadcast hash join
    # filters map-side, so the per-doc gram dedup (count DISTINCT) only
    # shuffles grams that actually hit the benchmark set — a tiny fraction
    # of the corpus.  Deduping first would shuffle every corpus gram.
    from ..util import gated_broadcast

    c_grams = corpus.select(F.col(id_col), grams)
    b_grams = benchmark.select(grams).distinct()
    # size evidence from the benchmark's raw text scan (cheap plan);
    # the gram explode yields ≤ n overlapping grams per word, covered
    # by the expansion factor
    return (c_grams.join(gated_broadcast(
                b_grams, probe=benchmark.select(text_col),
                expansion=n), "gram")
            .groupBy(id_col)
            .agg(F.count_distinct(F.col("gram")).alias("n_shared")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, max_shared: int = 0) -> DataFrame:
    """Drop corpus documents sharing more than ``max_shared`` distinct
    n-grams with the benchmark set (left-anti join on the flagged ids)."""
    if max_shared <= 0:
        # Existence is enough — skip the per-doc distinct count entirely;
        # one hit flags the doc, and the anti join dedups ids for free.
        from ..util import gated_broadcast

        grams = F.explode(_word_grams(F.col(text_col), n)).alias("gram")
        b_grams = benchmark.select(grams).distinct()
        flagged = (corpus.select(F.col(id_col), grams)
                   .join(gated_broadcast(b_grams,
                                         probe=benchmark.select(text_col),
                                         expansion=n), "gram")
                   .select(id_col))
    else:
        flagged = (ngram_overlap(corpus, benchmark, id_col, text_col, n)
                   .filter(F.col("n_shared") > max_shared)
                   .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")
