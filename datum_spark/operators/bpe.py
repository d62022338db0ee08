"""Byte-pair-encoding merge training over a distributed corpus.

Classic BPE training scales the way Sennrich's original does: work on the
WORD-FREQUENCY table, not the corpus — a 100 TB corpus has a vocabulary
of maybe 10^7 distinct words, so after one corpus-wide
`groupBy(word).count()` every iteration touches only the vocab table.
Each iteration is: count adjacent symbol pairs weighted by word
frequency (one small agg), pick the argmax pair (an O(1) driver collect,
the k-means/PageRank scalar discipline), and merge that pair in every
word's symbol sequence.

The merge step is pure JVM string work, no UDF: a word's symbol sequence
is kept as a \\x1e-delimited string ("\\x1ea\\x1eb\\x1ec\\x1e") and
merging pair (a, b) is TWO passes of plain `replace(s, "\\x1ea\\x1eb\\x1e",
"\\x1eab\\x1e")`.  One pass alone skips occurrences whose leading
delimiter the previous match consumed; pass two picks those up.
Over-merging is impossible in either pass: a new (a, b) adjacency would
need the merged token "ab" to equal "a" or "b".

Exact merge semantics (property-tested in tests/test_bpe.py):
- a ≠ b: occurrences cannot share a token, so the maximal match set is
  unique and the 2-pass result EQUALS the canonical greedy
  left-to-right BPE scan.
- a == b (run merging, e.g. doubled letters): the result is a
  deterministic MAXIMAL matching — valid (only (a,a) pairs merged),
  content-preserving, with no adjacent (a,a) left — but for runs ≥5 the
  chosen positions differ from the canonical scan, and an even run of
  2k ≥ 6 yields k-1 merges where the canonical scan yields k
  ("aaaaaa" → [aa,a,aa,a], canonical [aa,aa,aa]).  This variant is the
  engine's DEFINED semantics: training and encoding apply it
  identically, and the DuckDB oracle replays the same two-pass replace,
  so pair counts, argmax choices and encodings agree bit-for-bit across
  engines.

Determinism: ties on pair count break by the pair's symbol order; the
pair key is `a || \\x1f || b`, and since \\x1f sorts below every corpus
symbol byte, string order == (a, b) tuple order.  The whole trajectory
is therefore exactly replayable — the x114 oracle unrolls the same
iterations as DuckDB CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D = "\x1e"   # symbol delimiter inside a sequence string
U = "\x1f"   # pair-key separator; sorts below any real symbol byte


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercase alpha word-frequency table — the one corpus-wide pass."""
    return (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                          "[^a-z]+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _pairs(col):
    """Adjacent symbol pairs of a sequence, keyed ``sym_a \\x1f sym_b``.
    zip_with pads the shorter side with null and concat null-propagates,
    so the trailing (last, null) pair filters away; 1-symbol words give
    an empty list."""
    tail = F.slice(col, 2, F.greatest(F.size(col) - 1, F.lit(0)))
    zipped = F.zip_with(col, tail, lambda a, b: F.concat(a, F.lit(U), b))
    return F.filter(zipped, lambda p: p.isNotNull())


def learn_bpe_merges(words: DataFrame, iters: int = 5,
                     ) -> list[tuple[int, str, str, int]]:
    """Run ``iters`` BPE merge iterations over a (word, cnt) table.
    Returns the learned merge list [(iteration, sym_a, sym_b, freq)] —
    O(iters) driver data, like k-means centers."""
    seqs = words.select(
        "cnt",
        F.concat(F.lit(D), F.array_join(F.split("word", ""), D), F.lit(D))
         .alias("s")).persist()
    seqs.count()
    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, iters + 1):
        toks = F.filter(F.split("s", D), lambda x: x != F.lit(""))
        top = (seqs.select("cnt", F.explode(_pairs(toks)).alias("p"))
               .groupBy("p").agg(F.sum("cnt").alias("c"))
               .orderBy(F.desc("c"), "p").limit(1).collect())
        if not top:
            break
        a, b = top[0]["p"].split(U)
        merges.append((it, a, b, int(top[0]["c"])))
        pat, rep = F.lit(D + a + D + b + D), F.lit(D + a + b + D)
        nxt = seqs.select(
            "cnt",
            F.replace(F.replace("s", pat, rep), pat, rep).alias("s")
        ).persist()
        nxt.count()
        seqs.unpersist()
        seqs = nxt
    seqs.unpersist()
    return merges


def bpe_merge_table(spark: SparkSession, docs: DataFrame,
                    iters: int = 5, text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame (it, sym_a, sym_b, freq)."""
    merges = learn_bpe_merges(word_frequencies(docs, text_col), iters)
    return spark.createDataFrame(
        merges, "it int, sym_a string, sym_b string, freq bigint")


def bpe_encode_vocab(words: DataFrame,
                     merges: list[tuple[int, str, str, int]],
                     word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to the vocabulary: (word, n_tokens).

    The merge applications are ONE static chained-replace expression
    (2 passes per merge, all JVM string ops inside whole-stage codegen) —
    encoding is a single map-only pass over the vocab, and corpus
    encoding is then a broadcast join of this table onto exploded words
    (the vocab is tiny next to the corpus)."""
    col = F.concat(F.lit(D),
                   F.array_join(F.split(word_col, ""), D), F.lit(D))
    for _, a, b, _ in merges:
        pat, rep = F.lit(D + a + D + b + D), F.lit(D + a + b + D)
        col = F.replace(F.replace(col, pat, rep), pat, rep)
    n_tok = F.size(F.filter(F.split(col, D), lambda x: x != F.lit("")))
    return words.withColumn("n_tokens", n_tok)


def learn_bpe_merges_local(words: DataFrame, iters: int = 5,
                           ) -> list[tuple[int, str, str, int]]:
    """THROUGHPUT path of :func:`learn_bpe_merges`: collect the
    (word, cnt) vocabulary ONCE (it is vocabulary-sized — ~10⁷ rows at
    100 TB corpus scale, Sennrich's original in-memory regime) and run
    the merge loop driver-side — so a real 32k-merge vocab costs ONE
    Spark job instead of 32k sequential pair-count jobs, and training
    wall is flat in corpus size once the single word-frequency pass is
    paid.

    Bit-equal to the distributed trajectory (tested): same pair keys
    (``a \\x1f b``, \\x1f sorts below every corpus symbol byte, so
    string order == tuple order), same argmax tie-break (max count,
    then lexicographically smallest pair key), same two-pass
    non-overlapping replace semantics (Python ``str.replace`` and
    Spark ``F.replace`` both substitute left-to-right greedily) — so
    the x114 oracle hash is unchanged by switching paths.
    """
    rows = words.select("word", "cnt").collect()
    seqs: list[list] = [[int(r["cnt"]),
                         D + D.join(r["word"]) + D] for r in rows]
    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, iters + 1):
        counts: dict[str, int] = {}
        for cnt, s in seqs:
            toks = [t for t in s.split(D) if t]
            for a, b in zip(toks, toks[1:]):
                k = a + U + b
                counts[k] = counts.get(k, 0) + cnt
        if not counts:
            break
        # max count, ties by the smallest pair KEY (string order ==
        # (a, b) order because U sorts below every symbol byte)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = best[0].split(U)
        merges.append((it, a, b, int(best[1])))
        pat, rep = D + a + D + b + D, D + a + b + D
        for e in seqs:
            e[1] = e[1].replace(pat, rep).replace(pat, rep)
    return merges


def bpe_merge_table_local(spark: SparkSession, docs: DataFrame,
                          iters: int = 5,
                          text_col: str = "text") -> DataFrame:
    """:func:`bpe_merge_table` on the driver-side merge loop — one
    corpus pass + one vocab collect, bit-equal output."""
    merges = learn_bpe_merges_local(word_frequencies(docs, text_col),
                                    iters)
    return spark.createDataFrame(
        merges, "it int, sym_a string, sym_b string, freq bigint")
