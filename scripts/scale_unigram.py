"""Scale probe for unigram-LM tokenizer training + encoding (SCALE.md §24).

Claims under test (the learn_bpe_merges_local posture applied to the
second tokenizer family, operators/unigram.py):

- TRAINING wall is flat in corpus size: one word-frequency pass over
  the corpus, then hard-EM runs driver-side on the vocabulary-sized
  table (replication does not grow the vocab, exactly like a real
  corpus where vocab ≪ corpus).
- ENCODING is distributed, map-only and linear: the Viterbi DP is one
  Catalyst aggregate expression over a broadcast runtime cost map —
  here driven over the full (replicated) corpus's exploded words, the
  100 TB shape (tokenize every document), not just the vocab.

Sweep: documents fixture replicated 1× / 10× / 50×.
Run: python scripts/scale_unigram.py.  Prints one JSON doc.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.bpe import word_frequencies  # noqa: E402
from datum_spark.operators.unigram import (  # noqa: E402
    unigram_encode, unigram_train_local)
from datum_spark.session import get_session  # noqa: E402
from datum_spark.sources.registry import read_parquet_normalized  # noqa: E402


def corpus(spark, n_rep: int):
    docs = read_parquet_normalized(
        spark, "/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(n_rep).select(F.col("id").alias("rep"))
    return (docs.crossJoin(reps)
                .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                        .alias("doc_id"), "text")
                .repartition(64))


def main() -> None:
    spark = get_session()
    points = []
    for rep in (1, 10, 50):
        d = corpus(spark, rep)
        n_docs = d.count()
        t0 = time.time()
        words = (word_frequencies(d)
                 .filter(F.length("word") <= 16).persist())
        vocab_words = words.count()
        freq_s = time.time() - t0
        rows = [(r["word"], int(r["cnt"])) for r in words.collect()]
        t0 = time.time()
        vocab = unigram_train_local(rows, iters=2)
        em_s = time.time() - t0
        # corpus-scale encode: every word OCCURRENCE, not the vocab —
        # explode the corpus to words and run the DP over all of them
        occ = (d.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                         .alias("word"))
                 .filter((F.col("word") != "")
                         & (F.length("word") <= 16)))
        t0 = time.time()
        enc = unigram_encode(occ, vocab)
        n_tok = enc.agg(F.sum("n_tokens")).collect()[0][0]
        enc_s = time.time() - t0
        words.unpersist()
        points.append({"replication": rep, "n_docs": int(n_docs),
                       "vocab_words": int(vocab_words),
                       "vocab_pieces": len(vocab),
                       "word_freq_pass_s": round(freq_s, 2),
                       "driver_em_s": round(em_s, 3),
                       "corpus_encode_s": round(enc_s, 2),
                       "total_tokens": int(n_tok)})
    print(json.dumps({"metric": "unigram_scale", "unit": "sec",
                      "points": points}))


if __name__ == "__main__":
    main()
