"""Scale probe for BPE merge training (SCALE.md §22).

The claim under test: with the driver-side merge loop
(`learn_bpe_merges_local`), training wall is FLAT in corpus size —
one word-frequency pass over the corpus, then the merge loop runs on
the vocabulary-sized collected table (replicating the fixture does not
grow the vocabulary, exactly like a real corpus where vocab ≪ corpus).
The old distributed loop pays one pair-count Spark job PER MERGE —
fine at 5 merges, hopeless at a real 32k-merge vocab.

Sweep: documents fixture replicated 1× / 10× / 50×, iters=5 and
iters=40 (the x114 fixture scale and the round-8 bench shape), timing
both paths.  Run: python scripts/scale_bpe.py.  Prints one JSON doc.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.bpe import (  # noqa: E402
    learn_bpe_merges, learn_bpe_merges_local, word_frequencies)
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
        n = d.count()
        t0 = time.time()
        words = word_frequencies(d).persist()
        vocab = words.count()
        freq_s = time.time() - t0
        t0 = time.time()
        local = learn_bpe_merges_local(words, iters=40)
        local_s = time.time() - t0
        dist_s = None
        if rep == 1:                        # the old path, for contrast —
            # at its own x114 setting (5 merges): 40 chained persisted
            # replace frames OOM the driver on plan-tree strings alone,
            # which is the linear-in-merges cost the local loop removes
            t0 = time.time()
            dist = learn_bpe_merges(words, iters=5)
            dist_s = round(time.time() - t0, 2)
            assert dist == local[:5]        # trajectory prefix property
        words.unpersist()
        points.append({"n_docs": int(n), "vocab": int(vocab),
                       "wordfreq_s": round(freq_s, 2),
                       "local_40merges_s": round(local_s, 2),
                       "distributed_5merges_s": dist_s})
        print(json.dumps(points[-1]), file=sys.stderr)
    print(json.dumps({"probe": "bpe_local_merge_loop", "points": points}))


if __name__ == "__main__":
    main()
