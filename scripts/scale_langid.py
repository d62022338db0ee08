"""Scale probe: language-ID classifier (SCALE.md §27).

Claims under test (operators/langid.py):

1. the char-n-gram FEATURE PASS is computed once and shared by every
   one-vs-rest class fit — doubling the number of languages must NOT
   double the fit wall (only the O(n_buckets)-traffic GD steps scale
   with K, not the corpus tokenize);
2. scoring all K classes is ONE map-only projection — scoring wall
   roughly flat in K;
3. fit wall grows ~linearly in corpus size (the honest full-batch
   cost: steps × K passes over the CACHED feature frame).

Synthetic corpus: K fake 'languages' with disjoint alphabets (fully
separable — accuracy is also asserted > 0.9, so the probe witnesses
the operator working, not just running).

Run: python scripts/scale_langid.py
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.langid import (  # noqa: E402
    language_classifier_fit, language_classifier_score)
from datum_spark.session import get_session  # noqa: E402


ALPHA = "abcdefghijklmnopqrstuvwx"


def _corpus(spark, n_docs: int, k: int):
    random.seed(13)
    per = max(1, 24 // k)
    rows = []
    for i in range(n_docs):
        cls = i % k
        a = ALPHA[cls * per:(cls + 1) * per]
        rows.append((i, " ".join(
            "".join(random.choice(a) for _ in range(6))
            for _ in range(20)), f"lg{cls}"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string").repartition(32)


def main() -> None:
    spark = get_session()
    out: dict = {"metric": "langid_sweep", "unit": "sec", "sweep": []}
    for n_docs, k in ((20_000, 3), (20_000, 6), (80_000, 3)):
        docs = _corpus(spark, n_docs, k).persist()
        docs.count()
        t0 = time.perf_counter()
        models = language_classifier_fit(docs, "doc_id", "text", "lang",
                                         n_buckets=64, steps=4, lr=2.0)
        fit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        scored = language_classifier_score(docs, models, "doc_id",
                                           "text")
        acc = (docs.join(scored, "doc_id")
               .agg(F.avg((F.col("lang") == F.col("pred_lang"))
                          .cast("double"))).first()[0])
        score_s = time.perf_counter() - t0
        out["sweep"].append({"n_docs": n_docs, "k": k,
                             "fit_sec": round(fit_s, 2),
                             "score_sec": round(score_s, 2),
                             "accuracy": round(float(acc), 4)})
        docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
