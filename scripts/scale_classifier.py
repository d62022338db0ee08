"""Scale probe for the trainable quality classifier (SCALE.md §18).

Replicates the documents fixture N_REP times (ids offset, text
unchanged — the feature distribution is preserved) and measures
`quality_classifier_fit` wall time per GD step at growing corpus
sizes, plus the map-only scoring pass.  The claim under test: a step
is one feature-frame scan + one shuffle of n_buckets+1 gradient rows,
so step wall grows LINEARLY in corpus size with a fixed per-step
floor (plan/analysis + job scheduling), and scoring is a single
map-only pass.

Run: python scripts/scale_classifier.py [n_rep] [steps]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.classifier import (  # noqa: E402
    quality_classifier_fit, quality_classifier_fit_sgd,
    quality_classifier_score)
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


def main(n_rep: int, steps: int) -> None:
    spark = get_session()
    out = {"steps": steps, "points": []}
    for rep in (1, max(2, n_rep // 5), n_rep):
        d = corpus(spark, rep)
        words = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                         lambda t: t != "")
        share = (F.size(F.filter(words, lambda w: w.isin("the", "a")))
                 / F.size(words))
        seed = (d.withColumn("__sh", share)
                 .filter((F.col("__sh") >= 0.09) | (F.col("__sh") <= 0.03))
                 .withColumn("__y", (F.col("__sh") >= 0.09).cast("int")))
        n_seed = seed.count()          # materialize input out of timing
        t0 = time.time()
        w, b = quality_classifier_fit(seed, "doc_id", "text", "__y",
                                      n_buckets=256, steps=steps, lr=4.0)
        fit_sec = time.time() - t0
        # throughput twin: 2 epochs of parallel mini-batch SGD vs
        # `steps` full-batch passes, same feature map / score contract
        t0 = time.time()
        ws, bs = quality_classifier_fit_sgd(
            seed, "doc_id", "text", "__y", n_buckets=256,
            epochs=2, batch_size=256, lr=4.0)
        sgd_sec = time.time() - t0
        t0 = time.time()
        n_scored = quality_classifier_score(
            d, w, b, "doc_id", "text", n_buckets=256).count()
        score_sec = time.time() - t0
        # agreement of the two trained models on the full corpus
        both = (quality_classifier_score(d, w, b, "doc_id", "text",
                                         n_buckets=256)
                .select("doc_id", F.col("pred").alias("p_gd"))
                .join(quality_classifier_score(d, ws, bs, "doc_id",
                                               "text", n_buckets=256)
                      .select("doc_id", F.col("pred").alias("p_sgd")),
                      "doc_id"))
        agree = (both.agg(F.avg((F.col("p_gd") == F.col("p_sgd"))
                                .cast("double"))).first()[0])
        out["points"].append({
            "n_docs": int(d.count()), "n_seed": int(n_seed),
            "fit_sec": round(fit_sec, 2),
            "sec_per_step": round(fit_sec / steps, 2),
            "sgd_fit_sec": round(sgd_sec, 2),
            "gd_sgd_pred_agreement": round(float(agree), 4),
            "score_sec": round(score_sec, 2),
            "n_scored": int(n_scored),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         int(sys.argv[2]) if len(sys.argv) > 2 else 12)
