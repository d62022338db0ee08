"""OPQ 2x2 rotation sweep (SCALE.md §30 evidence).

The claim under test: the Householder ALIGNMENT and the serpentine
variance-BALANCING permutation are near-orthogonal remedies —
alignment helps when one dominant direction smears across subspaces
(the generic embedding case), the permutation helps when per-dimension
variances are skewed enough that natural order stacks all the energy
into one subspace.  The r12 default (align=True, balance=False) should
therefore win on isotropic-ish data, and (align, balance) should win
on skew, with "balance alone costs recall on isotropic data" (the
reason it is opt-in) directly measured rather than asserted.

Sweep: both fixtures x all four (align, balance) corners, recall@10
against exact L2 top-10 (20 held-in queries), m=8 ksub=16.

- fixture "isotropic": the sf0.01 embeddings table (64-dim).
- fixture "skewed": 1000 synthetic 16-dim vectors where dims 0..3
  carry ~100x the variance of the rest (md5-deterministic from ids,
  so reruns are bit-identical), m=4.

Run: python scripts/scale_opq_sweep.py
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.similarity import (  # noqa: E402
    opq_adc_topk,
    opq_train_encode,
)
from datum_spark.session import get_session  # noqa: E402


def _recall(spark, corpus, m, ksub, align, balance):
    queries = corpus.limit(20)
    t0 = time.time()
    codes, books, u, perm = opq_train_encode(
        corpus, "vec_id", "embedding", m=m, ksub=ksub, iters=2,
        align=align, balance=balance)
    codes = codes.cache()
    codes.count()
    wall_train = round(time.time() - t0, 2)
    adc = opq_adc_topk(queries, codes, books, u, perm, k=10,
                       qid_col="vec_id", qvec_col="embedding")
    # exact ground truth: query-side broadcast, corpus streams
    qv = queries.select(F.col("vec_id").alias("qid"),
                        F.col("embedding").alias("qe"))
    cv = corpus.select("vec_id", F.col("embedding").alias("e"))
    d2 = F.aggregate(F.zip_with("qe", "e", lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(d2.asc(), F.col("vec_id").asc())
    exact = (F.broadcast(qv).crossJoin(cv)
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 10).select("qid", "vec_id"))
    hits = (adc.join(exact, (adc["query_id"] == exact["qid"])
                     & (adc["vec_id"] == exact["vec_id"]), "inner")
            .count())
    codes.unpersist()
    return round(hits / (20 * 10.0), 3), wall_train


def main() -> None:
    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    iso = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))

    # skewed fixture: dims 0..3 ~ U(-10,10), dims 4..15 ~ U(-0.1,0.1),
    # every coordinate an md5-deterministic function of (id, dim)
    def coord(i):
        h = F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.lit("opq-sweep"), F.col("vec_id"), F.lit(i))), 1, 8),
            16, 10).cast("double") / F.lit(float(0xFFFFFFFF))
        amp = 10.0 if i < 4 else 0.1
        return (h * 2.0 - 1.0) * amp

    skew = (spark.range(1000).select(F.col("id").alias("vec_id"))
            .select("vec_id", F.array(*[coord(i) for i in range(16)])
                    .alias("embedding")))

    out = {"sf_dir": sf_dir, "fixtures": {}}
    for name, corpus, m in (("isotropic", iso, 8), ("skewed", skew, 4)):
        corpus = corpus.cache()
        corpus.count()
        grid = {}
        for align in (False, True):
            for balance in (False, True):
                r, wall = _recall(spark, corpus, m, 16, align, balance)
                grid[f"align={align},balance={balance}"] = {
                    "recall_at_10": r, "train_sec": wall}
        out["fixtures"][name] = {"m": m, "grid": grid}
        corpus.unpersist()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
