"""Scale probe for the persistent IVF-PQ index (SCALE.md §19 evidence).

The claim under test: at FIXED nprobe and fixed per-cell occupancy
(ncells grows with the corpus — the standard ~sqrt(N) sizing), serve
wall and serve IO are FLAT in corpus size, because the probed-cell
filter is directory-level partition pruning over the cell-partitioned
codes and the ADC join touches only nprobe cells of 4-byte codes.

Sweep: N in {4k, 16k, 64k} vectors (16-dim, 3 synthetic blobs + noise,
all coordinates md5-deterministic functions of the id — reruns are
bit-identical), ncells in {8, 32, 128} (≈500 vectors/cell throughout),
m=4 ksub=16 nprobe=2 k=10, 8 queries drawn from the corpus.

Records per step:
  - build wall (train both quantizer tiers + encode + write; grows with
    N*ncells — the amortized build-once cost, reported not asserted);
  - serve wall for the 8-query batch (the flat-line claim);
  - codes files scanned vs total (partition pruning observed, not
    assumed: inputFiles of the pruned scan);
  - self-retrieval hits@1 (sanity: the index answers).

Run: python scripts/scale_ivfpq.py [sizes_csv]   (default 4000,16000,64000)
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.sampling import md5_bucket  # noqa: E402
from datum_spark.operators.similarity import (  # noqa: E402
    ivfpq_index_build, ivfpq_index_query)
from datum_spark.session import get_session  # noqa: E402

U32 = float(1 << 32)
DIM = 16


def make_vectors(spark, n: int):
    """n 16-dim vectors: blob center by id%3 (0/40/80 per dim) plus
    md5-uniform jitter in [0,1) per dim — deterministic in the id."""
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    base = (F.col("vec_id") % 3).cast("double") * 40.0
    dims = [base + md5_bucket(F.col("vec_id"), f"d{d}") / F.lit(U32)
            for d in range(DIM)]
    return ids.select("vec_id", F.array(*dims).alias("embedding"))


def probe(spark, n: int, ncells: int) -> dict:
    df = make_vectors(spark, n).cache()
    df.count()
    idx = tempfile.mkdtemp(prefix=f"ivfpq_{n}_")
    try:
        t0 = time.time()
        info = ivfpq_index_build(df, idx, ncells=ncells, m=4, ksub=16,
                                 coarse_iters=1, pq_iters=1)
        build_s = time.time() - t0

        qs = df.filter(F.col("vec_id") < 8).collect()
        qdf = spark.createDataFrame(qs, df.schema)
        t0 = time.time()
        out = ivfpq_index_query(qdf, idx, k=10, nprobe=2)
        rows = out.collect()
        serve_s = time.time() - t0

        # observed pruning: the plan's PartitionFilters name the probed
        # cells — count the parquet files under exactly those dirs
        # (df.inputFiles() lists the relation pre-pruning, useless here)
        import re

        from datum_spark.plans.inspect import explain_str

        plan = explain_str(out)
        pf = re.search(r"PartitionFilters: \[[^\]]*cell#\d+"
                       r"(?: IN \(([^)]+)\)| INSET ([\d,\s]+)| = (\d+))",
                       plan)
        grp = pf and (pf.group(1) or pf.group(2))
        probed_cells = ([int(x) for x in grp.replace(" ", "").split(",")
                         if x] if grp
                        else [int(pf.group(3))] if pf else [])

        def _nfiles(d):
            p = os.path.join(idx, "codes", f"cell={d}")
            return len([f for f in os.listdir(p)
                        if f.endswith(".parquet")]) \
                if os.path.isdir(p) else 0

        scanned = sum(_nfiles(c) for c in probed_cells)
        total = sum(len([f for f in files if f.endswith(".parquet")])
                    for _, _, files in os.walk(os.path.join(idx, "codes")))
        hits1 = sum(1 for r in rows
                    if r["rnk"] == 1 and r["vec_id"] == r["query_id"])
        return {"n": n, "ncells": ncells, "build_s": round(build_s, 2),
                "serve_s": round(serve_s, 2),
                "cells_probed": len(probed_cells),
                "files_scanned": scanned, "files_total": total,
                "vectors": info["n_vectors"],
                "self_hits_at_1": hits1, "topk_rows": len(rows)}
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        df.unpersist()


def main() -> None:
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1
              else "4000,16000,64000").split(",")]
    spark = get_session()
    steps = []
    for n in sizes:
        ncells = max(8, n // 500)
        steps.append(probe(spark, n, ncells))
        print(json.dumps(steps[-1]), file=sys.stderr)
    print(json.dumps({"probe": "ivfpq_serve_flat", "dim": DIM,
                      "nprobe": 2, "m": 4, "ksub": 16, "steps": steps}))


if __name__ == "__main__":
    main()
