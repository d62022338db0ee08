"""Scale stress for DBSCAN (SCALE.md §16 evidence).

Synthesizes N points (default 500,000) on a 10,000 x 10,000 plane with
the density shape DBSCAN exists for: 80% of points fall in K dense
blobs (center grid + md5-uniform jitter inside a tight disc bounding
box), 20% are uniform background noise.  Runs
``operators.spatial.dbscan`` at full N and records:

  - wall seconds end-to-end (epsilon-graph -> degrees -> components ->
    border assignment);
  - epsilon-graph edge count (the one quantity that grows with local
    density — the probe's early-warning number: at fixed eps it grows
    ~linearly in N * blob density, never N^2, because radius_join is
    grid-bounded);
  - cluster count / core share / noise share (sanity: blobs resolve,
    background stays noise);
  - the heaviest single cluster (skew probe for the component rounds).

Everything derives deterministically from integer ids (md5 jitter, no
RNG), so reruns are bit-identical and N sweeps are comparable.

Run: python scripts/scale_dbscan.py [n_points] [n_blobs] [eps] [min_pts]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.sampling import md5_bucket  # noqa: E402
from datum_spark.operators.spatial import dbscan  # noqa: E402
from datum_spark.session import get_session  # noqa: E402

U32 = float(1 << 32)


def make_points(spark, n: int, n_blobs: int):
    """80% blob members (30-unit jitter box around a center grid), 20%
    uniform noise — all coordinates pure Catalyst expressions of id."""
    ids = spark.range(n).select(F.col("id").cast("long").alias("pid"))
    side = int(n_blobs ** 0.5) or 1
    # blob centers on a coarse grid, away from the plane edges
    blob = (F.col("pid") % n_blobs).alias("b")
    cx = ((F.col("b") % side) * (9000 / side) + 500)
    cy = (F.floor(F.col("b") / side) * (9000 / side) + 500)
    u1 = md5_bucket(F.col("pid"), "dbx") / F.lit(U32)
    u2 = md5_bucket(F.col("pid"), "dby") / F.lit(U32)
    is_noise = md5_bucket(F.col("pid"), "dbn") % 5 == 0  # 20%
    pts = (ids.select("pid", blob)
              .select("pid",
                      F.when(is_noise, u1 * 10000)
                       .otherwise(cx + (u1 - 0.5) * 30).alias("x"),
                      F.when(is_noise, u2 * 10000)
                       .otherwise(cy + (u2 - 0.5) * 30).alias("y")))
    return pts.repartition(64)


def main(n: int, n_blobs: int, eps: float, min_pts: int):
    spark = get_session()
    pts = make_points(spark, n, n_blobs)
    pts.count()  # materialize input timing out of the measured window

    t0 = time.time()
    lab = dbscan(pts, "pid", "x", "y", eps=eps, min_pts=min_pts)
    summary = (lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_core").cast("long")).alias("n_core"),
        F.sum(F.col("cluster").isNull().cast("long")).alias("n_noise"),
        F.countDistinct("cluster").alias("n_clusters")).collect()[0])
    heaviest = (lab.filter(F.col("cluster").isNotNull())
                   .groupBy("cluster").count()
                   .agg(F.max("count")).collect()[0][0])
    wall = time.time() - t0

    # the epsilon-graph edge count (re-derived; cached inside dbscan's
    # run, so this is the same radius_join shape measured separately)
    from datum_spark.operators.spatial import radius_join
    a = pts.select(F.col("pid").alias("ia"), F.col("x").alias("xa"),
                   F.col("y").alias("ya"))
    b = pts.select(F.col("pid").alias("ib"), F.col("x").alias("xb"),
                   F.col("y").alias("yb"))
    t1 = time.time()
    n_edges = radius_join(a, b, "xa", "ya", "xb", "yb", eps).count()
    graph_sec = time.time() - t1

    print(json.dumps({
        "n_points": n, "n_blobs": n_blobs, "eps": eps, "min_pts": min_pts,
        "wall_sec": round(wall, 2),
        "graph_only_sec": round(graph_sec, 2),
        "eps_graph_edges": int(n_edges),
        "edges_per_point": round(n_edges / n, 2),
        "n_clusters": int(summary["n_clusters"]),
        "core_share": round(summary["n_core"] / n, 4),
        "noise_share": round(summary["n_noise"] / n, 4),
        "heaviest_cluster": int(heaviest or 0),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 49,
         float(sys.argv[3]) if len(sys.argv) > 3 else 3.0,
         int(sys.argv[4]) if len(sys.argv) > 4 else 5)
