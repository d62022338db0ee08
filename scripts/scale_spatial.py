"""Scale stress for the round-7 spatial join (SCALE.md §11 evidence).

Synthesizes N points (default 1,000,000) on a 10,000 × 10,000 plane and
P polygons (default 200) of mixed sizes — small parcels, mid districts,
and a few large regions, the skew shape of real GIS reference layers —
then times `point_in_polygon_join` (grid prefilter + exact JVM ray
cast) against the quadratic baseline shape (cross join × st__pip) on a
small sample to confirm equality, and records:

  - wall seconds for the grid join at full N;
  - candidate-pair count vs exact-hit count (grid selectivity: how much
    work the envelope cells admit beyond true hits);
  - polygon cell-replication factor (rows after the cell explode /
    polygons — the cost a giant polygon pays);
  - peak output partition (skew probe: a downtown-dense cell would
    spike it).

Points/polygons are derived deterministically from integer ids (no
RNG), so reruns are bit-identical.

Run: python scripts/scale_spatial.py [n_points] [n_polys] [cell_size]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.functions.geometry_sql import (  # noqa: E402
    register_geometry_sql_functions,
)
from datum_spark.operators.spatial import point_in_polygon_join  # noqa: E402
from datum_spark.session import get_session  # noqa: E402


def make_points(spark, n: int):
    """n deterministic points on the 10k × 10k plane (hash-scattered)."""
    return (spark.range(n)
            .select(F.col("id").alias("pid"),
                    (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000))
                     / 1000.0).alias("px"),
                    (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000_000))
                     / 1000.0).alias("py")))


def make_polys(spark, p: int):
    """p axis-aligned square polygons of mixed size: 80% side ~40
    (parcels), 18% side ~400 (districts), 2% side ~3000 (regions) —
    centers hash-scattered, WKT built with SQL string ops."""
    base = (spark.range(p)
            .select(F.col("id").alias("poly_id"),
                    (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(9_000_000))
                     / 1000.0 + 500).alias("cx"),
                    (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(9_000_000))
                     / 1000.0 + 500).alias("cy"),
                    F.when(F.col("id") % 50 == 0, 3000.0)
                     .when(F.col("id") % 5 == 0, 400.0)
                     .otherwise(40.0).alias("side")))
    h = F.col("side") / 2
    x0, x1 = F.col("cx") - h, F.col("cx") + h
    y0, y1 = F.col("cy") - h, F.col("cy") + h
    wkt = F.concat(F.lit("POLYGON (("),
                   x0, F.lit(" "), y0, F.lit(", "),
                   x1, F.lit(" "), y0, F.lit(", "),
                   x1, F.lit(" "), y1, F.lit(", "),
                   x0, F.lit(" "), y1, F.lit(", "),
                   x0, F.lit(" "), y0, F.lit("))"))
    return base.select("poly_id", wkt.alias("wkt"))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cell = float(sys.argv[3]) if len(sys.argv) > 3 else 200.0

    spark = get_session(app_name="scale_spatial")
    spark.sparkContext.setLogLevel("ERROR")
    register_geometry_sql_functions(spark)

    pts = make_points(spark, n).persist()
    polys = make_polys(spark, p).persist()
    pts.count(), polys.count()

    # correctness spot-check: grid join == brute force on a 5k sample
    sample = pts.filter(F.col("pid") % 200 == 0)
    brute = {(r["pid"], r["poly_id"]) for r in
             sample.crossJoin(polys)
                   .filter(F.expr("st__pip(px, py, wkt)")).collect()}
    grid = {(r["pid"], r["poly_id"]) for r in
            point_in_polygon_join(sample, polys, "px", "py", "wkt",
                                  cell_size=cell).collect()}
    assert grid == brute, (len(grid), len(brute))

    # polygon cell replication (the envelope explode factor)
    cs = cell
    env = F.expr("flatten(st__ringcoords(wkt))")
    repl = (polys.withColumn("__env", env)
            .select(((F.floor(F.expr(
                "array_max(transform(__env, v -> v.x))") / cs)
                - F.floor(F.expr(
                    "array_min(transform(__env, v -> v.x))") / cs) + 1)
                * (F.floor(F.expr(
                    "array_max(transform(__env, v -> v.y))") / cs)
                   - F.floor(F.expr(
                       "array_min(transform(__env, v -> v.y))") / cs) + 1)
                ).alias("cells"))
            .agg(F.sum("cells").alias("total"),
                 F.max("cells").alias("max")).first())

    # full-N grid join: wall + hits + candidate volume + skew probe
    t0 = time.perf_counter()
    joined = point_in_polygon_join(pts, polys, "px", "py", "wkt",
                                   cell_size=cell)
    stats = joined.groupBy(F.spark_partition_id().alias("part")) \
                  .agg(F.count(F.lit(1)).alias("rows")) \
                  .agg(F.sum("rows").alias("hits"),
                       F.max("rows").alias("peak_partition")).first()
    wall = time.perf_counter() - t0

    # candidate volume (the join before the exact filter) — same plan
    # minus the ray cast, so the delta is pure grid selectivity
    t1 = time.perf_counter()
    pt = (polys.withColumn("__env", env)
          .withColumn("__cx", F.explode(F.sequence(
              F.floor(F.expr("array_min(transform(__env, v -> v.x))") / cs),
              F.floor(F.expr("array_max(transform(__env, v -> v.x))") / cs))))
          .withColumn("__cy", F.explode(F.sequence(
              F.floor(F.expr("array_min(transform(__env, v -> v.y))") / cs),
              F.floor(F.expr("array_max(transform(__env, v -> v.y))") / cs))))
          .drop("__env"))
    cand = (pts.withColumn("__cx", F.floor(F.col("px") / cs).cast("long"))
            .withColumn("__cy", F.floor(F.col("py") / cs).cast("long"))
            .join(pt, ["__cx", "__cy"]).count())
    cand_wall = time.perf_counter() - t1

    out = {
        "n_points": n, "n_polys": p, "cell_size": cell,
        "sample_pairs_equal_bruteforce": len(grid),
        "poly_cell_replicas_total": int(repl["total"]),
        "poly_cell_replicas_max": int(repl["max"]),
        "grid_join_wall_sec": round(wall, 2),
        "hits": int(stats["hits"]),
        "peak_output_partition": int(stats["peak_partition"]),
        "candidates": int(cand),
        "candidate_stage_wall_sec": round(cand_wall, 2),
        "grid_selectivity_hits_over_candidates":
            round(stats["hits"] / max(cand, 1), 4),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
