"""Deep fuzz for the boolean-overlay core (functions/clipping.py).

Three batteries, pure Python (no Spark):

1. float polygons (rects / star-shaped / holed): area identities
   area(A∩B)+area(A\\B)=area(A), area(A∪B)=area(A)+area(B)-area(A∩B),
   area(A⊕B)=area(A∪B)-area(A∩B), commutativity, plus even-odd
   pointwise agreement on an offset grid;
2. integer-grid polygons (rects / triangles / shared multiparts):
   maximally degenerate — shared edges, vertex-on-edge touches,
   identical parts, corner-exact crossings — exact (1e-9) identities;
3. buffer invariants: disc area closed-form, rectangle erosion exact,
   growth bounds.

Run: python scripts/fuzz_overlay.py [n_float] [n_int]
Exits non-zero on any failure.
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datum_spark.functions.clipping import (  # noqa: E402
    DIFFERENCE,
    INTERSECTION,
    UNION,
    XOR,
    _pip_multipoly,
    boolean_op,
    buffer_wkt,
    multipoly_area,
    parse_wkt,
)


def float_battery(n, rng):
    def rect():
        x1, y1 = rng.uniform(0, 50), rng.uniform(0, 50)
        w, h = rng.uniform(1, 40), rng.uniform(1, 40)
        return [[[(x1, y1), (x1 + w, y1), (x1 + w, y1 + h),
                  (x1, y1 + h), (x1, y1)]]]

    def star(k):
        cx, cy = rng.uniform(10, 60), rng.uniform(10, 60)
        step = 2 * math.pi / k
        pts = []
        for i in range(k):
            a = i * step + rng.uniform(-0.45, 0.45) * step
            r = rng.uniform(3, 25)
            pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
        return [[pts + [pts[0]]]]

    def holed():
        x1, y1 = rng.uniform(0, 30), rng.uniform(0, 30)
        w, h = rng.uniform(15, 40), rng.uniform(15, 40)
        hx, hy = x1 + w * 0.25, y1 + h * 0.25
        return [[[(x1, y1), (x1 + w, y1), (x1 + w, y1 + h),
                  (x1, y1 + h), (x1, y1)],
                 [(hx, hy), (hx + w * 0.4, hy), (hx + w * 0.4, hy + h * 0.4),
                  (hx, hy + h * 0.4), (hx, hy)]]]

    def geom():
        r = rng.random()
        if r < 0.3:
            return rect()
        if r < 0.65:
            return star(rng.randint(4, 12))
        return holed()

    fails = 0
    for _ in range(n):
        a, b = geom(), geom()
        fails += not check(a, b, tol_rel=1e-6)
    return fails


def int_battery(n, rng):
    def rect():
        x1, y1 = rng.randint(0, 12), rng.randint(0, 12)
        w, h = rng.randint(1, 10), rng.randint(1, 10)
        return [[[(x1, y1), (x1 + w, y1), (x1 + w, y1 + h),
                  (x1, y1 + h), (x1, y1)]]]

    def tri():
        while True:
            pts = [(rng.randint(0, 15), rng.randint(0, 15))
                   for _ in range(3)]
            cr = ((pts[1][0] - pts[0][0]) * (pts[2][1] - pts[0][1])
                  - (pts[1][1] - pts[0][1]) * (pts[2][0] - pts[0][0]))
            if cr != 0:
                return [[pts + [pts[0]]]]

    def geom():
        g = rect() if rng.random() < 0.6 else tri()
        if rng.random() < 0.3:
            g = g + [[[(30, 30), (34, 30), (34, 34), (30, 34), (30, 30)]]]
        return g

    fails = 0
    for _ in range(n):
        fails += not check(geom(), geom(), tol_rel=0.0)
    return fails


def check(a, b, tol_rel):
    aa, ab = multipoly_area(a), multipoly_area(b)
    i = boolean_op(a, b, INTERSECTION)
    u = boolean_op(a, b, UNION)
    d = boolean_op(a, b, DIFFERENCE)
    x = boolean_op(a, b, XOR)
    ai, au, ad, ax = map(multipoly_area, (i, u, d, x))
    tol = max(1e-9, tol_rel * max(aa, ab, 1.0))
    if not (abs(ai + ad - aa) < tol and abs(au - (aa + ab - ai)) < tol
            and abs(ax - (au - ai)) < tol):
        return False
    if abs(ai - multipoly_area(boolean_op(b, a, INTERSECTION))) >= tol:
        return False
    for gx in range(2, 80, 13):
        for gy in range(2, 80, 13):
            p = (gx + 0.123456, gy + 0.654321)
            in_a, in_b = _pip_multipoly(p, a), _pip_multipoly(p, b)
            if (_pip_multipoly(p, i) != (in_a and in_b)
                    or _pip_multipoly(p, u) != (in_a or in_b)
                    or _pip_multipoly(p, d) != (in_a and not in_b)
                    or _pip_multipoly(p, x) != (in_a != in_b)):
                return False
    return True


def buffer_battery(n, rng):
    fails = 0
    for _ in range(n):
        x1, y1 = rng.randint(0, 12), rng.randint(0, 12)
        w, h = rng.randint(3, 10), rng.randint(3, 10)
        wkt = (f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h}, "
               f"{x1} {y1+h}, {x1} {y1}))")
        r = rng.choice([0.5, 1.0, 1.5])
        ap = multipoly_area(parse_wkt(buffer_wkt(wkt, r))[1])
        an = multipoly_area(parse_wkt(buffer_wkt(wkt, -r))[1])
        a0 = w * h
        lo = a0 + 2 * (w + h) * r + math.pi * r * r * 0.97
        hi = a0 + 2 * (w + h) * r + math.pi * r * r
        exact = max(0, w - 2 * r) * max(0, h - 2 * r)
        if not (lo - 1e-6 <= ap <= hi + 1e-6 and abs(an - exact) < 1e-6):
            fails += 1
    return fails


def line_battery(n, rng):
    """len(line ∩ poly) + len(line ∖ poly) == len(line)."""
    import math as m

    from datum_spark.functions.clipping import overlay_wkt

    def llen(w):
        total = 0.0
        k, lines = parse_wkt(w)
        if k == "empty":
            return 0.0
        for ln in lines:
            for i in range(len(ln) - 1):
                total += m.hypot(ln[i + 1][0] - ln[i][0],
                                 ln[i + 1][1] - ln[i][1])
        return total

    fails = 0
    for _ in range(n):
        pts = [(rng.uniform(-10, 50), rng.uniform(-10, 50))
               for _ in range(rng.randint(2, 6))]
        lw = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
        x1, y1 = rng.randint(0, 20), rng.randint(0, 20)
        w, h = rng.randint(5, 25), rng.randint(5, 25)
        pw = (f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h}, "
              f"{x1} {y1+h}, {x1} {y1}))")
        li = llen(overlay_wkt(lw, pw, "intersection"))
        lo = llen(overlay_wkt(lw, pw, "difference"))
        lt = llen(lw)
        if abs(li + lo - lt) >= 1e-6 * max(lt, 1.0):
            fails += 1
    return fails


def main():
    n_float = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    n_int = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    rng = random.Random(20260814)
    f1 = float_battery(n_float, rng)
    f2 = int_battery(n_int, rng)
    f3 = buffer_battery(100, rng)
    f4 = line_battery(300, rng)
    print(f"float: {n_float - f1}/{n_float} clean; "
          f"int: {n_int - f2}/{n_int} clean; buffer: {100 - f3}/100 clean; "
          f"lines: {300 - f4}/300 clean")
    return 1 if (f1 or f2 or f3 or f4) else 0


if __name__ == "__main__":
    sys.exit(main())
