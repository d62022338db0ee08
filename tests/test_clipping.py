"""Constructive geometry (functions/clipping.py + gateway UDFs):
Martinez–Rueda boolean overlay, buffer, and the st_intersection /
st_union / st_difference / st_symdifference / st_buffer SQL surface."""

import math
import random

import pytest

from datum_spark.functions.clipping import (
    DIFFERENCE,
    INTERSECTION,
    UNION,
    XOR,
    boolean_op,
    buffer_wkt,
    multipoly_area,
    overlay_wkt,
    parse_wkt,
    to_wkt,
)


def area(wkt):
    return multipoly_area(parse_wkt(wkt)[1])


A_SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
B_SQ = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"


def test_overlay_basic_squares():
    assert area(overlay_wkt(A_SQ, B_SQ, "intersection")) == 25.0
    assert area(overlay_wkt(A_SQ, B_SQ, "union")) == 175.0
    assert area(overlay_wkt(A_SQ, B_SQ, "difference")) == 75.0
    assert area(overlay_wkt(A_SQ, B_SQ, "symdifference")) == 150.0
    # commutativity (areas)
    assert area(overlay_wkt(B_SQ, A_SQ, "intersection")) == 25.0
    # idempotence
    assert area(overlay_wkt(A_SQ, A_SQ, "intersection")) == 100.0
    assert area(overlay_wkt(A_SQ, A_SQ, "union")) == 100.0
    assert overlay_wkt(A_SQ, A_SQ, "difference") == "POLYGON EMPTY"


def test_overlay_degenerate_touches():
    # shared full edge: intersection empty, union dissolves the edge
    d = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"
    assert overlay_wkt(A_SQ, d, "intersection") == "POLYGON EMPTY"
    u = overlay_wkt(A_SQ, d, "union")
    assert area(u) == 200.0 and u.startswith("POLYGON")
    # vertex-on-edge touch (the degenerate case that broke the naive
    # status comparator): triangle rising off the square's edge
    tri = "POLYGON ((4 10, 8 14, 2 16, 4 10))"
    assert area(overlay_wkt(A_SQ, tri, "intersection")) == 0.0
    assert abs(area(overlay_wkt(A_SQ, tri, "union"))
               - (100.0 + area(tri))) < 1e-9
    # identical polygons in MULTIPOLYGON parts
    m1 = ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
          "((30 30, 34 30, 34 34, 30 34, 30 30)))")
    m2 = ("MULTIPOLYGON (((2 2, 6 2, 6 6, 2 6, 2 2)), "
          "((30 30, 34 30, 34 34, 30 34, 30 30)))")
    assert area(overlay_wkt(m1, m2, "intersection")) == 4.0 + 16.0
    assert area(overlay_wkt(m1, m2, "union")) == 16 + 16 + 16 - 4
    # crossing exactly through a corner (float-snap case)
    r = "POLYGON ((8 2, 17 2, 17 8, 8 8, 8 2))"
    t = "POLYGON ((14 6, 5 4, 2 10, 14 6))"
    ai = area(overlay_wkt(r, t, "intersection"))
    au = area(overlay_wkt(r, t, "union"))
    assert abs(au - (54 + 30 - ai)) < 1e-9


def test_overlay_holes():
    # clip result produces a hole
    inner = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"
    holed = overlay_wkt(A_SQ, inner, "difference")
    assert area(holed) == 64.0
    assert holed.count("(") >= 3          # exterior + hole rings
    # holed INPUT clipped by a rectangle
    h = ("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), "
         "(10 10, 30 10, 30 30, 10 30, 10 10))")
    r = "POLYGON ((20 0, 60 0, 60 40, 20 40, 20 0))"
    assert area(overlay_wkt(h, r, "intersection")) == 800 - 200
    assert area(overlay_wkt(h, r, "difference")) == (1600 - 400) - 600
    # island: subtracting a ring-shaped region leaves the island intact
    ring_shape = ("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), "
                  "(10 10, 30 10, 30 30, 10 30, 10 10))")
    island = "POLYGON ((15 15, 25 15, 25 25, 15 25, 15 15))"
    u = overlay_wkt(ring_shape, island, "union")
    assert area(u) == 1200 + 100


def test_overlay_null_empty_and_errors():
    assert overlay_wkt(None, A_SQ, "intersection") is None
    assert overlay_wkt(A_SQ, None, "union") is None
    assert overlay_wkt(A_SQ, "POLYGON EMPTY", "intersection") \
        == "POLYGON EMPTY"
    assert area(overlay_wkt(A_SQ, "POLYGON EMPTY", "union")) == 100.0
    assert area(overlay_wkt(A_SQ, "POLYGON EMPTY", "difference")) == 100.0
    # line x polygon union/symdifference stay unsupported (mixed-dim
    # GEOMETRYCOLLECTION output); intersection/difference clip instead
    with pytest.raises(ValueError):
        overlay_wkt(A_SQ, "LINESTRING (0 0, 5 5)", "union")
    with pytest.raises(ValueError):
        overlay_wkt("POINT (1 1)", A_SQ, "intersection")


def test_overlay_fuzz_invariants():
    """Compact in-suite fuzz (the heavy version lives in
    scripts/fuzz_overlay.py): area identities + even-odd pointwise
    agreement on random rects/stars/holed polygons."""
    from datum_spark.functions.clipping import _pip_multipoly

    rng = random.Random(4242)

    def rect():
        x1, y1 = rng.uniform(0, 50), rng.uniform(0, 50)
        w, h = rng.uniform(1, 40), rng.uniform(1, 40)
        return [[[(x1, y1), (x1 + w, y1), (x1 + w, y1 + h),
                  (x1, y1 + h), (x1, y1)]]]

    def star(n):
        cx, cy = rng.uniform(10, 60), rng.uniform(10, 60)
        step = 2 * math.pi / n
        pts = []
        for i in range(n):
            a = i * step + rng.uniform(-0.45, 0.45) * step
            r = rng.uniform(3, 25)
            pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
        return [[pts + [pts[0]]]]

    def geom():
        return rect() if rng.random() < 0.5 else star(rng.randint(4, 10))

    for _ in range(60):
        a, b = geom(), geom()
        aa, ab = multipoly_area(a), multipoly_area(b)
        i = boolean_op(a, b, INTERSECTION)
        u = boolean_op(a, b, UNION)
        d = boolean_op(a, b, DIFFERENCE)
        x = boolean_op(a, b, XOR)
        ai, au, ad, ax = map(multipoly_area, (i, u, d, x))
        tol = 1e-6 * max(aa, ab, 1.0)
        assert abs(ai + ad - aa) < tol
        assert abs(au - (aa + ab - ai)) < tol
        assert abs(ax - (au - ai)) < tol
        for gx in range(5, 80, 23):
            for gy in range(5, 80, 23):
                p = (gx + 0.123456, gy + 0.654321)
                in_a, in_b = _pip_multipoly(p, a), _pip_multipoly(p, b)
                assert _pip_multipoly(p, i) == (in_a and in_b)
                assert _pip_multipoly(p, u) == (in_a or in_b)
                assert _pip_multipoly(p, d) == (in_a and not in_b)


def test_buffer_point_line_polygon():
    # point: 32-gon disc, area = (n/2) r^2 sin(2pi/n)
    r = 2.0
    got = area(buffer_wkt("POINT (3 4)", r))
    want = 16 * r * r * math.sin(math.pi / 16)
    assert abs(got - want) < 1e-9
    # negative point buffer: empty
    assert buffer_wkt("POINT (3 4)", -1.0) == "POLYGON EMPTY"
    # line capsule ~ 2*r*len + pi r^2 (32-gon caps slightly smaller)
    lb = area(buffer_wkt("LINESTRING (0 0, 10 0)", 1.0))
    assert 2 * 10 * 1.0 + 0.95 * math.pi < lb <= 2 * 10 * 1.0 + math.pi
    # polygon positive: area + perimeter*r + (pi r^2 corners)
    pb = area(buffer_wkt(A_SQ, 1.0))
    assert 100 + 40 + 0.95 * math.pi < pb <= 100 + 40 + math.pi + 1e-9
    # polygon negative: exact erosion of a rectangle
    assert abs(area(buffer_wkt(A_SQ, -2.0)) - 36.0) < 1e-9
    # erosion past collapse: empty
    assert area(buffer_wkt(A_SQ, -6.0)) == 0.0
    # buffered polygon contains the original's vertices strictly
    grown = parse_wkt(buffer_wkt(A_SQ, 1.0))[1]
    from datum_spark.functions.clipping import _pip_multipoly

    for v in [(0.0, 0.0), (10.0, 10.0), (5.0, 5.0)]:
        assert _pip_multipoly(v, grown)


def test_wkt_roundtrip_structures():
    kind, mp = parse_wkt("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
                         "(1 1, 2 1, 2 2, 1 2, 1 1)), "
                         "((8 8, 9 8, 9 9, 8 9, 8 8)))")
    assert kind == "polygon"
    assert [len(p) for p in mp] == [2, 1]
    w = to_wkt(mp)
    assert w.startswith("MULTIPOLYGON") and area(w) == (16 - 1) + 1


def test_overlay_sql_gateway(spark):
    from datum_spark.functions.geometry_sql import (
        register_geometry_sql_functions)

    register_geometry_sql_functions(spark)
    [r] = spark.sql(f"""
        SELECT st_area(st_intersection('{A_SQ}', '{B_SQ}')) AS i,
               st_area(st_union('{A_SQ}', '{B_SQ}')) AS u,
               st_area(st_difference('{A_SQ}', '{B_SQ}')) AS d,
               st_area(st_symdifference('{A_SQ}', '{B_SQ}')) AS x,
               st_area(st_buffer('POINT (0 0)', 2.0)) AS bp,
               st_area(st_buffer('{A_SQ}', -2.0)) AS bn,
               st_intersection(NULL, '{A_SQ}') AS nul,
               st_geometrytype(st_intersection('{A_SQ}', '{B_SQ}')) AS t
    """).collect()
    assert r["i"] == 25.0 and r["u"] == 175.0
    assert r["d"] == 75.0 and r["x"] == 150.0
    assert abs(r["bp"] - 16 * 4 * math.sin(math.pi / 16)) < 1e-9
    assert abs(r["bn"] - 36.0) < 1e-9
    assert r["nul"] is None and r["t"] == "POLYGON"
    # composition with predicates: the eroded square is inside the square
    [c] = spark.sql(f"""
        SELECT st_within(st_buffer('{A_SQ}', -2.0), '{A_SQ}') AS w
    """).collect()
    assert c["w"] is True


def _line_len(w):
    total = 0.0
    k, lines = parse_wkt(w)
    if k == "empty":
        return 0.0
    for ln in lines:
        for i in range(len(ln) - 1):
            total += math.hypot(ln[i + 1][0] - ln[i][0],
                                ln[i + 1][1] - ln[i][1])
    return total


def test_line_clipping():
    sq = A_SQ
    d = overlay_wkt("LINESTRING (-5 -5, 15 15)", sq, "intersection")
    assert abs(_line_len(d) - 10 * math.sqrt(2)) < 1e-9
    # in/out/in -> MULTILINESTRING, both pieces
    z = overlay_wkt("LINESTRING (-5 5, 15 5, 15 8, -5 8)", sq,
                    "intersection")
    assert z.startswith("MULTILINESTRING") and abs(_line_len(z) - 20) < 1e-9
    # difference keeps the outside
    df = overlay_wkt("LINESTRING (-5 5, 15 5)", sq, "difference")
    assert abs(_line_len(df) - 10.0) < 1e-9
    # hole interrupts the line
    h = ("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), "
         "(10 10, 30 10, 30 30, 10 30, 10 10))")
    hi = overlay_wkt("LINESTRING (-10 20, 50 20)", h, "intersection")
    assert abs(_line_len(hi) - 20.0) < 1e-9
    # boundary-riding line counts as inside; fully-outside is EMPTY
    assert abs(_line_len(overlay_wkt("LINESTRING (0 0, 10 0)", sq,
                                     "intersection")) - 10) < 1e-9
    assert overlay_wkt("LINESTRING (20 20, 30 30)", sq,
                       "intersection") == "LINESTRING EMPTY"
    # operand order: polygon x line intersection also clips
    assert abs(_line_len(overlay_wkt(sq, "LINESTRING (-5 5, 15 5)",
                                     "intersection")) - 10) < 1e-9


def test_line_clipping_fuzz_length_identity():
    """len(line ∩ poly) + len(line ∖ poly) == len(line) over random
    polylines vs rects and holed polygons."""
    rng = random.Random(99)
    for _ in range(120):
        pts = [(rng.uniform(-10, 50), rng.uniform(-10, 50))
               for _ in range(rng.randint(2, 6))]
        lw = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
        x1, y1 = rng.randint(0, 20), rng.randint(0, 20)
        w, h = rng.randint(5, 25), rng.randint(5, 25)
        if rng.random() < 0.5:
            pw = (f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h}, "
                  f"{x1} {y1+h}, {x1} {y1}))")
        else:
            hx, hy, hw, hh = x1 + w // 4, y1 + h // 4, w // 2, h // 2
            pw = (f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h}, "
                  f"{x1} {y1+h}, {x1} {y1}), "
                  f"({hx} {hy}, {hx+hw} {hy}, {hx+hw} {hy+hh}, "
                  f"{hx} {hy+hh}, {hx} {hy}))")
        li = _line_len(overlay_wkt(lw, pw, "intersection"))
        lo = _line_len(overlay_wkt(lw, pw, "difference"))
        lt = _line_len(lw)
        assert abs(li + lo - lt) < 1e-6 * max(lt, 1.0), (lw, pw)


# -- validity: ST_IsValid / ST_MakeValid -------------------------------------


VALIDITY_CASES = [
    # (name, wkt, expect_valid, expected even-odd area after makevalid)
    ("valid_square", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", True, 100.0),
    ("bowtie", "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))", False, 50.0),
    ("holed", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
              "(2 2, 4 2, 4 4, 2 4, 2 2))", True, 96.0),
    ("self_touch", "POLYGON ((0 0, 4 0, 2 2, 4 4, 0 4, 2 2, 0 0))",
     False, 8.0),
    ("spike", "POLYGON ((0 0, 10 0, 10 10, 5 10, 5 15, 5 10, 0 10, 0 0))",
     False, 100.0),
    ("overlapping_shells",
     "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
     "((2 2, 6 2, 6 6, 2 6, 2 2)))", False, 24.0),
    ("double_wound",
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0, 4 0, 4 4, 0 4, 0 0))",
     False, 0.0),
    ("hole_outside",
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
     "(10 10, 11 10, 11 11, 10 11, 10 10))", False, 17.0),
    ("valid_multi",
     "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
     "((10 10, 14 10, 14 14, 10 14, 10 10)))", True, 32.0),
]


def test_is_valid_and_make_valid_fixtures():
    from datum_spark.functions.clipping import (
        is_valid_wkt, make_valid_wkt, parse_wkt, multipoly_area)

    for name, wkt, exp_valid, exp_area in VALIDITY_CASES:
        valid, reason = is_valid_wkt(wkt)
        assert valid == exp_valid, (name, reason)
        mv = make_valid_wkt(wkt)
        assert is_valid_wkt(mv)[0], (name, mv)
        got = multipoly_area(parse_wkt(mv)[1])
        assert got == pytest.approx(exp_area, abs=1e-9), (name, got)
        if exp_valid:                     # valid input passes through
            assert mv == wkt, name


def test_validity_non_polygons_and_null():
    from datum_spark.functions.clipping import is_valid_wkt, make_valid_wkt

    assert is_valid_wkt("POINT (3 4)") == (True, None)
    assert is_valid_wkt("LINESTRING (0 0, 5 5)") == (True, None)
    assert is_valid_wkt(None) == (None, None)
    assert make_valid_wkt(None) is None
    assert make_valid_wkt("POINT (3 4)") == "POINT (3 4)"
    assert is_valid_wkt("POLYGON ((0 0, 1 0, 0 0))")[1] == "too few points"


def test_make_valid_fuzz_invariants():
    """Random self-intersecting star rings: makevalid output is always
    valid, has non-negative area bounded by the coordinate box, and is
    idempotent (already-valid output round-trips unchanged)."""
    import random

    from datum_spark.functions.clipping import (
        is_valid_wkt, make_valid_wkt, parse_wkt, multipoly_area)

    rng = random.Random(83)
    for trial in range(150):
        n = rng.randint(4, 9)
        pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(n)]
        if len(set(pts)) < 3:
            continue
        ring = ", ".join(f"{x} {y}" for x, y in pts + [pts[0]])
        wkt = f"POLYGON (({ring}))"
        mv = make_valid_wkt(wkt)
        ok, reason = is_valid_wkt(mv)
        assert ok, (trial, wkt, mv, reason)
        if "EMPTY" not in mv:
            a = multipoly_area(parse_wkt(mv)[1])
            assert 0 <= a <= 400, (trial, wkt, a)
            assert make_valid_wkt(mv) == mv, (trial, mv)


def test_make_valid_passthrough_unmodeled_types():
    from datum_spark.functions.clipping import is_valid_wkt, make_valid_wkt

    gc = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
    assert make_valid_wkt(gc) == gc       # never raises on a bad row
    ok, reason = is_valid_wkt(gc)
    assert ok is False and "unsupported" in reason
