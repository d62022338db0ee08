"""PostGIS-style ST_* functions for the raw-SQL gateway, on WKT strings.

Reference users wrote ``ST_AsText``/``ST_X``/… inside ``where=`` fragments
and ``db.execute`` statements, delegated to PostGIS (SURVEY §2-B).  Here
they are Spark *SQL scalar UDFs* (``CREATE FUNCTION … RETURN <expr>``) —
pure catalyst expressions, JVM-side and codegen-friendly, NOT Python UDFs.
Geometry stays WKT text end-to-end, matching the engine's storage model
(the reference itself stores geom as text, ``datum/postgis/database.py:
83-88``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_COORD = r"-?[0-9.eE+]+"

# name -> (signature, body expression over the args)
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # identity boundary functions: WKT already IS the text form
    "st_astext": ("(w STRING)", "STRING", "w"),
    "st_geomfromtext": ("(w STRING)", "STRING", "w"),
    # try_cast: regexp_extract yields '' on non-POINT rows, and an ANSI-mode
    # CAST('' AS DOUBLE) throws instead of returning NULL
    "st_x": ("(w STRING)", "DOUBLE",
             f"try_cast(regexp_extract(w, 'POINT \\\\(\\\\s*({_COORD})', 1) "
             "AS DOUBLE)"),
    "st_y": ("(w STRING)", "DOUBLE",
             f"try_cast(regexp_extract(w, 'POINT \\\\(\\\\s*{_COORD}\\\\s+"
             f"({_COORD})', 1) AS DOUBLE)"),
    "st_isempty": ("(w STRING)", "BOOLEAN", "upper(w) LIKE '%EMPTY%'"),
    "st_geometrytype": ("(w STRING)", "STRING",
                        "upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1))"),
    "st_npoints": ("(w STRING)", "INT",
                   f"size(regexp_extract_all(w, '({_COORD}\\\\s+{_COORD})',"
                   " 1))"),
    "st_multi": ("(w STRING)", "STRING",
                 "CASE WHEN w IS NULL OR upper(trim(w)) LIKE 'MULTI%' "
                 "     OR upper(w) LIKE '%EMPTY%' THEN w "
                 "ELSE concat('MULTI', "
                 "            upper(regexp_extract(trim(w), '^([A-Za-z]+)',"
                 " 1)), "
                 "            ' (', trim(regexp_replace(trim(w), "
                 "'^[A-Za-z]+\\\\s*', '')), ')') END"),
}


def _coords(var: str) -> str:
    """SQL expression: WKT coordinate pairs of ``var`` as
    ``array<struct<x double, y double>>`` (vertex order preserved)."""
    pair = f"({_COORD}\\\\s+{_COORD})"
    return (
        f"transform(regexp_extract_all({var}, '{pair}', 1), "
        "s -> named_struct("
        "'x', try_cast(element_at(split(s, '\\\\s+'), 1) AS DOUBLE), "
        "'y', try_cast(element_at(split(s, '\\\\s+'), 2) AS DOUBLE)))"
    )


# bbox accessors: min/max over every coordinate pair of any WKT kind
# (PostGIS ST_XMin family).  Empty/vertex-free input -> NULL.  The
# extent AGGREGATE composes in plain SQL —
# st_makeenvelope(MIN(st_xmin(g)), ..., MAX(st_ymax(g))) — keeping the
# reduction a JVM min/max, never a geometry fold.
for _n, _ax, _fn in (("st_xmin", "x", "array_min"),
                     ("st_ymin", "y", "array_min"),
                     ("st_xmax", "x", "array_max"),
                     ("st_ymax", "y", "array_max")):
    _FUNCTIONS[_n] = (
        "(w STRING)", "DOUBLE",
        f"{_fn}(transform({_coords('w')}, p -> p.{_ax}))")
_FUNCTIONS["st_makeenvelope"] = (
    "(x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE)", "STRING",
    "concat('POLYGON ((', x1, ' ', y1, ', ', x2, ' ', y1, ', ', "
    "x2, ' ', y2, ', ', x1, ' ', y2, ', ', x1, ' ', y1, '))')")
# ST_Collect over an array (compose with collect_list/array_agg): an
# all-POINT input assembles a MULTIPOINT, anything else a
# GEOMETRYCOLLECTION of the members verbatim
_FUNCTIONS["st_collect"] = (
    "(arr ARRAY<STRING>)", "STRING",
    "CASE WHEN arr IS NULL THEN NULL "
    "WHEN size(arr) = 0 THEN 'GEOMETRYCOLLECTION EMPTY' "
    "WHEN size(filter(arr, g -> upper(trim(g)) NOT LIKE 'POINT (%'))"
    " = 0 THEN concat('MULTIPOINT (', array_join(transform(arr, "
    "g -> concat('(', regexp_extract(g, '\\\\(\\\\s*(.*?)\\\\s*\\\\)',"
    " 1), ')')), ', '), ')') "
    "ELSE concat('GEOMETRYCOLLECTION (', "
    "array_join(transform(arr, g -> trim(g)), ', '), ')') END")


# ST_GeoHash (PostGIS parity: encode a POINT to the base-32 geohash,
# `maxchars` characters).  Pure Catalyst: a fold over the 5*prec bits —
# even bits halve the longitude interval, odd bits the latitude, every
# 5th bit flushes a base-32 char.  The inner transform-over-1-element-
# array is SQL's let-binding: it names the bit-updated struct `t` so
# the flush branch need not recompute it.  Row-local, zero shuffle; at
# scale this is the cheap spatial BUCKETING key (prefix-join geohashes
# instead of the envelope grid when cells can be fixed-size).
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_expr(lon: str, lat: str, prec: str) -> str:
    bit = (f"IF(i % 2 = 0, IF({lon} >= (s.lo1+s.hi1)/2D, 1, 0), "
           f"IF({lat} >= (s.lo2+s.hi2)/2D, 1, 0))")
    step = (
        "named_struct("
        f"'lo1', IF(i % 2 = 0 AND {lon} >= (s.lo1+s.hi1)/2D, "
        "(s.lo1+s.hi1)/2D, s.lo1), "
        f"'hi1', IF(i % 2 = 0 AND {lon} < (s.lo1+s.hi1)/2D, "
        "(s.lo1+s.hi1)/2D, s.hi1), "
        f"'lo2', IF(i % 2 = 1 AND {lat} >= (s.lo2+s.hi2)/2D, "
        "(s.lo2+s.hi2)/2D, s.lo2), "
        f"'hi2', IF(i % 2 = 1 AND {lat} < (s.lo2+s.hi2)/2D, "
        "(s.lo2+s.hi2)/2D, s.hi2), "
        f"'acc', s.acc * 2 + {bit}, "
        "'out', s.out)")
    flush = (
        "CASE WHEN i % 5 = 4 THEN named_struct("
        "'lo1', t.lo1, 'hi1', t.hi1, 'lo2', t.lo2, 'hi2', t.hi2, "
        "'acc', 0, "
        f"'out', concat(t.out, substring('{_GH_ALPHABET}', t.acc + 1, 1)))"
        " ELSE t END")
    return (
        f"aggregate(sequence(0, greatest(least({prec}, 20), 1) * 5 - 1), "
        "named_struct('lo1', CAST(-180 AS DOUBLE), "
        "'hi1', CAST(180 AS DOUBLE), 'lo2', CAST(-90 AS DOUBLE), "
        "'hi2', CAST(90 AS DOUBLE), 'acc', 0, 'out', ''), "
        f"(s, i) -> element_at(transform(array({step}), t -> {flush}), 1),"
        " s -> s.out)")


# the point's lon/lat are bound ONCE via nested transform-lets (a
# repeated regex per bit would triple the per-row cost — measured 67k
# -> 156k rows/s on the 2M-point probe)
_FUNCTIONS["st_geohash"] = (
    "(w STRING, prec INT)", "STRING",
    "CASE WHEN w IS NULL OR prec IS NULL THEN NULL ELSE "
    "element_at(transform(array(named_struct("
    f"'lon', try_cast(regexp_extract(w, '({_COORD})\\\\s+{_COORD}', 1) "
    "AS DOUBLE), "
    f"'lat', try_cast(regexp_extract(w, '{_COORD}\\\\s+({_COORD})', 1) "
    "AS DOUBLE))), pt -> CASE WHEN pt.lon IS NULL OR pt.lat IS NULL "
    "THEN NULL ELSE "
    + _geohash_expr("pt.lon", "pt.lat", "prec")
    + " END), 1) END")




def _seg_fold(var: str, seg_expr: str, init: str = "0D") -> str:
    """Fold ``seg_expr`` (a lambda over consecutive vertices p, q) across
    the vertex list of ``var``."""
    c = _coords(var)
    return (
        f"CASE WHEN size({c}) < 2 THEN 0D ELSE "
        f"aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        f"slice({c}, 2, size({c}) - 1), (p, q) -> {seg_expr}), "
        f"{init}, (acc, v) -> acc + v) END"
    )


# Cartesian measures on WKT (planar, in the geometry's own unit — the same
# semantics PostGIS gives for projected CRS like the reference's 2272).
_FUNCTIONS.update({
    "st_makepoint": ("(x DOUBLE, y DOUBLE)", "STRING",
                     "concat('POINT (', x, ' ', y, ')')"),
    "st_point": ("(x DOUBLE, y DOUBLE)", "STRING",
                 "concat('POINT (', x, ' ', y, ')')"),
    # point-to-point distance (the reference's use: station-to-parcel
    # checks in projected feet)
    "st_distance": (
        "(a STRING, b STRING)", "DOUBLE",
        "sqrt(power("
        f"try_cast(regexp_extract(a, 'POINT \\\\(\\\\s*({_COORD})', 1) "
        "AS DOUBLE) - "
        f"try_cast(regexp_extract(b, 'POINT \\\\(\\\\s*({_COORD})', 1) "
        "AS DOUBLE), 2) + power("
        f"try_cast(regexp_extract(a, 'POINT \\\\(\\\\s*{_COORD}\\\\s+"
        f"({_COORD})', 1) AS DOUBLE) - "
        f"try_cast(regexp_extract(b, 'POINT \\\\(\\\\s*{_COORD}\\\\s+"
        f"({_COORD})', 1) AS DOUBLE), 2))"),
    "st_dwithin": (
        "(a STRING, b STRING, d DOUBLE)", "BOOLEAN",
        "st_distance(a, b) <= d"),
    # sum of segment lengths over the vertex list (LINESTRING length /
    # single-ring POLYGON perimeter)
    "st_length": ("(w STRING)", "DOUBLE",
                  _seg_fold("w", "sqrt(power(q.x - p.x, 2) "
                                 "+ power(q.y - p.y, 2))")),
    "st_perimeter": ("(w STRING)", "DOUBLE",
                     _seg_fold("w", "sqrt(power(q.x - p.x, 2) "
                                    "+ power(q.y - p.y, 2))")),
    # ring-aware shoelace (round 7): WKT parts split on ')),((' — per
    # part, the FIRST ring is the exterior (WKT spec) and later rings
    # are holes, so area = Σ_parts (|shoelace(outer)| − Σ|shoelace(hole)|);
    # MULTIPOLYGON parts sum, non-area types are 0 (PostGIS semantics)
    "st_area": ("(w STRING)", "DOUBLE", None),  # body built below
    # vertex-mean centroid — EXACT for POINT/MULTIPOINT (PostGIS
    # semantics); NULL for measure-weighted types (line/polygon centroids
    # need a real geometry library)
    "st_centroid": (
        "(w STRING)", "STRING",
        "CASE WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
        "NOT IN ('POINT', 'MULTIPOINT') THEN NULL "
        f"WHEN size({_coords('w')}) = 0 THEN NULL ELSE "
        f"concat('POINT (', "
        f"aggregate(transform({_coords('w')}, p -> p.x), 0D, "
        f"(a, v) -> a + v) / size({_coords('w')}), ' ', "
        f"aggregate(transform({_coords('w')}, p -> p.y), 0D, "
        f"(a, v) -> a + v) / size({_coords('w')}), ')') END"),
    "st_envelope": (
        "(w STRING)", "STRING",
        f"CASE WHEN size({_coords('w')}) = 0 THEN NULL ELSE "
        "concat('POLYGON ((', "
        f"array_min(transform({_coords('w')}, p -> p.x)), ' ', "
        f"array_min(transform({_coords('w')}, p -> p.y)), ', ', "
        f"array_max(transform({_coords('w')}, p -> p.x)), ' ', "
        f"array_min(transform({_coords('w')}, p -> p.y)), ', ', "
        f"array_max(transform({_coords('w')}, p -> p.x)), ' ', "
        f"array_max(transform({_coords('w')}, p -> p.y)), ', ', "
        f"array_min(transform({_coords('w')}, p -> p.x)), ' ', "
        f"array_max(transform({_coords('w')}, p -> p.y)), ', ', "
        f"array_min(transform({_coords('w')}, p -> p.x)), ' ', "
        f"array_min(transform({_coords('w')}, p -> p.y)), '))') END"),
})


def _ring_shoelace(var: str) -> str:
    """SQL expr: |shoelace| / 2 of one ring's coordinate string."""
    c = _coords(var)
    return (
        f"(CASE WHEN size({c}) < 2 THEN 0D ELSE "
        f"abs(aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        f"slice({c}, 2, size({c}) - 1), "
        "(__p, __q) -> __p.x * __q.y - __q.x * __p.y), "
        "0D, (__a, __v) -> __a + __v)) / 2 END)")


# WKT parts: split on ')),((' — each element then strips its leftover
# outer parens; within a part, ring 0 is the exterior, later rings holes
_AREA_PARTS = ("split(regexp_replace(trim(w), '^[A-Za-z]+\\\\s*', ''), "
               "'\\\\)\\\\)\\\\s*,\\\\s*\\\\(\\\\(')")
_FUNCTIONS["st_area"] = (
    "(w STRING)", "DOUBLE",
    "CASE WHEN w IS NULL THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN 0D "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "NOT IN ('POLYGON', 'MULTIPOLYGON') THEN 0D "
    f"ELSE aggregate({_AREA_PARTS}, 0D, (__accp, __part) -> __accp + "
    "aggregate(transform("
    "split(regexp_replace(__part, '^\\\\(+|\\\\)+$', ''), "
    "'\\\\)\\\\s*,\\\\s*\\\\('), "
    f"(__ring, __ri) -> CASE WHEN __ri = 0 THEN {_ring_shoelace('__ring')} "
    f"ELSE -{_ring_shoelace('__ring')} END), "
    "0D, (__a2, __v2) -> __a2 + __v2)) END")


_RING_BODY = r"\\(([^()]+)\\)"     # innermost parens = one ring's coords


def _ring_seglen(var: str) -> str:
    """SQL expr: sum of segment lengths of one ring's coord string."""
    c = _coords(var)
    return (
        f"(CASE WHEN size({c}) < 2 THEN 0D ELSE "
        f"aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        f"slice({c}, 2, size({c}) - 1), "
        "(__p, __q) -> sqrt(power(__q.x - __p.x, 2) "
        "+ power(__q.y - __p.y, 2))), "
        "0D, (__a, __v) -> __a + __v) END)")


# ring-aware length/perimeter (round 7): fold segments PER RING — the
# flat-vertex-list fold added a phantom segment between consecutive
# rings of a holed POLYGON / parts of a MULTI geometry.  PostGIS
# semantics: perimeter includes interior-ring boundaries; length of a
# MULTILINESTRING is the sum of its lines.
_PER_RING_LEN = (
    "CASE WHEN w IS NULL THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN 0D "
    f"ELSE aggregate(regexp_extract_all(w, '{_RING_BODY}', 1), 0D, "
    f"(__accr, __ring) -> __accr + {_ring_seglen('__ring')}) END")
_FUNCTIONS["st_length"] = ("(w STRING)", "DOUBLE", _PER_RING_LEN)
_FUNCTIONS["st_perimeter"] = ("(w STRING)", "DOUBLE", _PER_RING_LEN)


def _ring_cstats(var: str) -> str:
    """SQL expr: one ring's shoelace stats as a struct —
    ``cr`` = Σ cross products (2 × signed area),
    ``tx``/``ty`` = Σ (coordsum × cross) (6 × signed-area-weighted
    centroid numerators)."""
    c = _coords(var)
    z = "named_struct('cr', 0D, 'tx', 0D, 'ty', 0D)"
    return (
        f"(CASE WHEN size({c}) < 3 THEN {z} ELSE "
        f"aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        f"slice({c}, 2, size({c}) - 1), "
        "(__p, __q) -> named_struct("
        "'cr', __p.x * __q.y - __q.x * __p.y, "
        "'tx', (__p.x + __q.x) * (__p.x * __q.y - __q.x * __p.y), "
        "'ty', (__p.y + __q.y) * (__p.x * __q.y - __q.x * __p.y))), "
        f"{z}, (__a, __v) -> named_struct('cr', __a.cr + __v.cr, "
        "'tx', __a.tx + __v.tx, 'ty', __a.ty + __v.ty)) END)")


def _ring_lstats(var: str) -> str:
    """SQL expr: one polyline's length stats as a struct — ``ln`` total
    length, ``lx``/``ly`` = Σ (segment midpoint × segment length)."""
    c = _coords(var)
    z = "named_struct('ln', 0D, 'lx', 0D, 'ly', 0D)"
    seg = ("sqrt(power(__q.x - __p.x, 2) + power(__q.y - __p.y, 2))")
    return (
        f"(CASE WHEN size({c}) < 2 THEN {z} ELSE "
        f"aggregate(zip_with(slice({c}, 1, size({c}) - 1), "
        f"slice({c}, 2, size({c}) - 1), "
        f"(__p, __q) -> named_struct('ln', {seg}, "
        f"'lx', (__p.x + __q.x) / 2 * {seg}, "
        f"'ly', (__p.y + __q.y) / 2 * {seg})), "
        f"{z}, (__a, __v) -> named_struct('ln', __a.ln + __v.ln, "
        "'lx', __a.lx + __v.lx, 'ly', __a.ly + __v.ly)) END)")


# area-weighted polygon centroid: per ring, centroid × |area| =
# (t / 6) × sign(cr); holes subtract both numerator and area; parts sum.
# Length-weighted for line types, vertex mean for point types (all
# PostGIS semantics).
_CENT_Z = "named_struct('wx', 0D, 'wy', 0D, 'ar', 0D)"
_CENT_RING = (
    f"aggregate(transform(split(regexp_replace(__part, "
    "'^\\\\(+|\\\\)+$', ''), '\\\\)\\\\s*,\\\\s*\\\\('), "
    "(__ring, __ri) -> named_struct("
    f"'st', {_ring_cstats('__ring')}, "
    "'sg', CASE WHEN __ri = 0 THEN 1D ELSE -1D END)), "
    f"{_CENT_Z}, (__ac, __r) -> named_struct("
    "'wx', __ac.wx + __r.sg * (__r.st.tx / 6) * "
    "CASE WHEN __r.st.cr >= 0 THEN 1D ELSE -1D END, "
    "'wy', __ac.wy + __r.sg * (__r.st.ty / 6) * "
    "CASE WHEN __r.st.cr >= 0 THEN 1D ELSE -1D END, "
    "'ar', __ac.ar + __r.sg * abs(__r.st.cr) / 2))")
_CENT_POLY = (
    f"aggregate({_AREA_PARTS}, {_CENT_Z}, (__acc, __part) -> "
    f"named_struct("
    f"'wx', __acc.wx + {_CENT_RING}.wx, "
    f"'wy', __acc.wy + {_CENT_RING}.wy, "
    f"'ar', __acc.ar + {_CENT_RING}.ar))")
_CENT_LINE = (
    f"aggregate(regexp_extract_all(w, '{_RING_BODY}', 1), "
    "named_struct('ln', 0D, 'lx', 0D, 'ly', 0D), "
    f"(__acc, __ring) -> named_struct("
    f"'ln', __acc.ln + {_ring_lstats('__ring')}.ln, "
    f"'lx', __acc.lx + {_ring_lstats('__ring')}.lx, "
    f"'ly', __acc.ly + {_ring_lstats('__ring')}.ly))")
_FUNCTIONS["st_centroid"] = (
    "(w STRING)", "STRING",
    "CASE WHEN w IS NULL OR upper(w) LIKE '%EMPTY%' THEN NULL "
    # point types: vertex mean (exact PostGIS semantics)
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "IN ('POINT', 'MULTIPOINT') THEN "
    f"CASE WHEN size({_coords('w')}) = 0 THEN NULL ELSE "
    f"concat('POINT (', "
    f"aggregate(transform({_coords('w')}, p -> p.x), 0D, "
    f"(a, v) -> a + v) / size({_coords('w')}), ' ', "
    f"aggregate(transform({_coords('w')}, p -> p.y), 0D, "
    f"(a, v) -> a + v) / size({_coords('w')}), ')') END "
    # area types: area-weighted with holes subtracted
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "IN ('POLYGON', 'MULTIPOLYGON') THEN "
    f"CASE WHEN {_CENT_POLY}.ar = 0 THEN NULL ELSE "
    f"concat('POINT (', {_CENT_POLY}.wx / {_CENT_POLY}.ar, ' ', "
    f"{_CENT_POLY}.wy / {_CENT_POLY}.ar, ')') END "
    # line types: length-weighted midpoint sum
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "IN ('LINESTRING', 'MULTILINESTRING') THEN "
    f"CASE WHEN {_CENT_LINE}.ln = 0 THEN NULL ELSE "
    f"concat('POINT (', {_CENT_LINE}.lx / {_CENT_LINE}.ln, ' ', "
    f"{_CENT_LINE}.ly / {_CENT_LINE}.ln, ')') END "
    "ELSE NULL END")


# ---------------------------------------------------------------------------
# Polygon predicates (round 7): ST_Contains / ST_Within / ST_Intersects.
#
# The reference's PostGIS users splice these into ``where=`` fragments and
# ``db.execute`` statements, delegated wholesale to the backend
# (``/root/reference/datum/postgis/table.py:157-158`` passes any SQL
# through).  Here they are pure Catalyst array-lambda arithmetic over the
# WKT vertex lists — JVM-side, no Python, no geometry library:
#
# - interior test: even-odd ray cast, counted across ALL rings of the
#   geometry (``regexp_extract_all`` pulls every parenthesized ring), so
#   POLYGON holes and MULTIPOLYGON parts fall out of the parity for free;
# - boundary crossing: the classic orientation (cross-product sign) test
#   over every boundary-segment pair, as nested ``exists`` lambdas;
# - the public predicates dispatch on geometry type (POINT/MULTIPOINT vs
#   LINESTRING vs area types) and compose the two.
#
# Semantics are PostGIS's for interior points and disjoint/overlapping
# geometries.  Shared-boundary touches (edge-on-edge, corner-to-corner,
# vertex-on-edge) report intersects=true via ``st__onboundary``: any
# 1-D overlap of straight segments places an endpoint of one on the
# other, so the per-vertex on-boundary disjunction covers every
# straight-edge touch configuration (the round-7 shared-edge footnote is
# closed; the named DE-9IM pack below distinguishes touch from interior
# overlap).  Remaining best-effort corner: a boundary point's half-open
# ray cast resolves deterministically but not always to PostGIS's
# DE-9IM answer for CONTAINMENT decisions on it.  All arithmetic is
# plain IEEE ops (+,-,*, try_divide, compare), so an external engine
# re-deriving the same formula gets bit-identical answers — the
# x158/x159/x160 DuckDB oracles do.

_RING = r"\\(([^()]+)\\)"


def _ringcoords(w: str) -> str:
    """SQL expr: per-ring vertex lists of ``w`` —
    ``array<array<struct<x double, y double>>>``."""
    return (
        f"transform(regexp_extract_all({w}, '{_RING}', 1), "
        f"__r -> transform(regexp_extract_all(__r, "
        f"'({_COORD}\\\\s+{_COORD})', 1), "
        "__s -> named_struct("
        "'x', try_cast(element_at(split(__s, '\\\\s+'), 1) AS DOUBLE), "
        "'y', try_cast(element_at(split(__s, '\\\\s+'), 2) AS DOUBLE))))")


def _pip(px: str, py: str, w: str) -> str:
    """SQL expr: even-odd ray cast of point (px, py) against ALL rings
    of ``w``.  try_divide: a horizontal edge never straddles py, but
    non-short-circuit AND must not hit ANSI div-by-zero."""
    return (
        f"(aggregate({_ringcoords(w)}, 0, "
        "(__acc, __ring) -> __acc + CASE WHEN size(__ring) < 2 THEN 0 "
        "ELSE aggregate(zip_with("
        "slice(__ring, 1, size(__ring) - 1), "
        "slice(__ring, 2, size(__ring) - 1), "
        f"(__p, __q) -> CASE WHEN ((__p.y > {py}) != (__q.y > {py})) "
        f"AND {px} < __p.x + try_divide((__q.x - __p.x) * ({py} - __p.y), "
        "__q.y - __p.y) "
        "THEN 1 ELSE 0 END), 0, (__a2, __v2) -> __a2 + __v2) END) "
        "% 2 = 1)")


def _segs(w: str) -> str:
    """SQL expr: all boundary segments (consecutive vertex pairs of
    every ring) — ``array<struct<p: struct, q: struct>>``."""
    return (
        f"flatten(transform({_ringcoords(w)}, "
        "__ring -> CASE WHEN size(__ring) < 2 THEN array() "
        "ELSE zip_with(slice(__ring, 1, size(__ring) - 1), "
        "slice(__ring, 2, size(__ring) - 1), "
        "(__p, __q) -> struct(__p AS p, __q AS q)) END))")


def _segx(a: str, b: str) -> str:
    """SQL expr: any PROPER crossing between boundary segments of a and
    b (orientation signs strictly opposite on both; collinear touches
    excluded)."""
    return (
        f"exists({_segs(a)}, __sa -> exists({_segs(b)}, __sb -> "
        "(((__sb.q.x - __sb.p.x) * (__sa.p.y - __sb.p.y) "
        "- (__sb.q.y - __sb.p.y) * (__sa.p.x - __sb.p.x)) * "
        "((__sb.q.x - __sb.p.x) * (__sa.q.y - __sb.p.y) "
        "- (__sb.q.y - __sb.p.y) * (__sa.q.x - __sb.p.x)) < 0) AND "
        "(((__sa.q.x - __sa.p.x) * (__sb.p.y - __sa.p.y) "
        "- (__sa.q.y - __sa.p.y) * (__sb.p.x - __sa.p.x)) * "
        "((__sa.q.x - __sa.p.x) * (__sb.q.y - __sa.p.y) "
        "- (__sa.q.y - __sa.p.y) * (__sb.q.x - __sa.p.x)) < 0)))")


def _onb(px: str, py: str, w: str) -> str:
    """SQL expr: exact point-on-boundary — collinear with a segment AND
    inside its bbox."""
    return (
        f"exists({_segs(w)}, __sg -> "
        f"(__sg.q.x - __sg.p.x) * ({py} - __sg.p.y) "
        f"- (__sg.q.y - __sg.p.y) * ({px} - __sg.p.x) = 0 "
        f"AND {px} >= least(__sg.p.x, __sg.q.x) "
        f"AND {px} <= greatest(__sg.p.x, __sg.q.x) "
        f"AND {py} >= least(__sg.p.y, __sg.q.y) "
        f"AND {py} <= greatest(__sg.p.y, __sg.q.y))")


def _is_area(w: str) -> str:
    return (f"upper(regexp_extract(trim({w}), '^([A-Za-z]+)', 1)) "
            "IN ('POLYGON', 'MULTIPOLYGON')")


def _inarea(px: str, py: str, w: str) -> str:
    """SQL expr: interior test gated to area types (a ray cast over an
    OPEN polyline is meaningless — LINESTRING/MULTIPOINT interiors are
    empty here)."""
    return f"(CASE WHEN {_is_area(w)} THEN {_pip(px, py, w)} ELSE false END)"


# standalone helpers, usable directly in execute()/read(where=) and by
# operators/spatial.py (NOTE: a Spark SQL UDF cannot be CALLED with
# lambda-variable arguments — the public predicates below therefore
# inline these bodies textually instead of referencing st__pip & co.
# inside their forall/exists lambdas)
_FUNCTIONS["st__ringcoords"] = (
    "(w STRING)", "ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>",
    _ringcoords("w"))
_FUNCTIONS["st__pip"] = (
    "(px DOUBLE, py DOUBLE, w STRING)", "BOOLEAN", _pip("px", "py", "w"))
_FUNCTIONS["st__segs"] = (
    "(w STRING)",
    "ARRAY<STRUCT<p: STRUCT<x: DOUBLE, y: DOUBLE>, "
    "q: STRUCT<x: DOUBLE, y: DOUBLE>>>", _segs("w"))
_FUNCTIONS["st__segx"] = ("(a STRING, b STRING)", "BOOLEAN",
                          _segx("a", "b"))
_FUNCTIONS["st__onboundary"] = (
    "(px DOUBLE, py DOUBLE, w STRING)", "BOOLEAN", _onb("px", "py", "w"))

# -- linear referencing + closest-point pack (round 8) -----------------------
# PostGIS surface: ST_Azimuth, ST_LineInterpolatePoint, ST_LineLocatePoint,
# ST_LineSubstring, ST_ClosestPoint, ST_ShortestLine — transit/addressing
# splices in where=/execute SQL.  All pure Catalyst folds over the
# existing segment extraction; row-local, zero shuffle, no Python.


def _ptx(v: str) -> str:
    return (f"try_cast(regexp_extract({v}, 'POINT \\\\(\\\\s*({_COORD})',"
            " 1) AS DOUBLE)")


def _pty(v: str) -> str:
    return (f"try_cast(regexp_extract({v}, 'POINT \\\\(\\\\s*{_COORD}"
            f"\\\\s+({_COORD})', 1) AS DOUBLE)")


def _let(inner: str, bound: str, body: str) -> str:
    """transform-over-1-element-array as SQL let-binding."""
    return (f"element_at(transform(array({inner}), {bound} -> {body}), 1)")


_SEGLEN = "sqrt(power(g.q.x - g.p.x, 2) + power(g.q.y - g.p.y, 2))"


def _linelen(w: str) -> str:
    return (f"aggregate({_segs(w)}, 0D, (a, g) -> a + {_SEGLEN})")


_FUNCTIONS["st_azimuth"] = (
    "(a STRING, b STRING)", "DOUBLE",
    _let(f"named_struct('dx', {_ptx('b')} - {_ptx('a')}, "
         f"'dy', {_pty('b')} - {_pty('a')})", "d",
         "CASE WHEN d.dx = 0 AND d.dy = 0 THEN NULL "
         "ELSE pmod(atan2(d.dx, d.dy), 2 * pi()) END"))

# walk the polyline until the remaining distance falls inside a segment;
# state = (rem, x, y, done) seeded at the first vertex so frac 0 / a
# zero-length line still yields a point
_INTERP_STEP = _let(
    _SEGLEN, "l",
    "CASE WHEN s.done THEN s "
    "WHEN l > 0 AND s.rem <= l THEN named_struct("
    "'rem', 0D, "
    "'x', g.p.x + (s.rem / l) * (g.q.x - g.p.x), "
    "'y', g.p.y + (s.rem / l) * (g.q.y - g.p.y), 'done', true) "
    "ELSE named_struct('rem', s.rem - l, 'x', g.q.x, 'y', g.q.y, "
    "'done', false) END")
_FUNCTIONS["st_lineinterpolatepoint"] = (
    "(w STRING, f DOUBLE)", "STRING",
    "CASE WHEN w IS NULL OR f IS NULL THEN NULL "
    f"WHEN size({_coords('w')}) = 0 THEN NULL ELSE "
    + _let(
        f"aggregate({_segs('w')}, "
        f"named_struct('rem', greatest(least(f, 1D), 0D) * {_linelen('w')},"
        f" 'x', element_at({_coords('w')}, 1).x, "
        f"'y', element_at({_coords('w')}, 1).y, 'done', false), "
        f"(s, g) -> {_INTERP_STEP})", "r",
        "concat('POINT (', r.x, ' ', r.y, ')')")
    + " END")

# nearest position: per segment project the query point (t clamped to
# [0,1]), keep the STRICTLY closest candidate (first wins on ties) while
# accumulating the walked distance
_LOCATE_STEP = _let(
    _SEGLEN, "l",
    _let("CASE WHEN l = 0 THEN 0D ELSE greatest(0D, least(1D, "
         "((qx - g.p.x) * (g.q.x - g.p.x) + (qy - g.p.y) * "
         "(g.q.y - g.p.y)) / (l * l))) END", "t",
         _let("power(qx - (g.p.x + t * (g.q.x - g.p.x)), 2) "
              "+ power(qy - (g.p.y + t * (g.q.y - g.p.y)), 2)", "d2",
              "CASE WHEN d2 < s.best_d2 THEN named_struct("
              "'cum', s.cum + l, 'best_d2', d2, "
              "'best_pos', s.cum + t * l) "
              "ELSE named_struct('cum', s.cum + l, "
              "'best_d2', s.best_d2, 'best_pos', s.best_pos) END")))
_FUNCTIONS["st_linelocatepoint"] = (
    "(w STRING, pt STRING)", "DOUBLE",
    "CASE WHEN w IS NULL OR pt IS NULL THEN NULL "
    f"WHEN size({_segs('w')}) = 0 THEN NULL ELSE "
    + _let(f"named_struct('qx', {_ptx('pt')}, 'qy', {_pty('pt')})", "q",
           _let("q.qx", "qx", _let("q.qy", "qy",
                _let(f"aggregate({_segs('w')}, "
                     "named_struct('cum', 0D, 'best_d2', "
                     "CAST('Infinity' AS DOUBLE), 'best_pos', 0D), "
                     f"(s, g) -> {_LOCATE_STEP})", "r",
                     _let(_linelen("w"), "len",
                          "CASE WHEN len = 0 THEN 0D "
                          "ELSE r.best_pos / len END")))))
    + " END")

# clip the walked path to [f1, f2] of the total length: each segment
# contributes its entry point (once, when the text is empty) and its
# clipped exit point
_SUBSTR_STEP = _let(
    _SEGLEN, "l",
    _let("greatest(s.cum, lo)", "a",
         _let("least(s.cum + l, hi)", "b",
              "CASE WHEN l = 0 OR a > b THEN named_struct("
              "'cum', s.cum + l, 'txt', s.txt) "
              "ELSE named_struct('cum', s.cum + l, 'txt', concat(s.txt, "
              "CASE WHEN s.txt = '' THEN concat("
              "g.p.x + ((a - s.cum) / l) * (g.q.x - g.p.x), ' ', "
              "g.p.y + ((a - s.cum) / l) * (g.q.y - g.p.y)) ELSE '' END, "
              "CASE WHEN b > a THEN concat("
              "CASE WHEN s.txt = '' THEN ', ' ELSE '' END, "
              "CASE WHEN s.txt <> '' THEN ', ' ELSE '' END, "
              "g.p.x + ((b - s.cum) / l) * (g.q.x - g.p.x), ' ', "
              "g.p.y + ((b - s.cum) / l) * (g.q.y - g.p.y)) "
              "ELSE '' END)) END")))
_FUNCTIONS["st_linesubstring"] = (
    "(w STRING, f1 DOUBLE, f2 DOUBLE)", "STRING",
    "CASE WHEN w IS NULL OR f1 IS NULL OR f2 IS NULL THEN NULL "
    f"WHEN size({_segs('w')}) = 0 OR f2 <= f1 THEN 'LINESTRING EMPTY' "
    "ELSE "
    + _let(_linelen("w"), "len",
           _let("greatest(least(f1, 1D), 0D) * len", "lo",
                _let("greatest(least(f2, 1D), 0D) * len", "hi",
                     _let(f"aggregate({_segs('w')}, "
                          "named_struct('cum', 0D, 'txt', ''), "
                          f"(s, g) -> {_SUBSTR_STEP})", "r",
                          "CASE WHEN r.txt LIKE '%,%' THEN "
                          "concat('LINESTRING (', r.txt, ')') "
                          "ELSE 'LINESTRING EMPTY' END"))))
    + " END")

# closest pair of points between two geometries: candidates are every
# vertex of one side projected onto every segment of the other (t
# clamped, so vertex-vertex pairs are covered whenever either side has
# a segment) plus direct vertex-vertex pairs (point-point inputs).
# Exact whenever the boundaries do not properly cross (crossing pairs
# report the nearest sampled pair; st_intersects is the crossing test,
# same documented tier as the DE-9IM notes).
def _proj_candidates(seed: str, seg_side: str, vert_side: str,
                     swap: bool, tag: str) -> str:
    """Fold candidates: vertices of ``vert_side`` projected onto
    segments of ``seg_side``, seeded from ``seed``.  ``swap`` = the
    projected point lies on geometry B (so (ax,ay) must stay the
    A-side point).  ``tag`` uniquifies the lambda binder names."""
    if swap:
        best = (f"CASE WHEN d2{tag} < v{tag}s.best_d2 THEN named_struct("
                f"'best_d2', d2{tag}, 'ax', vv{tag}.x, 'ay', vv{tag}.y, "
                f"'bx', px{tag}, 'by', py{tag}) ELSE v{tag}s END")
    else:
        best = (f"CASE WHEN d2{tag} < v{tag}s.best_d2 THEN named_struct("
                f"'best_d2', d2{tag}, 'ax', px{tag}, 'ay', py{tag}, "
                f"'bx', vv{tag}.x, 'by', vv{tag}.y) ELSE v{tag}s END")
    seglen = (f"sqrt(power(g{tag}.q.x - g{tag}.p.x, 2) "
              f"+ power(g{tag}.q.y - g{tag}.p.y, 2))")
    proj_t = (f"CASE WHEN l{tag} = 0 THEN 0D ELSE greatest(0D, least(1D,"
              f" ((vv{tag}.x - g{tag}.p.x) * (g{tag}.q.x - g{tag}.p.x) "
              f"+ (vv{tag}.y - g{tag}.p.y) * (g{tag}.q.y - g{tag}.p.y)) "
              f"/ (l{tag} * l{tag}))) END")
    return (
        f"aggregate({_segs(seg_side)}, {seed}, (s{tag}, g{tag}) -> "
        + _let(seglen, f"l{tag}",
               f"aggregate({_coords(vert_side)}, s{tag}, "
               f"(v{tag}s, vv{tag}) -> "
               + _let(proj_t, f"t{tag}",
                      _let(f"g{tag}.p.x + t{tag} * (g{tag}.q.x "
                           f"- g{tag}.p.x)", f"px{tag}",
                           _let(f"g{tag}.p.y + t{tag} * (g{tag}.q.y "
                                f"- g{tag}.p.y)", f"py{tag}",
                                _let(f"power(px{tag} - vv{tag}.x, 2) + "
                                     f"power(py{tag} - vv{tag}.y, 2)",
                                     f"d2{tag}", best))))
               + ")")
        + ")")


def _vv_candidates(seed: str) -> str:
    return (
        f"aggregate({_coords('a')}, {seed}, (su, uu) -> "
        f"aggregate({_coords('b')}, su, (sv, uv) -> "
        + _let("power(uu.x - uv.x, 2) + power(uu.y - uv.y, 2)", "d2vv",
               "CASE WHEN d2vv < sv.best_d2 THEN named_struct("
               "'best_d2', d2vv, 'ax', uu.x, 'ay', uu.y, "
               "'bx', uv.x, 'by', uv.y) ELSE sv END")
        + "))")


_CLOSEST_EXPR = _let(
    "named_struct('best_d2', CAST('Infinity' AS DOUBLE), "
    "'ax', 0D, 'ay', 0D, 'bx', 0D, 'by', 0D)", "z0",
    _let(_vv_candidates("z0"), "z1",
         _let(_proj_candidates("z1", "a", "b", swap=False, tag="pa"),
              "z2",
              _proj_candidates("z2", "b", "a", swap=True, tag="pb"))))

_FUNCTIONS["st_shortestline"] = (
    "(a STRING, b STRING)", "STRING",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN size({_coords('a')}) = 0 OR size({_coords('b')}) = 0 "
    "THEN NULL ELSE "
    + _let(_CLOSEST_EXPR, "r",
           "concat('LINESTRING (', r.ax, ' ', r.ay, ', ', "
           "r.bx, ' ', r.by, ')')")
    + " END")
_FUNCTIONS["st_closestpoint"] = (
    "(a STRING, b STRING)", "STRING",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN size({_coords('a')}) = 0 OR size({_coords('b')}) = 0 "
    "THEN NULL ELSE "
    + _let(_CLOSEST_EXPR, "r", "concat('POINT (', r.ax, ' ', r.ay, ')')")
    + " END")


_IS_EMPTY = "(upper(a) LIKE '%EMPTY%' OR upper(b) LIKE '%EMPTY%')"
# unparseable/vertex-free input must NOT satisfy a vacuous forall()
# (st_contains(poly, 'garbage') was true before this guard).  One flat
# pair-regex count per side — deliberately NOT the full ringcoords
# parse, which costs ~2x the whole predicate when evaluated as a guard.
_NO_VERTS = (
    f"(regexp_count(a, '{_COORD}\\\\s+{_COORD}') = 0 "
    f"OR regexp_count(b, '{_COORD}\\\\s+{_COORD}') = 0)")
_PTS = "('POINT', 'MULTIPOINT')"
_FUNCTIONS["st_contains"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN false "
    # point(s) b: interior of area a (PostGIS: boundary points do NOT
    # count), or on-the-line for a 1-D a
    f"WHEN st_geometrytype(b) IN {_PTS} THEN "
    f"forall(flatten({_ringcoords('b')}), __v -> "
    f"CASE WHEN {_is_area('a')} THEN {_pip('__v.x', '__v.y', 'a')} "
    f"ELSE {_onb('__v.x', '__v.y', 'a')} END) "
    # extended b: every vertex inside-or-on a, and boundaries never
    # properly cross (valid-geometry argument: no crossing + a vertex
    # inside ⇒ all of b inside)
    f"ELSE forall(flatten({_ringcoords('b')}), __v -> "
    f"{_inarea('__v.x', '__v.y', 'a')} OR {_onb('__v.x', '__v.y', 'a')}) "
    f"AND NOT {_segx('a', 'b')} END")

_FUNCTIONS["st_within"] = (
    "(a STRING, b STRING)", "BOOLEAN", "st_contains(b, a)")

_FUNCTIONS["st_intersects"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN false "
    f"WHEN st_geometrytype(a) IN {_PTS} THEN "
    f"exists(flatten({_ringcoords('a')}), __v -> "
    f"{_inarea('__v.x', '__v.y', 'b')} OR {_onb('__v.x', '__v.y', 'b')} "
    f"OR (st_geometrytype(b) IN {_PTS} AND "
    f"exists(flatten({_ringcoords('b')}), "
    "__u -> __u.x = __v.x AND __u.y = __v.y))) "
    f"WHEN st_geometrytype(b) IN {_PTS} THEN "
    f"exists(flatten({_ringcoords('b')}), __v -> "
    f"{_inarea('__v.x', '__v.y', 'a')} OR {_onb('__v.x', '__v.y', 'a')}) "
    # extended/extended: a proper boundary crossing, or one inside the
    # other (first-vertex-inside suffices when nothing crosses), or a
    # vertex exactly on the other's boundary (shared-edge touch)
    f"ELSE {_segx('a', 'b')} "
    f"OR exists(flatten({_ringcoords('a')}), __v -> "
    f"{_inarea('__v.x', '__v.y', 'b')} OR {_onb('__v.x', '__v.y', 'b')}) "
    f"OR exists(flatten({_ringcoords('b')}), __v -> "
    f"{_inarea('__v.x', '__v.y', 'a')} OR {_onb('__v.x', '__v.y', 'a')}) "
    "END")


# ---------------------------------------------------------------------------
# Named DE-9IM predicates (round 8): ST_Disjoint / ST_Touches /
# ST_Crosses / ST_Overlaps, composed from the same primitives (proper
# segment crossing, even-odd interior, exact on-boundary) plus two new
# ones: strict-interior point sampling over vertices AND edge midpoints
# (midpoints catch an edge passing through an interior with no vertex
# inside), and collinear 1-D segment overlap (dot-product projection
# arithmetic, no division).  Semantics per dimension pair:
#
# - area/area: exact for valid inputs (interiors-intersect = proper
#   crossing or a vertex/midpoint of one strictly inside the other —
#   a valid polygon whose interior meets another's must exhibit one);
# - line/area, point/any: vertex+midpoint sampling — exact for the
#   common cases (a line's interior entering an area puts a vertex or
#   midpoint strictly inside unless the line only grazes sub-segment
#   features, the same best-effort note as the round-7 predicates);
# - line/line: crosses = proper crossing; overlaps = collinear 1-D
#   overlap of positive length; touches = endpoint-only contact.

_DIM = ("CASE WHEN upper(regexp_extract(trim({w}), '^([A-Za-z]+)', 1)) "
        "IN ('POINT', 'MULTIPOINT') THEN 0 "
        "WHEN upper(regexp_extract(trim({w}), '^([A-Za-z]+)', 1)) "
        "IN ('LINESTRING', 'MULTILINESTRING') THEN 1 "
        "WHEN upper(regexp_extract(trim({w}), '^([A-Za-z]+)', 1)) "
        "IN ('POLYGON', 'MULTIPOLYGON') THEN 2 ELSE -1 END")


def _samples(w: str) -> str:
    """SQL expr: vertex + segment-midpoint sample points of ``w`` —
    ``array<struct<x,y>>``.  A geometry whose interior reaches into an
    area type puts at least one of these strictly inside it (valid
    non-degenerate inputs)."""
    return (
        f"concat(flatten({_ringcoords(w)}), "
        f"transform({_segs(w)}, __sg -> named_struct("
        "'x', (__sg.p.x + __sg.q.x) / 2, "
        "'y', (__sg.p.y + __sg.q.y) / 2)))")


def _strictin(pt: str, w: str) -> str:
    """SQL expr: sample point strictly inside area ``w`` (even-odd
    interior AND not exactly on the boundary)."""
    return (f"({_pip(pt + '.x', pt + '.y', w)} "
            f"AND NOT {_onb(pt + '.x', pt + '.y', w)})")


_FUNCTIONS["st__anyinterior"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    # some sample point of a strictly inside area b
    f"exists({_samples('a')}, __sp -> {_strictin('__sp', 'b')})")

_FUNCTIONS["st__interiorx"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    # area/area interiors intersect: a proper crossing, a sample point
    # of one strictly inside the other, or mutual containment (equal
    # geometries share every sample point ON the boundary, so the
    # sampling witnesses miss them)
    f"{_segx('a', 'b')} OR st__anyinterior(a, b) OR st__anyinterior(b, a) "
    "OR (st_contains(a, b) AND st_contains(b, a))")

# collinear 1-D overlap of positive length between any segment pair
# (projection arithmetic on dot products; no division)
_FUNCTIONS["st__colinover"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    f"exists({_segs('a')}, __sa -> exists({_segs('b')}, __sb -> "
    "((__sa.q.x - __sa.p.x) * (__sb.p.y - __sa.p.y) "
    " - (__sa.q.y - __sa.p.y) * (__sb.p.x - __sa.p.x)) = 0 AND "
    "((__sa.q.x - __sa.p.x) * (__sb.q.y - __sa.p.y) "
    " - (__sa.q.y - __sa.p.y) * (__sb.q.x - __sa.p.x)) = 0 AND "
    "least("
    "  greatest((__sb.p.x - __sa.p.x) * (__sa.q.x - __sa.p.x) "
    "         + (__sb.p.y - __sa.p.y) * (__sa.q.y - __sa.p.y), "
    "           (__sb.q.x - __sa.p.x) * (__sa.q.x - __sa.p.x) "
    "         + (__sb.q.y - __sa.p.y) * (__sa.q.y - __sa.p.y)), "
    "  power(__sa.q.x - __sa.p.x, 2) + power(__sa.q.y - __sa.p.y, 2)) > "
    "greatest("
    "  least((__sb.p.x - __sa.p.x) * (__sa.q.x - __sa.p.x) "
    "      + (__sb.p.y - __sa.p.y) * (__sa.q.y - __sa.p.y), "
    "        (__sb.q.x - __sa.p.x) * (__sa.q.x - __sa.p.x) "
    "      + (__sb.q.y - __sa.p.y) * (__sa.q.y - __sa.p.y)), 0D)))")

_DIM_A = _DIM.format(w="a")
_DIM_B = _DIM.format(w="b")

# ---------------------------------------------------------------------------
# General ST_Distance (round 8): min planar distance between ANY two
# geometries — vertex-vertex plus clamped vertex-to-segment minima in
# both directions (exact for straight-edge geometries: the closest
# approach of two non-crossing segment sets is always at a vertex of
# one against a vertex-or-segment of the other), and 0 whenever the
# geometries intersect.  The original point-point spelling is kept as
# the fast path with its exact historical float behavior.


def _vv_min_d2(a: str, b: str) -> str:
    """SQL expr: min squared distance over vertex pairs (NULL if either
    side has no vertices)."""
    return (
        f"array_min(flatten(transform(flatten({_ringcoords(a)}), "
        f"__u -> transform(flatten({_ringcoords(b)}), "
        "__v -> (__u.x - __v.x) * (__u.x - __v.x) "
        "+ (__u.y - __v.y) * (__u.y - __v.y)))))")


def _vs_min_d2(a: str, b: str) -> str:
    """SQL expr: min squared distance from any vertex of ``a`` to any
    segment of ``b`` (clamped projection; zero-length segments fall
    back to endpoint distance).  NULL when either list is empty."""
    return (
        f"array_min(flatten(transform(flatten({_ringcoords(a)}), "
        f"__u -> transform({_segs(b)}, __sg -> "
        "CASE WHEN power(__sg.q.x - __sg.p.x, 2) "
        "        + power(__sg.q.y - __sg.p.y, 2) = 0 THEN "
        "(__u.x - __sg.p.x) * (__u.x - __sg.p.x) "
        "+ (__u.y - __sg.p.y) * (__u.y - __sg.p.y) "
        "ELSE "
        "power(__u.x - (__sg.p.x + "
        "  greatest(0D, least((__u.x - __sg.p.x) * (__sg.q.x - __sg.p.x) "
        "                   + (__u.y - __sg.p.y) * (__sg.q.y - __sg.p.y), "
        "                     power(__sg.q.x - __sg.p.x, 2) "
        "                   + power(__sg.q.y - __sg.p.y, 2))) "
        "  / (power(__sg.q.x - __sg.p.x, 2) "
        "   + power(__sg.q.y - __sg.p.y, 2)) * (__sg.q.x - __sg.p.x)), 2) "
        "+ power(__u.y - (__sg.p.y + "
        "  greatest(0D, least((__u.x - __sg.p.x) * (__sg.q.x - __sg.p.x) "
        "                   + (__u.y - __sg.p.y) * (__sg.q.y - __sg.p.y), "
        "                     power(__sg.q.x - __sg.p.x, 2) "
        "                   + power(__sg.q.y - __sg.p.y, 2))) "
        "  / (power(__sg.q.x - __sg.p.x, 2) "
        "   + power(__sg.q.y - __sg.p.y, 2)) * (__sg.q.y - __sg.p.y)), 2) "
        "END))))")


_DIST_PP = _FUNCTIONS["st_distance"][2]       # historical point-point body
_INF = "cast('Infinity' AS DOUBLE)"
del _FUNCTIONS["st_distance"]
del _FUNCTIONS["st_dwithin"]
_FUNCTIONS["st_distance"] = (
    "(a STRING, b STRING)", "DOUBLE",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN NULL "
    # point/point fast path: the exact historical expression
    "WHEN upper(regexp_extract(trim(a), '^([A-Za-z]+)', 1)) = 'POINT' "
    "AND upper(regexp_extract(trim(b), '^([A-Za-z]+)', 1)) = 'POINT' THEN "
    f"{_DIST_PP} "
    "WHEN st_intersects(a, b) THEN 0D "
    f"ELSE sqrt(least(coalesce({_vv_min_d2('a', 'b')}, {_INF}), "
    f"coalesce({_vs_min_d2('a', 'b')}, {_INF}), "
    f"coalesce({_vs_min_d2('b', 'a')}, {_INF}))) END")
_FUNCTIONS["st_dwithin"] = (
    "(a STRING, b STRING, d DOUBLE)", "BOOLEAN",
    "st_distance(a, b) <= d")


_FUNCTIONS["st_disjoint"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    "ELSE NOT st_intersects(a, b) END")

# point a vs extended b: every point on the boundary/line, at least
# one contact, none strictly interior (area b)
_FUNCTIONS["st__touches_pt"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    f"exists(flatten({_ringcoords('a')}), __v -> "
    f"{_onb('__v.x', '__v.y', 'b')}) "
    f"AND NOT exists(flatten({_ringcoords('a')}), __v -> {_DIM_B} = 2 "
    f"AND {_pip('__v.x', '__v.y', 'b')} "
    f"AND NOT {_onb('__v.x', '__v.y', 'b')})")

_FUNCTIONS["st_touches"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN false "
    # point/point: interiors ARE the points — never 'touches'
    f"WHEN {_DIM_A} = 0 AND {_DIM_B} = 0 THEN false "
    f"WHEN {_DIM_A} = 0 THEN st__touches_pt(a, b) "
    f"WHEN {_DIM_B} = 0 THEN st__touches_pt(b, a) "
    # line/line: contact but no proper crossing and no 1-D overlap
    f"WHEN {_DIM_A} = 1 AND {_DIM_B} = 1 THEN "
    f"st_intersects(a, b) AND NOT {_segx('a', 'b')} "
    "AND NOT st__colinover(a, b) "
    # line/area: line meets the boundary but its interior stays out
    f"WHEN {_DIM_A} = 1 THEN st_intersects(a, b) "
    "AND NOT st__anyinterior(a, b) "
    f"WHEN {_DIM_B} = 1 THEN st_intersects(a, b) "
    "AND NOT st__anyinterior(b, a) "
    # area/area: they meet, interiors don't
    "ELSE st_intersects(a, b) AND NOT st__interiorx(a, b) END")

# multipoint a vs extended b: some point interior-contact, some fully
# outside
_FUNCTIONS["st__crosses_pt"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    f"exists(flatten({_ringcoords('a')}), __v -> CASE WHEN {_DIM_B} = 2 "
    f"THEN {_pip('__v.x', '__v.y', 'b')} "
    f"AND NOT {_onb('__v.x', '__v.y', 'b')} "
    f"ELSE {_onb('__v.x', '__v.y', 'b')} END) "
    f"AND exists(flatten({_ringcoords('a')}), __v -> "
    f"CASE WHEN {_DIM_B} = 2 THEN NOT {_pip('__v.x', '__v.y', 'b')} "
    f"AND NOT {_onb('__v.x', '__v.y', 'b')} "
    f"ELSE NOT {_onb('__v.x', '__v.y', 'b')} END)")

# line a vs area b: part of the line interior inside, part strictly out
_FUNCTIONS["st__crosses_line"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    f"st__anyinterior(a, b) "
    f"AND exists({_samples('a')}, __sp -> "
    f"NOT {_pip('__sp.x', '__sp.y', 'b')} "
    f"AND NOT {_onb('__sp.x', '__sp.y', 'b')})")

_FUNCTIONS["st_crosses"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN false "
    # equal dims of 0 or 2 can never cross (DE-9IM)
    f"WHEN {_DIM_A} = 0 AND {_DIM_B} = 0 THEN false "
    f"WHEN {_DIM_A} = 2 AND {_DIM_B} = 2 THEN false "
    # line/line: interiors meet at a point
    f"WHEN {_DIM_A} = 1 AND {_DIM_B} = 1 THEN {_segx('a', 'b')} "
    f"WHEN {_DIM_A} = 0 THEN st__crosses_pt(a, b) "
    f"WHEN {_DIM_B} = 0 THEN st__crosses_pt(b, a) "
    f"WHEN {_DIM_A} = 1 THEN st__crosses_line(a, b) "
    "ELSE st__crosses_line(b, a) END")

_FUNCTIONS["st_overlaps"] = (
    "(a STRING, b STRING)", "BOOLEAN",
    "CASE WHEN a IS NULL OR b IS NULL THEN NULL "
    f"WHEN {_IS_EMPTY} OR {_NO_VERTS} THEN false "
    f"WHEN {_DIM_A} != {_DIM_B} THEN false "
    # point/point: a shared point plus an exclusive point on each side
    f"WHEN {_DIM_A} = 0 THEN "
    f"exists(flatten({_ringcoords('a')}), __v -> "
    f"exists(flatten({_ringcoords('b')}), "
    "__u -> __u.x = __v.x AND __u.y = __v.y)) "
    f"AND exists(flatten({_ringcoords('a')}), __v -> "
    f"NOT exists(flatten({_ringcoords('b')}), "
    "__u -> __u.x = __v.x AND __u.y = __v.y)) "
    f"AND exists(flatten({_ringcoords('b')}), __v -> "
    f"NOT exists(flatten({_ringcoords('a')}), "
    "__u -> __u.x = __v.x AND __u.y = __v.y)) "
    # line/line: 1-D collinear overlap, neither containing the other
    f"WHEN {_DIM_A} = 1 THEN st__colinover(a, b) "
    "AND NOT st_contains(a, b) AND NOT st_contains(b, a) "
    # area/area: interiors intersect, neither contains the other
    "ELSE st__interiorx(a, b) "
    "AND NOT st_contains(a, b) AND NOT st_contains(b, a) END")


# ---------------------------------------------------------------------------
# GeoJSON export (round 8): the reference's consumers are city open-data
# portals — GeoJSON-first.  Pure Catalyst string assembly from WKT
# (coordinates re-emitted from the parsed doubles, so numeric text is
# normalized; nesting depth per RFC 7946: Point 0, Multi-Point/Line 1-2,
# Polygon 2, MultiPolygon 3).


def _gj_ring(var: str) -> str:
    """SQL expr: one ring's coord text -> GeoJSON position array."""
    c = _coords(var)
    return ("concat('[', array_join(transform(" + c + ", "
            "__p -> concat('[', __p.x, ',', __p.y, ']')), ','), ']')")


_GJ_RINGS = (
    f"concat('[', array_join(transform(regexp_extract_all(w, '{_RING}', 1), "
    f"__r -> {_gj_ring('__r')}), ','), ']')")

# MULTIPOLYGON: split parts on ')),((' then rings within each part
_GJ_PARTS = (
    "concat('[', array_join(transform(" + _AREA_PARTS + ", "
    "__part -> concat('[', array_join(transform("
    "split(regexp_replace(__part, '^\\\\(+|\\\\)+$', ''), "
    "'\\\\)\\\\s*,\\\\s*\\\\('), "
    f"__ring -> {_gj_ring('__ring')}), ','), ']')), ','), ']')")

_FUNCTIONS["st_asgeojson"] = (
    "(w STRING)", "STRING",
    "CASE WHEN w IS NULL THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN concat("
    "'{\"type\":\"', "
    "CASE upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "  WHEN 'POINT' THEN 'Point' WHEN 'MULTIPOINT' THEN 'MultiPoint' "
    "  WHEN 'LINESTRING' THEN 'LineString' "
    "  WHEN 'MULTILINESTRING' THEN 'MultiLineString' "
    "  WHEN 'POLYGON' THEN 'Polygon' ELSE 'MultiPolygon' END, "
    "'\",\"coordinates\":[]}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) = 'POINT' "
    "THEN concat('{\"type\":\"Point\",\"coordinates\":[', "
    f"element_at({_coords('w')}, 1).x, ',', "
    f"element_at({_coords('w')}, 1).y, ']}}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "= 'MULTIPOINT' THEN concat("
    "'{\"type\":\"MultiPoint\",\"coordinates\":', "
    f"concat('[', array_join(transform({_coords('w')}, "
    "__p -> concat('[', __p.x, ',', __p.y, ']')), ','), ']'), '}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "= 'LINESTRING' THEN concat("
    "'{\"type\":\"LineString\",\"coordinates\":', "
    f"concat('[', array_join(transform({_coords('w')}, "
    "__p -> concat('[', __p.x, ',', __p.y, ']')), ','), ']'), '}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "= 'MULTILINESTRING' THEN concat("
    f"'{{\"type\":\"MultiLineString\",\"coordinates\":', {_GJ_RINGS}, "
    "'}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "= 'POLYGON' THEN concat("
    f"'{{\"type\":\"Polygon\",\"coordinates\":', {_GJ_RINGS}, '}}') "
    "WHEN upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1)) "
    "= 'MULTIPOLYGON' THEN concat("
    f"'{{\"type\":\"MultiPolygon\",\"coordinates\":', {_GJ_PARTS}, "
    "'}') "
    "ELSE NULL END")


# ---------------------------------------------------------------------------
# Accessor pack (round 8): the structural ST_* functions users splice
# for feature inspection — part/ring/vertex access, reversal, boundary.
# All pure Catalyst string/array ops; numeric text is re-emitted from
# the parsed doubles (normalized form, e.g. '1.0') where vertices are
# rebuilt, and kept verbatim where rings pass through whole.

_GTYPE = "upper(regexp_extract(trim(w), '^([A-Za-z]+)', 1))"

# rings of the nth MULTIPOLYGON part (st_area's split discipline)
_MPOLY_PART_RINGS_N = (
    f"split(regexp_replace(element_at({_AREA_PARTS}, n), "
    "'^\\\\(+|\\\\)+$', ''), '\\\\)\\\\s*,\\\\s*\\\\(')")


def _rev_ring(var: str) -> str:
    """SQL expr: one ring's coord text, vertex order reversed."""
    return (f"array_join(reverse(transform({_coords(var)}, "
            "__p -> concat(__p.x, ' ', __p.y))), ', ')")


_FUNCTIONS["st_numgeometries"] = (
    "(w STRING)", "INT",
    "CASE WHEN w IS NULL THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN 0 "
    f"WHEN {_GTYPE} = 'MULTIPOLYGON' THEN size({_AREA_PARTS}) "
    f"WHEN {_GTYPE} IN ('MULTILINESTRING', 'MULTIPOINT') "
    f"THEN size(regexp_extract_all(w, '{_RING}', 1)) "
    "ELSE 1 END")

_FUNCTIONS["st_geometryn"] = (
    "(w STRING, n INT)", "STRING",
    "CASE WHEN w IS NULL OR upper(w) LIKE '%EMPTY%' THEN NULL "
    "WHEN n < 1 OR n > st_numgeometries(w) THEN NULL "
    f"WHEN {_GTYPE} = 'MULTIPOLYGON' THEN "
    "concat('POLYGON (', array_join(transform("
    f"{_MPOLY_PART_RINGS_N}, "
    "__r -> concat('(', __r, ')')), ', '), ')') "
    f"WHEN {_GTYPE} = 'MULTILINESTRING' THEN "
    f"concat('LINESTRING (', "
    f"element_at(regexp_extract_all(w, '{_RING}', 1), n), ')') "
    f"WHEN {_GTYPE} = 'MULTIPOINT' THEN "
    f"concat('POINT (', element_at("
    f"regexp_extract_all(w, '{_RING}', 1), n), ')') "
    "ELSE w END")

_FUNCTIONS["st_numinteriorrings"] = (
    "(w STRING)", "INT",
    f"CASE WHEN w IS NULL OR {_GTYPE} != 'POLYGON' THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN 0 "
    f"ELSE size(regexp_extract_all(w, '{_RING}', 1)) - 1 END")

_FUNCTIONS["st_exteriorring"] = (
    "(w STRING)", "STRING",
    f"CASE WHEN w IS NULL OR {_GTYPE} != 'POLYGON' "
    "OR upper(w) LIKE '%EMPTY%' THEN NULL "
    "ELSE concat('LINESTRING (', "
    f"element_at(regexp_extract_all(w, '{_RING}', 1), 1), ')') END")

_FUNCTIONS["st_interiorringn"] = (
    "(w STRING, n INT)", "STRING",
    f"CASE WHEN w IS NULL OR {_GTYPE} != 'POLYGON' "
    "OR upper(w) LIKE '%EMPTY%' "
    "OR n < 1 OR n > st_numinteriorrings(w) THEN NULL "
    "ELSE concat('LINESTRING (', "
    f"element_at(regexp_extract_all(w, '{_RING}', 1), n + 1), ')') END")

_FUNCTIONS["st_pointn"] = (
    "(w STRING, n INT)", "STRING",
    f"CASE WHEN w IS NULL OR {_GTYPE} != 'LINESTRING' "
    "OR upper(w) LIKE '%EMPTY%' THEN NULL "
    f"WHEN n < 1 OR n > size({_coords('w')}) THEN NULL "
    f"ELSE concat('POINT (', element_at({_coords('w')}, n).x, ' ', "
    f"element_at({_coords('w')}, n).y, ')') END")

_FUNCTIONS["st_startpoint"] = (
    "(w STRING)", "STRING", "st_pointn(w, 1)")

_FUNCTIONS["st_endpoint"] = (
    "(w STRING)", "STRING",
    f"st_pointn(w, size({_coords('w')}))")

_FUNCTIONS["st_reverse"] = (
    "(w STRING)", "STRING",
    "CASE WHEN w IS NULL OR upper(w) LIKE '%EMPTY%' THEN w "
    f"WHEN {_GTYPE} IN ('POINT', 'MULTIPOINT') THEN w "
    f"WHEN {_GTYPE} = 'LINESTRING' THEN concat('LINESTRING (', "
    f"{_rev_ring('w')}, ')') "
    # POLYGON / MULTILINESTRING: ring list kept in place (exterior
    # stays first), vertex order reversed within each ring
    f"WHEN {_GTYPE} IN ('POLYGON', 'MULTILINESTRING') THEN "
    f"concat({_GTYPE}, ' (', array_join(transform("
    f"regexp_extract_all(w, '{_RING}', 1), "
    f"__r -> concat('(', {_rev_ring('__r')}, ')')), ', '), ')') "
    # MULTIPOLYGON: part/ring nesting preserved, rings reversed
    f"ELSE concat('MULTIPOLYGON (', array_join(transform({_AREA_PARTS}, "
    "__part -> concat('(', array_join(transform("
    "split(regexp_replace(__part, '^\\\\(+|\\\\)+$', ''), "
    "'\\\\)\\\\s*,\\\\s*\\\\('), "
    f"__r2 -> concat('(', {_rev_ring('__r2')}, ')')), ', '), ')')), "
    "', '), ')') END")

_FUNCTIONS["st_boundary"] = (
    "(w STRING)", "STRING",
    "CASE WHEN w IS NULL THEN NULL "
    "WHEN upper(w) LIKE '%EMPTY%' THEN 'GEOMETRYCOLLECTION EMPTY' "
    f"WHEN {_GTYPE} IN ('POINT', 'MULTIPOINT') "
    "THEN 'GEOMETRYCOLLECTION EMPTY' "
    f"WHEN {_GTYPE} = 'LINESTRING' THEN concat('MULTIPOINT ((', "
    f"element_at({_coords('w')}, 1).x, ' ', "
    f"element_at({_coords('w')}, 1).y, '), (', "
    f"element_at({_coords('w')}, size({_coords('w')})).x, ' ', "
    f"element_at({_coords('w')}, size({_coords('w')})).y, '))') "
    f"WHEN {_GTYPE} IN ('POLYGON', 'MULTIPOLYGON') THEN "
    "concat('MULTILINESTRING (', array_join(transform("
    f"regexp_extract_all(w, '{_RING}', 1), "
    "__r -> concat('(', __r, ')')), ', '), ')') "
    "ELSE NULL END")


def register_geometry_sql_functions(spark: SparkSession,
                                    force: bool = False) -> None:
    """Idempotently register the ST_* pack as temporary SQL functions.

    Helpers (``st__*``) are referenced by later bodies, so registration
    follows dict insertion order.  Analyzing the ~30 CREATE FUNCTION
    bodies costs ~1 s, so a session that already has the pack is
    skipped (marker attribute on the session; ``force`` re-registers —
    e.g. after a ``DROP TEMPORARY FUNCTION``).
    """
    if not force and getattr(spark, "_datum_st_registered", False):
        return
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
                  f"RETURNS {ret} RETURN {body}")
    # st_simplify / st_convexhull: pandas-UDF-backed (vertex reduction
    # needs a stack — the only ST_* pair that leaves the JVM)
    from .geometry import register_vertex_ops

    register_vertex_ops(spark)
    try:
        spark._datum_st_registered = True
    except AttributeError:      # exotic session proxies: just re-register
        pass
