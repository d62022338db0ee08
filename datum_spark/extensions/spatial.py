"""Round-7 polygon spatial predicates and the grid point-in-polygon join entries (x158–x160)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..operators import asof as asof_mod  # noqa: F401
from ..operators import dedup as dedup_mod  # noqa: F401
from ..operators import similarity as sim_mod  # noqa: F401
from ..operators import text as text_mod  # noqa: F401
from ..tierb import load  # noqa: F401
from ..util import ensure_parallelism  # noqa: F401

from ._shared import load_docs, load_emb, x  # noqa: F401


# ---------------------------------------------------------------------------
# Polygon spatial predicates (round 7) — the last Tier-B-parity gap: the
# reference's PostGIS users splice ST_Contains/ST_Within/ST_Intersects
# into where= fragments (/root/reference/datum/postgis/table.py:157-158);
# the engine-native spelling is pure Catalyst ray-cast arithmetic
# (functions/geometry_sql.py), so the oracles re-derive the SAME formula
# in DuckDB SQL over explicit vertex tables — the x62/x108 discipline.

# fixture polygons: a square with a hole, a diamond, a 2-part multipolygon
_POLY1 = ("POLYGON ((10 10, 50 10, 50 50, 10 50, 10 10), "
          "(20 20, 30 20, 30 30, 20 30, 20 20))")
_POLY2 = "POLYGON ((60 0, 90 30, 60 60, 30 30, 60 0))"
_POLY3 = ("MULTIPOLYGON (((0 60, 20 60, 20 80, 0 80, 0 60)), "
          "((40 60, 70 60, 70 85, 40 85, 40 60)))")

# the same three polygons as (poly_id, ring_id, seq, x, y) rows — the
# DuckDB oracles ray-cast against these (identical vertices, identical
# IEEE arithmetic, so results are bit-equal to the WKT path)
_POLY_VERTICES_SQL = """(VALUES
  (1,1,1,10.0,10.0),(1,1,2,50.0,10.0),(1,1,3,50.0,50.0),
  (1,1,4,10.0,50.0),(1,1,5,10.0,10.0),
  (1,2,1,20.0,20.0),(1,2,2,30.0,20.0),(1,2,3,30.0,30.0),
  (1,2,4,20.0,30.0),(1,2,5,20.0,20.0),
  (2,1,1,60.0,0.0),(2,1,2,90.0,30.0),(2,1,3,60.0,60.0),
  (2,1,4,30.0,30.0),(2,1,5,60.0,0.0),
  (3,1,1,0.0,60.0),(3,1,2,20.0,60.0),(3,1,3,20.0,80.0),
  (3,1,4,0.0,80.0),(3,1,5,0.0,60.0),
  (3,2,1,40.0,60.0),(3,2,2,70.0,60.0),(3,2,3,70.0,85.0),
  (3,2,4,40.0,85.0),(3,2,5,40.0,60.0))"""

# deterministic synthetic points from the customer table.  x158 caps at
# 2,000 points: it exercises PREDICATE semantics (3 polygons × 3
# predicates per point — the expression is the product, not the scan),
# while x159 runs the full table through the scale-path grid join.
_PTS_SQL = """SELECT c_custkey AS k,
       CAST(c_custkey % 97 AS DOUBLE) AS px,
       CAST(c_custkey % 89 AS DOUBLE) AS py
  FROM customer"""
_PTS_CAPPED_SQL = _PTS_SQL + " WHERE c_custkey <= 2000"

# per-(point, polygon): ray-cast crossings (even-odd over ALL rings, so
# the hole and both multipolygon parts count) + exact on-boundary flag —
# the same formula geometry_sql._pip/_onb evaluate
_HITS_SQL = f"""
v(poly_id, ring_id, seq, x, y) AS {_POLY_VERTICES_SQL},
e AS (
  SELECT a.poly_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM v a JOIN v b ON a.poly_id = b.poly_id AND a.ring_id = b.ring_id
                   AND b.seq = a.seq + 1
), hits AS (
  SELECT p.k, e.poly_id,
         SUM(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                   AND p.px < e.x1 + (e.x2 - e.x1) * (p.py - e.y1)
                                     / (e.y2 - e.y1)
             THEN 1 ELSE 0 END) AS crossings,
         MAX(CASE WHEN (e.x2 - e.x1) * (p.py - e.y1)
                       - (e.y2 - e.y1) * (p.px - e.x1) = 0
                   AND p.px >= least(e.x1, e.x2)
                   AND p.px <= greatest(e.x1, e.x2)
                   AND p.py >= least(e.y1, e.y2)
                   AND p.py <= greatest(e.y1, e.y2)
             THEN 1 ELSE 0 END) AS onb
  FROM pts p CROSS JOIN e
  GROUP BY p.k, e.poly_id
)"""


@x("x158_spatial_predicates", f"""
WITH pts AS ({_PTS_CAPPED_SQL}),
{_HITS_SQL}
SELECT poly_id,
       CAST(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contains,
       CAST(SUM(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within,
       CAST(SUM(CASE WHEN crossings % 2 = 1 OR onb = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_intersects,
       CAST(SUM(CASE WHEN crossings % 2 = 1 THEN k ELSE 0 END) AS BIGINT)
         AS sum_keys
FROM hits GROUP BY poly_id ORDER BY poly_id""")
def x158(spark, sf):
    """ST_Contains / ST_Within / ST_Intersects through the raw-SQL
    surface (the path the reference delegates to PostGIS): synthetic
    customer points tested against a holed polygon, a diamond, and a
    multipolygon.  The predicates are registered Spark SQL functions —
    pure JVM array-lambda ray casts, no Python — and the oracle
    re-derives the identical arithmetic over vertex rows in DuckDB."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    (load(spark, sf, "customer")
     .filter(F.col("c_custkey") <= 2000)
     .selectExpr("c_custkey AS k", "CAST(c_custkey % 97 AS DOUBLE) AS px",
                 "CAST(c_custkey % 89 AS DOUBLE) AS py")
     .createOrReplaceTempView("__x158_pts"))
    return spark.sql(f"""
WITH polys AS (SELECT * FROM VALUES
  (1, '{_POLY1}'), (2, '{_POLY2}'), (3, '{_POLY3}') AS t(poly_id, wkt)),
flags AS (
  SELECT pl.poly_id, p.k,
         st_contains(pl.wkt, concat('POINT (', p.px, ' ', p.py, ')')) AS c,
         st_within(concat('POINT (', p.px, ' ', p.py, ')'), pl.wkt) AS w,
         st_intersects(concat('POINT (', p.px, ' ', p.py, ')'), pl.wkt) AS i
  FROM __x158_pts p CROSS JOIN polys pl)
SELECT poly_id,
       CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
       CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
       CAST(SUM(CASE WHEN i THEN 1 ELSE 0 END) AS BIGINT) AS n_intersects,
       CAST(SUM(CASE WHEN c THEN k ELSE 0 END) AS BIGINT) AS sum_keys
FROM flags GROUP BY poly_id ORDER BY poly_id""")


@x("x159_point_in_polygon_join", f"""
WITH pts AS ({_PTS_SQL}),
{_HITS_SQL}
SELECT poly_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(k) AS BIGINT) AS sum_keys
FROM hits WHERE crossings % 2 = 1
GROUP BY poly_id ORDER BY poly_id""")
def x159(spark, sf):
    """Distributed point-in-polygon join: polygons expand once to the
    grid cells covering their envelope, points equi-join on their home
    cell, the exact ray cast runs on candidates only — one hash shuffle,
    never a cross join (`operators/spatial.py:point_in_polygon_join`).
    The grid is a pure prefilter, so the result must equal the oracle's
    direct all-pairs ray cast."""
    from ..operators.spatial import point_in_polygon_join

    pts = (load(spark, sf, "customer")
           .selectExpr("c_custkey AS k",
                       "CAST(c_custkey % 97 AS DOUBLE) AS px",
                       "CAST(c_custkey % 89 AS DOUBLE) AS py"))
    polys = spark.createDataFrame(
        [(1, _POLY1), (2, _POLY2), (3, _POLY3)], "poly_id int, wkt string")
    return (point_in_polygon_join(pts, polys, "px", "py", "wkt",
                                  cell_size=30.0)
            .groupBy("poly_id")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum("k").alias("sum_keys"))
            .orderBy("poly_id"))


# second polygon set for the pairwise matrix: overlapping, inside-the-
# hole, far-disjoint, shared-edge-touch, contains-everything
_POLYB1 = "POLYGON ((40 40, 70 40, 70 70, 40 70, 40 40))"
_POLYB2 = "POLYGON ((22 22, 28 22, 28 28, 22 28, 22 22))"
_POLYB3 = "POLYGON ((200 200, 210 200, 210 210, 200 210, 200 200))"
_POLYB4 = "POLYGON ((20 60, 40 60, 40 80, 20 80, 20 60))"
_POLYB5 = "POLYGON ((-10 -10, 120 -10, 120 100, -10 100, -10 -10))"

_POLYB_VERTICES_SQL = """(VALUES
  (1,1,1,40.0,40.0),(1,1,2,70.0,40.0),(1,1,3,70.0,70.0),
  (1,1,4,40.0,70.0),(1,1,5,40.0,40.0),
  (2,1,1,22.0,22.0),(2,1,2,28.0,22.0),(2,1,3,28.0,28.0),
  (2,1,4,22.0,28.0),(2,1,5,22.0,22.0),
  (3,1,1,200.0,200.0),(3,1,2,210.0,200.0),(3,1,3,210.0,210.0),
  (3,1,4,200.0,210.0),(3,1,5,200.0,200.0),
  (4,1,1,20.0,60.0),(4,1,2,40.0,60.0),(4,1,3,40.0,80.0),
  (4,1,4,20.0,80.0),(4,1,5,20.0,60.0),
  (5,1,1,-10.0,-10.0),(5,1,2,120.0,-10.0),(5,1,3,120.0,100.0),
  (5,1,4,-10.0,100.0),(5,1,5,-10.0,-10.0))"""


@x("x160_polygon_matrix", f"""
WITH va(poly_id, ring_id, seq, x, y) AS {_POLY_VERTICES_SQL},
vb(poly_id, ring_id, seq, x, y) AS {_POLYB_VERTICES_SQL},
ea AS (
  SELECT a.poly_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM va a JOIN va b ON a.poly_id = b.poly_id AND a.ring_id = b.ring_id
                     AND b.seq = a.seq + 1),
eb AS (
  SELECT a.poly_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM vb a JOIN vb b ON a.poly_id = b.poly_id AND a.ring_id = b.ring_id
                     AND b.seq = a.seq + 1),
a_in_b AS (
  SELECT w.poly_id AS a_id, w.other_id AS b_id,
         bool_and(w.ins OR w.onb) AS all_in,
         bool_or(w.ins OR w.onb) AS any_in
  FROM (
    SELECT vv.poly_id, ee.poly_id AS other_id, vv.ring_id, vv.seq,
           SUM(CASE WHEN (ee.y1 > vv.y) <> (ee.y2 > vv.y)
                     AND vv.x < ee.x1 + (ee.x2 - ee.x1) * (vv.y - ee.y1)
                                        / (ee.y2 - ee.y1)
               THEN 1 ELSE 0 END) % 2 = 1 AS ins,
           MAX(CASE WHEN (ee.x2 - ee.x1) * (vv.y - ee.y1)
                         - (ee.y2 - ee.y1) * (vv.x - ee.x1) = 0
                     AND vv.x >= least(ee.x1, ee.x2)
                     AND vv.x <= greatest(ee.x1, ee.x2)
                     AND vv.y >= least(ee.y1, ee.y2)
                     AND vv.y <= greatest(ee.y1, ee.y2)
               THEN 1 ELSE 0 END) = 1 AS onb
    FROM va vv CROSS JOIN eb ee
    GROUP BY vv.poly_id, ee.poly_id, vv.ring_id, vv.seq, vv.x, vv.y
  ) w GROUP BY w.poly_id, w.other_id),
b_in_a AS (
  SELECT w.other_id AS a_id, w.poly_id AS b_id,
         bool_and(w.ins OR w.onb) AS all_in,
         bool_or(w.ins OR w.onb) AS any_in
  FROM (
    SELECT vv.poly_id, ee.poly_id AS other_id, vv.ring_id, vv.seq,
           SUM(CASE WHEN (ee.y1 > vv.y) <> (ee.y2 > vv.y)
                     AND vv.x < ee.x1 + (ee.x2 - ee.x1) * (vv.y - ee.y1)
                                        / (ee.y2 - ee.y1)
               THEN 1 ELSE 0 END) % 2 = 1 AS ins,
           MAX(CASE WHEN (ee.x2 - ee.x1) * (vv.y - ee.y1)
                         - (ee.y2 - ee.y1) * (vv.x - ee.x1) = 0
                     AND vv.x >= least(ee.x1, ee.x2)
                     AND vv.x <= greatest(ee.x1, ee.x2)
                     AND vv.y >= least(ee.y1, ee.y2)
                     AND vv.y <= greatest(ee.y1, ee.y2)
               THEN 1 ELSE 0 END) = 1 AS onb
    FROM vb vv CROSS JOIN ea ee
    GROUP BY vv.poly_id, ee.poly_id, vv.ring_id, vv.seq, vv.x, vv.y
  ) w GROUP BY w.other_id, w.poly_id),
sx AS (
  SELECT ea.poly_id AS a_id, eb.poly_id AS b_id,
         bool_or(
           (((eb.x2 - eb.x1) * (ea.y1 - eb.y1)
             - (eb.y2 - eb.y1) * (ea.x1 - eb.x1)) *
            ((eb.x2 - eb.x1) * (ea.y2 - eb.y1)
             - (eb.y2 - eb.y1) * (ea.x2 - eb.x1)) < 0)
           AND
           (((ea.x2 - ea.x1) * (eb.y1 - ea.y1)
             - (ea.y2 - ea.y1) * (eb.x1 - ea.x1)) *
            ((ea.x2 - ea.x1) * (eb.y2 - ea.y1)
             - (ea.y2 - ea.y1) * (eb.x2 - ea.x1)) < 0)) AS xing
  FROM ea CROSS JOIN eb GROUP BY ea.poly_id, eb.poly_id)
SELECT a.a_id, a.b_id,
       CAST(CASE WHEN s.xing OR a.any_in OR b.any_in THEN 1 ELSE 0 END
            AS INTEGER) AS intersects,
       CAST(CASE WHEN b.all_in AND NOT s.xing THEN 1 ELSE 0 END
            AS INTEGER) AS a_contains_b,
       CAST(CASE WHEN a.all_in AND NOT s.xing THEN 1 ELSE 0 END
            AS INTEGER) AS a_within_b
FROM a_in_b a JOIN b_in_a b ON a.a_id = b.a_id AND a.b_id = b.b_id
JOIN sx s ON a.a_id = s.a_id AND a.b_id = s.b_id
ORDER BY a.a_id, a.b_id""")
def x160(spark, sf):
    """Pairwise polygon-polygon predicate matrix (3 fixture polygons ×
    5 probes: overlap, hole-interior, disjoint, shared-edge touch,
    superset): ST_Intersects / ST_Contains / ST_Within evaluated by the
    engine's Catalyst ray-cast + segment-crossing expressions; the
    oracle re-derives the full formula (proper edge crossing, per-vertex
    even-odd + on-boundary, forall/exists aggregation) over vertex rows
    in DuckDB."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    return spark.sql(f"""
WITH pa AS (SELECT * FROM VALUES
  (1, '{_POLY1}'), (2, '{_POLY2}'), (3, '{_POLY3}') AS t(a_id, wa)),
pb AS (SELECT * FROM VALUES
  (1, '{_POLYB1}'), (2, '{_POLYB2}'), (3, '{_POLYB3}'),
  (4, '{_POLYB4}'), (5, '{_POLYB5}') AS t(b_id, wb))
SELECT a_id, b_id,
       CAST(st_intersects(wa, wb) AS INT) AS intersects,
       CAST(st_contains(wa, wb) AS INT) AS a_contains_b,
       CAST(st_within(wa, wb) AS INT) AS a_within_b
FROM pa CROSS JOIN pb ORDER BY a_id, b_id""")




@x("x161_geometry_measures", f"""
WITH v(poly_id, ring_id, seq, x, y) AS {_POLY_VERTICES_SQL},
roles(poly_id, ring_id, sgn) AS (VALUES
  (1, 1, 1), (1, 2, -1), (2, 1, 1), (3, 1, 1), (3, 2, 1)),
e AS (
  SELECT a.poly_id, a.ring_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM v a JOIN v b ON a.poly_id = b.poly_id AND a.ring_id = b.ring_id
                   AND b.seq = a.seq + 1),
r AS (
  SELECT poly_id, ring_id,
         SUM(x1 * y2 - x2 * y1) AS cr,
         SUM((x1 + x2) * (x1 * y2 - x2 * y1)) AS tx,
         SUM((y1 + y2) * (x1 * y2 - x2 * y1)) AS ty,
         SUM(sqrt(power(x2 - x1, 2) + power(y2 - y1, 2))) AS len
  FROM e GROUP BY poly_id, ring_id),
agg AS (
  SELECT r.poly_id,
         SUM(roles.sgn * abs(cr) / 2) AS area,
         SUM(len) AS perimeter,
         SUM(roles.sgn * (tx / 6) * CASE WHEN cr >= 0 THEN 1 ELSE -1 END)
           AS wx,
         SUM(roles.sgn * (ty / 6) * CASE WHEN cr >= 0 THEN 1 ELSE -1 END)
           AS wy
  FROM r JOIN roles ON r.poly_id = roles.poly_id
                   AND r.ring_id = roles.ring_id
  GROUP BY r.poly_id)
SELECT poly_id, ROUND(area, 6) AS area, ROUND(perimeter, 6) AS perimeter,
       ROUND(wx / area, 6) AS cx, ROUND(wy / area, 6) AS cy
FROM agg ORDER BY poly_id""")
def x161(spark, sf):
    """Geometry measures through the SQL gateway, oracle-checked: area
    (holes subtract, MULTIPOLYGON parts sum), ring-aware perimeter
    (interior-ring boundaries included, no phantom inter-ring segments)
    and area-weighted centroid over the three fixture polygons — the
    DuckDB oracle re-derives shoelace / segment-length / weighted-
    centroid arithmetic from vertex rows, with explicit hole-vs-part
    roles that the engine infers from WKT ring nesting."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    return spark.sql(f"""
SELECT poly_id,
       ROUND(st_area(wkt), 6) AS area,
       ROUND(st_perimeter(wkt), 6) AS perimeter,
       ROUND(st_x(st_centroid(wkt)), 6) AS cx,
       ROUND(st_y(st_centroid(wkt)), 6) AS cy
FROM VALUES (1, '{_POLY1}'), (2, '{_POLY2}'), (3, '{_POLY3}')
  AS t(poly_id, wkt)
ORDER BY poly_id""")


@x("x162_nearest_neighbor", """
WITH c AS (
  SELECT c_custkey, abs(c_acctbal) % 100 AS x,
         CAST(c_custkey % 100 AS DOUBLE) AS y
  FROM customer
), s AS (
  SELECT s_suppkey, abs(s_acctbal) % 100 AS x,
         CAST(s_suppkey % 100 AS DOUBLE) AS y
  FROM supplier
), pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
         sqrt((c.x - s.x)*(c.x - s.x) + (c.y - s.y)*(c.y - s.y)) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY sqrt((c.x - s.x)*(c.x - s.x)
                         + (c.y - s.y)*(c.y - s.y)), s.s_suppkey) AS rn
  FROM c, s
  WHERE (c.x - s.x)*(c.x - s.x) + (c.y - s.y)*(c.y - s.y) <= 9.0
)
SELECT c_custkey, s_suppkey, ROUND(dist, 4) AS dist
FROM pairs WHERE rn = 1 ORDER BY c_custkey""")
def x162(spark, sf):
    """Nearest-facility join: each customer's single closest supplier
    within planar radius 3 (geocode-snap semantics) via the grid-
    prefiltered radius join + min_by pick — never a cross join, ties
    broken by supplier key.  The oracle is the all-pairs window form the
    operator exists to avoid; coordinates derive from acctbal/key so
    both engines compute identical IEEE distances."""
    from ..operators.spatial import nearest_neighbor_join

    cust = (load(spark, sf, "customer")
            .select("c_custkey",
                    (F.abs(F.col("c_acctbal")) % 100).alias("cx"),
                    (F.col("c_custkey") % 100).cast("double").alias("cy")))
    supp = (load(spark, sf, "supplier")
            .select("s_suppkey",
                    (F.abs(F.col("s_acctbal")) % 100).alias("sx"),
                    (F.col("s_suppkey") % 100).cast("double").alias("sy")))
    out = nearest_neighbor_join(cust, supp, "cx", "cy", "sx", "sy",
                                "c_custkey", 3.0)
    return (out.select("c_custkey", "s_suppkey",
                       F.round("dist", 4).alias("dist"))
               .orderBy("c_custkey"))


# ---------------------------------------------------------------------------
# Constructive geometry (round 8): ST_Intersection / ST_Union /
# ST_Difference / ST_Buffer through the SQL gateway — the last
# PostGIS-delegation surface (reference users splice these into where=/
# create_view SQL, /root/reference/datum/postgis/table.py:157-158,
# database.py:108-111).  Engine side: Martinez–Rueda boolean overlay
# (functions/clipping.py) as Arrow-batched UDFs.  Oracle strategy:
# x163 derives axis-aligned rectangles from customer keys so DuckDB can
# compute the EXACT clipped areas with interval arithmetic (the general
# clipper must agree bit-for-bit on integer-coordinate rectangles);
# x164 pins hand-computed overlay areas for non-rectangular fixtures
# (diamond, holed polygon, multipolygon); x165 checks disc buffers
# against the closed-form n-gon area.

# three fixed clip rectangles (integer coords; areas exact in IEEE)
_CLIPS = [(1, 10, 10, 40, 30), (2, 0, 0, 25, 25), (3, 30, 20, 60, 45)]
_CLIPS_SQL = ", ".join(f"({i}, {a}.0, {b}.0, {c}.0, {d}.0)"
                       for i, a, b, c, d in _CLIPS)

# per-customer rectangle: integer-valued doubles derived from the key
_RECT_SQL = """SELECT c_custkey AS k,
       CAST(c_custkey % 50 AS DOUBLE) AS ax1,
       CAST(c_custkey % 37 AS DOUBLE) AS ay1,
       CAST(c_custkey % 50 + c_custkey % 13 + 5 AS DOUBLE) AS ax2,
       CAST(c_custkey % 37 + c_custkey % 11 + 5 AS DOUBLE) AS ay2
  FROM customer WHERE c_custkey <= 400"""


@x("x163_overlay_rect", f"""
WITH r AS ({_RECT_SQL}),
c(cid, bx1, by1, bx2, by2) AS (VALUES {_CLIPS_SQL}),
pairs AS (
  SELECT cid,
         (ax2 - ax1) * (ay2 - ay1) AS a_area,
         (bx2 - bx1) * (by2 - by1) AS b_area,
         GREATEST(0, LEAST(ax2, bx2) - GREATEST(ax1, bx1))
           * GREATEST(0, LEAST(ay2, by2) - GREATEST(ay1, by1)) AS inter
  FROM r CROSS JOIN c)
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(inter), 4) AS sum_inter,
       ROUND(SUM(a_area + b_area - inter), 4) AS sum_union,
       ROUND(SUM(a_area - inter), 4) AS sum_diff
FROM pairs GROUP BY cid ORDER BY cid""")
def x163(spark, sf):
    """Boolean overlay through the SQL gateway on 400 × 3
    integer-coordinate rectangle pairs: st_area of st_intersection /
    st_union / st_difference must equal DuckDB's exact interval
    arithmetic (integer-valued doubles -> every product and sum is
    IEEE-exact, so the general sweep-line clipper is held to
    bit-equality).  Map-only pandas UDFs, zero shuffle; the 400-row cap
    bounds the per-row Python sweep (the operator's scale path is
    one-geometry-per-row parallelism, measured in SCALE.md §13)."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x163_cust")
    return spark.sql(f"""
WITH r AS (SELECT c_custkey AS k,
       CAST(c_custkey % 50 AS DOUBLE) AS ax1,
       CAST(c_custkey % 37 AS DOUBLE) AS ay1,
       CAST(c_custkey % 50 + c_custkey % 13 + 5 AS DOUBLE) AS ax2,
       CAST(c_custkey % 37 + c_custkey % 11 + 5 AS DOUBLE) AS ay2
  FROM __x163_cust WHERE c_custkey <= 400),
c(cid, bx1, by1, bx2, by2) AS (VALUES {_CLIPS_SQL}),
w AS (
  SELECT cid,
         concat('POLYGON ((', ax1, ' ', ay1, ', ', ax2, ' ', ay1, ', ',
                ax2, ' ', ay2, ', ', ax1, ' ', ay2, ', ',
                ax1, ' ', ay1, '))') AS wa,
         concat('POLYGON ((', bx1, ' ', by1, ', ', bx2, ' ', by1, ', ',
                bx2, ' ', by2, ', ', bx1, ' ', by2, ', ',
                bx1, ' ', by1, '))') AS wb
  FROM r CROSS JOIN c)
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(st_area(st_intersection(wa, wb))), 4) AS sum_inter,
       ROUND(SUM(st_area(st_union(wa, wb))), 4) AS sum_union,
       ROUND(SUM(st_area(st_difference(wa, wb))), 4) AS sum_diff
FROM w GROUP BY cid ORDER BY cid""")


# hand-computed overlays for non-rectangular fixtures:
#  pair 1: unit-100 square vs diamond |x-10|+|y-10|<=10 -> inter = the
#          square corner region above x+y=10 = 100-50 = 50
#  pair 2: holed 40x40 (hole 20x20) vs rect x in [20,60] -> inter =
#          right half minus right half of hole = 800-200 = 600
#  pair 3: two-part multipolygon vs spanning rect -> 50 + 50
_X164_CASES = [
    (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
     "POLYGON ((10 0, 20 10, 10 20, 0 10, 10 0))", 50.0, 250.0, 50.0),
    (2, "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), "
        "(10 10, 30 10, 30 30, 10 30, 10 10))",
     "POLYGON ((20 0, 60 0, 60 40, 20 40, 20 0))", 600.0, 2200.0, 600.0),
    (3, "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
        "((20 0, 30 0, 30 10, 20 10, 20 0)))",
     "POLYGON ((5 0, 25 0, 25 10, 5 10, 5 0))", 100.0, 300.0, 100.0),
]


@x("x164_overlay_fixtures", """
SELECT * FROM (VALUES
  (1, CAST(50.0 AS DOUBLE), CAST(250.0 AS DOUBLE), CAST(50.0 AS DOUBLE)),
  (2, CAST(600.0 AS DOUBLE), CAST(2200.0 AS DOUBLE), CAST(600.0 AS DOUBLE)),
  (3, CAST(100.0 AS DOUBLE), CAST(300.0 AS DOUBLE), CAST(100.0 AS DOUBLE))
) AS t(pair_id, inter_area, union_area, diff_area) ORDER BY pair_id""")
def x164(spark, sf):
    """General-polygon overlay fixtures vs hand-computed truth: diamond
    x square (diagonal clip), holed polygon x rectangle (hole survives
    into the result), multipolygon x spanning rectangle.  Integer
    coordinates keep the sweep's arithmetic exact, so the areas are
    hash-equal to the literal oracle."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    vals = ", ".join(f"({i}, '{wa}', '{wb}')"
                     for i, wa, wb, *_ in _X164_CASES)
    return spark.sql(f"""
SELECT pair_id,
       st_area(st_intersection(wa, wb)) AS inter_area,
       st_area(st_union(wa, wb)) AS union_area,
       st_area(st_difference(wa, wb)) AS diff_area
FROM VALUES {vals} AS t(pair_id, wa, wb) ORDER BY pair_id""")


@x("x165_buffer", """
WITH pts AS (
  SELECT c_custkey AS k, CAST(c_custkey % 5 + 1 AS DOUBLE) AS r
  FROM customer WHERE c_custkey <= 500)
SELECT CAST(r AS DOUBLE) AS r,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(32 AS INT) AS npoints,
       ROUND(16 * r * r * sin(pi() / 16), 6) AS disc_area
FROM pts GROUP BY r ORDER BY r""")
def x165(spark, sf):
    """ST_Buffer on points through the SQL gateway: the 32-gon disc
    area must match the closed form (n/2)·r²·sin(2π/n) to 6 decimals
    (engine: shoelace over the generated vertices; oracle: the
    formula), and every disc carries exactly 32 vertices.  Lines and
    polygons (capsule unions, erosion) are covered by the fixture/fuzz
    suites — their areas have no closed form DuckDB can re-derive."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x165_cust")
    return spark.sql("""
WITH pts AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 97 AS DOUBLE) AS px,
         CAST(c_custkey % 89 AS DOUBLE) AS py,
         CAST(c_custkey % 5 + 1 AS DOUBLE) AS r
  FROM __x165_cust WHERE c_custkey <= 500),
buf AS (
  SELECT r, st_buffer(st_makepoint(px, py), r) AS w FROM pts)
SELECT CAST(r AS DOUBLE) AS r,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(st_npoints(w) - 1) AS npoints,
       ROUND(MAX(st_area(w)), 6) AS disc_area
FROM buf GROUP BY r ORDER BY r""")


# ---------------------------------------------------------------------------
# Named DE-9IM predicates (round 8): ST_Touches / ST_Crosses /
# ST_Overlaps / ST_Disjoint over a dimension-matrix of fixtures.  The
# oracle pins the hand-derived DE-9IM truth (PostGIS semantics) as
# literal values — a STRONGER check than re-deriving the engine's own
# formula, since it validates the semantics rather than the arithmetic.

_SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
_X166_CASES = [
    # (id, a, b, touches, crosses, overlaps, disjoint)
    (1, _SQ, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))", 1, 0, 0, 0),
    (2, _SQ, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", 1, 0, 0, 0),
    (3, _SQ, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", 0, 0, 1, 0),
    (4, _SQ, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))", 0, 0, 0, 1),
    (5, _SQ, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", 0, 0, 0, 0),
    (6, _SQ, _SQ, 0, 0, 0, 0),
    (7, _SQ, "POLYGON ((8 10, 12 14, 4 16, 8 10))", 1, 0, 0, 0),
    (8, "LINESTRING (5 -5, 5 15)", _SQ, 0, 1, 0, 0),
    (9, "LINESTRING (0 -5, 0 15)", _SQ, 1, 0, 0, 0),
    (10, "LINESTRING (2 2, 8 8)", _SQ, 0, 0, 0, 0),
    (11, "LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 15 0)", 0, 0, 1, 0),
    (12, "LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)", 0, 1, 0, 0),
    (13, "LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 10 0)", 1, 0, 0, 0),
    (14, "POINT (0 5)", _SQ, 1, 0, 0, 0),
    (15, "MULTIPOINT ((5 5), (20 20))", _SQ, 0, 1, 0, 0),
    (16, "MULTIPOINT ((1 1), (2 2))", "MULTIPOINT ((2 2), (3 3))",
     0, 0, 1, 0),
]


@x("x166_de9im_predicates", """
SELECT * FROM (VALUES
""" + ",\n".join(f"  ({i}, {t}, {c}, {o}, {d})"
                 for i, _, _, t, c, o, d in _X166_CASES) + """
) AS t(case_id, is_touch, is_cross, is_overlap, is_disjoint)
ORDER BY case_id""")
def x166(spark, sf):
    """Named DE-9IM predicates vs hand-derived PostGIS truth: shared
    edge / shared corner / vertex-on-edge touches, proper overlap,
    containment, equality, line-area crossing, collinear line overlap,
    endpoint touch, boundary point, multipoint straddle — the
    dimension matrix a GIS user actually hits.  Pure Catalyst
    composition of the ray-cast/on-boundary/segment-crossing
    primitives; no Python."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    vals = ", ".join(f"({i}, '{a}', '{b}')"
                     for i, a, b, *_ in _X166_CASES)
    return spark.sql(f"""
SELECT case_id,
       CAST(st_touches(a, b) AS INT) AS is_touch,
       CAST(st_crosses(a, b) AS INT) AS is_cross,
       CAST(st_overlaps(a, b) AS INT) AS is_overlap,
       CAST(st_disjoint(a, b) AS INT) AS is_disjoint
FROM VALUES {vals} AS t(case_id, a, b) ORDER BY case_id""")


# ---------------------------------------------------------------------------
# Distributed overlay join (round 8): the parcels x zoning-districts
# composition — grid-prefiltered spatial join + Martinez clipping, the
# operator a spatial-ETL user otherwise writes as ST_Intersection
# inside a PostGIS join.  Oracle: exact all-pairs interval arithmetic
# (the grid prefilter and canonical-cell dedup must be invisible).

_ZONES = [(1, 0, 0, 30, 25), (2, 25, 10, 55, 40), (3, 10, 30, 45, 60),
          (4, 50, 0, 80, 35), (5, 60, 30, 95, 65), (6, 0, 45, 30, 90)]
_ZONES_SQL = ", ".join(f"({i}, {a}.0, {b}.0, {c}.0, {d}.0)"
                       for i, a, b, c, d in _ZONES)

_PARCEL_SQL = """SELECT c_custkey AS k,
       CAST(c_custkey % 83 AS DOUBLE) AS ax1,
       CAST(c_custkey % 71 AS DOUBLE) AS ay1,
       CAST(c_custkey % 83 + c_custkey % 7 + 2 AS DOUBLE) AS ax2,
       CAST(c_custkey % 71 + c_custkey % 9 + 2 AS DOUBLE) AS ay2
  FROM customer WHERE c_custkey BETWEEN 1 AND 300"""


@x("x167_overlay_join", f"""
WITH p AS ({_PARCEL_SQL}),
z(zone_id, bx1, by1, bx2, by2) AS (VALUES {_ZONES_SQL}),
pairs AS (
  SELECT zone_id,
         GREATEST(0, LEAST(ax2, bx2) - GREATEST(ax1, bx1))
           * GREATEST(0, LEAST(ay2, by2) - GREATEST(ay1, by1)) AS inter
  FROM p CROSS JOIN z)
SELECT zone_id,
       CAST(COUNT(*) FILTER (WHERE inter > 0) AS BIGINT) AS n_parcels,
       ROUND(SUM(inter), 4) AS zoned_area
FROM pairs GROUP BY zone_id ORDER BY zone_id""")
def x167(spark, sf):
    """Distributed polygon overlay join: 300 synthetic parcels x 6
    zoning districts through `operators.spatial.polygon_overlay_join`
    (envelope-grid candidates, canonical-cell dedup, bbox prefilter,
    Martinez clipping on survivors only) aggregated to per-zone parcel
    counts and zoned area.  The oracle is the exact all-pairs interval
    arithmetic the grid join exists to avoid — integer-valued doubles,
    so the hash holds the whole pipeline to bit-equality."""
    from ..operators.spatial import polygon_overlay_join

    load(spark, sf, "customer").createOrReplaceTempView("__x167_cust")
    parcels = spark.sql(f"""
SELECT k, concat('POLYGON ((', ax1, ' ', ay1, ', ', ax2, ' ', ay1, ', ',
       ax2, ' ', ay2, ', ', ax1, ' ', ay2, ', ', ax1, ' ', ay1,
       '))') AS lw
FROM ({_PARCEL_SQL.replace('customer', '__x167_cust')})""")
    zones = spark.sql(f"""
SELECT zone_id, concat('POLYGON ((', bx1, ' ', by1, ', ', bx2, ' ', by1,
       ', ', bx2, ' ', by2, ', ', bx1, ' ', by2, ', ', bx1, ' ', by1,
       '))') AS rw
FROM (VALUES {_ZONES_SQL}) AS z(zone_id, bx1, by1, bx2, by2)""")
    out = polygon_overlay_join(parcels, zones, "lw", "rw",
                               cell_size=25.0, wkt_out=None)
    return (out.groupBy("zone_id")
               .agg(F.count(F.lit(1)).alias("n_parcels"),
                    F.round(F.sum("inter_area"), 4).alias("zoned_area"))
               .orderBy("zone_id"))


# ---------------------------------------------------------------------------
# Line clipping (round 8): ST_Intersection(line, polygon) — the 1-D
# overlay (street segments × district).  The oracle re-derives the
# clipped LENGTH of each segment against each rectangle with
# Liang–Barsky parameter clipping in plain SQL (exact interval
# arithmetic on the t-range; both engines divide the same IEEE values).

_SEGS_SQL = """SELECT c_custkey AS k,
       CAST(c_custkey % 61 AS DOUBLE) AS x1,
       CAST(c_custkey % 53 AS DOUBLE) AS y1,
       CAST((c_custkey + 17) % 67 AS DOUBLE) AS x2,
       CAST((c_custkey + 29) % 59 AS DOUBLE) AS y2
  FROM customer WHERE c_custkey <= 400"""

_CLIP_RECTS = [(1, 5, 5, 35, 30), (2, 20, 15, 55, 45), (3, 0, 30, 40, 58)]
_CLIP_RECTS_SQL = ", ".join(f"({i}, {a}.0, {b}.0, {c}.0, {d}.0)"
                            for i, a, b, c, d in _CLIP_RECTS)


@x("x168_line_clip", f"""
WITH s AS ({_SEGS_SQL}),
r(rid, bx1, by1, bx2, by2) AS (VALUES {_CLIP_RECTS_SQL}),
t AS (
  SELECT rid, k, x2 - x1 AS dx, y2 - y1 AS dy,
         CASE WHEN x2 - x1 = 0 THEN
                CASE WHEN x1 >= bx1 AND x1 <= bx2 THEN 0.0 ELSE 1.0 END
              ELSE GREATEST(LEAST((bx1 - x1) / (x2 - x1),
                                  (bx2 - x1) / (x2 - x1)), 0.0) END AS tx0,
         CASE WHEN x2 - x1 = 0 THEN
                CASE WHEN x1 >= bx1 AND x1 <= bx2 THEN 1.0 ELSE 0.0 END
              ELSE LEAST(GREATEST((bx1 - x1) / (x2 - x1),
                                  (bx2 - x1) / (x2 - x1)), 1.0) END AS tx1,
         CASE WHEN y2 - y1 = 0 THEN
                CASE WHEN y1 >= by1 AND y1 <= by2 THEN 0.0 ELSE 1.0 END
              ELSE GREATEST(LEAST((by1 - y1) / (y2 - y1),
                                  (by2 - y1) / (y2 - y1)), 0.0) END AS ty0,
         CASE WHEN y2 - y1 = 0 THEN
                CASE WHEN y1 >= by1 AND y1 <= by2 THEN 1.0 ELSE 0.0 END
              ELSE LEAST(GREATEST((by1 - y1) / (y2 - y1),
                                  (by2 - y1) / (y2 - y1)), 1.0) END AS ty1
  FROM s CROSS JOIN r),
cl AS (
  SELECT rid, k,
         GREATEST(0.0, LEAST(tx1, ty1) - GREATEST(tx0, ty0))
           * sqrt(dx * dx + dy * dy) AS clen
  FROM t)
SELECT rid,
       CAST(COUNT(*) FILTER (WHERE clen > 0) AS BIGINT) AS n_crossing,
       ROUND(SUM(clen), 4) AS clipped_len
FROM cl GROUP BY rid ORDER BY rid""")
def x168(spark, sf):
    """1-D overlay: 400 synthetic street segments clipped by 3 district
    rectangles through st_intersection(line, polygon) + st_length; the
    oracle replays Liang–Barsky parameter clipping per (segment, rect)
    in SQL.  Exercises the line-splitting path of the clipper (entry /
    exit crossings, fully-inside, fully-outside, axis-parallel
    segments) under a hash gate."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x168_cust")
    return spark.sql(f"""
WITH s AS ({_SEGS_SQL.replace('customer', '__x168_cust')}),
r(rid, bx1, by1, bx2, by2) AS (VALUES {_CLIP_RECTS_SQL}),
w AS (
  SELECT rid, k,
         concat('LINESTRING (', x1, ' ', y1, ', ', x2, ' ', y2,
                ')') AS lw,
         concat('POLYGON ((', bx1, ' ', by1, ', ', bx2, ' ', by1, ', ',
                bx2, ' ', by2, ', ', bx1, ' ', by2, ', ', bx1, ' ', by1,
                '))') AS rw
  FROM s CROSS JOIN r),
cl AS (SELECT rid, k, st_length(st_intersection(lw, rw)) AS clen FROM w)
SELECT rid,
       CAST(COUNT(*) FILTER (WHERE clen > 0) AS BIGINT) AS n_crossing,
       ROUND(SUM(clen), 4) AS clipped_len
FROM cl GROUP BY rid ORDER BY rid""")


# ---------------------------------------------------------------------------
# Grouped dissolve (round 8): ST_Union as a GROUP aggregate — merge each
# group's (overlapping) rectangles into one geometry.  Oracle: exact
# 3-way inclusion–exclusion interval arithmetic per group.

_DISSOLVE_RECTS = """SELECT c_custkey AS k,
       CAST(floor((c_custkey - 1) / 3) AS INT) AS g,
       CAST((c_custkey % 7) * 4 AS DOUBLE) AS x1,
       CAST((c_custkey % 5) * 4 AS DOUBLE) AS y1,
       CAST((c_custkey % 7) * 4 + 10 AS DOUBLE) AS x2,
       CAST((c_custkey % 5) * 4 + 10 AS DOUBLE) AS y2
  FROM customer WHERE c_custkey BETWEEN 1 AND 300"""


@x("x169_dissolve", f"""
WITH r AS (
  SELECT *, row_number() OVER (PARTITION BY g ORDER BY k) AS rn
  FROM ({_DISSOLVE_RECTS})
),
trip AS (
  SELECT a.g,
         (a.x2-a.x1)*(a.y2-a.y1) AS sa,
         (b.x2-b.x1)*(b.y2-b.y1) AS sb,
         (c.x2-c.x1)*(c.y2-c.y1) AS sc,
         GREATEST(0, LEAST(a.x2,b.x2)-GREATEST(a.x1,b.x1))
           * GREATEST(0, LEAST(a.y2,b.y2)-GREATEST(a.y1,b.y1)) AS iab,
         GREATEST(0, LEAST(a.x2,c.x2)-GREATEST(a.x1,c.x1))
           * GREATEST(0, LEAST(a.y2,c.y2)-GREATEST(a.y1,c.y1)) AS iac,
         GREATEST(0, LEAST(b.x2,c.x2)-GREATEST(b.x1,c.x1))
           * GREATEST(0, LEAST(b.y2,c.y2)-GREATEST(b.y1,c.y1)) AS ibc,
         GREATEST(0, LEAST(a.x2,b.x2,c.x2)-GREATEST(a.x1,b.x1,c.x1))
           * GREATEST(0, LEAST(a.y2,b.y2,c.y2)-GREATEST(a.y1,b.y1,c.y1))
           AS iabc
  FROM r a JOIN r b ON a.g = b.g AND b.rn = 2
           JOIN r c ON a.g = c.g AND c.rn = 3
  WHERE a.rn = 1)
SELECT g, ROUND(sa + sb + sc - iab - iac - ibc + iabc, 4) AS union_area
FROM trip ORDER BY g""")
def x169(spark, sf):
    """Grouped dissolve (the PostGIS ``GROUP BY region, ST_Union(geom)``
    shape): 100 groups of 3 overlapping rectangles merged by
    `operators.spatial.dissolve` (per-group Martinez tree-fold via
    applyInPandas; a salted two-stage fold handles giant groups at
    scale), areas hash-checked against exact 3-way inclusion–exclusion
    interval arithmetic in DuckDB."""
    from ..functions.geometry_sql import register_geometry_sql_functions
    from ..operators.spatial import dissolve

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x169_cust")
    rects = spark.sql(f"""
SELECT g, concat('POLYGON ((', x1, ' ', y1, ', ', x2, ' ', y1, ', ',
       x2, ' ', y2, ', ', x1, ' ', y2, ', ', x1, ' ', y1, '))') AS wkt
FROM ({_DISSOLVE_RECTS.replace('customer', '__x169_cust')})
WHERE g < CAST(300 / 3 AS INT)""")
    merged = dissolve(rects, ["g"], "wkt")
    return (merged.selectExpr("g",
                              "ROUND(st_area(geom), 4) AS union_area")
                  .orderBy("g"))


# ---------------------------------------------------------------------------
# General ST_Distance (round 8): min planar distance between arbitrary
# geometries.  Oracle: the closed-form distance from a point to an
# axis-aligned rectangle, sqrt(max(0, gapx)^2 + max(0, gapy)^2) — exact
# interval arithmetic that the engine's vertex/segment minimization
# must reproduce (ROUND 4 absorbs the clamped-projection division ulp).

_DIST_RECTS = [(1, 20, 15, 45, 40), (2, 60, 5, 85, 30), (3, 10, 55, 40, 80)]
_DIST_RECTS_SQL = ", ".join(f"({i}, {a}.0, {b}.0, {c}.0, {d}.0)"
                            for i, a, b, c, d in _DIST_RECTS)


@x("x170_distance", f"""
WITH p AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 101 AS DOUBLE) AS px,
         CAST(c_custkey % 97 AS DOUBLE) AS py
  FROM customer WHERE c_custkey <= 600),
r(rid, bx1, by1, bx2, by2) AS (VALUES {_DIST_RECTS_SQL}),
d AS (
  SELECT rid, k,
         sqrt(power(GREATEST(0, bx1 - px, px - bx2), 2)
            + power(GREATEST(0, by1 - py, py - by2), 2)) AS dist
  FROM p CROSS JOIN r)
SELECT rid,
       CAST(COUNT(*) FILTER (WHERE dist = 0) AS BIGINT) AS n_inside,
       CAST(COUNT(*) FILTER (WHERE dist > 0 AND dist <= 10) AS BIGINT)
         AS n_near,
       ROUND(SUM(dist), 4) AS total_dist
FROM d GROUP BY rid ORDER BY rid""")
def x170(spark, sf):
    """General ST_Distance through the SQL gateway: 600 synthetic
    points against 3 district rectangles — zero inside (via the
    intersects short-circuit), the ST_DWithin-style near band, and the
    distance sum, hash-checked against the exact closed-form
    point-to-rectangle distance in DuckDB.  The engine path is the
    generic vertex/segment minimization (no rectangle special-case),
    so the oracle holds the general formula to the closed form."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x170_cust")
    return spark.sql(f"""
WITH p AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 101 AS DOUBLE) AS px,
         CAST(c_custkey % 97 AS DOUBLE) AS py
  FROM __x170_cust WHERE c_custkey <= 600),
r(rid, bx1, by1, bx2, by2) AS (VALUES {_DIST_RECTS_SQL}),
d AS (
  SELECT rid, k,
         st_distance(concat('POINT (', px, ' ', py, ')'),
                     concat('POLYGON ((', bx1, ' ', by1, ', ',
                            bx2, ' ', by1, ', ', bx2, ' ', by2, ', ',
                            bx1, ' ', by2, ', ', bx1, ' ', by1,
                            '))')) AS dist
  FROM p CROSS JOIN r)
SELECT rid,
       CAST(COUNT(*) FILTER (WHERE dist = 0) AS BIGINT) AS n_inside,
       CAST(COUNT(*) FILTER (WHERE dist > 0 AND dist <= 10) AS BIGINT)
         AS n_near,
       ROUND(SUM(dist), 4) AS total_dist
FROM d GROUP BY rid ORDER BY rid""")


# ---------------------------------------------------------------------------
# GeoJSON export (round 8): st_asgeojson — the city-open-data export
# surface.  The oracle re-assembles the IDENTICAL JSON strings (DuckDB
# and Spark print doubles the same way), so the hash gate is on exact
# string equality, plus literal fixtures for every geometry type.

_GJ_FIXTURES = [
    (1001, "LINESTRING (0 0, 5 5)",
     '{"type":"LineString","coordinates":[[0.0,0.0],[5.0,5.0]]}'),
    (1002, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
           "(1 1, 2 1, 2 2, 1 2, 1 1))",
     '{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],'
     '[0.0,4.0],[0.0,0.0]],[[1.0,1.0],[2.0,1.0],[2.0,2.0],[1.0,2.0],'
     '[1.0,1.0]]]}'),
    (1003, "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
           "((5 5, 6 5, 6 6, 5 5)))",
     '{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],'
     '[1.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],'
     '[5.0,5.0]]]]}'),
    (1004, "MULTIPOINT ((1 2), (3 4))",
     '{"type":"MultiPoint","coordinates":[[1.0,2.0],[3.0,4.0]]}'),
]


@x("x171_geojson", """
WITH pts AS (
  SELECT c_custkey AS k,
         concat('{"type":"Point","coordinates":[',
                CAST(CAST(c_custkey % 101 AS DOUBLE) AS VARCHAR), ',',
                CAST(CAST(c_custkey % 97 AS DOUBLE) AS VARCHAR),
                ']}') AS gj
  FROM customer WHERE c_custkey <= 300)
SELECT k, gj FROM pts
UNION ALL
SELECT * FROM (VALUES
""" + ",\n".join("  (%d, '%s')" % (i, gj.replace("'", "''"))
                 for i, _, gj in _GJ_FIXTURES) + """
) AS t(k, gj)
ORDER BY k""")
def x171(spark, sf):
    """GeoJSON export through the SQL gateway: 300 synthetic points
    plus one fixture per geometry type (holed polygon, multipolygon,
    multi-point/line), hash-gated on EXACT string equality — the
    oracle re-assembles the same RFC 7946 JSON from the same doubles in
    DuckDB, and the fixtures are pinned literals."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x171_cust")
    fixture_vals = ", ".join(f"({i}, '{w}')" for i, w, _ in _GJ_FIXTURES)
    return spark.sql(f"""
WITH pts AS (
  SELECT c_custkey AS k,
         st_asgeojson(st_makepoint(CAST(c_custkey % 101 AS DOUBLE),
                                   CAST(c_custkey % 97 AS DOUBLE))) AS gj
  FROM __x171_cust WHERE c_custkey <= 300)
SELECT k, gj FROM pts
UNION ALL
SELECT k, st_asgeojson(w) AS gj
FROM VALUES {fixture_vals} AS t(k, w)
ORDER BY k""")


# ---------------------------------------------------------------------------
# Structural accessors (round 8): part/ring/vertex access + reversal +
# boundary.  Oracle: pinned literal truth per fixture (hand-derived,
# the x164/x166 discipline) — accessors are pure structure, so literal
# expectations validate semantics, not just arithmetic.

_X172_MP = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
            "((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))")
_X172_PG = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
_X172_LS = "LINESTRING (0 0, 5 5, 9 1)"


@x("x172_accessors", """
SELECT * FROM (VALUES
  (1, 2, 1, CAST('POLYGON ((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, '
     || '5.4 5.4, 5.2 5.2))' AS VARCHAR),
     CAST('LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)' AS VARCHAR),
     CAST('POINT (5.0 5.0)' AS VARCHAR),
     CAST('LINESTRING (9.0 1.0, 5.0 5.0, 0.0 0.0)' AS VARCHAR),
     CAST(0.98 AS DOUBLE),
     CAST('MULTIPOINT ((0.0 0.0), (9.0 1.0))' AS VARCHAR))
) AS t(case_id, n_parts, n_holes, part2, ext_ring, point2, rev_line,
       rev_area, line_bdy)
ORDER BY case_id""")
def x172(spark, sf):
    """Structural accessor pack through the SQL gateway — part/ring/
    vertex access (st_numgeometries / st_geometryn /
    st_numinteriorrings / st_exteriorring / st_pointn), reversal
    (st_reverse preserves area through the full MULTIPOLYGON nesting)
    and boundary extraction — against hand-pinned literal truth."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    return spark.sql(f"""
SELECT 1 AS case_id,
       st_numgeometries('{_X172_MP}') AS n_parts,
       st_numinteriorrings('{_X172_PG}') AS n_holes,
       st_geometryn('{_X172_MP}', 2) AS part2,
       st_exteriorring('{_X172_PG}') AS ext_ring,
       st_pointn('{_X172_LS}', 2) AS point2,
       st_reverse('{_X172_LS}') AS rev_line,
       ROUND(st_area(st_reverse('{_X172_MP}')), 6) AS rev_area,
       st_boundary('{_X172_LS}') AS line_bdy
ORDER BY case_id""")


# ---------------------------------------------------------------------------
# ST_IsValid / ST_MakeValid (round 8): even-odd validity repair — the
# GEOS "linework" method re-expressed on the module's own noding + XOR
# fold (functions/clipping.py).  The oracle pins hand-derived truth
# (validity verdicts and even-odd areas after repair) as literals; the
# fixtures cover the OGC failure modes (bowtie, self-touch, spike,
# crossing shells, double-wound cancellation, hole outside shell).

_X173_CASES = [
    (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", True, 100.0),
    (2, "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))", False, 50.0),
    (3, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 4 2, 4 4, 2 4, 2 2))", True, 96.0),
    (4, "POLYGON ((0 0, 4 0, 2 2, 4 4, 0 4, 2 2, 0 0))", False, 8.0),
    (5, "POLYGON ((0 0, 10 0, 10 10, 5 10, 5 15, 5 10, 0 10, 0 0))",
     False, 100.0),
    (6, "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((2 2, 6 2, 6 6, 2 6, 2 2)))", False, 24.0),
    (7, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0, 4 0, 4 4, 0 4, 0 0))",
     False, 0.0),
    (8, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
        "(10 10, 11 10, 11 11, 10 11, 10 10))", False, 17.0),
    (9, "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((10 10, 14 10, 14 14, 10 14, 10 10)))", True, 32.0),
]


@x("x173_makevalid", """
SELECT * FROM (VALUES
  (1, TRUE,  CAST(100.0 AS DOUBLE), TRUE),
  (2, FALSE, CAST(50.0  AS DOUBLE), TRUE),
  (3, TRUE,  CAST(96.0  AS DOUBLE), TRUE),
  (4, FALSE, CAST(8.0   AS DOUBLE), TRUE),
  (5, FALSE, CAST(100.0 AS DOUBLE), TRUE),
  (6, FALSE, CAST(24.0  AS DOUBLE), TRUE),
  (7, FALSE, CAST(0.0   AS DOUBLE), TRUE),
  (8, FALSE, CAST(17.0  AS DOUBLE), TRUE),
  (9, TRUE,  CAST(32.0  AS DOUBLE), TRUE)
) AS t(gid, is_valid, mv_area, mv_valid) ORDER BY gid""")
def x173(spark, sf):
    """ST_IsValid / ST_MakeValid through the SQL gateway: verdicts on
    the nine OGC-failure fixtures plus the even-odd area after repair
    (bowtie -> two triangles, spike vanishes, double-wound ring
    cancels to empty, crossing shells XOR) and the repaired geometry
    re-validating.  Areas are IEEE-exact on the integer fixtures, so
    the entry hash-matches the pinned truth."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    vals = ", ".join(f"({gid}, '{w}')" for gid, w, *_ in _X173_CASES)
    return spark.sql(f"""
SELECT gid,
       st_isvalid(w) AS is_valid,
       ROUND(st_area(st_makevalid(w)), 6) AS mv_area,
       st_isvalid(st_makevalid(w)) AS mv_valid
FROM VALUES {vals} AS t(gid, w) ORDER BY gid""")


@x("x174_extent_collect", """
WITH pts AS (SELECT c_custkey AS k, c_nationkey AS nk,
       CAST(c_custkey % 97 AS DOUBLE) AS px,
       CAST(c_custkey % 89 AS DOUBLE) AS py
  FROM customer WHERE c_custkey <= 2000)
SELECT CAST(nk AS BIGINT) AS nk,
       MIN(px) AS xmin, MIN(py) AS ymin,
       MAX(px) AS xmax, MAX(py) AS ymax,
       ROUND((MAX(px) - MIN(px)) * (MAX(py) - MIN(py)), 6) AS extent_area,
       CAST(COUNT(*) AS INT) AS n_collected,
       CAST('GEOMETRYCOLLECTION (POINT (1.0 2.0), '
            || 'LINESTRING (0 0, 1 1))' AS VARCHAR) AS gc
FROM pts GROUP BY nk ORDER BY nk""")
def x174(spark, sf):
    """Spatial extent + collect through the SQL gateway: per-nation
    bounding boxes via the ST_XMin family under plain MIN/MAX
    aggregates (the PostGIS ST_Extent composition — the reduction stays
    a JVM min/max, never a geometry fold), envelope areas via
    st_makeenvelope, and ST_Collect over array_agg (MULTIPOINT
    assembly, vertex count = group size; the mixed-type
    GEOMETRYCOLLECTION branch pinned on a literal).  Oracle re-derives
    every number from the raw coordinates."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x174_cust")
    return spark.sql("""
WITH pts AS (
  SELECT c_custkey AS k, c_nationkey AS nk,
         st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
                      CAST(c_custkey % 89 AS DOUBLE)) AS g
  FROM __x174_cust WHERE c_custkey <= 2000),
agg AS (
  SELECT CAST(nk AS BIGINT) AS nk,
         MIN(st_xmin(g)) AS xmin, MIN(st_ymin(g)) AS ymin,
         MAX(st_xmax(g)) AS xmax, MAX(st_ymax(g)) AS ymax,
         st_npoints(st_collect(collect_list(g))) AS n_collected
  FROM pts GROUP BY nk)
SELECT nk, xmin, ymin, xmax, ymax,
       ROUND(st_area(st_makeenvelope(xmin, ymin, xmax, ymax)), 6)
         AS extent_area,
       n_collected,
       st_collect(array('POINT (1.0 2.0)',
                        'LINESTRING (0 0, 1 1)')) AS gc
FROM agg ORDER BY nk""")


# geohash bit-fold replayed as a DuckDB recursive CTE — identical
# interval-halving arithmetic, so the strings are exactly equal
_X175_ORACLE = """
WITH RECURSIVE pts AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 360 AS DOUBLE) - 180 + 0.5 AS lon,
         CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.25 AS lat
  FROM customer WHERE c_custkey <= 300),
gh AS (
  SELECT k, lon, lat, 0 AS i,
         CAST(-180 AS DOUBLE) AS lo1, CAST(180 AS DOUBLE) AS hi1,
         CAST(-90 AS DOUBLE) AS lo2, CAST(90 AS DOUBLE) AS hi2,
         0 AS acc, '' AS out
  FROM pts
  UNION ALL
  SELECT k, lon, lat, i + 1,
    CASE WHEN i % 2 = 0 AND lon >= (lo1+hi1)/2 THEN (lo1+hi1)/2
         ELSE lo1 END,
    CASE WHEN i % 2 = 0 AND lon <  (lo1+hi1)/2 THEN (lo1+hi1)/2
         ELSE hi1 END,
    CASE WHEN i % 2 = 1 AND lat >= (lo2+hi2)/2 THEN (lo2+hi2)/2
         ELSE lo2 END,
    CASE WHEN i % 2 = 1 AND lat <  (lo2+hi2)/2 THEN (lo2+hi2)/2
         ELSE hi2 END,
    CASE WHEN i % 5 = 4 THEN 0
         ELSE acc * 2 + (CASE WHEN i % 2 = 0
                              THEN (CASE WHEN lon >= (lo1+hi1)/2
                                         THEN 1 ELSE 0 END)
                              ELSE (CASE WHEN lat >= (lo2+hi2)/2
                                         THEN 1 ELSE 0 END) END) END,
    CASE WHEN i % 5 = 4
         THEN out || substring('0123456789bcdefghjkmnpqrstuvwxyz',
              acc * 2 + (CASE WHEN i % 2 = 0
                              THEN (CASE WHEN lon >= (lo1+hi1)/2
                                         THEN 1 ELSE 0 END)
                              ELSE (CASE WHEN lat >= (lo2+hi2)/2
                                         THEN 1 ELSE 0 END) END) + 1, 1)
         ELSE out END
  FROM gh WHERE i < 40)
SELECT substring(out, 1, 4) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(out) AS min_hash, MAX(out) AS max_hash
FROM gh WHERE i = 40
GROUP BY prefix ORDER BY prefix"""


@x("x175_geohash", _X175_ORACLE)
def x175(spark, sf):
    """ST_GeoHash through the SQL gateway: 300 synthetic lon/lat points
    encoded at precision 8, grouped by 4-char geohash prefix (the
    spatial BUCKETING composition — prefix = fixed-size cell).  The
    oracle replays the identical interval-halving bit fold as a DuckDB
    recursive CTE, so the strings are exactly equal; the engine side is
    one row-local Catalyst fold, zero shuffle before the prefix agg."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x175_cust")
    return spark.sql("""
WITH pts AS (
  SELECT c_custkey AS k,
         st_makepoint(CAST(c_custkey % 360 AS DOUBLE) - 180 + 0.5,
                      CAST(c_custkey % 180 AS DOUBLE) - 90 + 0.25) AS g
  FROM __x175_cust WHERE c_custkey <= 300),
h AS (SELECT k, st_geohash(g, 8) AS gh FROM pts)
SELECT substring(gh, 1, 4) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(gh) AS min_hash, MAX(gh) AS max_hash
FROM h GROUP BY prefix ORDER BY prefix""")


# ---------------------------------------------------------------------------
# Linear referencing + closest-point pack (round 8): ST_Azimuth,
# ST_LineInterpolatePoint / ST_LineLocatePoint / ST_LineSubstring,
# ST_ClosestPoint / ST_ShortestLine — transit/addressing splices the
# reference's PostGIS users run in where=/execute.  Engine = pure
# Catalyst folds over the segment arrays (row-local, zero shuffle);
# oracles re-derive the identical arithmetic closed-form in DuckDB on
# the canonical 3-4-5 polyline / axis rectangle, so every number is
# ROUND-stable (params vary per customer row).

_X176_ORACLE = """
WITH p AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 100 AS DOUBLE) / 100 AS f,
         CAST(c_custkey % 80 AS DOUBLE) / 100 AS f1,
         CAST(c_custkey % 80 AS DOUBLE) / 100
           + CAST(c_custkey % 15 + 1 AS DOUBLE) / 100 AS f2,
         CAST(c_custkey % 7 AS DOUBLE) AS px,
         CAST(c_custkey % 9 AS DOUBLE) AS py,
         CAST(c_custkey % 7 AS DOUBLE) - 3 AS dx,
         CAST(c_custkey % 9 AS DOUBLE) - 4 AS dy
  FROM customer WHERE c_custkey <= 400),
d AS (
  SELECT k, f, f1, f2, px, py, dx, dy,
         f * 7 AS pos,
         GREATEST(0.0, LEAST(1.0, px * 3 / 9)) AS t1,
         GREATEST(0.0, LEAST(1.0, py * 4 / 16)) AS t2,
         f1 * 7 AS lo, f2 * 7 AS hi
  FROM p),
e AS (
  SELECT k,
         CASE WHEN pos <= 3 THEN pos ELSE 3.0 END AS ix,
         CASE WHEN pos <= 3 THEN 0.0 ELSE 0 + ((pos - 3) / 4) * 4 END
           AS iy,
         POWER(px - t1 * 3, 2) + POWER(py, 2) AS d1sq,
         POWER(px - 3, 2) + POWER(py - t2 * 4, 2) AS d2sq,
         t1 * 3 AS pos1, 3 + t2 * 4 AS pos2,
         GREATEST(0.0, LEAST(3.0, hi) - GREATEST(0.0, lo))
           + GREATEST(0.0, LEAST(7.0, hi) - GREATEST(3.0, lo)) AS slen,
         CASE WHEN dx = 0 AND dy = 0 THEN NULL
              WHEN atan2(dx, dy) < 0 THEN atan2(dx, dy) + 2 * pi()
              ELSE atan2(dx, dy) END AS az
  FROM d)
SELECT k,
       ROUND(ix, 6) AS ix, ROUND(iy, 6) AS iy,
       ROUND((CASE WHEN d2sq < d1sq THEN pos2 ELSE pos1 END) / 7, 9)
         AS loc,
       ROUND(slen, 6) AS sub_len,
       ROUND(az, 9) AS az
FROM e ORDER BY k"""


@x("x176_linear_ref", _X176_ORACLE)
def x176(spark, sf):
    """Linear referencing through the SQL gateway on the canonical
    3-4-5 polyline with per-customer parameters: interpolated point
    coords, locate fraction (strict-first-min tie rule replicated in
    the oracle), substring length (engine re-parses its own built WKT),
    and full-quadrant azimuth (pmod normalization).  All Catalyst
    folds; the oracle is closed-form DuckDB arithmetic over identical
    IEEE inputs, ROUND-stabilized."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x176_cust")
    return spark.sql("""
WITH p AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 100 AS DOUBLE) / 100 AS f,
         CAST(c_custkey % 80 AS DOUBLE) / 100 AS f1,
         CAST(c_custkey % 80 AS DOUBLE) / 100
           + CAST(c_custkey % 15 + 1 AS DOUBLE) / 100 AS f2,
         st_makepoint(CAST(c_custkey % 7 AS DOUBLE),
                      CAST(c_custkey % 9 AS DOUBLE)) AS pt,
         st_makepoint(CAST(c_custkey % 7 AS DOUBLE) - 3,
                      CAST(c_custkey % 9 AS DOUBLE) - 4) AS dpt
  FROM __x176_cust WHERE c_custkey <= 400),
e AS (
  SELECT k,
         st_lineinterpolatepoint('LINESTRING (0 0, 3 0, 3 4)', f) AS ip,
         st_linelocatepoint('LINESTRING (0 0, 3 0, 3 4)', pt) AS loc,
         st_length(st_linesubstring('LINESTRING (0 0, 3 0, 3 4)',
                                    f1, f2)) AS slen,
         st_azimuth('POINT (0 0)', dpt) AS az
  FROM p)
SELECT k,
       ROUND(st_x(ip), 6) AS ix, ROUND(st_y(ip), 6) AS iy,
       ROUND(loc, 9) AS loc,
       ROUND(coalesce(slen, 0.0), 6) AS sub_len,
       ROUND(az, 9) AS az
FROM e ORDER BY k""")


_X177_ORACLE = """
WITH p AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 80 AS DOUBLE) - 20 + 0.25 AS px,
         CAST(c_custkey % 70 AS DOUBLE) - 20 + 0.5 AS py
  FROM customer WHERE c_custkey <= 400),
c AS (
  SELECT k, px, py,
         CASE WHEN px > 0 AND px < 40 AND py > 0 AND py < 30 THEN
           CASE WHEN py <= (40 - px) AND py <= (30 - py) AND py <= px
                THEN px
                WHEN (40 - px) <= (30 - py) AND (40 - px) <= px
                THEN 40.0
                WHEN (30 - py) <= px THEN px
                ELSE 0.0 END
         ELSE GREATEST(0.0, LEAST(40.0, px)) END AS cx,
         CASE WHEN px > 0 AND px < 40 AND py > 0 AND py < 30 THEN
           CASE WHEN py <= (40 - px) AND py <= (30 - py) AND py <= px
                THEN 0.0
                WHEN (40 - px) <= (30 - py) AND (40 - px) <= px
                THEN py
                WHEN (30 - py) <= px THEN 30.0
                ELSE py END
         ELSE GREATEST(0.0, LEAST(30.0, py)) END AS cy
  FROM p)
SELECT k, ROUND(cx, 6) AS cx, ROUND(cy, 6) AS cy,
       ROUND(SQRT(POWER(px - cx, 2) + POWER(py - cy, 2)), 6) AS dist
FROM c ORDER BY k"""


@x("x177_closest_point", _X177_ORACLE)
def x177(spark, sf):
    """ST_ClosestPoint / ST_ShortestLine through the SQL gateway:
    per-customer points (inside and outside an axis rectangle) against
    the rectangle ring — closest boundary point and separation
    distance.  The engine folds vertex-projection candidates with a
    strict-first-min rule over the ring's WKT segment order (bottom,
    right, top, left); the oracle replays that priority closed-form.
    Fixture coordinates carry distinct fractional parts so no two
    edges ever tie."""
    from ..functions.geometry_sql import register_geometry_sql_functions

    register_geometry_sql_functions(spark)
    load(spark, sf, "customer").createOrReplaceTempView("__x177_cust")
    return spark.sql("""
WITH p AS (
  SELECT c_custkey AS k,
         st_makepoint(CAST(c_custkey % 80 AS DOUBLE) - 20 + 0.25,
                      CAST(c_custkey % 70 AS DOUBLE) - 20 + 0.5) AS pt
  FROM __x177_cust WHERE c_custkey <= 400),
c AS (
  SELECT k,
         st_closestpoint('POLYGON ((0 0, 40 0, 40 30, 0 30, 0 0))',
                         pt) AS cp,
         st_shortestline('POLYGON ((0 0, 40 0, 40 30, 0 30, 0 0))',
                         pt) AS sl
  FROM p)
SELECT k, ROUND(st_x(cp), 6) AS cx, ROUND(st_y(cp), 6) AS cy,
       ROUND(st_length(sl), 6) AS dist
FROM c ORDER BY k""")


@x("x181_dbscan", """
WITH RECURSIVE p AS (
  SELECT c_custkey AS id, abs(c_acctbal) % 100 AS x,
         CAST(c_custkey % 100 AS DOUBLE) AS y FROM customer
), nbr AS (
  SELECT a.id AS ia, b.id AS ib
  FROM p a JOIN p b
    ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4.0
), core AS (
  SELECT ia AS id FROM nbr GROUP BY ia HAVING COUNT(*) >= 4
), ce AS (
  SELECT ia, ib FROM nbr
  WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)
    AND ia <> ib
), reach(a, b) AS (
  SELECT id, id FROM core
  UNION
  SELECT r.a, e.ib FROM reach r JOIN ce e ON r.b = e.ia
), lab AS (
  SELECT a AS id, MIN(b) AS cluster FROM reach GROUP BY a
), border AS (
  SELECT n.ia AS id, MIN(l.cluster) AS cluster
  FROM nbr n JOIN lab l ON n.ib = l.id
  WHERE n.ia NOT IN (SELECT id FROM core)
  GROUP BY n.ia
), allpts AS (
  SELECT p.id, p.x, p.y,
         COALESCE(l.cluster, border.cluster) AS cluster,
         l.id IS NOT NULL AS is_core
  FROM p LEFT JOIN lab l ON p.id = l.id
         LEFT JOIN border ON p.id = border.id
)
SELECT COALESCE(cluster, -1) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT)
         AS n_core,
       ROUND(AVG(x), 4) AS cx, ROUND(AVG(y), 4) AS cy
FROM allpts GROUP BY 1 ORDER BY cluster""")
def x181(spark, sf):
    """Density-based spatial clustering (``ST_ClusterDBSCAN`` parity,
    eps=2, minPoints=4) over the customer point cloud, summarized per
    cluster (noise = -1): the geocode-blob detector a spatial-ETL user
    gets from PostGIS as a window function.  The engine composes the
    uniform-grid radius join (never all-pairs), map-combined degree
    counts and alternating-star connected components; border points
    take the smallest candidate cluster deterministically, so the
    all-pairs recursive-CTE oracle replays the exact labeling."""
    from ..operators.spatial import dbscan

    cust = (load(spark, sf, "customer")
            .select("c_custkey",
                    (F.abs(F.col("c_acctbal")) % 100).alias("x"),
                    (F.col("c_custkey") % 100).cast("double").alias("y")))
    out = dbscan(cust, "c_custkey", "x", "y", eps=2.0, min_pts=4)
    return (out.groupBy(F.coalesce("cluster", F.lit(-1)).alias("cluster"))
               .agg(F.count(F.lit(1)).alias("n_points"),
                    F.sum(F.col("is_core").cast("long")).alias("n_core"),
                    F.round(F.avg("x"), 4).alias("cx"),
                    F.round(F.avg("y"), 4).alias("cy"))
               .orderBy("cluster"))
