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
    # shoelace over the (closed) vertex list — simple single-ring
    # polygons; holes/multipolygons need a real geometry lib
    "st_area": ("(w STRING)", "DOUBLE",
                f"abs({_seg_fold('w', 'p.x * q.y - q.x * p.y')}) / 2"),
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


def register_geometry_sql_functions(spark: SparkSession) -> None:
    """Idempotently register the ST_* pack as temporary SQL functions."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
                  f"RETURNS {ret} RETURN {body}")
