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


def register_geometry_sql_functions(spark: SparkSession) -> None:
    """Idempotently register the ST_* pack as temporary SQL functions."""
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
                  f"RETURNS {ret} RETURN {body}")
