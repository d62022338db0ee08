"""Geometry unit fixtures (SURVEY §5 item 4) — WKT-string semantics.

These mirror the reference's geometry handling: m-value scrub regexes
(datum/oracle_stgeom/table.py:33-34), MULTI-cast on write
(datum/postgis/table.py:246-254), EMPTY for null geometry
(datum/oracle_stgeom/table.py:320-322), Force2D intent
(datum/postgis/table.py:181-187), and reprojection plumbing
(datum/oracle_stgeom/util.py:5-19 — dead code there, real here).
"""

import pytest
from pyspark.sql import functions as F

from datum_spark.functions import geometry as G


def _one(spark, col_expr, value):
    df = spark.createDataFrame([(value,)], "wkt string")
    return df.select(col_expr.alias("out")).collect()[0]["out"]


def test_scrub_m_values(spark):
    wkt = "LINESTRING M (0 0 1.#QNAN000, 1 1 1.#QNAN000)"
    out = _one(spark, G.scrub_m_values(F.col("wkt")), wkt)
    assert out == "LINESTRING (0 0, 1 1)"


def test_scrub_m_keeps_plain(spark):
    wkt = "LINESTRING (0 0, 1 1)"
    assert _one(spark, G.scrub_m_values(F.col("wkt")), wkt) == wkt


def test_force_2d(spark):
    wkt = "POINT Z (1.5 2.5 NaN)"
    assert _one(spark, G.force_2d(F.col("wkt")), wkt) == "POINT (1.5 2.5)"


def test_multi_cast_promotes_single(spark):
    out = _one(spark, G.multi_cast(F.col("wkt"), "MULTIPOINT"), "POINT (1 2)")
    assert out == "MULTIPOINT ((1 2))"


def test_multi_cast_keeps_multi(spark):
    wkt = "MULTIPOINT ((1 2), (3 4))"
    assert _one(spark, G.multi_cast(F.col("wkt"), "MULTIPOINT"), wkt) == wkt


def test_multi_cast_nontarget_noop(spark):
    wkt = "POINT (1 2)"
    assert _one(spark, G.multi_cast(F.col("wkt"), "POINT"), wkt) == wkt


def test_empty_wkt():
    assert G.empty_wkt("multilinestring") == "MULTILINESTRING EMPTY"


def test_wkt_geom_type(spark):
    assert _one(spark, G.wkt_geom_type(F.col("wkt")),
                " MultiPolygon (((0 0, 1 0, 1 1, 0 0)))") == "MULTIPOLYGON"


def test_reproject_plumbing_with_fake_transform(spark):
    """The distributed reprojection path, with a deterministic fake
    coordinate function standing in for pyproj (not in this runtime)."""
    def make_fn():
        return lambda x, y: (x + 100.0, y - 50.0)

    df = spark.createDataFrame(
        [("POINT (1 2)",), ("LINESTRING (0 0, 10 20)",), (None,)],
        "wkt string")
    out = [r["out"] for r in
           df.select(G._reproject_with(F.col("wkt"), make_fn).alias("out"))
             .collect()]
    assert out[0] == "POINT (101.00000000 -48.00000000)"
    assert out[1] == "LINESTRING (100.00000000 -50.00000000, 110.00000000 -30.00000000)"
    assert out[2] is None


def test_reproject_requires_pyproj():
    if G._HAVE_PYPROJ:
        pytest.skip("pyproj present; gate not exercised")
    with pytest.raises(NotImplementedError):
        G.reproject_wkt(F.col("x"), 2272, 4326)


def test_write_applies_geometry_prep(tmp_db):
    tmp_db.create_table("seg", [{"name": "shape", "type": "geom"},
                                {"name": "nm", "type": "text"}])
    # register MULTI geom type + srid like a real feature class
    t = tmp_db.table("seg")
    t._store_props({**t._props, "geom_type": "MULTILINESTRING", "srid": 2272})
    t = tmp_db.table("seg")  # fresh handle re-reads props
    t.write([
        {"nm": "plain", "shape": "LINESTRING (0 0, 1 1)"},
        {"nm": "multi", "shape": "MULTILINESTRING ((0 0, 1 1))"},
        {"nm": "measured", "shape": "LINESTRING M (0 0 1.#QNAN000, 1 1 1.#QNAN000)"},
        {"nm": "missing", "shape": None},
    ])
    rows = {r["nm"]: r["shape"] for r in t.read(fields=["nm", "shape"])}
    assert rows["plain"] == "MULTILINESTRING ((0 0, 1 1))"
    assert rows["multi"] == "MULTILINESTRING ((0 0, 1 1))"
    assert rows["measured"] == "MULTILINESTRING ((0 0, 1 1))"
    assert rows["missing"] == "MULTILINESTRING EMPTY"
