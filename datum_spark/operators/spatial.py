"""Distributed spatial joins (planar, on x/y columns).

The reference's domain is spatial ETL (PostGIS/Oracle-SDE tables —
`/root/reference/datum/postgis/table.py`), but it delegates every spatial
predicate to the database.  A Spark engine has to supply the join
strategy itself: the naive ``ST_DWithin`` translation is a cross join
with a distance filter — quadratic, dead at any scale.

``radius_join`` is the standard uniform-grid decomposition: snap both
sides to square cells of side ``radius``; then any pair within
``radius`` must land in the same cell OR an adjacent one, so expanding
ONE side to its 3×3 cell neighborhood and equi-joining on the cell key
finds every candidate exactly once (the un-expanded side keeps its
single home cell, so no pair dedup is ever needed).  The exact
squared-distance filter then removes false positives.  One hash
shuffle on the cell key; candidate count is bounded by local density,
not table size.  Hot cells (downtown effects) are ordinary join skew —
AQE skew-split or ``skew.salted_join`` applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(x, y, radius: float):
    return (F.floor(x / radius).cast("long"),
            F.floor(y / radius).cast("long"))


def radius_join(left: DataFrame, right: DataFrame,
                lx: str, ly: str, rx: str, ry: str,
                radius: float,
                dist_col: str = "dist") -> DataFrame:
    """All pairs (left row, right row) with planar distance ≤ ``radius``
    (closed boundary, ``ST_DWithin`` semantics).  Output = left columns +
    right columns + ``dist_col``; column names must not collide (alias
    beforehand).  See module docstring for the grid strategy."""
    cx, cy = _cell(F.col(lx), F.col(ly), radius)
    lt = left.withColumn("__cx", cx).withColumn("__cy", cy)
    # right side visits its 3×3 neighborhood — each candidate pair meets
    # in exactly one cell: the LEFT point's home cell
    rcx, rcy = _cell(F.col(rx), F.col(ry), radius)
    off = F.explode(F.array(*[F.struct(F.lit(dx).alias("dx"),
                                       F.lit(dy).alias("dy"))
                              for dx in (-1, 0, 1) for dy in (-1, 0, 1)]))
    rt = (right.withColumn("__o", off)
               .withColumn("__cx", rcx + F.col("__o.dx"))
               .withColumn("__cy", rcy + F.col("__o.dy"))
               .drop("__o"))
    # plain multiplications, not pow(): x*x is the same IEEE op in every
    # engine, so a boundary pair (dist² == radius²) lands on the same side
    # of the filter wherever the query is re-derived
    dx, dy = F.col(lx) - F.col(rx), F.col(ly) - F.col(ry)
    d2 = dx * dx + dy * dy
    return (lt.join(rt, ["__cx", "__cy"])
              .filter(d2 <= F.lit(float(radius) * float(radius)))
              .withColumn(dist_col, F.sqrt(d2))
              .drop("__cx", "__cy"))


def nearest_neighbor_join(left: DataFrame, right: DataFrame,
                          lx: str, ly: str, rx: str, ry: str,
                          left_id: str, max_radius: float,
                          dist_col: str = "dist") -> DataFrame:
    """Each left row's single nearest right row within ``max_radius``
    (ties broken by the right side's column order via min_by struct) —
    the geocode-snap / nearest-facility operator.  Built on
    :func:`radius_join`; left rows with no neighbor inside the radius
    are absent from the output (semi-join semantics, like a bounded KNN
    with k=1)."""
    paired = radius_join(left, right, lx, ly, rx, ry, max_radius,
                         dist_col=dist_col)
    rcols = [c for c in right.columns]
    pick = F.expr(f"min_by(struct({', '.join(rcols + [dist_col])}), "
                  f"struct({dist_col}, {rcols[0]}))")
    lcols = [c for c in left.columns]
    out = (paired.groupBy(*lcols).agg(pick.alias("__nn")))
    for c in rcols + [dist_col]:
        out = out.withColumn(c, F.col(f"__nn.{c}"))
    return out.drop("__nn")
