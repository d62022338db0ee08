"""Scalar-function layer: SQL dialect shim + WKT geometry expressions."""

from .dialect import translate_predicate, translate_sql
from .geometry import (
    scrub_m_values,
    force_2d,
    multi_cast,
    wkt_geom_type,
    empty_wkt,
    reproject_wkt,
)

__all__ = [
    "translate_predicate", "translate_sql",
    "scrub_m_values", "force_2d", "multi_cast", "wkt_geom_type",
    "empty_wkt", "reproject_wkt",
]
