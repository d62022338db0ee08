"""Built-in ellipsoidal map projections (no external deps).

The reference's client-side reprojection (``datum/oracle_stgeom/util.py:5-19``,
dead code there per SURVEY §1.4#1 — its intent was Philadelphia State Plane ↔
WGS84/NAD83, comment at ``datum/oracle_stgeom/table.py:205-207``) needs a real
transform.  pyproj is not in this runtime, so the projection of record is
implemented directly: Lambert Conformal Conic (2SP) on GRS80, formulas from
Snyder, *Map Projections — A Working Manual* (USGS PP 1395, public domain),
§15.  NAD83 ↔ WGS84 datum shift is treated as zero (centimeter-level,
standard practice at mapping accuracy; the reference's own SDE pipeline did
the same).

Supported SRIDs: 4326 (geographic NAD83/WGS84) and 2272 (PA South, US survey
feet).  The parameter table is data — adding another LCC state-plane zone is
one dict entry.  Everything is vectorized NumPy, called from the Arrow-batched
WKT plumbing in ``geometry.py``.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = 2 * _F - _F * _F
_E = float(np.sqrt(_E2))

_FT_US = 1200.0 / 3937.0  # US survey foot in meters (exact ratio)

# EPSG:2272 — NAD83 / Pennsylvania South (ftUS), Lambert Conformal Conic 2SP.
# Parameters from the public EPSG registry entry.
_LCC_ZONES = {
    2272: {
        "lat0": 39.0 + 20.0 / 60.0,        # latitude of false origin
        "lon0": -(77.0 + 45.0 / 60.0),     # central meridian
        "lat1": 40.0 + 58.0 / 60.0,        # standard parallel 1
        "lat2": 39.0 + 56.0 / 60.0,        # standard parallel 2
        "fe_m": 600000.0,                  # false easting (1,968,500 ftUS)
        "fn_m": 0.0,
        "unit_m": _FT_US,                  # coordinate unit in meters
    },
}


def _m(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _t(phi: np.ndarray) -> np.ndarray:
    s = _E * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - s) / (1.0 + s)) ** (_E / 2.0)


class _Lcc2Sp:
    def __init__(self, p: dict):
        lat0, lat1, lat2 = (np.radians(p["lat0"]), np.radians(p["lat1"]),
                            np.radians(p["lat2"]))
        self.lon0 = np.radians(p["lon0"])
        m1, m2 = _m(np.array(lat1)), _m(np.array(lat2))
        t0, t1, t2 = _t(np.array(lat0)), _t(np.array(lat1)), _t(np.array(lat2))
        self.n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
        self.big_f = float(m1 / (self.n * t1 ** self.n))
        self.rho0 = _A * self.big_f * float(t0) ** self.n
        self.fe, self.fn, self.unit = p["fe_m"], p["fn_m"], p["unit_m"]

    def forward(self, lon_deg, lat_deg):
        """(lon°, lat°) → (easting, northing) in the zone's native unit."""
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        rho = _A * self.big_f * _t(phi) ** self.n
        theta = self.n * (lam - self.lon0)
        x = self.fe + rho * np.sin(theta)
        y = self.fn + self.rho0 - rho * np.cos(theta)
        return x / self.unit, y / self.unit

    def inverse(self, x_unit, y_unit):
        """(easting, northing) in native unit → (lon°, lat°)."""
        x = np.asarray(x_unit, dtype=np.float64) * self.unit - self.fe
        y = self.rho0 - (np.asarray(y_unit, dtype=np.float64) * self.unit
                         - self.fn)
        sign = np.sign(self.n) or 1.0
        rho = sign * np.hypot(x, y)
        theta = np.arctan2(sign * x, sign * y)
        lam = theta / self.n + self.lon0
        tp = (rho / (_A * self.big_f)) ** (1.0 / self.n)
        # fixed-point iteration for phi (converges quadratically; 8 rounds
        # reaches double precision)
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(8):
            s = _E * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - s) / (1.0 + s)) ** (_E / 2.0))
        return np.degrees(lam), np.degrees(phi)


def builtin_transform(from_srid: int, to_srid: int):
    """``fn(x, y) -> (x', y')`` for SRID pairs the built-in math covers,
    else ``None``.  Accepts scalars or arrays (NumPy-vectorized)."""
    if from_srid == 4326 and to_srid in _LCC_ZONES:
        proj = _Lcc2Sp(_LCC_ZONES[to_srid])
        return proj.forward
    if to_srid == 4326 and from_srid in _LCC_ZONES:
        proj = _Lcc2Sp(_LCC_ZONES[from_srid])
        return proj.inverse
    return None
