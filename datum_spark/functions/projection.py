"""Built-in ellipsoidal map projections (no external deps).

The reference's client-side reprojection (``datum/oracle_stgeom/util.py:5-19``,
dead code there per SURVEY §1.4#1 — its intent was Philadelphia State Plane ↔
WGS84/NAD83, comment at ``datum/oracle_stgeom/table.py:205-207``) needs a real
transform.  pyproj is not in this runtime, so the projections of record are
implemented directly from Snyder, *Map Projections — A Working Manual*
(USGS PP 1395, public domain): Lambert Conformal Conic 2SP (§15),
Transverse Mercator series (§8), and spherical Web Mercator.  NAD83 ↔ WGS84
datum shift is treated as zero (centimeter-level, standard practice at
mapping accuracy; the reference's own SDE pipeline did the same).

Supported SRIDs:

- 4326 — geographic NAD83/WGS84 (the hub: unsupported-pair transforms
  compose through it);
- LCC 2SP state-plane zones from the parameter table (2272 PA South,
  2271 PA North, 2263 NY Long Island — one dict entry per zone);
- Transverse Mercator: every WGS84 UTM zone (EPSG 326xx N / 327xx S) and
  NAD83 UTM (EPSG 269xx);
- 3857 — spherical Web Mercator.

Everything is vectorized NumPy, called from the Arrow-batched WKT plumbing
in ``geometry.py``.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = 2 * _F - _F * _F
_E = float(np.sqrt(_E2))

_FT_US = 1200.0 / 3937.0  # US survey foot in meters (exact ratio)

# Lambert Conformal Conic 2SP zones, parameters from the public EPSG
# registry entries (angles in degrees, false origin in meters).
_LCC_ZONES = {
    # EPSG:2272 — NAD83 / Pennsylvania South (ftUS)
    2272: {
        "lat0": 39.0 + 20.0 / 60.0,        # latitude of false origin
        "lon0": -(77.0 + 45.0 / 60.0),     # central meridian
        "lat1": 40.0 + 58.0 / 60.0,        # standard parallel 1
        "lat2": 39.0 + 56.0 / 60.0,        # standard parallel 2
        "fe_m": 600000.0,                  # false easting (1,968,500 ftUS)
        "fn_m": 0.0,
        "unit_m": _FT_US,                  # coordinate unit in meters
    },
    # EPSG:2271 — NAD83 / Pennsylvania North (ftUS)
    2271: {
        "lat0": 40.0 + 10.0 / 60.0,
        "lon0": -(77.0 + 45.0 / 60.0),
        "lat1": 41.0 + 57.0 / 60.0,
        "lat2": 40.0 + 53.0 / 60.0,
        "fe_m": 600000.0,
        "fn_m": 0.0,
        "unit_m": _FT_US,
    },
    # EPSG:2263 — NAD83 / New York Long Island (ftUS)
    2263: {
        "lat0": 40.0 + 10.0 / 60.0,
        "lon0": -74.0,
        "lat1": 41.0 + 2.0 / 60.0,
        "lat2": 40.0 + 40.0 / 60.0,
        "fe_m": 300000.0,                  # 984,250 ftUS exactly
        "fn_m": 0.0,
        "unit_m": _FT_US,
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


class _TransverseMercator:
    """Ellipsoidal Transverse Mercator, Snyder §8 series (8-9..8-25):
    sub-mm agreement with the exact projection within UTM zone widths."""

    def __init__(self, lat0: float, lon0: float, k0: float,
                 fe: float, fn: float, unit_m: float = 1.0):
        self.lon0 = np.radians(lon0)
        self.k0, self.fe, self.fn, self.unit = k0, fe, fn, unit_m
        self.ep2 = _E2 / (1.0 - _E2)
        self.m0 = self._merid(np.radians(lat0))
        e1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
        self._e1 = e1

    @staticmethod
    def _merid(phi):
        """Meridian arc length from the equator (Snyder 3-21)."""
        e2, e4, e6 = _E2, _E2 * _E2, _E2 * _E2 * _E2
        return _A * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
                     - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024)
                     * np.sin(2 * phi)
                     + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
                     - (35 * e6 / 3072) * np.sin(6 * phi))

    def forward(self, lon_deg, lat_deg):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
        big_n = _A / np.sqrt(1.0 - _E2 * sin_p * sin_p)
        big_t = tan_p * tan_p
        big_c = self.ep2 * cos_p * cos_p
        big_a = (lam - self.lon0) * cos_p
        a2, a3 = big_a * big_a, None
        a3 = a2 * big_a
        x = self.k0 * big_n * (
            big_a + (1 - big_t + big_c) * a3 / 6.0
            + (5 - 18 * big_t + big_t * big_t + 72 * big_c
               - 58 * self.ep2) * a3 * a2 / 120.0)
        y = self.k0 * (self._merid(phi) - self.m0 + big_n * tan_p * (
            a2 / 2.0 + (5 - big_t + 9 * big_c + 4 * big_c * big_c)
            * a2 * a2 / 24.0
            + (61 - 58 * big_t + big_t * big_t + 600 * big_c
               - 330 * self.ep2) * a3 * a3 / 720.0))
        return (x + self.fe) / self.unit, (y + self.fn) / self.unit

    def inverse(self, x_unit, y_unit):
        x = np.asarray(x_unit, dtype=np.float64) * self.unit - self.fe
        y = np.asarray(y_unit, dtype=np.float64) * self.unit - self.fn
        m = self.m0 + y / self.k0
        mu = m / (_A * (1 - _E2 / 4 - 3 * _E2 * _E2 / 64
                        - 5 * _E2 ** 3 / 256))
        e1 = self._e1
        phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
                + (21 * e1 * e1 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
                + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
                + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
        sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
        c1 = self.ep2 * cos1 * cos1
        t1 = tan1 * tan1
        n1 = _A / np.sqrt(1.0 - _E2 * sin1 * sin1)
        r1 = _A * (1.0 - _E2) / (1.0 - _E2 * sin1 * sin1) ** 1.5
        d = x / (n1 * self.k0)
        d2 = d * d
        phi = phi1 - (n1 * tan1 / r1) * (
            d2 / 2.0 - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1
                        - 9 * self.ep2) * d2 * d2 / 24.0
            + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * self.ep2
               - 3 * c1 * c1) * d2 * d2 * d2 / 720.0)
        lam = self.lon0 + (d - (1 + 2 * t1 + c1) * d2 * d / 6.0
                           + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1
                              + 8 * self.ep2 + 24 * t1 * t1)
                           * d2 * d2 * d / 120.0) / cos1
        return np.degrees(lam), np.degrees(phi)


class _WebMercator:
    """EPSG:3857 — spherical Mercator on the WGS84 semi-major axis (the
    published definition: geodetic latitude applied to a sphere)."""

    def forward(self, lon_deg, lat_deg):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        return _A * lam, _A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))

    def inverse(self, x, y):
        lam = np.asarray(x, dtype=np.float64) / _A
        phi = 2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _A)) \
            - np.pi / 2.0
        return np.degrees(lam), np.degrees(phi)


def _utm_params(srid: int):
    """UTM zone parameters for EPSG 326xx (WGS84 N) / 327xx (WGS84 S) /
    269xx (NAD83 N); None if not a UTM code."""
    for base, south in ((32600, False), (32700, True), (26900, False)):
        zone = srid - base
        if 1 <= zone <= 60:
            return {"lat0": 0.0, "lon0": -183.0 + 6.0 * zone, "k0": 0.9996,
                    "fe": 500000.0, "fn": 10000000.0 if south else 0.0}
    return None


def _projection_for(srid: int):
    """Projection object with forward/inverse to geographic 4326, or
    None."""
    if srid in _LCC_ZONES:
        return _Lcc2Sp(_LCC_ZONES[srid])
    utm = _utm_params(srid)
    if utm is not None:
        return _TransverseMercator(utm["lat0"], utm["lon0"], utm["k0"],
                                   utm["fe"], utm["fn"])
    if srid == 3857:
        return _WebMercator()
    return None


def builtin_transform(from_srid: int, to_srid: int):
    """``fn(x, y) -> (x', y')`` for SRID pairs the built-in math covers,
    else ``None``.  Accepts scalars or arrays (NumPy-vectorized).

    4326 is the hub: projected → projected pairs compose inverse-then-
    forward through geographic coordinates (same route pyproj takes for
    these CRS pairs, minus the cm-level datum steps)."""
    if from_srid == to_srid:
        return lambda x, y: (x, y)
    src = _projection_for(from_srid) if from_srid != 4326 else None
    dst = _projection_for(to_srid) if to_srid != 4326 else None
    if from_srid == 4326 and dst is not None:
        return dst.forward
    if to_srid == 4326 and src is not None:
        return src.inverse
    if src is not None and dst is not None:
        def composed(x, y, _src=src, _dst=dst):
            lon, lat = _src.inverse(x, y)
            return _dst.forward(lon, lat)
        return composed
    return None
