"""Pseudocylindrical / cylindrical equidistant CRS families — Sinusoidal
(the MODIS science grid) and Equidistant Cylindrical / Plate Carrée —
closed-form, pure vectorized numpy.

The reference reprojects any GeoTools-resolvable CRS at ingest
(`core/geotime/src/main/java/org/locationtech/geowave/core/geotime/util/
GeometryUtils.java` transform plumbing in /root/reference); this engine
carries the math itself (same contract as `sfc/utm.py` / `sfc/conic.py`
/ `sfc/polar.py` / `sfc/oblique.py`).  Formulas are Snyder, "Map
Projections — A Working Manual", USGS PP 1395 (1987): §30 (Sinusoidal,
sphere and ellipsoid) and §12 (Cylindrical Equidistant), with the
meridian-arc series 3-21 and its rectifying-latitude inverse 3-26 —
the same public series every transverse-Mercator implementation uses.

Correctness evidence (tests/test_crs_pseudocyl.py): the WGS84 quarter
meridian against its published value (10,001,965.729 m), the MODIS grid
half-width against NASA's published sinusoidal extent (20,015,109.354 m
for R = 6,371,007.181), equal-area Jacobian and y==M(phi) property
tests, e->0 sphere continuity, round-trips, `.prj` sniffing, and a
MODIS-sinusoidal shapefile riding the ingest -> reproject -> PIP join
path.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

_WGS84 = (6378137.0, 1.0 / 298.257223563)

# NASA MODIS land-grid sphere radius (meters) — the authalic-sphere
# constant published in the MODIS gridding documentation.
MODIS_RADIUS = 6371007.181


# ------------------------------------------------------ meridian arc


def _m_coeffs(e2: float):
    """Snyder 3-21 series coefficients for the meridian arc M(phi)."""
    e4 = e2 * e2
    e6 = e4 * e2
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    return c0, c2, c4, c6


def meridian_arc(phi, a: float, f: float):
    """Distance along the meridian from the equator to latitude ``phi``
    (radians) — Snyder 3-21.  f == 0 degrades to the sphere's a*phi."""
    phi = np.asarray(phi, dtype=np.float64)
    if f == 0.0:
        return a * phi
    e2 = f * (2.0 - f)
    c0, c2, c4, c6 = _m_coeffs(e2)
    return a * (c0 * phi - c2 * np.sin(2.0 * phi)
                + c4 * np.sin(4.0 * phi) - c6 * np.sin(6.0 * phi))


def inverse_meridian_arc(m, a: float, f: float):
    """phi (radians) from the meridian arc — rectifying latitude mu and
    the Snyder 3-26 series.  f == 0 degrades to m/a."""
    m = np.asarray(m, dtype=np.float64)
    if f == 0.0:
        return m / a
    e2 = f * (2.0 - f)
    c0, _c2, _c4, _c6 = _m_coeffs(e2)
    mu = m / (a * c0)
    se = math.sqrt(1.0 - e2)
    e1 = (1.0 - se) / (1.0 + se)
    e1_2 = e1 * e1
    return (mu
            + (3.0 * e1 / 2.0 - 27.0 * e1 * e1_2 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1_2 / 16.0 - 55.0 * e1_2 * e1_2 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * e1 * e1_2 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1_2 * e1_2 / 512.0) * np.sin(8.0 * mu))


# ------------------------------------------------------ sinusoidal


@dataclass(frozen=True)
class SinusoidalParams:
    """Sinusoidal (Sanson-Flamsteed) parameters.  f == 0 is the common
    spherical form (MODIS, World_Sinusoidal); f > 0 is Snyder's
    ellipsoidal extension (30-8/30-9)."""

    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = MODIS_RADIUS
    f: float = 0.0


# the MODIS land grid CRS (sphere R=6371007.181, lon0=0)
MODIS_SINUSOIDAL = SinusoidalParams()


def sinusoidal_forward(lon, lat, p: SinusoidalParams):
    """(lon, lat) degrees -> (x, y) meters.  Snyder 30-1/30-2 (sphere),
    30-8/30-9 (ellipsoid: x scaled by the parallel radius, y = M)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dl = np.radians(lon - p.lon0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    if p.f == 0.0:
        x = p.a * dl * np.cos(phi)
        y = p.a * phi
    else:
        e2 = p.f * (2.0 - p.f)
        s = np.sin(phi)
        x = p.a * dl * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
        y = meridian_arc(phi, p.a, p.f)
    return p.fe + x, p.fn + y


def sinusoidal_inverse(x, y, p: SinusoidalParams):
    """(x, y) meters -> (lon, lat) degrees.  Snyder 30-6/30-7 (sphere),
    30-10/30-11 (ellipsoid).  At the poles (cos phi == 0) the meridian
    is indeterminate; lon0 is returned (Snyder's convention)."""
    dx = np.asarray(x, dtype=np.float64) - p.fe
    dy = np.asarray(y, dtype=np.float64) - p.fn
    if p.f == 0.0:
        phi = dy / p.a
        denom = p.a * np.cos(phi)
    else:
        e2 = p.f * (2.0 - p.f)
        phi = inverse_meridian_arc(dy, p.a, p.f)
        s = np.sin(phi)
        denom = p.a * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
    tiny = np.abs(denom) < 1e-9
    dl = np.where(tiny, 0.0, dx / np.where(tiny, 1.0, denom))
    lon = np.degrees(dl) + p.lon0
    lon = (lon + 180.0) % 360.0 - 180.0
    return lon, np.degrees(phi)


# ------------------------------------------- equidistant cylindrical


@dataclass(frozen=True)
class EquirectParams:
    """Equidistant Cylindrical / Plate Carrée parameters.  ``lat_ts`` is
    the standard parallel (0 for Plate Carrée); the ellipsoidal form is
    the EPSG 1028 method (x scaled by the parallel radius at lat_ts,
    y = meridian arc)."""

    lat_ts: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = _WGS84[0]
    f: float = _WGS84[1]


EPSG_EQC: dict[int, EquirectParams] = {
    # WGS 84 / World Equidistant Cylindrical
    4087: EquirectParams(0.0, 0.0, 0.0, 0.0, *_WGS84),
    # WGS 84 / Plate Carree (deprecated code, same definition)
    32662: EquirectParams(0.0, 0.0, 0.0, 0.0, *_WGS84),
}


def _eqc_kx(p: EquirectParams) -> float:
    """Meters of x per radian of longitude: the parallel radius at the
    standard parallel (nu1 * cos(lat_ts); sphere limit a*cos)."""
    phi1 = math.radians(p.lat_ts)
    c = math.cos(phi1)
    if p.f == 0.0:
        return p.a * c
    e2 = p.f * (2.0 - p.f)
    s = math.sin(phi1)
    return p.a * c / math.sqrt(1.0 - e2 * s * s)


def equirect_forward(lon, lat, p: EquirectParams):
    """(lon, lat) degrees -> (x, y) meters (EPSG method 1028/1029)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dl = np.radians(lon - p.lon0)
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    x = _eqc_kx(p) * dl
    y = meridian_arc(np.radians(lat), p.a, p.f)
    return p.fe + x, p.fn + y


def equirect_inverse(x, y, p: EquirectParams):
    dx = np.asarray(x, dtype=np.float64) - p.fe
    dy = np.asarray(y, dtype=np.float64) - p.fn
    lon = np.degrees(dx / _eqc_kx(p)) + p.lon0
    lon = (lon + 180.0) % 360.0 - 180.0
    lat = np.degrees(inverse_meridian_arc(dy, p.a, p.f))
    return lon, lat


# ------------------------------------------------------------- CRS lookup

_PROJ_RE = re.compile(r'PROJECTION\s*\[\s*"([^"]+)"', re.I)
_PARAM_RE = re.compile(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-\d.eE+]+)', re.I)
_SPHEROID_RE = re.compile(
    r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)', re.I)

_SINU_NAMES = {"sinusoidal"}
_EQC_NAMES = {"equirectangular", "equidistant_cylindrical",
              "plate_carree", "equidistant_cylindrical_spherical"}


def _ellipsoid(wkt: str) -> tuple[float, float]:
    sph = _SPHEROID_RE.search(wkt)
    if not sph:
        return _WGS84
    a = float(sph.group(1))
    inv_f = float(sph.group(2))
    return a, (0.0 if inv_f == 0 else 1.0 / inv_f)


def parse_prj_pseudocyl(wkt: str):
    """Sniff a `.prj` PROJCS string for a sinusoidal or equidistant-
    cylindrical definition; None if the projection is another family."""
    m = _PROJ_RE.search(wkt)
    if not m:
        return None
    name = m.group(1).strip().lower()
    params = {k.lower(): float(v) for k, v in _PARAM_RE.findall(wkt)}
    a, f = _ellipsoid(wkt)

    def get(*names, default=0.0):
        for n in names:
            if n in params:
                return params[n]
        return default

    lon0 = get("central_meridian", "longitude_of_origin",
               "longitude_of_natural_origin")
    fe, fn = get("false_easting"), get("false_northing")
    if name in _SINU_NAMES:
        return SinusoidalParams(lon0, fe, fn, a, f)
    if name in _EQC_NAMES:
        lat_ts = get("standard_parallel_1", "latitude_of_1st_standard_parallel",
                     "latitude_of_origin")
        return EquirectParams(lat_ts, lon0, fe, fn, a, f)
    return None
