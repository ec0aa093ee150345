"""Polar Stereographic CRS (north/south aspect, standard-parallel and
scale-factor variants), closed-form ellipsoidal, pure vectorized numpy —
the projection family of polar research rasters (NSIDC sea-ice grids,
Antarctic mosaics) and UPS map sheets.

The reference reprojects any GeoTools-resolvable CRS at ingest
(`core/geotime/src/main/java/org/locationtech/geowave/core/geotime/util/
GeometryUtils.java` transform plumbing in /root/reference); this engine
carries the math itself (same contract as `sfc/utm.py` / `sfc/conic.py`).
Formulas are Snyder, "Map Projections — A Working Manual", USGS PP 1395
(1987), §21 eqs. 21-33..21-41 (ellipsoid) — the isometric-latitude
exponential t and the parallel-radius m are shared with the LCC/Albers
family (`conic._t`, `conic._m`).  Correctness evidence: Snyder's south
polar worked numerical example (International 1924) and the independent
EPSG Guidance Note 7-2 Variant-B example, plus round-trip,
scale-at-standard-parallel and conformality property tests
(tests/test_crs_polar.py).

Parameters come from a parsed `.prj` PROJCS or the common EPSG codes
(3413/3031/3976 standard-parallel grids, 5041/5042 UPS);
`utm.parse_crs` dispatches here exactly like the conic family.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

from .conic import _m, _t

_WGS84 = (6378137.0, 1.0 / 298.257223563)


@dataclass(frozen=True)
class PolarParams:
    """Polar stereographic parameters (degrees / meters) + ellipsoid.

    `lat_ts` is the standard parallel (variant B).  When |lat_ts| == 90
    the projection is true at the pole and `k0` scales it (variant A /
    UPS); otherwise `k0` must stay 1.
    """

    north: bool        # aspect
    lat_ts: float      # standard parallel (latitude of true scale)
    lon0: float        # central meridian (down-grid longitude)
    fe: float = 0.0    # false easting
    fn: float = 0.0    # false northing
    k0: float = 1.0    # scale at the pole (variant A only)
    a: float = _WGS84[0]
    f: float = _WGS84[1]

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))


def _rho_scale(p: PolarParams) -> float:
    """rho / (a * t): the aspect-invariant radial constant.

    Variant B (standard parallel): m_F / t_F (Snyder 21-34).
    Variant A (true at the pole): 2 k0 / sqrt((1+e)^(1+e) (1-e)^(1-e))
    (Snyder 21-33) — the |lat_ts| -> 90 limit of the B form.
    """
    e = p.e
    ts = abs(p.lat_ts)
    if 90.0 - ts < 1e-9:
        return 2.0 * p.k0 / math.sqrt((1.0 + e) ** (1.0 + e)
                                      * (1.0 - e) ** (1.0 - e))
    pf = math.radians(ts)
    return float(_m(pf, e) / _t(pf, e))


def polar_forward(lon, lat, p: PolarParams):
    """(lon, lat) degrees -> (x, y) meters.  Snyder 21-30/31/34; the
    south aspect runs the north equations on the negated sphere and
    flips both axes (Snyder p.161 sign-reversal rule)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    sgn = 1.0 if p.north else -1.0
    phi = np.radians(sgn * lat)
    th = np.radians(sgn * (lon - p.lon0))
    rho = p.a * _rho_scale(p) * _t(phi, p.e)
    x = rho * np.sin(th)
    y = -rho * np.cos(th)
    return p.fe + sgn * x, p.fn + sgn * y


def polar_inverse(x, y, p: PolarParams):
    """(x, y) meters -> (lon, lat) degrees.  Snyder 21-39/40 + the
    fixed-point phi iteration (7-9; same scheme as `conic.lcc_inverse`,
    double precision in <8 steps away from the equator)."""
    sgn = 1.0 if p.north else -1.0
    dx = sgn * (np.asarray(x, dtype=np.float64) - p.fe)
    dy = sgn * (np.asarray(y, dtype=np.float64) - p.fn)
    rho = np.hypot(dx, dy)
    t = rho / (p.a * _rho_scale(p))
    e = p.e
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    lam = np.arctan2(dx, -dy)
    lon = sgn * np.degrees(lam) + p.lon0
    # normalize: a south aspect with a nonzero lon0 can land outside
    # +-180 (Snyder's own worked example: lam0=-100, point at 150E)
    lon = (lon + 180.0) % 360.0 - 180.0
    return lon, sgn * np.degrees(phi)


# ------------------------------------------------------------- CRS lookup

# common polar grids (parameters are published EPSG facts)
EPSG_POLAR: dict[int, PolarParams] = {
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North
    3413: PolarParams(True, 70.0, -45.0, 0.0, 0.0, 1.0, *_WGS84),
    # WGS 84 / Antarctic Polar Stereographic
    3031: PolarParams(False, -71.0, 0.0, 0.0, 0.0, 1.0, *_WGS84),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic South
    3976: PolarParams(False, -70.0, 0.0, 0.0, 0.0, 1.0, *_WGS84),
    # WGS 84 / UPS North and South (variant A, k0 = 0.994, FE = FN = 2e6)
    5041: PolarParams(True, 90.0, 0.0, 2000000.0, 2000000.0, 0.994,
                      *_WGS84),
    5042: PolarParams(False, -90.0, 0.0, 2000000.0, 2000000.0, 0.994,
                      *_WGS84),
}

_PROJ_RE = re.compile(r'PROJECTION\s*\[\s*"([^"]+)"', re.I)
_PARAM_RE = re.compile(r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-\d.eE+]+)', re.I)
_SPHEROID_RE = re.compile(
    r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)', re.I)

# OGC + ESRI spellings (ESRI encodes the aspect in the projection name)
_POLAR_NAMES = {"polar_stereographic", "stereographic_north_pole",
                "stereographic_south_pole",
                "polar_stereographic_variant_b"}


def parse_prj_polar(wkt: str) -> PolarParams | None:
    """Sniff a `.prj` PROJCS string for a polar-stereographic definition;
    None if the projection is a different family (plain oblique
    Stereographic included — its latitude of origin is not a pole)."""
    m = _PROJ_RE.search(wkt)
    if not m:
        return None
    name = m.group(1).strip().lower()
    if name not in _POLAR_NAMES:
        return None
    params = {k.lower(): float(v) for k, v in _PARAM_RE.findall(wkt)}
    sph = _SPHEROID_RE.search(wkt)
    a, f = _WGS84
    if sph:
        a = float(sph.group(1))
        inv_f = float(sph.group(2))
        f = 0.0 if inv_f == 0 else 1.0 / inv_f

    def get(*names, default=0.0):
        for n in names:
            if n in params:
                return params[n]
        return default

    # the standard parallel rides in standard_parallel_1 (ESRI) or
    # latitude_of_origin / latitude_of_standard_parallel (OGC variants)
    lat_ts = get("standard_parallel_1", "latitude_of_standard_parallel",
                 "latitude_of_origin", default=90.0)
    if name == "stereographic_south_pole" and lat_ts > 0:
        lat_ts = -lat_ts
    north = lat_ts >= 0.0
    if name == "stereographic_north_pole":
        north = True
    elif name == "stereographic_south_pole":
        north = False
    if abs(lat_ts) < 60.0:
        # a mid-latitude origin is an oblique stereographic — not ours
        return None
    return PolarParams(
        north, lat_ts,
        get("central_meridian", "longitude_of_origin",
            "longitude_of_center"),
        get("false_easting"), get("false_northing"),
        get("scale_factor", default=1.0), a, f)
