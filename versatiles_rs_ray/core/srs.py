"""Spatial reference systems for the reprojection path — pure numpy.

The reference reprojects ANY source SRS by delegating to GDAL's
window warp (versatiles_pipeline/src/operations/read/from_gdal/raster/
raster_source.rs:114-152 + instance.rs `reproject_to_dataset`). GDAL
is not in this container, so this module implements the transforms the
warp needs from public formulas:

- EPSG:4326 (WGS84 geographic, identity on lon/lat)
- EPSG:3857 (spherical web mercator)
- EPSG:326xx / 327xx (UTM north/south, WGS84 ellipsoid) via the
  Krüger series (standard 3rd-order-in-n expansion, the same series
  PROJ's ``tmerc`` approx mode uses; accuracy well under a
  millimeter inside a zone)
- EPSG:3035 (ETRS89-LAEA Europe, ellipsoidal Lambert azimuthal
  equal-area, EPSG method 9820) and EPSG:2154 (Lambert-93, Lambert
  conformal conic 2SP, EPSG method 9802) — property-validated
  (equal-area Jacobian / conformality + unit scale on the standard
  parallels) plus the IOGP GN7-2 worked example
- GDAL-style affine geotransforms (pixel <-> source-CRS coords)

Every transform is vectorized over numpy arrays. An SRS object maps
``forward(lon, lat) -> (x, y)`` into its own coordinate space and
``inverse(x, y) -> (lon, lat)`` back; unknown EPSG codes raise with
the extension point named.
"""

from __future__ import annotations

import math

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996  # UTM scale on the central meridian

_N = _F / (2.0 - _F)
_AA = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0,
    56.0 * _N**3 / 15.0,
)


class Geographic:
    """EPSG:4326 — coordinates ARE lon/lat degrees."""

    code = 4326

    def forward(self, lon, lat):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)

    def inverse(self, x, y):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)


class WebMercator:
    """EPSG:3857 — spherical mercator meters (core/coords.py uses the
    same sphere for tile math)."""

    code = 3857

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        x = np.radians(lon) * _A
        y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * _A
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon = np.degrees(x / _A)
        lat = np.degrees(2.0 * np.arctan(np.exp(y / _A)) - np.pi / 2.0)
        return lon, lat


class UTM:
    """EPSG:326xx (north) / 327xx (south) — WGS84 transverse mercator,
    Krüger series."""

    def __init__(self, zone: int, north: bool):
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone {zone} out of range 1..60")
        self.zone = zone
        self.north = north
        self.code = (32600 if north else 32700) + zone
        self.lon0 = math.radians(zone * 6.0 - 183.0)
        self.e0 = 500000.0
        self.n0 = 0.0 if north else 10000000.0

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        s = math.sqrt(_N) * 2.0 / (1.0 + _N)
        sphi = np.sin(lat)
        t = np.sinh(np.arctanh(sphi) - s * np.arctanh(s * sphi))
        dlon = lon - self.lon0
        xi_p = np.arctan2(t, np.cos(dlon))
        eta_p = np.arctanh(np.sin(dlon) / np.sqrt(1.0 + t * t))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(_ALPHA, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.e0 + _K0 * _AA * eta, self.n0 + _K0 * _AA * xi

    def inverse(self, x, y):
        xi = (np.asarray(y, dtype=np.float64) - self.n0) / (_K0 * _AA)
        eta = (np.asarray(x, dtype=np.float64) - self.e0) / (_K0 * _AA)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(_BETA, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        lat = chi.copy()
        for j, d in enumerate(_DELTA, start=1):
            lat += d * np.sin(2 * j * chi)
        lon = self.lon0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(lon), np.degrees(lat)


class LAEA:
    """Ellipsoidal Lambert Azimuthal Equal-Area (EPSG method 9820,
    Snyder 1987 §24 oblique aspect) — EPSG:3035 is the European
    standard grid. Equal-area is a checkable invariant: the numeric
    Jacobian determinant must equal the ellipsoidal area element
    everywhere (tests/test_reproject.py), which validates the
    formulas without an external geodesy library."""

    def __init__(self, code, lat0_deg, lon0_deg, fe, fn,
                 a=6378137.0, f=1.0 / 298.257222101):  # GRS80 default
        self.code = code
        self.a, self.e2 = a, 2.0 * f - f * f
        self.e = math.sqrt(self.e2)
        self.lon0 = math.radians(lon0_deg)
        self.fe, self.fn = fe, fn
        phi0 = math.radians(lat0_deg)
        self.phi0 = phi0
        self.qp = float(self._q(np.array(math.pi / 2.0)))
        q0 = float(self._q(np.array(phi0)))
        self.beta0 = math.asin(q0 / self.qp)
        self.rq = a * math.sqrt(self.qp / 2.0)
        self.d = (a * math.cos(phi0)
                  / math.sqrt(1.0 - self.e2 * math.sin(phi0) ** 2)
                  / (self.rq * math.cos(self.beta0)))

    def _q(self, phi):
        s = np.sin(phi)
        return (1.0 - self.e2) * (
            s / (1.0 - self.e2 * s * s)
            - (1.0 / (2.0 * self.e))
            * np.log((1.0 - self.e * s) / (1.0 + self.e * s)))

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        beta = np.arcsin(np.clip(self._q(phi) / self.qp, -1.0, 1.0))
        dl = lam - self.lon0
        # denominator -> 0 only at the antipode of the projection
        # center (outside any service area); floor it so out-of-domain
        # points degrade to huge-but-finite coordinates, not inf/nan
        denom = np.maximum(
            1.0 + math.sin(self.beta0) * np.sin(beta)
            + math.cos(self.beta0) * np.cos(beta) * np.cos(dl), 1e-12)
        b = self.rq * np.sqrt(2.0 / denom)
        x = self.fe + b * self.d * np.cos(beta) * np.sin(dl)
        y = self.fn + (b / self.d) * (
            math.cos(self.beta0) * np.sin(beta)
            - math.sin(self.beta0) * np.cos(beta) * np.cos(dl))
        return x, y

    def inverse(self, x, y):
        xr = (np.asarray(x, dtype=np.float64) - self.fe) / self.d
        yr = (np.asarray(y, dtype=np.float64) - self.fn) * self.d
        rho = np.hypot(xr, yr)
        c = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.rq), -1.0, 1.0))
        with np.errstate(invalid="ignore"):
            qq = self.qp * (np.cos(c) * math.sin(self.beta0)
                            + yr * np.sin(c) * math.cos(self.beta0)
                            / np.where(rho == 0.0, 1.0, rho))
        qq = np.where(rho == 0.0, self.qp * math.sin(self.beta0), qq)
        # |q| -> qp means a pole: Snyder 3-16's 1/cos(phi) blows up
        # there, so pin those points and keep the iteration away from
        # the division
        pole = np.abs(qq) >= self.qp * (1.0 - 1e-12)
        phi = np.arcsin(np.clip(qq / 2.0, -1.0, 1.0))
        phi = np.where(pole, 0.0, phi)
        for _ in range(8):  # Snyder 3-16, quadratic convergence
            s = np.sin(phi)
            phi = phi + (1.0 - self.e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
                qq / (1.0 - self.e2)
                - s / (1.0 - self.e2 * s * s)
                + (1.0 / (2.0 * self.e))
                * np.log((1.0 - self.e * s) / (1.0 + self.e * s)))
        phi = np.where(pole, np.sign(qq) * (np.pi / 2.0), phi)
        lam = self.lon0 + np.arctan2(
            xr * np.sin(c),
            rho * math.cos(self.beta0) * np.cos(c)
            - yr * math.sin(self.beta0) * np.sin(c))
        lam = np.where(rho == 0.0, self.lon0, lam)
        # at the exact center the iteration has already converged to
        # the GEODETIC phi0 (via the qq substitution above); pinning it
        # avoids any residual first-guess dependence
        phi = np.where(rho == 0.0, self.phi0, phi)
        return np.degrees(lam), np.degrees(phi)


class LCC2SP:
    """Lambert Conformal Conic, 2 standard parallels (EPSG method
    9802) — EPSG:2154 Lambert-93 is the French national grid.
    Conformality + unit scale ON the standard parallels are checkable
    invariants (tests/test_reproject.py)."""

    def __init__(self, code, lat1_deg, lat2_deg, lat0_deg, lon0_deg, fe, fn,
                 a=6378137.0, f=1.0 / 298.257222101):  # GRS80 default
        self.code = code
        self.a, self.e2 = a, 2.0 * f - f * f
        self.e = math.sqrt(self.e2)
        self.lon0 = math.radians(lon0_deg)
        self.fe, self.fn = fe, fn
        p1, p2, p0 = (math.radians(v) for v in (lat1_deg, lat2_deg, lat0_deg))

        def m(phi):
            return math.cos(phi) / math.sqrt(1.0 - self.e2 * math.sin(phi) ** 2)

        def t(phi):
            s = math.sin(phi)
            return (math.tan(math.pi / 4.0 - phi / 2.0)
                    / ((1.0 - self.e * s) / (1.0 + self.e * s)) ** (self.e / 2.0))

        self.n = (math.log(m(p1)) - math.log(m(p2))) / (
            math.log(t(p1)) - math.log(t(p2)))
        self.fcap = m(p1) / (self.n * t(p1) ** self.n)
        self.rho0 = a * self.fcap * t(p0) ** self.n

    def _t(self, phi):
        s = np.sin(phi)
        return (np.tan(np.pi / 4.0 - phi / 2.0)
                / ((1.0 - self.e * s) / (1.0 + self.e * s)) ** (self.e / 2.0))

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = self.a * self.fcap * self._t(phi) ** self.n
        th = self.n * (lam - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.fe
        yr = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.hypot(xr, yr) * np.sign(self.n)
        th = np.arctan2(xr, yr)
        tt = (rho / (self.a * self.fcap)) ** (1.0 / self.n)
        phi = np.pi / 2.0 - 2.0 * np.arctan(tt)
        for _ in range(8):  # EPSG 9802 fixed point on t
            s = np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tt * ((1.0 - self.e * s) / (1.0 + self.e * s)) ** (self.e / 2.0))
        return np.degrees(self.lon0 + th / self.n), np.degrees(phi)


class Albers:
    """Albers Equal-Area Conic, 2 standard parallels (EPSG method
    9822, Snyder 1987 §14 ellipsoidal) — EPSG:5070 (NAD83 CONUS) is
    the US national analysis grid, EPSG:3577 the Australian one.
    Equal-area is a checkable invariant (numeric Jacobian == the
    ellipsoidal area element), shared with LAEA; the authalic-q
    machinery is LAEA's."""

    def __init__(self, code, lat1_deg, lat2_deg, lat0_deg, lon0_deg,
                 fe, fn, a=6378137.0, f=1.0 / 298.257222101):  # GRS80
        self.code = code
        self.a, self.e2 = a, 2.0 * f - f * f
        self.e = math.sqrt(self.e2)
        self.lon0 = math.radians(lon0_deg)
        self.fe, self.fn = fe, fn
        p1, p2, p0 = (math.radians(v) for v in (lat1_deg, lat2_deg,
                                                lat0_deg))

        def m(phi):
            return math.cos(phi) / math.sqrt(
                1.0 - self.e2 * math.sin(phi) ** 2)

        q1, q2, q0 = (float(LAEA._q(self, np.array(p)))
                      for p in (p1, p2, p0))
        m1, m2 = m(p1), m(p2)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * math.sqrt(self.C - self.n * q0) / self.n
        self.qp = float(LAEA._q(self, np.array(math.pi / 2.0)))

    _q = LAEA._q

    def forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        q = self._q(phi)
        rho = self.a * np.sqrt(np.maximum(self.C - self.n * q, 0.0)) \
            / self.n
        th = self.n * (lam - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        xr = np.asarray(x, dtype=np.float64) - self.fe
        yr = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.hypot(xr, yr)
        if self.n < 0:
            rho, xr, yr = -rho, -xr, -yr
        th = np.arctan2(xr, yr)
        qq = (self.C - (rho * self.n / self.a) ** 2) / self.n
        pole = np.abs(qq) >= self.qp * (1.0 - 1e-12)
        phi = np.arcsin(np.clip(qq / 2.0, -1.0, 1.0))
        phi = np.where(pole, 0.0, phi)
        for _ in range(8):  # Snyder 3-16, same iteration as LAEA
            s = np.sin(phi)
            phi = phi + (1.0 - self.e2 * s * s) ** 2 \
                / (2.0 * np.cos(phi)) * (
                    qq / (1.0 - self.e2)
                    - s / (1.0 - self.e2 * s * s)
                    + (1.0 / (2.0 * self.e))
                    * np.log((1.0 - self.e * s) / (1.0 + self.e * s)))
        phi = np.where(pole, np.sign(qq) * (np.pi / 2.0), phi)
        return np.degrees(self.lon0 + th / self.n), np.degrees(phi)


# parameter sets from the EPSG registry entries for each code (the
# full registry needs PROJ at deploy; these are the codes real
# regional rasters carry — NAD83/ETRS89/GDA94 all use GRS80, the
# constructors' default ellipsoid)
_PROJECTED = {
    3035: lambda: LAEA(3035, 52.0, 10.0, 4321000.0, 3210000.0),
    2154: lambda: LCC2SP(2154, 49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
    # Lambert conformal family (EPSG 9802)
    3034: lambda: LCC2SP(3034, 35.0, 65.0, 52.0, 10.0,
                         4000000.0, 2800000.0),   # ETRS89-LCC Europe
    3347: lambda: LCC2SP(3347, 49.0, 77.0, 63.390675, -91.866667,
                         6200000.0, 3000000.0),   # NAD83 Canada LCC
    # Albers equal-area family (EPSG 9822)
    5070: lambda: Albers(5070, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3577: lambda: Albers(3577, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
    3310: lambda: Albers(3310, 34.0, 40.5, 0.0, -120.0,
                         0.0, -4000000.0),        # California Albers
}


def get_srs(code: int):
    """EPSG code -> SRS object. The registry the warp consults; extend
    here for additional projections."""
    code = int(code)
    if code == 4326:
        return Geographic()
    if code == 3857:
        return WebMercator()
    if 32601 <= code <= 32660:
        return UTM(code - 32600, north=True)
    if 32701 <= code <= 32760:
        return UTM(code - 32700, north=False)
    if code in _PROJECTED:
        return _PROJECTED[code]()
    raise NotImplementedError(
        f"EPSG:{code} not in the built-in SRS registry (core/srs.py get_srs); "
        "add a forward/inverse pair or install GDAL at deploy"
    )


class GeoTransform:
    """GDAL-style affine geotransform (x0, dx, rx, y0, ry, dy):
    pixel (col,row) -> CRS coords; plus the inverse."""

    def __init__(self, gt):
        self.gt = tuple(float(v) for v in gt)
        x0, dx, rx, y0, ry, dy = self.gt
        det = dx * dy - rx * ry
        if det == 0:
            raise ValueError("singular geotransform")
        self._inv = (dy / det, -rx / det, -ry / det, dx / det)

    @classmethod
    def north_up(cls, x0, y0, px, py=None):
        """Common case: no rotation, y decreasing downward."""
        return cls((x0, px, 0.0, y0, 0.0, -(py if py is not None else px)))

    def pixel_to_crs(self, col, row):
        x0, dx, rx, y0, ry, dy = self.gt
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        return x0 + dx * col + rx * row, y0 + ry * col + dy * row

    def crs_to_pixel(self, x, y):
        x0, _, _, y0, _, _ = self.gt
        a, b, c, d = self._inv
        u = np.asarray(x, dtype=np.float64) - x0
        v = np.asarray(y, dtype=np.float64) - y0
        return a * u + b * v, c * u + d * v
