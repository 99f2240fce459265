"""Gauss-Krüger (transverse Mercator) projection on GRS80, numpy-vectorized.

Replaces the reference's `arcpy.management.Project` (T1; reference:
etl/process.py:129-156, etl/stage_files.py:556-565) for the closed CRS set
the reference handles (etl/sr_utils.py:11-13): EPSG:4326 (WGS84 geodetic,
treated as identical to SWEREF99 geodetic at the reference's tolerance),
EPSG:3006 (SWEREF99 TM) and EPSG:3010 (SWEREF99 16 30).

Formulas: Krüger's n-series as published by Lantmäteriet ("Gauss Conformal
Projection — Krüger's formulas"), accurate to sub-mm inside the projection
zones. Pure numpy — the Spark surface wraps these in Arrow pandas UDFs, so
per-batch work is vectorized C loops, never per-row Python.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101

# EPSG -> (lon0_deg, scale k0, false easting, false northing)
CRS_REGISTRY = {
    3006: (15.0, 0.9996, 500000.0, 0.0),  # SWEREF99 TM
    3010: (16.5, 1.0, 150000.0, 0.0),     # SWEREF99 16 30
}

_e2 = _F * (2.0 - _F)
_e4 = _e2 * _e2
_e6 = _e4 * _e2
_e8 = _e4 * _e4
_n = _F / (2.0 - _F)
_n2, _n3, _n4 = _n * _n, _n ** 3, _n ** 4
_a_hat = _A / (1.0 + _n) * (1.0 + _n2 / 4.0 + _n4 / 64.0)

# forward series coefficients
_BETA1 = _n / 2.0 - 2.0 * _n2 / 3.0 + 5.0 * _n3 / 16.0 + 41.0 * _n4 / 180.0
_BETA2 = 13.0 * _n2 / 48.0 - 3.0 * _n3 / 5.0 + 557.0 * _n4 / 1440.0
_BETA3 = 61.0 * _n3 / 240.0 - 103.0 * _n4 / 140.0
_BETA4 = 49561.0 * _n4 / 161280.0

# inverse series coefficients
_DELTA1 = _n / 2.0 - 2.0 * _n2 / 3.0 + 37.0 * _n3 / 96.0 - _n4 / 360.0
_DELTA2 = _n2 / 48.0 + _n3 / 15.0 - 437.0 * _n4 / 1440.0
_DELTA3 = 17.0 * _n3 / 480.0 - 37.0 * _n4 / 840.0
_DELTA4 = 4397.0 * _n4 / 161280.0

# conformal-latitude series (forward)
_CA = _e2
_CB = (5.0 * _e4 - _e6) / 6.0
_CC = (104.0 * _e6 - 45.0 * _e8) / 120.0
_CD = 1237.0 * _e8 / 1260.0

# geodetic-latitude series (inverse)
_IA = _e2 + _e4 + _e6 + _e8
_IB = -(7.0 * _e4 + 17.0 * _e6 + 30.0 * _e8) / 6.0
_IC = (224.0 * _e6 + 889.0 * _e8) / 120.0
_ID = -(4279.0 * _e8) / 1260.0


def geodetic_to_grid(lat_deg, lon_deg, epsg: int):
    """(lat, lon) degrees -> (easting x, northing y) meters in `epsg`."""
    lon0, k0, fe, fn = CRS_REGISTRY[epsg]
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.radians(lon0)

    s = np.sin(phi)
    s2 = s * s
    phi_star = phi - s * np.cos(phi) * (_CA + _CB * s2 + _CC * s2 * s2 + _CD * s2 * s2 * s2)

    dlam = lam - lam0
    xi_p = np.arctan2(np.tan(phi_star), np.cos(dlam))
    eta_p = np.arctanh(np.cos(phi_star) * np.sin(dlam))

    northing = k0 * _a_hat * (
        xi_p
        + _BETA1 * np.sin(2 * xi_p) * np.cosh(2 * eta_p)
        + _BETA2 * np.sin(4 * xi_p) * np.cosh(4 * eta_p)
        + _BETA3 * np.sin(6 * xi_p) * np.cosh(6 * eta_p)
        + _BETA4 * np.sin(8 * xi_p) * np.cosh(8 * eta_p)
    ) + fn
    easting = k0 * _a_hat * (
        eta_p
        + _BETA1 * np.cos(2 * xi_p) * np.sinh(2 * eta_p)
        + _BETA2 * np.cos(4 * xi_p) * np.sinh(4 * eta_p)
        + _BETA3 * np.cos(6 * xi_p) * np.sinh(6 * eta_p)
        + _BETA4 * np.cos(8 * xi_p) * np.sinh(8 * eta_p)
    ) + fe
    return easting, northing


def grid_to_geodetic(x, y, epsg: int):
    """(easting x, northing y) meters in `epsg` -> (lat, lon) degrees."""
    lon0, k0, fe, fn = CRS_REGISTRY[epsg]
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * _a_hat)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * _a_hat)

    xi_p = xi - (
        _DELTA1 * np.sin(2 * xi) * np.cosh(2 * eta)
        + _DELTA2 * np.sin(4 * xi) * np.cosh(4 * eta)
        + _DELTA3 * np.sin(6 * xi) * np.cosh(6 * eta)
        + _DELTA4 * np.sin(8 * xi) * np.cosh(8 * eta)
    )
    eta_p = eta - (
        _DELTA1 * np.cos(2 * xi) * np.sinh(2 * eta)
        + _DELTA2 * np.cos(4 * xi) * np.sinh(4 * eta)
        + _DELTA3 * np.cos(6 * xi) * np.sinh(6 * eta)
        + _DELTA4 * np.cos(8 * xi) * np.sinh(8 * eta)
    )

    phi_star = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    dlam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))

    s = np.sin(phi_star)
    s2 = s * s
    phi = phi_star + s * np.cos(phi_star) * (
        _IA + _IB * s2 + _IC * s2 * s2 + _ID * s2 * s2 * s2
    )
    return np.degrees(phi), np.degrees(dlam) + lon0


def reproject_xy(x, y, src_epsg: int, dst_epsg: int):
    """Coordinate arrays src -> dst across the supported CRS set.

    4326 coordinates are (lon, lat) in x, y order (GeoJSON convention,
    reference: etl/stage_files.py:494-500 reads coords[0]=lon).
    """
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if src_epsg == 4326:
        lat, lon = np.asarray(y, dtype=np.float64), np.asarray(x, dtype=np.float64)
    else:
        lat, lon = grid_to_geodetic(x, y, src_epsg)
    if dst_epsg == 4326:
        return lon, lat
    return geodetic_to_grid(lat, lon, dst_epsg)
