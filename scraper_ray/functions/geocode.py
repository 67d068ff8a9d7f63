"""Geodetic datum converters: WGS-84 <-> GCJ-02 <-> BD-09, vectorized.

Implements the standard published obfuscation formulas for the Chinese
map datums (the same family the reference ports in
utils/utility_geocode.py:13-130), written from scratch as numpy
vectorized kernels so a ``map_batches(batch_format="numpy")`` stage
converts millions of coordinate pairs per second.

Conventions: longitudes/latitudes in degrees; points outside mainland
China's bounding box pass through unchanged (matching the reference's
``out_of_china`` guard, utility_geocode.py:123-130).
"""

from __future__ import annotations

import numpy as np

_A = 6378245.0                 # Krasovsky 1940 semi-major axis
_EE = 0.00669342162296594323   # eccentricity squared
_X_PI = np.pi * 3000.0 / 180.0


def out_of_china(lng: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return ~((72.004 <= lng) & (lng <= 137.8347)
             & (0.8293 <= lat) & (lat <= 55.8271))


def _transform_lat(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    r = (-100.0 + 2.0 * x + 3.0 * y + 0.2 * y * y + 0.1 * x * y
         + 0.2 * np.sqrt(np.abs(x)))
    r += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    r += (20.0 * np.sin(y * np.pi) + 40.0 * np.sin(y / 3.0 * np.pi)) * 2.0 / 3.0
    r += (160.0 * np.sin(y / 12.0 * np.pi) + 320.0 * np.sin(y * np.pi / 30.0)) * 2.0 / 3.0
    return r


def _transform_lng(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    r = (300.0 + x + 2.0 * y + 0.1 * x * x + 0.1 * x * y
         + 0.1 * np.sqrt(np.abs(x)))
    r += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    r += (20.0 * np.sin(x * np.pi) + 40.0 * np.sin(x / 3.0 * np.pi)) * 2.0 / 3.0
    r += (150.0 * np.sin(x / 12.0 * np.pi) + 300.0 * np.sin(x / 30.0 * np.pi)) * 2.0 / 3.0
    return r


def _delta(lng: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    dlat = _transform_lat(lng - 105.0, lat - 35.0)
    dlng = _transform_lng(lng - 105.0, lat - 35.0)
    radlat = lat / 180.0 * np.pi
    magic = np.sin(radlat)
    magic = 1 - _EE * magic * magic
    sqrtmagic = np.sqrt(magic)
    dlat = (dlat * 180.0) / ((_A * (1 - _EE)) / (magic * sqrtmagic) * np.pi)
    dlng = (dlng * 180.0) / (_A / sqrtmagic * np.cos(radlat) * np.pi)
    return dlng, dlat


def wgs84_to_gcj02(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mask = out_of_china(lng, lat)
    dlng, dlat = _delta(lng, lat)
    glng = np.where(mask, lng, lng + dlng)
    glat = np.where(mask, lat, lat + dlat)
    return glng, glat


def gcj02_to_wgs84(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    """One-step inverse approximation (error < ~1e-6 deg), as published."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mask = out_of_china(lng, lat)
    dlng, dlat = _delta(lng, lat)
    wlng = np.where(mask, lng, lng * 2 - (lng + dlng))
    wlat = np.where(mask, lat, lat * 2 - (lat + dlat))
    return wlng, wlat


def gcj02_to_bd09(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = np.sqrt(lng * lng + lat * lat) + 0.00002 * np.sin(lat * _X_PI)
    theta = np.arctan2(lat, lng) + 0.000003 * np.cos(lng * _X_PI)
    return z * np.cos(theta) + 0.0065, z * np.sin(theta) + 0.006


def bd09_to_gcj02(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(lng, dtype=np.float64) - 0.0065
    y = np.asarray(lat, dtype=np.float64) - 0.006
    z = np.sqrt(x * x + y * y) - 0.00002 * np.sin(y * _X_PI)
    theta = np.arctan2(y, x) - 0.000003 * np.cos(x * _X_PI)
    return z * np.cos(theta), z * np.sin(theta)


def wgs84_to_bd09(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    return gcj02_to_bd09(*wgs84_to_gcj02(lng, lat))


def bd09_to_wgs84(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    return gcj02_to_wgs84(*bd09_to_gcj02(lng, lat))
