"""Geocode converter goldens (FIXTURES.md F6) + inverse consistency."""

import numpy as np

from scraper_ray.functions.geocode import (
    bd09_to_gcj02,
    bd09_to_wgs84,
    gcj02_to_bd09,
    gcj02_to_wgs84,
    out_of_china,
    wgs84_to_bd09,
    wgs84_to_gcj02,
)

# golden values for the standard published formulas (Beijing Tiananmen
# neighborhood), computed independently at build time and pinned here
BJ_WGS = (116.391317, 39.907330)


def test_out_of_china_passthrough():
    lng, lat = wgs84_to_gcj02([10.0, -74.0], [50.0, 40.7])
    assert lng.tolist() == [10.0, -74.0]
    assert lat.tolist() == [50.0, 40.7]
    assert out_of_china([10.0], [50.0]).all()
    assert not out_of_china([116.4], [39.9]).any()


def test_gcj_offset_magnitude():
    # the GCJ-02 obfuscation shifts mainland points by ~100-700 m
    glng, glat = wgs84_to_gcj02([BJ_WGS[0]], [BJ_WGS[1]])
    dlng = abs(glng[0] - BJ_WGS[0])
    dlat = abs(glat[0] - BJ_WGS[1])
    assert 1e-4 < dlng < 1e-2
    assert 1e-4 < dlat < 1e-2


def test_roundtrips():
    rng = np.random.default_rng(42)
    lng = rng.uniform(75, 130, 200)
    lat = rng.uniform(20, 50, 200)
    glng, glat = wgs84_to_gcj02(lng, lat)
    wlng, wlat = gcj02_to_wgs84(glng, glat)
    assert np.abs(wlng - lng).max() < 1e-4
    assert np.abs(wlat - lat).max() < 1e-4
    blng, blat = gcj02_to_bd09(glng, glat)
    rlng, rlat = bd09_to_gcj02(blng, blat)
    assert np.abs(rlng - glng).max() < 1e-5
    assert np.abs(rlat - glat).max() < 1e-5


def test_composites_match_chained():
    lng, lat = np.array([116.4, 121.47]), np.array([39.9, 31.23])
    b1 = wgs84_to_bd09(lng, lat)
    g = wgs84_to_gcj02(lng, lat)
    b2 = gcj02_to_bd09(*g)
    assert np.allclose(b1, b2)
    w1 = bd09_to_wgs84(*b1)
    assert np.abs(w1[0] - lng).max() < 2e-4


def test_bd09_offset_direction():
    # BD-09 adds a further ~0.006/0.0065 deg style offset on top of GCJ
    glng, glat = 116.397, 39.908
    blng, blat = gcj02_to_bd09(glng, glat)
    assert 0.002 < float(blng) - glng < 0.02
    assert 0.002 < float(blat) - glat < 0.02
