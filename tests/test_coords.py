from __future__ import annotations

import numpy as np

from spider_spark.operators.coords import (
    bd09_to_gcj02,
    gcj02_to_bd09,
    gcj02_to_wgs84,
    out_of_china,
    wgs84_to_bd09,
    wgs84_to_gcj02,
)


LNG = np.array([113.9547, 114.0579, 116.3913, 121.4737])  # Shenzhen/Beijing/Shanghai
LAT = np.array([22.5431, 22.5431, 39.9075, 31.2304])


def test_gcj_offset_magnitude():
    """GCJ-02 obfuscation shifts mainland points by ~100-700 m (public
    property of the algorithm)."""
    glng, glat = wgs84_to_gcj02(LNG, LAT)
    d = np.sqrt((glng - LNG) ** 2 + (glat - LAT) ** 2) * 111_000
    assert ((d > 50) & (d < 1500)).all()


def test_wgs_gcj_roundtrip():
    glng, glat = wgs84_to_gcj02(LNG, LAT)
    wlng, wlat = gcj02_to_wgs84(glng, glat)
    # single-step inverse: ~1e-5 deg (≈1 m) accuracy, the standard bound
    assert np.abs(wlng - LNG).max() < 5e-5
    assert np.abs(wlat - LAT).max() < 5e-5


def test_gcj_bd_roundtrip():
    blng, blat = gcj02_to_bd09(LNG, LAT)
    glng, glat = bd09_to_gcj02(blng, blat)
    assert np.abs(glng - LNG).max() < 2e-6
    assert np.abs(glat - LAT).max() < 2e-6


def test_out_of_china_passthrough():
    lng = np.array([-122.4194, 2.3522])
    lat = np.array([37.7749, 48.8566])
    assert out_of_china(lng, lat).all()
    glng, glat = wgs84_to_gcj02(lng, lat)
    np.testing.assert_array_equal(glng, lng)
    np.testing.assert_array_equal(glat, lat)


def test_composite_matches_chain():
    blng1, blat1 = wgs84_to_bd09(LNG, LAT)
    g = wgs84_to_gcj02(LNG, LAT)
    blng2, blat2 = gcj02_to_bd09(*g)
    np.testing.assert_allclose(blng1, blng2, rtol=0, atol=1e-12)
    np.testing.assert_allclose(blat1, blat2, rtol=0, atol=1e-12)
