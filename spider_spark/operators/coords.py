"""Chinese coordinate-system transforms (F12 in SURVEY.md §2.8) —
WGS-84 ↔ GCJ-02 ↔ BD-09 — vectorized over numpy inside pandas UDFs.

The reference carries the same conversions
(/root/reference/coordTransform_utils.py:43-160); the algorithm itself is
the widely-published public GCJ-02 obfuscation model (Krasovsky-1940
ellipsoid series expansion) and the BD-09 polar offset — re-implemented
here from the public formulas, vectorized (the reference is scalar
per-point Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query

_A = 6378245.0  # Krasovsky 1940 semi-major axis
_EE = 0.00669342162296594323  # first eccentricity squared
_X_PI = np.pi * 3000.0 / 180.0


def out_of_china(lng: np.ndarray, lat: np.ndarray) -> np.ndarray:
    return ~((72.004 <= lng) & (lng <= 137.8347) & (0.8293 <= lat) & (lat <= 55.8271))


def _transform_lat(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    ret = (
        -100.0 + 2.0 * x + 3.0 * y + 0.2 * y * y + 0.1 * x * y
        + 0.2 * np.sqrt(np.abs(x))
    )
    ret += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    ret += (20.0 * np.sin(y * np.pi) + 40.0 * np.sin(y / 3.0 * np.pi)) * 2.0 / 3.0
    ret += (160.0 * np.sin(y / 12.0 * np.pi) + 320.0 * np.sin(y * np.pi / 30.0)) * 2.0 / 3.0
    return ret


def _transform_lng(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    ret = (
        300.0 + x + 2.0 * y + 0.1 * x * x + 0.1 * x * y + 0.1 * np.sqrt(np.abs(x))
    )
    ret += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    ret += (20.0 * np.sin(x * np.pi) + 40.0 * np.sin(x / 3.0 * np.pi)) * 2.0 / 3.0
    ret += (150.0 * np.sin(x / 12.0 * np.pi) + 300.0 * np.sin(x / 30.0 * np.pi)) * 2.0 / 3.0
    return ret


def _gcj_offset(lng: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    dlat = _transform_lat(lng - 105.0, lat - 35.0)
    dlng = _transform_lng(lng - 105.0, lat - 35.0)
    radlat = lat / 180.0 * np.pi
    magic = np.sin(radlat)
    magic = 1 - _EE * magic * magic
    sqrtmagic = np.sqrt(magic)
    dlat = (dlat * 180.0) / ((_A * (1 - _EE)) / (magic * sqrtmagic) * np.pi)
    dlng = (dlng * 180.0) / (_A / sqrtmagic * np.cos(radlat) * np.pi)
    return dlng, dlat


def wgs84_to_gcj02(lng, lat):
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlng, dlat = _gcj_offset(lng, lat)
    mask = out_of_china(lng, lat)
    glng = np.where(mask, lng, lng + dlng)
    glat = np.where(mask, lat, lat + dlat)
    return glng, glat


def gcj02_to_wgs84(lng, lat):
    """Single-step inverse approximation (the standard public inverse —
    same as the reference's approach)."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlng, dlat = _gcj_offset(lng, lat)
    mask = out_of_china(lng, lat)
    wlng = np.where(mask, lng, lng * 2 - (lng + dlng))
    wlat = np.where(mask, lat, lat * 2 - (lat + dlat))
    return wlng, wlat


def gcj02_to_bd09(lng, lat):
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = np.sqrt(lng * lng + lat * lat) + 0.00002 * np.sin(lat * _X_PI)
    theta = np.arctan2(lat, lng) + 0.000003 * np.cos(lng * _X_PI)
    return z * np.cos(theta) + 0.0065, z * np.sin(theta) + 0.006


def bd09_to_gcj02(lng, lat):
    lng = np.asarray(lng, dtype=np.float64) - 0.0065
    lat = np.asarray(lat, dtype=np.float64) - 0.006
    z = np.sqrt(lng * lng + lat * lat) - 0.00002 * np.sin(lat * _X_PI)
    theta = np.arctan2(lat, lng) - 0.000003 * np.cos(lng * _X_PI)
    return z * np.cos(theta), z * np.sin(theta)


def bd09_to_wgs84(lng, lat):
    glng, glat = bd09_to_gcj02(lng, lat)
    return gcj02_to_wgs84(glng, glat)


def wgs84_to_bd09(lng, lat):
    glng, glat = wgs84_to_gcj02(lng, lat)
    return gcj02_to_bd09(glng, glat)


_OUT_SCHEMA = T.StructType(
    [T.StructField("out_lng", T.DoubleType()), T.StructField("out_lat", T.DoubleType())]
)

_MODES = {
    "wgs84_to_gcj02": wgs84_to_gcj02,
    "gcj02_to_wgs84": gcj02_to_wgs84,
    "gcj02_to_bd09": gcj02_to_bd09,
    "bd09_to_gcj02": bd09_to_gcj02,
    "bd09_to_wgs84": bd09_to_wgs84,
    "wgs84_to_bd09": wgs84_to_bd09,
}


def coord_transform_udf(mode: str):
    fn = _MODES[mode]

    @F.pandas_udf(_OUT_SCHEMA)
    def _udf(lng: pd.Series, lat: pd.Series) -> pd.DataFrame:
        out_lng, out_lat = fn(lng.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"out_lng": out_lng, "out_lat": out_lat})

    return _udf


# The GCJ-02/BD-09 series is plain sin/cos/atan2/sqrt, so the oracle is the
# same series transcribed to DuckDB SQL in the numpy expression order. Two
# determinism rules make the hash comparable:
#  - the synthetic input points are derived INTEGER-exactly (cents =
#    round(|bal|·100), then integer mod) — a float fmod here is NOT portable:
#    DuckDB's fmod is not the exactly-rounded C fmod, and near multiples of
#    the modulus the two results differ by the whole modulus;
#  - outputs are floor-rounded at 6 dp (f10 precedent): numpy's SIMD sin/cos
#    and DuckDB's libm differ by ~1e-12 after the ×320 series terms, and the
#    closest 6-dp boundary across all three SFs is ≥9.8e-5 away — verified
#    exhaustively, so the truncation absorbs the libm divergence.
_F12_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         CAST(round(abs(c_acctbal)::DOUBLE * 100) AS BIGINT) AS cents
  FROM customer
), p AS (
  SELECT c_custkey,
         113.8 + (cents % 80000) / 100000.0 AS lng,
         22.5  + (cents % 50000) / 100000.0 AS lat
  FROM pts
), t AS (
  SELECT c_custkey, lng, lat, lng - 105.0 AS x, lat - 35.0 AS y FROM p
), d AS (
  SELECT c_custkey, lng, lat,
    -100.0 + 2.0*x + 3.0*y + 0.2*y*y + 0.1*x*y + 0.2*sqrt(abs(x))
      + (20.0*sin(6.0*x*pi()) + 20.0*sin(2.0*x*pi())) * 2.0/3.0
      + (20.0*sin(y*pi()) + 40.0*sin(y/3.0*pi())) * 2.0/3.0
      + (160.0*sin(y/12.0*pi()) + 320.0*sin(y*pi()/30.0)) * 2.0/3.0 AS dlat0,
    300.0 + x + 2.0*y + 0.1*x*x + 0.1*x*y + 0.1*sqrt(abs(x))
      + (20.0*sin(6.0*x*pi()) + 20.0*sin(2.0*x*pi())) * 2.0/3.0
      + (20.0*sin(x*pi()) + 40.0*sin(x/3.0*pi())) * 2.0/3.0
      + (150.0*sin(x/12.0*pi()) + 300.0*sin(x/30.0*pi())) * 2.0/3.0 AS dlng0
  FROM t
), g AS (
  SELECT c_custkey, lng, lat, dlat0, dlng0,
    lat/180.0*pi() AS radlat,
    1 - 0.00669342162296594323 * sin(lat/180.0*pi()) * sin(lat/180.0*pi())
      AS magic
  FROM d
), gc AS (
  SELECT c_custkey,
    lng + (dlng0 * 180.0)
      / (6378245.0 / sqrt(magic) * cos(radlat) * pi()) AS glng,
    lat + (dlat0 * 180.0)
      / ((6378245.0 * (1 - 0.00669342162296594323)) / (magic * sqrt(magic))
         * pi()) AS glat
  FROM g
), bd AS (
  SELECT c_custkey,
    (sqrt(glng*glng + glat*glat)
       + 0.00002*sin(glat * (pi()*3000.0/180.0))) AS z,
    (atan2(glat, glng) + 0.000003*cos(glng * (pi()*3000.0/180.0))) AS theta
  FROM gc
)
SELECT c_custkey,
       floor((z*cos(theta) + 0.0065) * 1000000)/1000000 AS bd_lng,
       floor((z*sin(theta) + 0.006) * 1000000)/1000000 AS bd_lat
FROM bd
"""


@query("f12_coord_transform", _F12_ORACLE)
def f12_coord_transform(spark, sf_dir):
    """WGS-84 → BD-09 over synthetic Shenzhen-area points derived from
    customer rows (one vectorized numpy UDF, 6-dp floor-rounding like
    /root/reference/coordsTransform.py:37-39). Input points use an
    integer-exact derivation and the output a floor-round — see
    _F12_ORACLE's comment for why both are required for a portable hash."""
    c = load(spark, sf_dir, "customer")
    cents = F.round(F.abs(F.col("c_acctbal")).cast("double") * 100).cast("long")
    pts = c.select(
        "c_custkey",
        (F.lit(113.8) + (cents % 80000) / F.lit(100000.0)).alias("lng"),
        (F.lit(22.5) + (cents % 50000) / F.lit(100000.0)).alias("lat"),
    )
    out = pts.withColumn("bd", coord_transform_udf("wgs84_to_bd09")("lng", "lat"))
    return out.select(
        "c_custkey",
        (F.floor(F.col("bd.out_lng") * 1000000) / 1000000.0).alias("bd_lng"),
        (F.floor(F.col("bd.out_lat") * 1000000) / 1000000.0).alias("bd_lat"),
    )
