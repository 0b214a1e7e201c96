"""Geohash encoding (A4) — the reference declares ``geohash_grid``
aggregations with precision 2 + geocentroid in Kibana visStates
(/root/reference/consumer/app/visualization.py:130-148); ES executes them.

Standard geohash (base32, interleaved bit bisection), implemented fully
vectorized in numpy inside an Arrow pandas_udf — per-character loop runs
``precision`` times (≤12), never per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"))


def geohash_np(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    n = len(lat)
    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lon_lo = np.full(n, -180.0)
    lon_hi = np.full(n, 180.0)
    out = np.empty((n, precision), dtype="U1")
    even = True  # start with longitude bit
    bit_seq = []
    total_bits = precision * 5
    for _ in range(total_bits):
        bit_seq.append(even)
        even = not even
    bits = np.zeros(n, dtype=np.int64)
    nbit = 0
    ci = 0
    for is_lon in bit_seq:
        if is_lon:
            mid = (lon_lo + lon_hi) / 2
            b = lon >= mid
            lon_lo = np.where(b, mid, lon_lo)
            lon_hi = np.where(b, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            b = lat >= mid
            lat_lo = np.where(b, mid, lat_lo)
            lat_hi = np.where(b, lat_hi, mid)
        bits = (bits << 1) | b.astype(np.int64)
        nbit += 1
        if nbit == 5:
            out[:, ci] = _BASE32[bits]
            ci += 1
            bits = np.zeros(n, dtype=np.int64)
            nbit = 0
    return np.array(["".join(row) for row in out])


def make_geohash_udf(precision: int):
    @F.pandas_udf(T.StringType())
    def geohash_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64)
        lo = lon.to_numpy(dtype=np.float64)
        ok = ~(np.isnan(la) | np.isnan(lo))
        res = np.full(len(la), None, dtype=object)
        if ok.any():
            res[ok] = geohash_np(la[ok], lo[ok], precision)
        return pd.Series(res)

    return geohash_udf


def geohash(lat: Column | str, lon: Column | str, precision: int = 2) -> Column:
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    return make_geohash_udf(precision)(la, lo)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (haversine, R=6371km — the ES
    ``arc`` default's constant), as a pure Column expression (JVM trig,
    whole-stage codegen). Backs the ES ``geo_distance`` filter/sort.

    Float contract: the same formula renders in DuckDB SQL
    (``haversine_duckdb_sql``); libm one-ulp trig differences only matter
    for points within ~millimeters of a filter radius, the same
    boundary-measure-zero exposure as the engine's ln()-based idf."""
    rad = lambda c: F.radians(c)  # noqa: E731
    dlat = (rad(lat2) - rad(lat1)) / 2
    dlon = (rad(lon2) - rad(lon1)) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rad(lat1)) * F.cos(rad(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * 6371000.0) * F.asin(F.sqrt(a))


def haversine_duckdb_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB rendering of ``haversine_m`` — kept literally in sync."""
    r = lambda c: f"radians({c})"  # noqa: E731
    dlat = f"(({r(lat2)}) - ({r(lat1)})) / 2"
    dlon = f"(({r(lon2)}) - ({r(lon1)})) / 2"
    a = (
        f"sin({dlat}) * sin({dlat}) + cos({r(lat1)}) * cos({r(lat2)})"
        f" * sin({dlon}) * sin({dlon})"
    )
    return f"(2.0 * 6371000.0 * asin(sqrt({a})))"
