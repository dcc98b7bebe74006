"""Geo predicates — pure trig Columns, no UDF, no index needed.

The reference keeps a boost R-tree and uplifts NEARBY conjuncts to it
(engine/db/index/spatial/geoindex.cpp:16-59); in Spark the same predicate
is a codegen'd haversine expression that Catalyst pushes down, with an
optional bounding-box prefilter for data skipping at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0  # reference geoindex.cpp:43


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (reference geoindex.cpp:41-59)."""
    rlat1 = F.radians(lat1.cast("double"))
    rlat2 = F.radians(lat2.cast("double"))
    dlat = F.radians(lat2.cast("double") - lat1.cast("double"))
    dlon = F.radians(lon2.cast("double") - lon1.cast("double"))
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def nearby(geo: Column | str, lat: float, lon: float, radius_km: float) -> Column:
    """NEARBY(geo_field, lat, lon, km) predicate (reference
    expr.cpp:532-608). ``geo`` is struct<latitude double, longitude double>.

    Wraps the haversine test in a cheap bounding-box prefilter so that at
    scale the parquet scan can skip row groups on min/max stats before
    any trig runs.
    """
    if not (-90.0 <= lat <= 90.0):
        raise ValueError(f"NEARBY latitude out of range: {lat}")
    if not (-180.0 <= lon <= 180.0):
        raise ValueError(f"NEARBY longitude out of range: {lon}")
    g = F.col(geo) if isinstance(geo, str) else geo
    glat = g.getField("latitude")
    glon = g.getField("longitude")
    # Bounding box (degrees); at |lat| near poles the lon window is the
    # whole range. Only a prefilter — haversine decides.
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    coslat = math.cos(math.radians(lat))
    box = (glat >= lat - dlat) & (glat <= lat + dlat)
    if coslat > 1e-9:
        dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * coslat))
        if dlon < 180.0:
            lo, hi = lon - dlon, lon + dlon
            if lo < -180.0:
                # window wraps the antimeridian westward: [lo+360, 180] ∪ [-180, hi]
                box = box & ((glon >= lo + 360.0) | (glon <= hi))
            elif hi > 180.0:
                # wraps eastward: [lo, 180] ∪ [-180, hi-360]
                box = box & ((glon >= lo) | (glon <= hi - 360.0))
            else:
                box = box & (glon >= lo) & (glon <= hi)
    return box & (
        haversine_km(glat, glon, F.lit(float(lat)), F.lit(float(lon)))
        <= F.lit(float(radius_km))
    )
