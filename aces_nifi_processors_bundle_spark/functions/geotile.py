"""Web-Mercator tile / quadkey math as pure Column expressions.

The reference's GeoTileBinner lives in the external net.acesinc.data:
data-binner lib (aces-nifi-processors/pom.xml:29-33; configured at
DataBinningProcessor.java:179-197), so the exact bin-name format is our
golden spec: standard Bing-maps quadkeys (public algorithm), one bin
per zoom level 0..maxLevel.

All pure math columns — floor/ln/tan/cos/shiftright/bitwise-and — so
the whole binning stage stays inside whole-stage codegen. asinh is
expanded as ln(tan x + 1/cos x) so the same formula is expressible in
the DuckDB oracle (which lacks asinh).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# Web-Mercator is undefined at the poles; clamp like standard tiling.
_MAX_LAT = 85.05112878


def tile_x(lon: Column, zoom: int) -> Column:
    """Tile X index at a fixed zoom: floor((lon+180)/360 * 2^zoom),
    clamped. NULL/NaN longitudes yield NULL — greatest/least SKIP
    nulls and order NaN above every double, so without the guard a
    garbage coordinate landed on a valid edge tile."""
    n = F.lit(float(2**zoom))
    raw = F.floor((lon + 180.0) / 360.0 * n)
    idx = F.greatest(F.lit(0), F.least(raw, F.lit(2**zoom - 1))).cast("long")
    return F.when(lon.isNotNull() & ~F.isnan(lon.cast("double")), idx)


def tile_y(lat: Column, zoom: int) -> Column:
    """Tile Y index: floor((1 - asinh(tan(lat))/pi)/2 * 2^zoom), clamped.

    asinh(t) written as ln(t + 1/cos(lat)) for oracle parity.
    """
    n = F.lit(float(2**zoom))
    clamped = F.greatest(F.lit(-_MAX_LAT), F.least(lat, F.lit(_MAX_LAT)))
    rad = F.radians(clamped)
    asinh_tan = F.log(F.tan(rad) + 1.0 / F.cos(rad))
    raw = F.floor((1.0 - asinh_tan / math.pi) / 2.0 * n)
    idx = F.greatest(F.lit(0), F.least(raw, F.lit(2**zoom - 1))).cast("long")
    # same NULL/NaN guard as tile_x (NaN ordered above _MAX_LAT would
    # otherwise clamp to the y=0 corner tile)
    return F.when(lat.isNotNull() & ~F.isnan(lat.cast("double")), idx)


def quadkey(lon: Column, lat: Column, zoom: int) -> Column:
    """Quadkey string of length ``zoom`` for the tile containing (lon, lat).

    Digit i (1-based) interleaves one bit of tile-x and tile-y:
    d_i = ((x >> (zoom-i)) & 1) + 2*((y >> (zoom-i)) & 1).
    zoom=0 → empty string (the single root tile).
    """
    if zoom == 0:
        return F.lit("")
    x, y = tile_x(lon, zoom), tile_y(lat, zoom)
    digits = []
    for i in range(1, zoom + 1):
        shift = zoom - i
        d = (F.shiftright(x, shift).bitwiseAND(F.lit(1))
             + F.shiftright(y, shift).bitwiseAND(F.lit(1)) * 2)
        digits.append(d.cast("string"))
    return F.concat(*digits)
