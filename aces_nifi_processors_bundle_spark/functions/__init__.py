from .scalar import (
    ISO_MILLIS_FMT,
    array_sum_double,
    array_sum_int,
    epoch_millis_to_iso,
    java_parse_boolean,
    mongo_extended_date,
)
from .geotile import quadkey, tile_x, tile_y

__all__ = [
    "ISO_MILLIS_FMT",
    "array_sum_double",
    "array_sum_int",
    "epoch_millis_to_iso",
    "java_parse_boolean",
    "mongo_extended_date",
    "quadkey",
    "tile_x",
    "tile_y",
]
