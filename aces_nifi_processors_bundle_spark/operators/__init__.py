from .routing import Routed
from .attributes_to_json import AttributesToJsonConfig, attributes_to_json
from .security_marking import SecurityMarkingConfig, convert_security_marking
from .binning import (
    BinnerConfig,
    DateBinner,
    GeoTileBinner,
    LiteralBinner,
    MergedBinner,
    NumericBinner,
    bin_count,
    bin_records,
)
from .partial_update import PartialUpdateConfig, partial_update
from .put_if_absent import put_if_absent

__all__ = [
    "Routed",
    "AttributesToJsonConfig",
    "attributes_to_json",
    "SecurityMarkingConfig",
    "convert_security_marking",
    "BinnerConfig",
    "DateBinner",
    "LiteralBinner",
    "NumericBinner",
    "GeoTileBinner",
    "MergedBinner",
    "bin_records",
    "bin_count",
    "PartialUpdateConfig",
    "partial_update",
    "put_if_absent",
]
