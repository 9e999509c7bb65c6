from .keyed_table import KeyedParquetStore  # noqa: F401
