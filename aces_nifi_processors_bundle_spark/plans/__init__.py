from .oracles import ORACLES
from .registry import QUERIES

__all__ = ["ORACLES", "QUERIES"]
