from .windows import HoppingWindow, SessionWindow, TumblingWindow
from .aggregates import Aggregate
from . import joins, skew, tables

__all__ = [
    "TumblingWindow",
    "HoppingWindow",
    "SessionWindow",
    "Aggregate",
    "joins",
    "skew",
    "tables",
]
