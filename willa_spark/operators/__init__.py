from .windows import HoppingWindow, SessionWindow, TumblingWindow
from .aggregates import Aggregate
from . import joins, skew, tables, zorder

__all__ = [
    "TumblingWindow",
    "HoppingWindow",
    "SessionWindow",
    "Aggregate",
    "joins",
    "skew",
    "tables",
    "zorder",
]
