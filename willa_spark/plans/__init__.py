from .inspect import count_exchanges, physical_plan, uses_broadcast_join, pushed_filters

__all__ = ["physical_plan", "count_exchanges", "uses_broadcast_join", "pushed_filters"]
