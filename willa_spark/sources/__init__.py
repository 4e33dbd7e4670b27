from .parquet import read_table, table_names, register_views

__all__ = ["read_table", "table_names", "register_views"]
