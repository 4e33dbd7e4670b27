from .files import file_source, read_records
from .parquet import read_table, table_names, register_views

__all__ = ["file_source", "read_records", "read_table", "table_names", "register_views"]
