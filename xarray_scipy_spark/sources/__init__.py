from .tables import TABLES, load_table, load_tables, register_views
from .write import read_series, write_bucketed, write_partitioned, write_series

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_partitioned",
    "write_bucketed",
    "write_series",
    "read_series",
]
