from .csv import read_csv
from .tables import load_table, load_tables, register_views

__all__ = ["read_csv", "load_table", "load_tables", "register_views"]
