from .csv import read_csv
from .jsonl import read_jsonl
from .tables import load_table, load_tables, register_views

__all__ = ["read_csv", "read_jsonl", "load_table", "load_tables",
           "register_views"]
