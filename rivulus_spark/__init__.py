"""rivulus_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the capabilities of the reference
engine (CleConor/rivulus, a Rust lazy query engine) as a thin semantic
layer over Spark SQL + Catalyst, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB workloads.
"""

from . import cache
from .errors import (
    ColumnNotFoundError,
    DuplicateColumnError,
    EmptySeriesError,
    IncompatibleJoinKeysError,
    InvalidPredicateError,
    LengthMismatchError,
    MixedTypesError,
    RivulusError,
    SchemaRequiredError,
)
from .expressions import Expr, col, lit
from .frame import GroupedFrame, LazyFrame, PivotedFrame
from .schema import DataType
from .session import get_spark

__all__ = [
    "cache",
    "LazyFrame", "GroupedFrame", "PivotedFrame", "Expr", "col", "lit", "DataType",
    "get_spark", "RivulusError", "ColumnNotFoundError",
    "DuplicateColumnError", "MixedTypesError", "LengthMismatchError",
    "IncompatibleJoinKeysError", "InvalidPredicateError",
    "SchemaRequiredError", "EmptySeriesError",
]

__version__ = "0.1.0"
