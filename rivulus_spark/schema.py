"""Type system: the reference's five logical types mapped onto Spark SQL.

Semantics mirrored (not copied) from the reference:
- five logical types Int64/Float64/String/Boolean/Null
  (/root/reference/src/datatypes/series.rs:126-133);
- inference from Python values: first non-null wins, Int64+Float64
  promotes to Float64, any other mix errors
  (/root/reference/src/datatypes/series.rs:190-212);
- numeric promotion for arithmetic: (Float64, any-numeric) -> Float64,
  (Int64, Int64) -> Int64, Null absorbs to the other side
  (/root/reference/src/logical_plan/plan.rs:235-262);
- comparability: same type, Int64<->Float64, Null<->anything
  (/root/reference/src/datatypes/series.rs:144-159).

On Spark these map to LongType/DoubleType/StringType/BooleanType/NullType,
and nested/timestamp/decimal types are accepted as a superset.
"""

from __future__ import annotations

import enum
from typing import Any

from pyspark.sql import types as T

from .errors import MixedTypesError


class DataType(enum.Enum):
    INT64 = "Int64"
    FLOAT64 = "Float64"
    STRING = "String"
    BOOLEAN = "Boolean"
    NULL = "Null"

    def to_spark(self) -> T.DataType:
        return _TO_SPARK[self]

    @classmethod
    def from_spark(cls, dt: T.DataType) -> "DataType | None":
        """Map a Spark type to a reference logical type; None if outside
        the five-type core (superset types pass through untouched)."""
        return _FROM_SPARK.get(dt.__class__)

    @property
    def is_numeric(self) -> bool:
        return self in (DataType.INT64, DataType.FLOAT64)


_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.INT64: T.LongType(),
    DataType.FLOAT64: T.DoubleType(),
    DataType.STRING: T.StringType(),
    DataType.BOOLEAN: T.BooleanType(),
    DataType.NULL: T.NullType(),
}

_FROM_SPARK: dict[type, DataType] = {
    T.LongType: DataType.INT64,
    T.IntegerType: DataType.INT64,
    T.ShortType: DataType.INT64,
    T.ByteType: DataType.INT64,
    T.DoubleType: DataType.FLOAT64,
    T.FloatType: DataType.FLOAT64,
    T.StringType: DataType.STRING,
    T.BooleanType: DataType.BOOLEAN,
    T.NullType: DataType.NULL,
}


def infer_value_type(v: Any) -> DataType:
    if v is None:
        return DataType.NULL
    if isinstance(v, bool):  # bool before int: bool is an int subclass
        return DataType.BOOLEAN
    if isinstance(v, int):
        return DataType.INT64
    if isinstance(v, float):
        return DataType.FLOAT64
    if isinstance(v, str):
        return DataType.STRING
    raise MixedTypesError(f"unsupported scalar {type(v).__name__}: {v!r}")


def infer_series_type(values: list[Any]) -> DataType:
    """First-non-null inference with Int64+Float64 -> Float64 promotion;
    any other heterogeneous mix raises MixedTypesError."""
    seen: set[DataType] = set()
    for v in values:
        t = infer_value_type(v)
        if t is not DataType.NULL:
            seen.add(t)
    if not seen:
        return DataType.NULL
    if len(seen) == 1:
        return next(iter(seen))
    if seen == {DataType.INT64, DataType.FLOAT64}:
        return DataType.FLOAT64
    raise MixedTypesError(f"incompatible value types in one column: {sorted(t.value for t in seen)}")


def promote_numeric(a: DataType, b: DataType) -> DataType:
    """Result type of arithmetic between two logical types."""
    if DataType.FLOAT64 in (a, b) and all(t.is_numeric or t is DataType.NULL for t in (a, b)):
        return DataType.FLOAT64
    if a is DataType.INT64 and b is DataType.INT64:
        return DataType.INT64
    if a is DataType.NULL:
        return b
    if b is DataType.NULL:
        return a
    return DataType.NULL


def comparable(a: DataType, b: DataType) -> bool:
    if a == b:
        return True
    if {a, b} == {DataType.INT64, DataType.FLOAT64}:
        return True
    return DataType.NULL in (a, b)


def struct_type(fields: list[tuple[str, DataType]] | dict[str, DataType],
                nullable: bool = True) -> T.StructType:
    """Build a Spark StructType from (name, logical-type) pairs."""
    items = fields.items() if isinstance(fields, dict) else fields
    return T.StructType([T.StructField(n, dt.to_spark(), nullable) for n, dt in items])
