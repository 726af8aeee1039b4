"""Error hierarchy mirroring the reference engine's error surface.

The reference (rivulus) reports errors from schema validation and
planning: ColumnNotFound, IncompatibleJoinKeys, MixedTypes, duplicate
columns, length mismatches (see /root/reference/src/logical_plan/plan.rs:115-202
and /root/reference/src/datatypes/series.rs:203-208 for the semantics we
mirror — no code is copied; this is a fresh PySpark-native implementation).
"""

from __future__ import annotations


class RivulusError(Exception):
    """Base class for all rivulus_spark errors."""


class ColumnNotFoundError(RivulusError):
    def __init__(self, column: str, available: list[str] | None = None):
        self.column = column
        self.available = list(available) if available else []
        msg = f"column not found: {column!r}"
        if self.available:
            msg += f" (available: {', '.join(self.available)})"
        super().__init__(msg)


class DuplicateColumnError(RivulusError):
    def __init__(self, column: str):
        self.column = column
        super().__init__(f"duplicate column name: {column!r}")


class MixedTypesError(RivulusError):
    def __init__(self, detail: str):
        super().__init__(f"mixed types: {detail}")


class LengthMismatchError(RivulusError):
    def __init__(self, detail: str):
        super().__init__(f"column length mismatch: {detail}")


class IncompatibleJoinKeysError(RivulusError):
    def __init__(self, left_key: str, left_type: str, right_key: str, right_type: str):
        self.left_key, self.right_key = left_key, right_key
        super().__init__(
            f"incompatible join keys: {left_key!r} ({left_type}) vs "
            f"{right_key!r} ({right_type})"
        )


class InvalidPredicateError(RivulusError):
    def __init__(self, detail: str):
        super().__init__(f"invalid predicate: {detail}")


class SchemaRequiredError(RivulusError):
    def __init__(self, source: str):
        super().__init__(f"{source} source requires an explicit schema")


class EmptySeriesError(RivulusError):
    def __init__(self, column: str | None = None) -> None:
        where = f" (column {column!r})" if column else ""
        super().__init__(
            f"cannot build a Series from zero values{where} "
            "(typed 0-row frames only arise as query results)")
