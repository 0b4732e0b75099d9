"""Array expression nodes: the ``.arr`` accessor.

Extension beyond the reference surface (nested/array types are a
SURVEY §7 item — the reference DSL is scalar-only). Three nodes cover
the constraint surface an ``array<T>`` column needs:

- ``ArrLen`` — element count (``F.size``; null array -> null, so a
  length constraint on a null row is neither pass nor violation,
  consistent with every scalar constraint).
- ``ArrMin`` / ``ArrMax`` — element extrema (``F.array_min/max``;
  null or empty array -> null). ``arr.min() >= b`` is exactly
  "every element >= b" and compiles to ONE codegen'd expression —
  unlike a ``forall`` lambda, it is also expressible in plain Python
  for the Pydantic bridge and in any SQL dialect for the oracles.

All dual-compile: ``to_spark()`` -> Column, ``to_python(values)`` ->
plain value, matching the rest of the DSL.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ops import Expr


class ArrLen(Expr):
    """Number of elements in an array column (null -> null)."""

    def __init__(self, operand: Any):
        self.operand = operand

    def to_spark(self) -> Column:
        return F.size(self._to_spark(self.operand))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        return None if v is None else len(v)

    def __repr__(self) -> str:
        return f"{self.operand!r}.arr.len()"


class ArrMin(Expr):
    """Smallest element (null/empty array -> null; nulls skipped)."""

    def __init__(self, operand: Any):
        self.operand = operand

    def to_spark(self) -> Column:
        return F.array_min(self._to_spark(self.operand))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        if v is None:
            return None
        items = [x for x in v if x is not None]
        return min(items) if items else None

    def __repr__(self) -> str:
        return f"{self.operand!r}.arr.min()"


class ArrMax(Expr):
    """Largest element (null/empty array -> null; nulls skipped)."""

    def __init__(self, operand: Any):
        self.operand = operand

    def to_spark(self) -> Column:
        return F.array_max(self._to_spark(self.operand))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        if v is None:
            return None
        items = [x for x in v if x is not None]
        return max(items) if items else None

    def __repr__(self) -> str:
        return f"{self.operand!r}.arr.max()"


class MapHasKey(Expr):
    """True when a map column contains ``key`` (null map -> null)."""

    def __init__(self, operand: Any, key: str):
        self.operand = operand
        self.key = key

    def to_spark(self) -> Column:
        c = self._to_spark(self.operand)
        return F.when(
            c.isNull(), F.lit(None).cast("boolean")
        ).otherwise(F.map_contains_key(c, self.key))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        return None if v is None else self.key in v

    def __repr__(self) -> str:
        return f"{self.operand!r}.map.has_key({self.key!r})"


class MapMin(Expr):
    """Smallest map VALUE (null/empty map -> null; null values skipped)."""

    def __init__(self, operand: Any):
        self.operand = operand

    def to_spark(self) -> Column:
        return F.array_min(F.map_values(self._to_spark(self.operand)))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        if v is None:
            return None
        items = [x for x in v.values() if x is not None]
        return min(items) if items else None

    def __repr__(self) -> str:
        return f"{self.operand!r}.map.min()"


class MapMax(Expr):
    """Largest map VALUE (null/empty map -> null; null values skipped)."""

    def __init__(self, operand: Any):
        self.operand = operand

    def to_spark(self) -> Column:
        return F.array_max(F.map_values(self._to_spark(self.operand)))

    def to_python(self, values: Any) -> Any:
        v = self._to_python(self.operand, values)
        if v is None:
            return None
        items = [x for x in v.values() if x is not None]
        return max(items) if items else None

    def __repr__(self) -> str:
        return f"{self.operand!r}.map.max()"


class ArrayAccessor:
    """``col("xs").arr`` — array helpers on any expression node."""

    def __init__(self, expr: Any):
        self._expr = expr

    def len(self) -> ArrLen:
        return ArrLen(self._expr)

    def min(self) -> ArrMin:
        return ArrMin(self._expr)

    def max(self) -> ArrMax:
        return ArrMax(self._expr)


class MapAccessor:
    """``col("props").map`` — map helpers on any expression node.

    ``len()`` counts entries (``ArrLen`` — F.size works for maps and
    Python ``len`` for dicts); ``min()/max()`` range over VALUES.
    """

    def __init__(self, expr: Any):
        self._expr = expr

    def len(self) -> ArrLen:
        return ArrLen(self._expr)

    def has_key(self, key: str) -> MapHasKey:
        return MapHasKey(self._expr, key)

    def min(self) -> MapMin:
        return MapMin(self._expr)

    def max(self) -> MapMax:
        return MapMax(self._expr)
