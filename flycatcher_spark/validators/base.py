"""Shared conversion helpers for validator expressions.

Mirrors the reference's ``_ExpressionMixin``
(``/root/reference/src/flycatcher/validators/base.py:10-23``) with the
columnar target retargeted from Polars to Spark ``Column``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_spark_expr(obj: Any) -> Column:
    """Convert a DSL node / Column / literal to a Spark Column.

    The isinstance check must come first: ``Column.__getattr__``
    resolves any attribute name as struct-field access, so
    ``hasattr(column, "to_spark")`` is always true.
    """
    if isinstance(obj, Column):
        return obj
    if hasattr(obj, "to_spark"):
        return obj.to_spark()
    return F.lit(obj)


def to_python_value(obj: Any, values: Any) -> Any:
    """Convert a DSL node / literal to a concrete Python value."""
    if hasattr(obj, "to_python"):
        return obj.to_python(values)
    return obj


class _ExpressionMixin:
    """Mixin providing operand-conversion methods for expression nodes."""

    def _to_spark(self, obj: Any) -> Column:
        return to_spark_expr(obj)

    def _to_python(self, obj: Any, values: Any) -> Any:
        return to_python_value(obj, values)
