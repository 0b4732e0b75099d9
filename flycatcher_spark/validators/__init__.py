"""Validator expression DSL, dual-compiled to Spark Columns and Python."""

from .core import FieldRef, ValidatorResult, col
from .datetime import DateTimeAccessor, DateTimeOp
from .membership import MembershipOp
from .ops import BinaryOp, Expr, UnaryOp
from .string import StringAccessor, StringOp

__all__ = [
    "BinaryOp",
    "DateTimeAccessor",
    "DateTimeOp",
    "Expr",
    "FieldRef",
    "MembershipOp",
    "StringAccessor",
    "StringOp",
    "UnaryOp",
    "ValidatorResult",
    "col",
]
