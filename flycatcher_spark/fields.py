"""Field type definitions compiled to Spark types + Column constraints.

Capability parity with the reference's field layer
(``/root/reference/src/flycatcher/fields.py``): six primitive scalar
types (int, float, str, bool, datetime, date), Pydantic-style
``Field()`` metadata capture, and per-field declarative constraints.
Where the reference compiles constraints to ``pl.Expr`` via
``get_polars_constraints()`` (fields.py:397-422, 491-506, 573-604,
681-704), this engine compiles to ``pyspark.sql.Column`` via
``get_spark_constraints()`` so that constraint evaluation runs inside
Catalyst/Tungsten (whole-stage codegen, predicate pushdown) instead of
a single-node columnar kernel.
"""

from __future__ import annotations

import warnings
from datetime import date, datetime
from typing import Any, Callable

from pyspark.sql import types as T

from .validators.array import ArrLen, ArrMax, ArrMin, MapHasKey, MapMax, MapMin
from .validators.core import FieldRef
from .validators.ops import Expr, Lit

# Sentinel: distinguishes "no default provided" from "default is None".
_MISSING = object()

# Python annotation type -> Field class (populated at module end).
_TYPE_MAP: dict[type, type["FieldBase"]] = {}


class FieldInfo:
    """Carrier for metadata/constraints declared through ``Field()``.

    Internal: the ``SchemaMeta`` metaclass merges a ``FieldInfo`` with
    the annotated Python type to pick and construct the concrete field
    class. Mirrors reference ``FieldInfo`` (fields.py:16-106).
    """

    def __init__(
        self,
        *,
        primary_key: bool = False,
        nullable: bool = False,
        default: Any = _MISSING,
        description: str | None = None,
        unique: bool = False,
        index: bool = False,
        autoincrement: bool | None = None,
        gt: int | float | datetime | None = None,
        ge: int | float | datetime | None = None,
        lt: int | float | datetime | None = None,
        le: int | float | datetime | None = None,
        multiple_of: int | None = None,
        min_length: int | None = None,
        max_length: int | None = None,
        pattern: str | None = None,
        min_items: int | None = None,
        max_items: int | None = None,
        item_gt: int | float | None = None,
        item_ge: int | float | None = None,
        item_lt: int | float | None = None,
        item_le: int | float | None = None,
        required_keys: list[str] | None = None,
    ):
        self.primary_key = primary_key
        self.nullable = nullable
        self.default = default
        self.description = description
        self.unique = unique
        self.index = index
        self.autoincrement = autoincrement
        self.gt = gt
        self.ge = ge
        self.lt = lt
        self.le = le
        self.multiple_of = multiple_of
        self.min_length = min_length
        self.max_length = max_length
        self.pattern = pattern
        self.min_items = min_items
        self.max_items = max_items
        self.item_gt = item_gt
        self.item_ge = item_ge
        self.item_lt = item_lt
        self.item_le = item_le
        self.required_keys = required_keys

    def to_field_kwargs(self) -> dict[str, Any]:
        """Flatten set options into constructor kwargs for a field class."""
        kwargs: dict[str, Any] = {
            "primary_key": self.primary_key,
            "nullable": self.nullable,
            "unique": self.unique,
            "index": self.index,
        }
        if self.default is not _MISSING:
            kwargs["default"] = self.default
        if self.description is not None:
            kwargs["description"] = self.description
        if self.autoincrement is not None:
            kwargs["autoincrement"] = self.autoincrement
        for name in ("gt", "ge", "lt", "le", "multiple_of",
                     "min_length", "max_length", "pattern",
                     "min_items", "max_items",
                     "item_gt", "item_ge", "item_lt", "item_le",
                     "required_keys"):
            value = getattr(self, name)
            if value is not None:
                kwargs[name] = value
        return kwargs


def Field(  # noqa: N802 - capitalized to match the Pydantic-style API
    default: Any = _MISSING,
    *,
    primary_key: bool = False,
    nullable: bool = False,
    description: str | None = None,
    unique: bool = False,
    index: bool = False,
    autoincrement: bool | None = None,
    gt: int | float | datetime | None = None,
    ge: int | float | datetime | None = None,
    lt: int | float | datetime | None = None,
    le: int | float | datetime | None = None,
    multiple_of: int | None = None,
    min_length: int | None = None,
    max_length: int | None = None,
    pattern: str | None = None,
    min_items: int | None = None,
    max_items: int | None = None,
    item_gt: int | float | None = None,
    item_ge: int | float | None = None,
    item_lt: int | float | None = None,
    item_le: int | float | None = None,
    required_keys: list[str] | None = None,
) -> Any:
    """Declare field metadata and constraints, Pydantic-style.

    Examples
    --------
        >>> from flycatcher_spark import Schema, Field
        >>> class UserSchema(Schema):
        ...     id: int = Field(primary_key=True)
        ...     age: int = Field(ge=0, le=120)
        ...     email: str = Field(pattern=r'^[^@]+@[^@]+\\.[^@]+$')
    """
    return FieldInfo(
        primary_key=primary_key,
        nullable=nullable,
        default=default,
        description=description,
        unique=unique,
        index=index,
        autoincrement=autoincrement,
        gt=gt,
        ge=ge,
        lt=lt,
        le=le,
        multiple_of=multiple_of,
        min_length=min_length,
        max_length=max_length,
        pattern=pattern,
        min_items=min_items,
        max_items=max_items,
        item_gt=item_gt,
        item_ge=item_ge,
        item_lt=item_lt,
        item_le=item_le,
        required_keys=required_keys,
    )


class FieldBase:
    """Base class for all schema field types.

    Holds name/nullability/default plus DB-only metadata (primary_key,
    unique, index, autoincrement, description). DB-only metadata is
    intentionally NOT validated by the bulk path — it only shapes DDL —
    matching the reference's asymmetry (SURVEY.md §1.3).
    """

    def __init__(
        self,
        *,
        primary_key: bool = False,
        nullable: bool = False,
        default: Any = _MISSING,
        description: str | None = None,
        unique: bool = False,
        index: bool = False,
        autoincrement: bool | None = None,
    ):
        self.primary_key = primary_key
        self.nullable = nullable
        self.default = default
        self.description = description
        self.unique = unique
        self.index = index
        self.autoincrement = autoincrement
        self.name: str | None = None  # set by SchemaMeta

        # nullable + default is ambiguous (default fills only missing
        # columns, not nulls) — warn once, deferred until name is known.
        self._needs_warning = nullable and default is not _MISSING

        self.validators: list[Callable] = []

    # -- type mapping -------------------------------------------------
    def get_python_type(self) -> type:
        raise NotImplementedError

    def get_spark_dtype(self) -> T.DataType:
        """Spark SQL type for this field."""
        raise NotImplementedError

    def get_ddl_type(self) -> str:
        """ANSI-SQL-ish DDL type string for CREATE TABLE generation."""
        return self.get_spark_dtype().simpleString().upper()

    # -- constraints --------------------------------------------------
    def get_spark_constraints(self) -> list[tuple[Expr, str]]:
        """Return ``(boolean DSL expression, error message)`` pairs.

        Constraints are DSL nodes (session-free); ``SparkValidator``
        compiles them to Columns at validate time. They run after null
        handling, so they need not guard nulls explicitly (rows where
        the predicate evaluates to null are neither violations nor —
        unless another constraint fires — filtered).
        """
        if self.name is None:
            raise RuntimeError(
                f"{self.__class__.__name__} constraints require field name "
                f"to be set by Schema metaclass"
            )
        if self._needs_warning:
            warnings.warn(
                f"Field '{self.name}' is nullable=True with a default value. "
                f"Default will only be used for missing columns, not null values. "
                f"Use fill_nulls=True in validate() to replace nulls with defaults.",
                UserWarning,
                stacklevel=2,
            )
            self._needs_warning = False
        return []

    def add_validator(self, func: Callable):
        """Attach a custom validator callable (kept for API parity)."""
        self.validators.append(func)
        return self

    # -- shared range-constraint helper -------------------------------
    def _range_constraints(self, fmt=str, cast=None) -> list[tuple[Expr, str]]:
        """gt/ge/lt/le constraints shared by numeric/datetime fields."""
        assert self.name is not None
        c = FieldRef(self.name)
        out: list[tuple[Expr, str]] = []
        for attr, op, sym in (
            ("gt", c.__gt__, ">"),
            ("ge", c.__ge__, ">="),
            ("lt", c.__lt__, "<"),
            ("le", c.__le__, "<="),
        ):
            bound = getattr(self, attr, None)
            if bound is not None:
                out.append(
                    (op(Lit(bound, cast)), f"{self.name} must be {sym} {fmt(bound)}")
                )
        return out


class Integer(FieldBase):
    """int field → Spark ``LongType`` with gt/ge/lt/le/multiple_of."""

    def __init__(
        self,
        *,
        gt: int | None = None,
        ge: int | None = None,
        lt: int | None = None,
        le: int | None = None,
        multiple_of: int | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.gt = gt
        self.ge = ge
        self.lt = lt
        self.le = le
        self.multiple_of = multiple_of

    def get_python_type(self):
        return int

    def get_spark_dtype(self):
        return T.LongType()

    def get_spark_constraints(self) -> list[tuple[Expr, str]]:
        constraints = list(super().get_spark_constraints())
        constraints.extend(self._range_constraints())
        if self.multiple_of is not None:
            constraints.append(
                (
                    FieldRef(self.name) % self.multiple_of == 0,
                    f"{self.name} must be multiple of {self.multiple_of}",
                )
            )
        return constraints

    def get_pydantic_field_kwargs(self) -> dict[str, Any]:
        kwargs = {}
        for k in ("gt", "ge", "lt", "le", "multiple_of"):
            v = getattr(self, k)
            if v is not None:
                kwargs[k] = v
        return kwargs


class Float(FieldBase):
    """float field → Spark ``DoubleType`` with gt/ge/lt/le."""

    def __init__(
        self,
        *,
        gt: float | None = None,
        ge: float | None = None,
        lt: float | None = None,
        le: float | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.gt = gt
        self.ge = ge
        self.lt = lt
        self.le = le

    def get_python_type(self):
        return float

    def get_spark_dtype(self):
        return T.DoubleType()

    def get_spark_constraints(self) -> list[tuple[Expr, str]]:
        constraints = list(super().get_spark_constraints())
        constraints.extend(self._range_constraints())
        return constraints

    def get_pydantic_field_kwargs(self) -> dict[str, Any]:
        kwargs = {}
        for k in ("gt", "ge", "lt", "le"):
            v = getattr(self, k)
            if v is not None:
                kwargs[k] = v
        return kwargs


class String(FieldBase):
    r"""str field → Spark ``StringType`` with length/pattern constraints.

    ``min_length``/``max_length`` count characters (``F.length`` on
    StringType counts characters, matching the reference's
    ``len_chars``). ``pattern`` is an unanchored regex search
    (``rlike``), matching the reference's ``str.contains``.
    """

    def __init__(
        self,
        *,
        max_length: int | None = None,
        min_length: int | None = None,
        pattern: str | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.max_length = max_length
        self.min_length = min_length
        self.pattern = pattern

    def get_python_type(self):
        return str

    def get_spark_dtype(self):
        return T.StringType()

    def get_ddl_type(self) -> str:
        if self.max_length:
            return f"VARCHAR({self.max_length})"
        return "STRING"

    def get_spark_constraints(self) -> list[tuple[Expr, str]]:
        constraints = list(super().get_spark_constraints())
        c = FieldRef(self.name)
        if self.min_length is not None:
            constraints.append(
                (
                    c.str.len_chars() >= self.min_length,
                    f"{self.name} must have at least {self.min_length} characters",
                )
            )
        if self.max_length is not None:
            constraints.append(
                (
                    c.str.len_chars() <= self.max_length,
                    f"{self.name} must have at most {self.max_length} characters",
                )
            )
        if self.pattern is not None:
            constraints.append(
                (
                    c.str.contains(self.pattern),
                    f"{self.name} must match pattern: {self.pattern}",
                )
            )
        return constraints

    def get_pydantic_field_kwargs(self) -> dict[str, Any]:
        kwargs: dict[str, Any] = {}
        for k in ("min_length", "max_length", "pattern"):
            v = getattr(self, k)
            if v is not None:
                kwargs[k] = v
        return kwargs


class Boolean(FieldBase):
    """bool field → Spark ``BooleanType``. Type-only (no constraints)."""

    def get_python_type(self):
        return bool

    def get_spark_dtype(self):
        return T.BooleanType()


class Datetime(FieldBase):
    """datetime field → Spark ``TimestampNTZType`` with range constraints.

    TimestampNTZ is chosen for parity with the reference's tz-naive
    semantics (Polars ``pl.Datetime`` is tz-naive; SURVEY.md §1.2).
    """

    def __init__(
        self,
        *,
        gt: datetime | None = None,
        ge: datetime | None = None,
        lt: datetime | None = None,
        le: datetime | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.gt = gt
        self.ge = ge
        self.lt = lt
        self.le = le

    def get_python_type(self):
        return datetime

    def get_spark_dtype(self):
        return T.TimestampNTZType()

    def get_spark_constraints(self) -> list[tuple[Expr, str]]:
        constraints = list(super().get_spark_constraints())
        # Literal datetimes become TIMESTAMP in Spark; cast to NTZ so the
        # comparison against a TimestampNTZ column stays timezone-free.
        constraints.extend(
            self._range_constraints(
                fmt=lambda v: v.isoformat(), cast=T.TimestampNTZType()
            )
        )
        return constraints

    def get_pydantic_field_kwargs(self) -> dict[str, Any]:
        kwargs: dict[str, Any] = {}
        for k in ("gt", "ge", "lt", "le"):
            v = getattr(self, k)
            if v is not None:
                kwargs[k] = v
        return kwargs


class Date(FieldBase):
    """date field → Spark ``DateType``. Type-only (no constraints)."""

    def get_python_type(self):
        return date

    def get_spark_dtype(self):
        return T.DateType()


class Array(FieldBase):
    """``list[T]`` field → Spark ``ArrayType`` (§7 extension; the
    reference DSL is scalar-only).

    Constraints: ``min_items``/``max_items`` bound the element count
    (``.arr.len()``); ``item_gt/ge/lt/le`` bound every element via
    the array extrema (``arr.min() >= b`` == "all elements >= b") —
    single codegen'd expressions, no higher-order lambdas, and
    mirrorable in plain Python for the Pydantic bridge. Null-array
    rows pass constraints (null handling owns them), matching every
    scalar field.
    """

    element_type: type = float  # overridden by concrete subclasses
    element_dtype: T.DataType = T.DoubleType()

    def __init__(
        self,
        *,
        min_items: int | None = None,
        max_items: int | None = None,
        item_gt: int | float | None = None,
        item_ge: int | float | None = None,
        item_lt: int | float | None = None,
        item_le: int | float | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.min_items = min_items
        self.max_items = max_items
        self.item_gt = item_gt
        self.item_ge = item_ge
        self.item_lt = item_lt
        self.item_le = item_le

    def get_python_type(self):
        return list[self.element_type]  # type: ignore[name-defined]

    def get_pydantic_type(self):
        """list[Annotated[T, Field(...)]] when item bounds exist."""
        bounds = {
            k: v
            for k, v in (
                ("gt", self.item_gt),
                ("ge", self.item_ge),
                ("lt", self.item_lt),
                ("le", self.item_le),
            )
            if v is not None
        }
        if not bounds:
            return self.get_python_type()
        from typing import Annotated

        from pydantic import Field as PydanticField

        return list[Annotated[self.element_type, PydanticField(**bounds)]]  # type: ignore[name-defined]

    def get_pydantic_field_kwargs(self) -> dict:
        out = {}
        if self.min_items is not None:
            out["min_length"] = self.min_items
        if self.max_items is not None:
            out["max_length"] = self.max_items
        return out

    def get_spark_dtype(self):
        return T.ArrayType(self.element_dtype, containsNull=True)

    def get_spark_constraints(self):
        constraints = list(super().get_spark_constraints())
        assert self.name is not None
        c = FieldRef(self.name)
        if self.min_items is not None:
            constraints.append(
                (
                    ArrLen(c) >= Lit(self.min_items),
                    f"{self.name} must have at least {self.min_items} items",
                )
            )
        if self.max_items is not None:
            constraints.append(
                (
                    ArrLen(c) <= Lit(self.max_items),
                    f"{self.name} must have at most {self.max_items} items",
                )
            )
        for attr, node, op, sym in (
            ("item_gt", ArrMin, "__gt__", ">"),
            ("item_ge", ArrMin, "__ge__", ">="),
            ("item_lt", ArrMax, "__lt__", "<"),
            ("item_le", ArrMax, "__le__", "<="),
        ):
            bound = getattr(self, attr)
            if bound is not None:
                constraints.append(
                    (
                        getattr(node(c), op)(Lit(bound)),
                        f"{self.name} items must be {sym} {bound}",
                    )
                )
        return constraints


class Map(FieldBase):
    """``dict[str, T]`` field → Spark ``MapType(string, T)`` (§7
    nested-type extension; JSON-object-shaped metadata columns).

    Constraints: ``min_items``/``max_items`` bound the entry count,
    ``required_keys`` demands specific keys, ``item_gt/ge/lt/le``
    bound every VALUE via map_values extrema. Same null semantics as
    every field: a null map passes constraints (null handling owns
    it).
    """

    value_type: type = str
    value_dtype: T.DataType = T.StringType()

    def __init__(
        self,
        *,
        min_items: int | None = None,
        max_items: int | None = None,
        required_keys: list[str] | None = None,
        item_gt: int | float | None = None,
        item_ge: int | float | None = None,
        item_lt: int | float | None = None,
        item_le: int | float | None = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.min_items = min_items
        self.max_items = max_items
        self.required_keys = list(required_keys) if required_keys else None
        self.item_gt = item_gt
        self.item_ge = item_ge
        self.item_lt = item_lt
        self.item_le = item_le

    def get_python_type(self):
        return dict[str, self.value_type]  # type: ignore[name-defined]

    def get_pydantic_type(self):
        from typing import Annotated

        from pydantic import AfterValidator
        from pydantic import Field as PydanticField

        bounds = {
            k: v
            for k, v in (
                ("gt", self.item_gt),
                ("ge", self.item_ge),
                ("lt", self.item_lt),
                ("le", self.item_le),
            )
            if v is not None
        }
        vt: Any = (
            Annotated[self.value_type, PydanticField(**bounds)]
            if bounds
            else self.value_type
        )
        py_type: Any = dict[str, vt]
        if self.required_keys:
            required = list(self.required_keys)
            fname = self.name

            def _check(v: dict) -> dict:
                missing = [k for k in required if k not in v]
                if missing:
                    raise ValueError(
                        f"{fname or 'map'} missing required keys: {missing}"
                    )
                return v

            py_type = Annotated[py_type, AfterValidator(_check)]
        return py_type

    def get_pydantic_field_kwargs(self) -> dict:
        out = {}
        if self.min_items is not None:
            out["min_length"] = self.min_items
        if self.max_items is not None:
            out["max_length"] = self.max_items
        return out

    def get_spark_dtype(self):
        return T.MapType(T.StringType(), self.value_dtype, valueContainsNull=True)

    def get_spark_constraints(self):
        constraints = list(super().get_spark_constraints())
        assert self.name is not None
        c = FieldRef(self.name)
        if self.min_items is not None:
            constraints.append(
                (
                    ArrLen(c) >= Lit(self.min_items),
                    f"{self.name} must have at least {self.min_items} entries",
                )
            )
        if self.max_items is not None:
            constraints.append(
                (
                    ArrLen(c) <= Lit(self.max_items),
                    f"{self.name} must have at most {self.max_items} entries",
                )
            )
        for key in self.required_keys or []:
            constraints.append(
                (
                    MapHasKey(c, key),
                    f"{self.name} must contain key '{key}'",
                )
            )
        for attr, node, op, sym in (
            ("item_gt", MapMin, "__gt__", ">"),
            ("item_ge", MapMin, "__ge__", ">="),
            ("item_lt", MapMax, "__lt__", "<"),
            ("item_le", MapMax, "__le__", "<="),
        ):
            bound = getattr(self, attr)
            if bound is not None:
                constraints.append(
                    (
                        getattr(node(c), op)(Lit(bound)),
                        f"{self.name} values must be {sym} {bound}",
                    )
                )
        return constraints


class StrMap(Map):
    value_type = str
    value_dtype = T.StringType()


class IntMap(Map):
    value_type = int
    value_dtype = T.LongType()


class FloatMap(Map):
    value_type = float
    value_dtype = T.DoubleType()


class BoolMap(Map):
    value_type = bool
    value_dtype = T.BooleanType()


class IntArray(Array):
    element_type = int
    element_dtype = T.LongType()


class FloatArray(Array):
    element_type = float
    element_dtype = T.DoubleType()


class StrArray(Array):
    element_type = str
    element_dtype = T.StringType()


class BoolArray(Array):
    element_type = bool
    element_dtype = T.BooleanType()


_TYPE_MAP.update(
    {
        int: Integer,
        str: String,
        float: Float,
        bool: Boolean,
        datetime: Datetime,
        date: Date,
        list[int]: IntArray,
        list[float]: FloatArray,
        list[str]: StrArray,
        list[bool]: BoolArray,
        dict[str, str]: StrMap,
        dict[str, int]: IntMap,
        dict[str, float]: FloatMap,
        dict[str, bool]: BoolMap,
    }
)


def get_field_class_for_type(python_type: type) -> type[FieldBase] | None:
    """Look up the field class for a Python annotation type."""
    return _TYPE_MAP.get(python_type)
