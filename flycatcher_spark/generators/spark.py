"""Spark bulk-validation generator — the engine's hot path.

Capability parity with the reference's bulk validator
(``/root/reference/src/flycatcher/generators/polars.py:93-254``):
the same public surface (``validate(df, strict, show_violations,
fill_nulls)``, ``.schema``, ``describe_constraints()``) and the same
pipeline stages V1-V8 (SURVEY.md §2.1), re-architected for Spark's
lazy, distributed execution model:

**Physical design (the core improvement, SURVEY.md §4.2).** The
reference evaluates each constraint in its own pass — N+ full scans
for N constraints. Here, null counts for every non-nullable column
AND violation counts for every constraint are computed in ONE
conditional-aggregation job::

    df.agg(sum(when(col.isNull(), 1)), ..., sum(when(ok & ~expr, 1)), ...)

which Catalyst executes as a single whole-stage-codegen scan with
map-side partial aggregation — one scan regardless of constraint
count, at any scale. Sample rows for error messages are fetched
lazily (``filter(~expr).limit(k)``) only for constraints that
actually violated. The returned DataFrame is a pure lazy
transformation (cast/select + filters) that fuses into downstream
plans: filters combine, casts fold into the parquet scan's projection,
and predicate pushdown applies when constraints reference scan
columns.

**Documented divergence:** violation counts are computed
independently in one pass (better diagnostics), whereas the reference
computes them on a sequentially-filtered frame so later counts exclude
rows already removed (reference polars.py:229). Kept rows are
identical except in one pathological corner: a constraint whose every
violating row is also rejected by an earlier constraint is still
applied here (dropping its null-valued rows) but skipped by the
reference.
"""

from __future__ import annotations

import inspect
import logging
from functools import reduce
from typing import TYPE_CHECKING, Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fields import _MISSING
from ..validators import ValidatorResult

if TYPE_CHECKING:  # pragma: no cover
    from ..base import Schema

logger = logging.getLogger(__name__)


class SparkValidator:
    """Validates Spark DataFrames against a flycatcher_spark schema.

    Examples
    --------
        >>> from flycatcher_spark import Field, Schema
        >>> class UserSchema(Schema):
        ...     id: int = Field(primary_key=True)
        ...     name: str = Field(min_length=1)
        >>> validator = UserSchema.to_spark_validator()
        >>> validator.describe_constraints()
        ['name must have at least 1 characters']
    """

    def __init__(self, schema_cls: "type[Schema]") -> None:
        self.schema_cls = schema_cls
        self.fields = schema_cls.fields()
        self._struct_type = schema_cls.to_spark_schema()
        self._constraints = self._build_constraints()
        #: diagnostics from the most recent non-strict validate() call:
        #: list of {"constraint": msg, "count": n, "rows": [Row] | None}
        self.last_violations: list[dict[str, Any]] = []

    # ------------------------------------------------------------------
    # plan build (driver-side, lazy)
    # ------------------------------------------------------------------
    def _build_constraints(self) -> list[tuple[Any, str]]:
        """Field-level constraints + model-level validators, in order.

        Each entry is ``(expression, message)`` where the expression is
        an *uncompiled* DSL node (or a raw Column from a dict-format
        validator) — construction needs no SparkSession; compilation
        happens per validate() call. Constraints are evaluated after
        null handling, so they don't guard nulls explicitly (null
        predicate results are neither violations nor kept rows when
        the constraint filters).
        """
        constraints: list[tuple[Any, str]] = []
        for _name, field in self.fields.items():
            constraints.extend(field.get_spark_constraints())

        for validator in self.schema_cls.model_validators():
            func = validator.__func__ if isinstance(validator, classmethod) else validator
            sig = inspect.signature(func)
            if len(sig.parameters) > 0:
                validator_result = func(self.schema_cls)
            else:
                validator_result = func()
            result = ValidatorResult(validator_result)
            constraints.append(result.get_spark_validator())
        return constraints

    # ------------------------------------------------------------------
    # public pipeline
    # ------------------------------------------------------------------
    def validate(
        self,
        df: DataFrame,
        strict: bool = True,
        show_violations: bool = False,
        fill_nulls: bool = False,
    ) -> DataFrame:
        """Validate and coerce a DataFrame to match the schema.

        Parameters
        ----------
        df : DataFrame
            Input Spark DataFrame.
        strict : bool, default True
            If True, raise on validation errors. If False, filter
            invalid rows.
        show_violations : bool, default False
            If True, log each violation (message, count, sample rows).
        fill_nulls : bool, default False
            If True, replace null values with field defaults (where a
            default exists). Defaults otherwise apply only to columns
            missing from the input entirely.

        Returns
        -------
        DataFrame
            Lazy validated DataFrame with schema-ordered, correctly
            typed columns (extra input columns dropped).

        Raises
        ------
        ValueError
            If validation fails and strict=True.

        Examples
        --------
            >>> from flycatcher_spark import Field, Schema
            >>> class Users(Schema):
            ...     id: int = Field(ge=1)
            ...     name: str = Field(min_length=1)
            >>> df = spark.createDataFrame(
            ...     [(1, "Alice"), (-5, "Bob"), (3, "")], ["id", "name"])
            >>> v = Users.to_spark_validator()
            >>> good = v.validate(df, strict=False)  # filter, don't raise
            >>> sorted(r.id for r in good.collect())
            [1]
            >>> sorted((x["constraint"], x["count"]) for x in v.last_violations)
            [('id must be >= 1', 1), ('name must have at least 1 characters', 1)]
        """
        df = self._coerce(df, fill_nulls=fill_nulls)
        null_checks = self._null_check_fields(fill_nulls)
        usable = self._analyzable_constraints(df)

        # --- single-pass conditional aggregation (one scan) ----------
        ok = self._not_null_condition(null_checks)
        aggs: list[Column] = []
        for name in null_checks:
            aggs.append(
                F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"__null_{name}")
            )
        for i, (expr, _msg) in usable:
            violated = ~expr if ok is None else ok & ~expr
            aggs.append(F.sum(F.when(violated, 1).otherwise(0)).alias(f"__viol_{i}"))

        counts: dict[str, int] = {}
        if aggs:
            counts = self._run_count_job(df, aggs, null_checks, usable, ok)

        # --- V4: null handling ---------------------------------------
        for name in null_checks:
            null_count = counts.get(f"__null_{name}", 0) or 0
            if null_count == 0:
                continue
            if strict:
                raise ValueError(
                    f"Column '{name}' has {null_count} null values "
                    f"but is not nullable"
                )
        if null_checks:
            # Non-strict (and clean strict) path: drop rows with nulls in
            # non-nullable columns. One fused filter for all columns.
            df = df.filter(self._not_null_condition(null_checks))

        # --- V5/V6: constraints --------------------------------------
        self.last_violations = []
        applied: list[Column] = []
        for i, (expr, msg) in usable:
            violation_count = counts.get(f"__viol_{i}", 0) or 0
            if violation_count == 0:
                continue
            if strict:
                sample = df.filter(~expr).limit(5)
                sample_str = self._render_sample(sample)
                raise ValueError(
                    f"Constraint violation: {msg}\n"
                    f"Found {violation_count} violations.\n"
                    f"Sample violations:\n{sample_str}"
                )
            violation = {
                "constraint": msg,
                "count": violation_count,
                "rows": None,
            }
            if show_violations:
                violation["rows"] = df.filter(~expr).limit(10).collect()
            self.last_violations.append(violation)
            applied.append(expr)

        if applied:
            df = df.filter(reduce(lambda a, b: a & b, applied))

        if show_violations:
            for violation in self.last_violations:
                logger.warning("Constraint violation: %s", violation["constraint"])
                logger.warning("Count: %s", violation["count"])
                logger.warning("Rows: %s", violation["rows"])
                logger.warning("-" * 80)
        return df

    def validate_lazy(self, df: DataFrame, fill_nulls: bool = False) -> DataFrame:
        """Zero-job validation: pure transformation, no driver actions.

        The 100 TB fast path. Returns the same kept rows as
        ``validate(strict=False)`` without running any counting jobs:
        rows are kept when every non-nullable column is present and
        every constraint is true-or-null. Because the result is a
        single lazy ``filter``, Catalyst fuses it with downstream
        operators and pushes eligible predicates into the scan.
        Violation diagnostics are not collected — use ``validate()``
        or ``flag_violations()`` when counts are needed.
        """
        df = self._coerce(df, fill_nulls=fill_nulls)
        conditions: list[Column] = []
        nn = self._not_null_condition(self._null_check_fields(fill_nulls))
        if nn is not None:
            conditions.append(nn)
        for _i, (expr, _msg) in self._analyzable_constraints(df):
            # true-or-null keeps the "nulls are not violations" semantic
            conditions.append(expr.isNull() | expr)
        if conditions:
            df = df.filter(reduce(lambda a, b: a & b, conditions))
        return df

    def flag_violations(self, df: DataFrame, fill_nulls: bool = False) -> DataFrame:
        """Annotate instead of filter: adds an ``_violations`` column.

        Each row gets an ``array<string>`` of failed-constraint
        messages (empty array = valid row). No rows are dropped and no
        jobs run — suited to CDC-style routing at scale::

            flagged = validator.flag_violations(df)
            good = flagged.filter(F.size("_violations") == 0)
            quarantine = flagged.filter(F.size("_violations") > 0)
        """
        df = self._coerce(df, fill_nulls=fill_nulls)
        flags: list[Column] = []
        for name in self._null_check_fields(fill_nulls):
            flags.append(
                F.when(
                    F.col(name).isNull(),
                    F.lit(f"{name} must not be null"),
                )
            )
        for _i, (expr, msg) in self._analyzable_constraints(df):
            flags.append(F.when(~expr, F.lit(msg)))
        if not flags:
            return df.withColumn("_violations", F.array().cast("array<string>"))
        return df.withColumn(
            "_violations",
            F.filter(F.array(*flags), lambda x: x.isNotNull()),
        )

    def check_unique(self, df: DataFrame) -> dict[str, int]:
        """Opt-in uniqueness scan for ``unique``/``primary_key`` fields.

        The reference treats unique/primary_key as DDL-only metadata
        and never scans for duplicates (SURVEY.md §1.3); this is the
        documented opt-in extension. One aggregation job computes
        ``count - countDistinct`` per flagged column.
        """
        cols = [
            name
            for name, field in self.fields.items()
            if getattr(field, "unique", False) or getattr(field, "primary_key", False)
        ]
        if not cols:
            return {}
        aggs = [F.count(F.lit(1)).alias("__total")]
        for name in cols:
            aggs.append(F.count(F.col(name)).alias(f"__nonnull_{name}"))
            aggs.append(F.count_distinct(F.col(name)).alias(f"__distinct_{name}"))
        row = df.agg(*aggs).collect()[0].asDict()
        return {
            name: int(row[f"__nonnull_{name}"] - row[f"__distinct_{name}"])
            for name in cols
        }

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------
    @property
    def schema(self) -> T.StructType:
        """The compiled Spark schema (copy)."""
        return T.StructType(list(self._struct_type.fields))

    def describe_constraints(self) -> list[str]:
        """Human-readable list of constraint messages, in order."""
        return [msg for _, msg in self._constraints]

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------
    def _coerce(self, df: DataFrame, fill_nulls: bool) -> DataFrame:
        """Stages V1-V3 (+fill): required-check, defaults, cast-select.

        All lazy; the required-column check inspects only driver-side
        metadata (``df.columns``) and runs no job.
        """
        # V1: fail fast on missing required (no-default) columns.
        required = {
            name for name, field in self.fields.items() if field.default is _MISSING
        }
        missing = required - set(df.columns)
        if missing:
            raise ValueError(f"Missing required columns: {missing}")

        # V2: inject missing defaulted columns.
        for name, field in self.fields.items():
            if name not in df.columns and field.default is not _MISSING:
                dtype = field.get_spark_dtype()
                df = df.withColumn(name, F.lit(field.default).cast(dtype))
                logger.info(
                    "Added column '%s' with default value: %s", name, field.default
                )

        # V3: cast + project + reorder to schema order; lossy casts
        # become null (try_cast — independent of spark.sql.ansi.enabled),
        # extra input columns are dropped.
        df = df.select(
            *[
                F.col(name).try_cast(field.get_spark_dtype()).alias(name)
                for name, field in self.fields.items()
                if name in df.columns
            ]
        )

        # Optional fill: nulls -> default, only where a default exists.
        if fill_nulls:
            fills = {
                name: F.coalesce(
                    F.col(name), F.lit(field.default).cast(field.get_spark_dtype())
                )
                for name, field in self.fields.items()
                if field.default is not _MISSING and name in df.columns
            }
            if fills:
                df = df.withColumns(fills)
        return df

    def _null_check_fields(self, fill_nulls: bool) -> list[str]:
        """Non-nullable fields whose nulls aren't covered by a fill."""
        return [
            name
            for name, field in self.fields.items()
            if not field.nullable
            and not (fill_nulls and field.default is not _MISSING)
        ]

    @staticmethod
    def _not_null_condition(names: list[str]) -> Column | None:
        if not names:
            return None
        return reduce(lambda a, b: a & b, [F.col(n).isNotNull() for n in names])

    def _analyzable_constraints(
        self, df: DataFrame
    ) -> list[tuple[int, tuple[Column, str]]]:
        """Compile constraints; V7: drop ones that fail, with a warning.

        Compiles each DSL node to a Column and checks it resolves
        against the frame. A constraint that cannot be compiled or
        resolved (e.g. references a column outside the schema, or a
        type-invalid operation) is demoted to a warning and skipped,
        mirroring the reference's error-tolerant evaluation
        (polars.py:230-246). Analysis is driver-side only — no job
        runs.
        """
        usable: list[tuple[int, tuple[Column, str]]] = []
        for i, (raw, msg) in enumerate(self._constraints):
            try:
                # isinstance first: Column.__getattr__ would satisfy
                # hasattr(raw, "to_spark") via struct-field access.
                expr = raw if isinstance(raw, Column) else raw.to_spark()
                df.select(expr.cast("boolean"))
            except Exception as e:
                logger.warning("Could not evaluate constraint '%s': %s", msg, e)
                continue
            usable.append((i, (expr, msg)))
        return usable

    def _run_count_job(
        self,
        df: DataFrame,
        aggs: list[Column],
        null_checks: list[str],
        usable: list[tuple[int, tuple[Column, str]]],
        ok: Column | None,
    ) -> dict[str, int]:
        """Execute the merged count aggregation; fall back per-constraint.

        The merged job is the fast path (one scan). If it fails at
        runtime (a constraint whose expression errors on real data),
        fall back to evaluating each aggregate separately so the
        failing constraint alone is skipped with a warning — the
        reference's per-constraint error tolerance, paid only on the
        error path.
        """
        try:
            row = df.agg(*aggs).collect()[0]
            return row.asDict()
        except Exception as merged_err:  # pragma: no cover - error path
            logger.warning(
                "Merged validation aggregate failed (%s); retrying per-constraint",
                merged_err,
            )
        counts: dict[str, int] = {}
        for name in null_checks:
            try:
                c = df.agg(
                    F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
                ).collect()[0][0]
                counts[f"__null_{name}"] = c or 0
            except Exception as e:  # pragma: no cover - error path
                logger.warning("Could not count nulls for '%s': %s", name, e)
        for i, (expr, msg) in usable:
            violated = ~expr if ok is None else ok & ~expr
            try:
                c = df.agg(F.sum(F.when(violated, 1).otherwise(0))).collect()[0][0]
                counts[f"__viol_{i}"] = c or 0
            except Exception as e:
                logger.warning("Could not evaluate constraint '%s': %s", msg, e)
        return counts

    @staticmethod
    def _render_sample(sample: DataFrame) -> str:
        """Render a small sample DataFrame for error messages."""
        rows = sample.collect()
        if not rows:
            return "(no sample rows collected)"
        cols = sample.columns
        header = ", ".join(cols)
        body = "\n".join(
            "(" + ", ".join(repr(row[c]) for c in cols) + ")" for row in rows
        )
        return f"columns: {header}\n{body}"


def create_spark_validator(schema_cls: "type[Schema]") -> SparkValidator:
    """Create a SparkValidator from a Schema class."""
    return SparkValidator(schema_cls)
