"""Pydantic model generator — the row-level validation backend.

Capability parity with the reference
(``/root/reference/src/flycatcher/generators/pydantic.py``): field
constraints map to Pydantic ``Field`` kwargs, nullable fields become
``T | None``, and all cross-field validators run in a single
``@model_validator(mode="after")`` hook. This backend involves no
Spark at all — it's the per-row path for API/forms-style validation —
but ``as_pandas_udf`` exposes it inside Spark as a vectorized
validity-check column for the rare case where row-level logic must
run in the bulk path.
"""

from __future__ import annotations

import inspect
import logging
from typing import TYPE_CHECKING, Any, Union

from pydantic import BaseModel, create_model
from pydantic import Field as PydanticField
from pydantic import model_validator as pydantic_model_validator

from ..fields import _MISSING
from ..validators import ValidatorResult

if TYPE_CHECKING:  # pragma: no cover
    from ..base import Schema

logger = logging.getLogger(__name__)


def create_pydantic_model(schema_cls: "type[Schema]") -> type[BaseModel]:
    """Generate a Pydantic BaseModel from a Schema class."""
    fields = schema_cls.fields()
    pydantic_fields: dict[str, Any] = {}

    for field_name, field in fields.items():
        get_type = getattr(field, "get_pydantic_type", None)
        python_type: Any = (
            get_type() if get_type is not None else field.get_python_type()
        )
        if field.nullable:
            python_type = Union[python_type, None]

        field_kwargs: dict[str, Any] = {}
        if field.description:
            field_kwargs["description"] = field.description
        if field.default is not _MISSING:
            field_kwargs["default"] = field.default

        get_kwargs = getattr(field, "get_pydantic_field_kwargs", None)
        if get_kwargs is not None:
            field_kwargs.update(get_kwargs())

        if field_kwargs:
            pydantic_fields[field_name] = (python_type, PydanticField(**field_kwargs))
        else:
            pydantic_fields[field_name] = (python_type, ...)

    model_name = schema_cls.__name__.removesuffix("Schema") + "Model"
    base_model: type[BaseModel] = create_model(model_name, **pydantic_fields)

    # Compile model validators that have a Python-side implementation.
    validators_to_add = []
    for validator_func in schema_cls.model_validators():
        func = (
            validator_func.__func__
            if isinstance(validator_func, classmethod)
            else validator_func
        )
        sig = inspect.signature(func)
        validator_result = func(schema_cls) if len(sig.parameters) > 0 else func()
        result = ValidatorResult(validator_result)
        if result.has_pydantic_validator():
            validators_to_add.append(result.get_pydantic_validator())

    if validators_to_add:

        class ModelWithValidators(base_model):  # type: ignore[misc, valid-type]
            """Pydantic model with custom cross-field validators."""

            @pydantic_model_validator(mode="after")
            def validate_all(self):
                """Execute all custom model validators after field checks."""
                for validator in validators_to_add:
                    try:
                        validator(self)
                    except Exception as e:
                        logger.warning("Model validator failed: %s", e)
                        raise
                return self

        ModelWithValidators.__name__ = model_name
        return ModelWithValidators

    return base_model


def as_pandas_udf(schema_cls: "type[Schema]"):
    """Expose the row-level model as an Arrow-batched validity UDF.

    Returns a pandas UDF ``struct(cols...) -> boolean`` that
    instantiates the generated Pydantic model per row and yields
    whether it validated. Extension beyond the reference surface:
    lets genuinely row-level logic (the ``{'pydantic': callable}``
    validator format) participate in a Spark pipeline without
    row-at-a-time Python UDF overhead. Still the slow path vs. the
    compiled Column constraints — use only when semantics demand it.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    model = create_pydantic_model(schema_cls)

    # No type hints on the inner function: this module uses
    # ``from __future__ import annotations``, which would leave pandas_udf
    # with unevaluatable string hints; the explicit SCALAR default applies.
    def _validate(batch):
        out = []
        for row in batch.to_dict(orient="records"):
            try:
                model(**row)
                out.append(True)
            except Exception:
                out.append(False)
        return pd.Series(out)

    return pandas_udf(_validate, "boolean")
