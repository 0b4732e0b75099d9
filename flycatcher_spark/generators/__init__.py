"""Output generators: Spark bulk validator, Pydantic row models, DDL."""

from .ddl import create_table_ddl, read, write
from .pydantic import create_pydantic_model
from .spark import SparkValidator, create_spark_validator

__all__ = [
    "SparkValidator",
    "create_pydantic_model",
    "create_spark_validator",
    "create_table_ddl",
    "read",
    "write",
]
