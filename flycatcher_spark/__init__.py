"""flycatcher_spark — PySpark-native schema validation + data-pipeline engine.

Define your schema once; validate at cluster scale. The declarative
``Schema`` compiles to:

- a **Spark bulk validator** (``to_spark_validator()``) whose
  validation pipeline runs as a single conditional-aggregation scan
  under Catalyst/Tungsten;
- a **Pydantic model** (``to_pydantic()``) for row-level validation;
- **Spark SQL DDL** (``to_ddl()``) and schema-enforced readers/writers.

Beyond validation, ``flycatcher_spark.operators`` adds the operators a
large-scale training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search, text analysis, and multimodal-column plumbing. Supporting
packages: ``functions`` (column helpers + SQL registration +
chunking), ``sources`` (schema-enforced readers, synthetic batch and
streaming data sources), ``plans`` (physical-plan inspection and
scale assertions), ``streaming`` (watermarked and stateful pipelines).

Capability surface modeled on the reference library mrmcmullan/flycatcher
(see SURVEY.md); architecture is Spark-first, not a port.
"""

from .base import Schema, SchemaMeta, model_validator
from .fields import (
    Boolean,
    Date,
    Datetime,
    Field,
    FieldBase,
    FieldInfo,
    Float,
    Integer,
    String,
)
from .validators import FieldRef, col

# API-parity constant: mirrors the reference library's published
# version (reference pyproject.toml: version = "0.2.0") so callers
# that feature-gate on the reference's version string keep working.
# The DISTRIBUTION version lives in this repo's pyproject.toml and is
# monotonic (0.3.1 as of r11) — see the note there (ADVICE r10).
__version__ = "0.2.0"

__all__ = [
    "Boolean",
    "Date",
    "Datetime",
    "Field",
    "FieldBase",
    "FieldInfo",
    "FieldRef",
    "Float",
    "Integer",
    "Schema",
    "SchemaMeta",
    "String",
    "col",
    "model_validator",
]
