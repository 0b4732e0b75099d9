"""Data sources: schema-enforced readers plus custom Python data sources.

The schema-on-read helpers (``read``/``write``/``write_bucketed``/
``write_jdbc``) live in :mod:`flycatcher_spark.generators.ddl` and are
re-exported here; this package adds sources built on Spark 4's Python
DataSource API (``pyspark.sql.datasource``):

- :class:`SyntheticDocumentsDataSource` — a deterministic, partitioned,
  Arrow-batch-producing batch source for documents, with doc_id range
  filter pushdown. Feeds the dedup/similarity/text operators with
  arbitrarily large reproducible corpora without pre-materializing
  parquet.
- :class:`SyntheticEventsStreamSource` — a deterministic micro-batch
  streaming source for events, for driving the streaming operators.

Register both with :func:`register` before use::

    from flycatcher_spark import sources
    sources.register(spark)
    docs = spark.read.format("flycatcher_docs").option("rows", 10_000).load()
"""

from ..generators.ddl import read, write, write_bucketed, write_jdbc
from .synthetic import (
    SyntheticDocumentsDataSource,
    SyntheticEventsStreamSource,
    register,
)

__all__ = [
    "read",
    "write",
    "write_bucketed",
    "write_jdbc",
    "SyntheticDocumentsDataSource",
    "SyntheticEventsStreamSource",
    "register",
]
