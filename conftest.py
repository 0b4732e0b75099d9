"""Root conftest: doctest namespace for executable docstring examples.

``pyproject.toml`` runs ``--doctest-modules`` over the package
(matching the reference CI, /root/reference/pyproject.toml). Library
docstrings show real DataFrame usage, so every doctest gets a shared
``spark`` handle (plus ``F``) injected into its namespace. The handle
is a lazy proxy — the JVM starts only when a Spark-using doctest
actually touches it, so pure-DSL doctests and collection stay cheap.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


class _LazySpark:
    """Attribute proxy that creates (or reuses) the shared local
    SparkSession on first real use. ``get_spark`` is getOrCreate-based,
    so doctests and the pytest ``spark`` fixture share one JVM."""

    def __getattr__(self, name):
        from flycatcher_spark.session import get_spark

        # default_parallelism=8: same rationale as the pytest spark
        # fixture — doctest frames are tiny local collections and
        # 32-way parallelize is pure per-action scheduler overhead
        session = get_spark(
            app_name="flycatcher_spark_doctests",
            shuffle_partitions=4,
            default_parallelism=8,
        )
        session.sparkContext.setLogLevel("ERROR")
        return getattr(session, name)


@pytest.fixture(autouse=True)
def _doctest_ns(doctest_namespace):
    from pyspark.sql import functions as F

    doctest_namespace["spark"] = _LazySpark()
    doctest_namespace["F"] = F
