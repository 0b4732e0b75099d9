"""Shared fixtures: one local SparkSession + the reference's fixture schemas.

Fixture shapes mirror the reference test suite
(``/root/reference/tests/conftest.py``; catalogued in FIXTURES.md) so
behavioral parity is asserted against the same inputs.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pytest

# Python workers deserialize custom DataSource classes by module
# reference; make the repo importable there no matter where pytest is
# invoked from (must happen before the JVM starts).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from flycatcher_spark import Field, Schema
from flycatcher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # default_parallelism=8: test frames are tiny local collections;
    # at local[32] they otherwise parallelize into 32 partitions and
    # every action pays 32 python-worker tasks of scheduler overhead
    # (measured ~4x on per-action cost; values are partitioning-
    # independent by the engine's determinism discipline)
    session = get_spark(
        app_name="flycatcher_spark_tests",
        shuffle_partitions=4,
        default_parallelism=8,
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


# --- FIXTURES.md F1: simple ------------------------------------------
class SimpleSchema(Schema):
    id: int = Field(primary_key=True)
    name: str
    age: int | None = None


# --- FIXTURES.md F2: constrained -------------------------------------
class ConstrainedSchema(Schema):
    id: int = Field(ge=1)
    name: str = Field(min_length=1, max_length=100)
    age: int = Field(ge=0, le=120)
    price: float = Field(gt=0.0)
    email: str = Field(pattern=r"^[^@]+@[^@]+\.[^@]+$")
    is_active: bool = True
    created_at: datetime


# --- FIXTURES.md F4: defaults ----------------------------------------
class DefaultsSchema(Schema):
    id: int
    name: str = "unknown"
    count: int = 0
    is_active: bool = True
    created_at: datetime = datetime(2024, 1, 1)


@pytest.fixture
def valid_df(spark):
    return spark.createDataFrame(
        [(1, "Alice", 25), (2, "Bob", 30), (3, "Charlie", 35)],
        ["id", "name", "age"],
    )


@pytest.fixture
def constrained_valid_df(spark):
    ts = datetime(2024, 6, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (1, "Alice", 25, 9.99, "alice@example.com", True, ts),
            (2, "Bob", 30, 19.99, "bob@example.com", False, ts),
        ],
        ["id", "name", "age", "price", "email", "is_active", "created_at"],
    )


@pytest.fixture
def constrained_invalid_df(spark):
    """One violation per row: id=-1, name='', age=150."""
    ts = datetime(2024, 6, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (-1, "Alice", 25, 9.99, "alice@example.com", True, ts),
            (2, "", 30, 19.99, "bob@example.com", False, ts),
            (3, "Carol", 150, 5.0, "carol@example.com", True, ts),
            (4, "Dave", 40, 1.0, "dave@example.com", True, ts),
        ],
        ["id", "name", "age", "price", "email", "is_active", "created_at"],
    )
