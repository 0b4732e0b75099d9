"""Property-based Spark-vs-Python differential tests.

Generalizes the reference's hand-picked dual-backend consistency
tests (/root/reference/tests/test_validators.py:177-231) with
hypothesis-generated data: every expression is evaluated through
``to_spark()`` on a DataFrame and through ``to_python()`` per row,
and results must agree elementwise (incl. nulls and NaN).

One Spark job evaluates ALL expressions over one generated frame per
example, keeping runtime sane. Documented backend divergences
(SURVEY.md §7.4 item 4: Python-side short-circuit &/|, null→False
string predicates, len_chars null→0) are normalized the same way the
reference's own tests do — by generating non-null data for those ops.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flycatcher_spark import col

# expression battery: (name, expr, needs) where needs marks columns
# that must be non-null for backend parity (documented divergences)
EXPRS = [
    ("cmp_gt", (col("i") > 3), None),
    ("cmp_le_f", (col("f") <= 0.5), None),
    ("arith", ((col("i") + 2) * 3 - 1) / 2, None),
    ("modulo", col("i") % 5 == 0, None),
    ("neg", ~(col("b")), "b"),  # python `not None`=True vs Kleene null
    ("and_or", (col("b") & (col("i") > 0)) | (col("f") < 0), "b"),
    ("is_null", col("s").is_null(), None),
    ("abs", (col("f") - 0.25).abs(), None),
    ("round2", col("f").round(2), None),
    ("floor", col("f").floor(), None),
    ("ceil", col("f").ceil(), None),
    ("sqrt", col("f").abs().sqrt(), None),
    ("pow2", col("f").pow(2), None),
    ("str_len", col("s").str.len_chars(), "s"),
    ("str_lower", col("s").str.to_lowercase(), None),
    ("str_strip", col("s").str.strip_chars(), None),
    ("str_contains", col("s").str.contains("a"), "s"),
    ("str_starts", col("s").str.starts_with("ab"), "s"),
    ("str_slice", col("s").str.slice(1, 3), None),
    ("str_replace", col("s").str.replace("[ab]", "_"), None),
    ("member_in", col("i").is_in([1, 2, 3]), None),
    ("between_lr", col("f").is_between(0.1, 0.9, closed="left"), None),
]

row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    st.one_of(
        st.none(),
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    st.one_of(st.none(), st.text(alphabet="abcXYZ 01_", max_size=12)),
    st.one_of(st.none(), st.booleans()),
)


def _eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
        return a == pytest.approx(b, rel=1e-9, abs=1e-12)
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    return a == b


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_spark_matches_python(spark_global, rows):
    spark = spark_global
    df = spark.createDataFrame(
        rows, "i long, f double, s string, b boolean"
    )
    cols = [e.to_spark().alias(name) for name, e, _needs in EXPRS]
    got = df.select(*cols).collect()

    for row_in, row_out in zip(rows, got):
        values = dict(zip(["i", "f", "s", "b"], row_in))
        for name, e, needs in EXPRS:
            if needs is not None and values.get(needs) is None:
                continue  # documented backend divergence on nulls
            try:
                expected = e.to_python(values)
            except TypeError:
                # python backend raises on None operands for some ops
                # where Spark null-propagates; skip those cells
                if any(v is None for v in values.values()):
                    continue
                raise
            actual = row_out[name]
            assert _eq(actual, expected), (
                f"{name}: spark={actual!r} python={expected!r} on {values!r}"
            )


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# -- container nodes (.arr / .map): same differential property --------
CONTAINER_EXPRS = [
    ("arr_len", col("xs").arr.len()),
    ("arr_min", col("xs").arr.min()),
    ("arr_max", col("xs").arr.max()),
    ("arr_len_cmp", col("xs").arr.len() >= 2),
    ("map_len", col("m").map.len()),
    ("map_has", col("m").map.has_key("k")),
    ("map_min", col("m").map.min()),
    ("map_max", col("m").map.max()),
]

container_row = st.tuples(
    st.one_of(
        st.none(),
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-50,
                    max_value=50,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            max_size=6,
        ),
    ),
    st.one_of(
        st.none(),
        st.dictionaries(
            st.sampled_from(["k", "j", "x", "longer_key"]),
            st.one_of(st.none(), st.integers(min_value=-99, max_value=99)),
            max_size=4,
        ),
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(container_row, min_size=1, max_size=20))
def test_container_nodes_spark_matches_python(spark_global, rows):
    spark = spark_global
    df = spark.createDataFrame(
        rows, "xs array<double>, m map<string,bigint>"
    )
    cols = [e.to_spark().alias(name) for name, e in CONTAINER_EXPRS]
    got = df.select(*cols).collect()
    for row_in, row_out in zip(rows, got):
        values = dict(zip(["xs", "m"], row_in))
        for name, e in CONTAINER_EXPRS:
            try:
                expected = e.to_python(values)
            except TypeError:
                # python backend raises on None operands where Spark
                # null-propagates (same policy as the scalar battery)
                if any(v is None for v in values.values()):
                    continue
                raise
            actual = row_out[name]
            assert _eq(actual, expected), (
                f"{name}: spark={actual!r} python={expected!r} on {values!r}"
            )
