"""Physical-plan inspection: make the scale checklist assertable.

"Did the filter reach the scan?", "does this validate without a
shuffle?", "did the join broadcast?" are the questions that decide
whether a pipeline survives a 100× scale-up — this package turns each
into a function over the executed plan so tests (and users) can gate
on them instead of eyeballing ``explain()`` output.
"""

from .inspect import (
    PlanReport,
    assert_jvm_only,
    assert_no_shuffle,
    assert_pushed_filters,
    plan_report,
)
from .tuning import ensure_min_parallelism, runtime_bloom_pruning, session_confs

__all__ = [
    "PlanReport",
    "plan_report",
    "assert_no_shuffle",
    "assert_pushed_filters",
    "assert_jvm_only",
    "ensure_min_parallelism",
    "runtime_bloom_pruning",
    "session_confs",
]
