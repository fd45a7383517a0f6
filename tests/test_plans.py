"""Physical-plan regression tests: the scale-critical plan shapes
(pushdown, pruning, broadcast, partial agg, no Python in hot paths)
asserted per query — the same expectations as tools/explain_audit.py,
enforced continuously."""

from __future__ import annotations

import pytest

from updatable_persistent_map_reduce_spark.operators import all_queries

from tools.explain_audit import EXPECTATIONS


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(name, spark, sf_dir):
    want, avoid = EXPECTATIONS[name]
    df = all_queries()[name].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    missing = [m for m in want if m not in plan]
    present = [m for m in avoid if m in plan]
    assert not missing and not present, (
        f"{name}: missing={missing} forbidden={present}\n{plan}"
    )
