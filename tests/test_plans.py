"""Physical-plan regression tests: the scale-critical plan shapes
(pushdown, pruning, broadcast, partial agg, no Python in hot paths)
asserted per query — the same expectations as tools/explain_audit.py,
enforced continuously."""

from __future__ import annotations

import pytest

from updatable_persistent_map_reduce_spark.operators import all_queries

from tools.explain_audit import EXPECTATIONS, marker_hit


def test_cluster_edges_are_bucket_joined(spark, sf_dir):
    """q_dedup_cluster's candidate edges must come from the LSH bucket
    equi-join — never an all-pairs va<vb cross product (round-2
    weak-at-scale finding)."""
    from updatable_persistent_map_reduce_spark.operators.dedup import (
        lsh_candidate_edges,
    )
    from updatable_persistent_map_reduce_spark.sources import Catalog

    e = Catalog(spark, sf_dir).embeddings
    df = lsh_candidate_edges(spark, e)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    for forbidden in ("CartesianProduct", "BroadcastNestedLoop"):
        assert forbidden not in plan, plan


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(name, spark, sf_dir):
    want, avoid = EXPECTATIONS[name]
    df = all_queries()[name].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    missing = [m for m in want if not marker_hit(m, plan)]
    present = [m for m in avoid if marker_hit(m, plan)]
    assert not missing and not present, (
        f"{name}: missing={missing} forbidden={present}\n{plan}"
    )


def test_every_query_has_a_plan_expectation():
    """The audit's ALL-queries claim may not drift: every registered
    query carries a physical-plan expectation."""
    missing = [n for n in all_queries() if n not in EXPECTATIONS]
    assert not missing, missing
