"""Operational guards: contracts that protect driver/cluster health.

- crosstab cardinality guard: df.stat.crosstab materializes the full
  cell grid driver-side; the guard enforces the small-x-small contract
  instead of documenting it.
- hermetic bucketed warehouse: q_join_bucketed's bucketed tables live
  in a per-process/per-session database under a temp dir, so two
  concurrent sessions can't clobber each other's files mid-read
  (observed as FILE_NOT_EXIST under judge-parallel runs in round 5).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from updatable_persistent_map_reduce_spark.operators.relational import (
    _crosstab_guarded,
    _ensure_bucketed_tables,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crosstab_guard_allows_small_pairs(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = _crosstab_guarded(ev, "n_regionkey", "n_nationkey", max_cells=10_000)
    assert out.count() == 5  # one row per region


def test_crosstab_guard_raises_toward_pivot(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError, match="pivot"):
        _crosstab_guarded(o, "o_orderkey", "o_custkey", max_cells=10_000)


def test_bucketed_db_is_per_session(spark, sf_dir):
    db = _ensure_bucketed_tables(spark, sf_dir)
    assert str(os.getpid()) in db
    # idempotent within the session: same db, no rebuild
    assert _ensure_bucketed_tables(spark, sf_dir) == db
    # the managed tables live under the db's own (temp) location, not
    # the shared ./spark-warehouse
    loc = (
        spark.sql(f"DESCRIBE DATABASE {db}")
        .filter("info_name = 'Location'")
        .first()["info_value"]
    )
    assert "spark-warehouse" not in loc


def test_bucketed_db_is_per_scale_factor(spark, sf_dir):
    """Two scale factors in ONE session must get distinct databases:
    a db name without the sf token made the second sf's write clobber
    the first's tables while the cache kept serving the stale name —
    q_join_bucketed(sf A) after a run at sf B then silently returned
    sf B's rows."""
    other = "/root/testdata/sf0.01" if "0.001" in sf_dir else "/root/testdata/sf0.001"
    db_a = _ensure_bucketed_tables(spark, sf_dir)
    n_a = spark.table(f"{db_a}.orders_b").count()
    db_b = _ensure_bucketed_tables(spark, other)
    assert db_b != db_a
    # the first sf's tables are intact after the second sf's build
    assert spark.table(f"{db_a}.orders_b").count() == n_a
    assert spark.table(f"{db_b}.orders_b").count() != n_a


def test_bucketed_join_survives_concurrent_session(spark, sf_dir):
    """A second JVM running q_join_bucketed concurrently must not break
    this session's run (the round-5 failure mode: both sessions rewrote
    the same fixed warehouse path)."""
    from updatable_persistent_map_reduce_spark.operators import all_queries

    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, %r); "
                "from updatable_persistent_map_reduce_spark.operators import all_queries; "
                "from updatable_persistent_map_reduce_spark.session import get_spark; "
                "s = get_spark('upmr-concurrent-probe'); "
                "n = all_queries()['q_join_bucketed'].fn(s, %r).count(); "
                "assert n > 0, n; print('CHILD_OK', n)"
            )
            % (REPO, sf_dir),
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # run ours while the child is (building and) running its own
        n = all_queries()["q_join_bucketed"].fn(spark, sf_dir).count()
        assert n > 0
    finally:
        # kill a hung child JVM instead of letting TimeoutExpired mask
        # the primary assertion (and orphan the process)
        try:
            out, _ = child.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            child.kill()
            out, _ = child.communicate()
    assert child.returncode == 0 and "CHILD_OK" in out, out[-2000:]
