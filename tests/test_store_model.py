"""Model-based property test: ManifestTable.merge + changes against a
plain-dict model. Random merge sequences (update / insert / delete
mixes) must keep the table equal to the model after every commit, and
the change feed between ANY two consecutive versions must equal the
model's diff — the same hypothesis strategy tests/test_view.py applies
to the view's incremental≡full invariant, here for the row-level
table-format surface (merge, CDC, snapshot isolation)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from updatable_persistent_map_reduce_spark.plans.store import ManifestTable

N_SPANS = 4

# one merge = a small batch of ops keyed 1..12: ("put", k, v) upserts
# (update if k exists, insert otherwise), ("del", k) deletes if matched
op = st.one_of(
    st.tuples(st.just("put"), st.integers(1, 12), st.integers(-50, 50)),
    st.tuples(st.just("del"), st.integers(1, 12)),
)
merges = st.lists(
    st.lists(op, min_size=1, max_size=8),
    min_size=1,
    max_size=4,
)


def table_rows(t: ManifestTable, spark) -> dict[int, int]:
    df = t.read(spark)
    if df is None:
        return {}
    return {r["k"]: r["v"] for r in df.collect()}


def test_merge_and_cdc_match_model(spark):
    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=list(HealthCheck),
    )
    @given(merges)
    def run(seq):
        base = tempfile.mkdtemp(prefix="upmr_model_")
        t = ManifestTable(base + "/t", "span")
        # seed so the schema exists before delete_where merges
        t.commit(
            replace=t.write_data(
                spark.createDataFrame(
                    [(0, 0, 0)], "span int, k int, v int"
                )
            )
        )
        model: dict[int, int] = {0: 0}
        versions: list[tuple[int, dict[int, int]]] = [
            (t.version, dict(model))
        ]
        for batch in seq:
            # last op per key wins inside a batch (merge requires
            # key-unique sources, like every engine batch)
            per_key: dict[int, tuple] = {}
            for o in batch:
                per_key[o[1]] = o
            rows = []
            for k, o in sorted(per_key.items()):
                if o[0] == "put":
                    rows.append((k % N_SPANS, k, o[2], False))
                else:
                    rows.append((k % N_SPANS, k, 0, True))
            src = spark.createDataFrame(
                rows, "span int, k int, v int, dead boolean"
            )
            t.merge(src, on=["k"], delete_where="dead")
            for k, o in per_key.items():
                if o[0] == "put":
                    model[k] = o[2]
                else:
                    model.pop(k, None)
            assert table_rows(t, spark) == model
            versions.append((t.version, dict(model)))
        # CDC between every consecutive snapshot equals the model diff
        for (v_from, m_from), (v_to, m_to) in zip(versions, versions[1:]):
            feed = t.changes(spark, v_from, v_to).collect()
            got_ins = {
                (r["k"], r["v"])
                for r in feed
                if r["_change_type"] == "insert"
            }
            got_del = {
                (r["k"], r["v"])
                for r in feed
                if r["_change_type"] == "delete"
            }
            want_ins = {
                (k, v)
                for k, v in m_to.items()
                if m_from.get(k) != v
            }
            want_del = {
                (k, v)
                for k, v in m_from.items()
                if m_to.get(k) != v
            }
            assert got_ins == want_ins, (v_from, v_to)
            assert got_del == want_del, (v_from, v_to)
        # time travel: every archived snapshot still reads as its model
        for ver, m in versions:
            got = {
                r["k"]: r["v"]
                for r in (t.read(spark, version=ver) or spark.createDataFrame([], "k int, v int")).collect()
            }
            assert got == m, ver

    run()
