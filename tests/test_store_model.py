"""Model-based property test: ManifestTable.merge + changes against a
plain-dict model. Random merge sequences (update / insert / delete
mixes) must keep the table equal to the model after every commit, and
the change feed between ANY two consecutive versions must equal the
model's diff — the same hypothesis strategy tests/test_view.py applies
to the view's incremental≡full invariant, here for the row-level
table-format surface (merge, CDC, snapshot isolation)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, example, given, settings
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
# a step is a merge batch, a merge-on-read tombstone delete of some
# keys, a compaction (which must materialize tombstones and change no
# answers), or a RACED merge: a rival writer's MoR delete lands between
# the merge's base-snapshot read and its commit — the merge must lose,
# rebase via retry_commit, and re-land on top of the rival (both
# effects visible, model order: rival first, then the batch)
step = st.one_of(
    st.lists(op, min_size=1, max_size=8),
    st.tuples(st.just("mor"), st.lists(st.integers(1, 12), min_size=1, max_size=4)),
    st.just("compact"),
    st.tuples(
        st.just("race"),
        st.lists(op, min_size=1, max_size=4),
        st.lists(st.integers(1, 12), min_size=1, max_size=3),
    ),
    # append via append_materializing — THE append path for a table
    # that also takes MoR deletes: keys currently live are dropped at
    # run time (append is not latest-wins; re-appending a live key
    # would duplicate it), so the interesting draws are brand-new keys
    # and RE-APPENDS OF DELETED keys, which must materialize exactly
    # the intersecting tombstoned spans (the r12 narrowed rule 2)
    st.tuples(
        st.just("app"),
        st.lists(
            st.tuples(st.integers(1, 12), st.integers(51, 99)),
            min_size=1,
            max_size=4,
        ),
    ),
)
merges = st.lists(step, min_size=1, max_size=5)


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
    # guaranteed raced-merge coverage regardless of what the 5
    # derandomized draws generate: put 2 keys, then a merge raced by a
    # rival MoR delete (one raced key overlaps the batch, one doesn't),
    # then compact to materialize the survivor's tombstone
    @example(
        seq=[
            [("put", 2, 3), ("put", 5, 7)],
            ("race", [("put", 5, 9), ("del", 2)], [5, 11]),
            "compact",
        ]
    )
    # guaranteed append_materializing coverage: delete keys in two
    # different spans, then re-append one of them plus a brand-new key
    # — the intersecting span materializes, the other span's tombstone
    # must survive the append (r12 narrowed rule 2) until the compact
    @example(
        seq=[
            [("put", 2, 3), ("put", 5, 7)],
            ("mor", [2, 5]),
            ("app", [(5, 60), (9, 61)]),
            "compact",
        ]
    )
    def run(seq):
        base = tempfile.mkdtemp(prefix="upmr_model_")
        try:
            _run_example(seq, base)
        finally:
            import shutil

            shutil.rmtree(base, ignore_errors=True)

    def _run_example(seq, base):
        t = ManifestTable(base + "/t", "span")
        # seed so the schema exists before delete_where merges
        t.commit(
            replace=t.write_data(
                spark.createDataFrame(
                    [(0, 0, 0)], "span int, k int, v int"
                )
            )
        )
        # two model layers: `physical` = rows in data files (what CDC
        # diffs), `tombs` = MoR-deleted keys; the LIVE view every read
        # must return is physical minus tombs
        physical: dict[int, int] = {0: 0}
        tombs: set[int] = set()

        def live() -> dict[int, int]:
            return {k: v for k, v in physical.items() if k not in tombs}

        versions: list[tuple[int, dict[int, int], dict[int, int]]] = [
            (t.version, dict(physical), live())
        ]
        for stp in seq:
            if stp == "compact":
                physical = live()
                tombs = set()
                t.compact(spark, min_files=2)
            elif isinstance(stp, tuple) and stp[0] == "app":
                cur_live = live()
                per_key = {}
                for k, v in stp[1]:
                    if k not in cur_live:
                        per_key[k] = v
                if not per_key:
                    continue  # nothing appendable: no state change
                mapping = t.write_data(
                    spark.createDataFrame(
                        [
                            (k % N_SPANS, k, v)
                            for k, v in sorted(per_key.items())
                        ],
                        "span int, k int, v int",
                    )
                )
                t.append_materializing(
                    spark,
                    mapping,
                    keys=spark.createDataFrame(
                        [(k,) for k in sorted(per_key)], "k int"
                    ),
                )
                # model: rule 1 — appended spans with pending
                # tombstones materialize; rule 2 — spans whose
                # tombstone keys intersect the batch keys materialize
                # (and ONLY those: the narrowed r12 contract)
                tomb_spans = {tk % N_SPANS for tk in tombs}
                fix = ({k % N_SPANS for k in per_key} & tomb_spans) | {
                    tk % N_SPANS for tk in tombs if tk in per_key
                }
                if fix:
                    physical = {
                        k: v
                        for k, v in physical.items()
                        if not (k % N_SPANS in fix and k in tombs)
                    }
                    tombs = {tk for tk in tombs if tk % N_SPANS not in fix}
                physical.update(per_key)
                # every materialized span's tombstones are gone (the
                # exact survive-vs-materialize split is pinned by
                # test_store.py's narrowing unit test; the model's
                # `tombs` may include keys delete_keys skipped as
                # no-ops, so only the subset direction is assertable)
                assert not (set(t.tombstoned_spans()) & fix)
            elif isinstance(stp, tuple) and stp[0] == "mor":
                keys = sorted(set(stp[1]))
                t.delete_keys(
                    spark.createDataFrame(
                        [(k % N_SPANS, k) for k in keys], "span int, k int"
                    ),
                    on=["k"],
                )
                tombs |= set(keys)
            else:
                raced_keys: list[int] | None = None
                if isinstance(stp, tuple) and stp[0] == "race":
                    _, batch, raced_keys = stp
                    raced_keys = sorted(set(raced_keys))
                else:
                    batch = stp
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
                if raced_keys is None:
                    t.merge(src, on=["k"], delete_where="dead")
                else:
                    # rival MoR delete fires after the merge pinned its
                    # base snapshot (inside write_data) and before its
                    # commit: the merge MUST lose once, rebase, re-land
                    from updatable_persistent_map_reduce_spark.plans.store import (
                        retry_commit,
                    )

                    real_write = t.write_data
                    fired = [False]

                    def write_and_race(df, _rw=real_write, _f=fired, **kw):
                        mapping = _rw(df, **kw)
                        if not _f[0]:
                            _f[0] = True
                            rival = ManifestTable(t.path, "span")
                            rival.delete_keys(
                                spark.createDataFrame(
                                    [(k % N_SPANS, k) for k in raced_keys],
                                    "span int, k int",
                                ),
                                on=["k"],
                            )
                        return mapping

                    t.write_data = write_and_race
                    try:
                        retry_commit(
                            lambda: t.merge(src, on=["k"], delete_where="dead")
                        )
                    finally:
                        t.write_data = real_write
                    assert fired[0]
                    # model: the rival landed FIRST (the merge rebased
                    # on top of it)
                    tombs |= set(raced_keys)
                # merge operates on the LIVE view and rewrites the
                # touched spans with it: those spans' physical content
                # becomes the merged live rows, their tombstones clear
                touched = {k % N_SPANS for k in per_key}
                new_live = live()
                for k, o in per_key.items():
                    if o[0] == "put":
                        new_live[k] = o[2]
                    else:
                        new_live.pop(k, None)
                physical = {
                    k: v
                    for k, v in physical.items()
                    if k % N_SPANS not in touched
                }
                physical.update(
                    {
                        k: v
                        for k, v in new_live.items()
                        if k % N_SPANS in touched
                    }
                )
                tombs = {k for k in tombs if k % N_SPANS not in touched}
            assert table_rows(t, spark) == live()
            versions.append((t.version, dict(physical), live()))
        # CDC between consecutive snapshots equals the PHYSICAL diff
        # (tombstone commits feed nothing until materialized — the
        # deferred-visibility contract)
        for (v_from, p_from, _), (v_to, p_to, _) in zip(
            versions, versions[1:]
        ):
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
                (k, v) for k, v in p_to.items() if p_from.get(k) != v
            }
            want_del = {
                (k, v) for k, v in p_from.items() if p_to.get(k) != v
            }
            assert got_ins == want_ins, (v_from, v_to)
            assert got_del == want_del, (v_from, v_to)
        # time travel: every archived snapshot reads as ITS live view
        # (each version's own tombstones apply)
        for ver, _, lv in versions:
            df = t.read(spark, version=ver)
            got = (
                {r["k"]: r["v"] for r in df.collect()}
                if df is not None
                else {}
            )
            assert got == lv, ver

    run()
