"""JoinView (plans/join_view.py) — the delta-join maintenance
contracts the q_join_view_incremental oracle can't see from the final
state alone: interleaving-equivalence against a from-scratch rebuild,
span-pruned delta economics, unmatched-fact revival on late dim
arrival, and the journaled kill matrix: a crash at any stage of the
commit chain reopens as batch-applied or batch-not-applied, healed
at O(dirty spans).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.plans.join_view import JoinView


def _mk(spark, path, n_spans=4):
    return JoinView(
        spark,
        path,
        fact_id="okey",
        join_col="ckey",
        dim_id="ckey",
        group_cols=["segment"],
        agg_exprs=[
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ],
        rereduce_exprs=[
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sv").cast("bigint").alias("sv"),
        ],
        n_spans=n_spans,
    )


def _facts_df(spark, rows):
    return spark.createDataFrame(rows, "okey bigint, ckey bigint, v bigint")


def _dims_df(spark, rows):
    return spark.createDataFrame(rows, "ckey bigint, segment string")


def _final(jv):
    return {
        r["segment"]: (r["n"], r["sv"]) for r in jv.final_df().collect()
    }


def _expected(facts, dims):
    """Driver-side recompute of the inner-join aggregate from the
    latest-wins state dicts."""
    out: dict[str, list[int]] = {}
    for okey, (ckey, v) in facts.items():
        if ckey in dims:
            seg = dims[ckey]
            cur = out.setdefault(seg, [0, 0])
            cur[0] += 1
            cur[1] += v
    return {k: (a, b) for k, (a, b) in out.items()}


def test_joinview_random_interleaving_equals_model(spark, tmp_path):
    """Property: ANY interleaving of fact upserts / dim upserts / fact
    deletes leaves final_df() equal to the model computed from the
    latest-wins state — including join-key migration and dim
    re-attribution mid-stream."""
    rng = random.Random(12012)
    jv = _mk(spark, str(tmp_path / "jv"))
    facts: dict[int, tuple[int, int]] = {}
    dims: dict[int, str] = {}
    segs = ["a", "b", "c"]
    for step in range(12):
        op = rng.choice(["facts", "facts", "dims", "delete"])
        if op == "facts":
            batch = {
                rng.randrange(30): (rng.randrange(8), rng.randrange(100))
                for _ in range(rng.randrange(1, 6))
            }
            facts.update(batch)
            jv.upsert_facts(
                _facts_df(
                    spark, [(k, c, v) for k, (c, v) in batch.items()]
                )
            )
        elif op == "dims":
            batch = {
                rng.randrange(8): rng.choice(segs)
                for _ in range(rng.randrange(1, 4))
            }
            dims.update(batch)
            jv.upsert_dims(
                _dims_df(spark, [(k, s) for k, s in batch.items()])
            )
        else:
            victims = [k for k in list(facts) if rng.random() < 0.3]
            for k in victims:
                facts.pop(k)
            if victims:
                jv.delete_facts(
                    spark.createDataFrame(
                        [(k,) for k in victims], "okey bigint"
                    )
                )
        assert _final(jv) == _expected(facts, dims), f"diverged at step {step}"


def test_joinview_dim_update_retro_propagates(spark, tmp_path):
    jv = _mk(spark, str(tmp_path / "jv"))
    jv.upsert_dims(_dims_df(spark, [(1, "old"), (2, "x")]))
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5), (11, 1, 7), (12, 2, 1)]))
    assert _final(jv) == {"old": (2, 12), "x": (1, 1)}
    # re-attribute customer 1: BOTH its already-joined facts must move
    jv.upsert_dims(_dims_df(spark, [(1, "new")]))
    assert _final(jv) == {"new": (2, 12), "x": (1, 1)}


def test_joinview_late_dim_revives_unmatched_facts(spark, tmp_path):
    jv = _mk(spark, str(tmp_path / "jv"))
    jv.upsert_facts(_facts_df(spark, [(10, 9, 5)]))  # no dim 9 yet
    assert _final(jv) == {}
    jv.upsert_dims(_dims_df(spark, [(9, "late")]))
    assert _final(jv) == {"late": (1, 5)}


def test_joinview_fact_migration_retracts_old_span(spark, tmp_path):
    jv = _mk(spark, str(tmp_path / "jv"), n_spans=8)
    jv.upsert_dims(_dims_df(spark, [(1, "a"), (2, "b")]))
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5)]))
    assert _final(jv) == {"a": (1, 5)}
    # the same fact id re-lands under a DIFFERENT join key: the old
    # partner's span must retract it, the new partner's span gain it
    res = jv.upsert_facts(_facts_df(spark, [(10, 2, 5)]))
    assert _final(jv) == {"b": (1, 5)}
    # the delta report names the vacated span when the keys hash apart
    old_span = [
        r[0]
        for r in _facts_df(spark, [(10, 1, 5)])
        .select(F.pmod(F.xxhash64("ckey"), F.lit(8)).cast("int"))
        .collect()
    ][0]
    new_span = [
        r[0]
        for r in _facts_df(spark, [(10, 2, 5)])
        .select(F.pmod(F.xxhash64("ckey"), F.lit(8)).cast("int"))
        .collect()
    ][0]
    if old_span != new_span:
        assert res["migrated_from"] == [old_span]


def test_joinview_delta_touches_only_dirty_spans(spark, tmp_path):
    """The economics pin: after a bulk load, a single-fact upsert's
    partials commit records touched spans ⊆ {old span, new span} —
    the manifest's own conflict-class bookkeeping is the witness."""
    jv = _mk(spark, str(tmp_path / "jv"), n_spans=8)
    jv.upsert_dims(_dims_df(spark, [(c, "s%d" % (c % 3)) for c in range(8)]))
    jv.upsert_facts(
        _facts_df(spark, [(k, k % 8, k) for k in range(64)])
    )
    res = jv.upsert_facts(_facts_df(spark, [(3, 5, 99)]))
    # fact 3 moved from ckey 3's span to ckey 5's span
    assert 1 <= len(res["dirty_spans"]) <= 2
    last = jv._part_t._load()  # current manifest records its commit's
    assert last["touched"] != "*"  # conflict class: the touched spans
    assert set(last["touched"]) <= set(res["dirty_spans"])
    # and the answer is still exact
    expected = _expected(
        {**{k: (k % 8, k) for k in range(64)}, 3: (5, 99)},
        {c: "s%d" % (c % 3) for c in range(8)},
    )
    assert _final(jv) == expected


def _kill(jv, attr, tbl=None):
    """Patch one commit-chain stage to raise — the kill matrix's
    crash injector. ``attr`` on ``tbl`` (a ManifestTable) or on the
    view itself."""
    target = tbl if tbl is not None else jv

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    setattr(target, attr, boom)


@pytest.mark.parametrize(
    "stage",
    ["before_fact_commit", "before_idx_merge", "before_partials"],
)
def test_joinview_kill_matrix_reopen_heals(spark, tmp_path, stage):
    """The journal contract at every stage of upsert_facts' commit
    chain (journal -> fact commit -> index merge -> partials):
    a reopened view is 'batch fully applied' or 'batch not applied',
    never a torn mix — in particular a crash between the fact commit
    and the index merge may NOT leave a stale-span index entry that
    would double-count the fact on its next upsert."""
    path = str(tmp_path / "jv")
    jv = _mk(spark, path)
    jv.upsert_dims(_dims_df(spark, [(1, "a"), (2, "b")]))
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5)]))
    pre = {"a": (1, 5)}
    assert _final(jv) == pre

    # the batch: fact 10 MIGRATES key 1 -> 2 (the case where a stale
    # index entry is dangerous) plus a new fact
    batch = _facts_df(spark, [(10, 2, 5), (11, 1, 2)])
    if stage == "before_fact_commit":
        _kill(jv, "commit", jv._fact_t)
    elif stage == "before_idx_merge":
        _kill(jv, "merge", jv._idx_t)
    else:
        _kill(jv, "_recompute_partials")
    with pytest.raises(RuntimeError, match="injected crash"):
        jv.upsert_facts(batch)

    # reopen: __init__ finds the journal and heals at O(dirty spans)
    jv2 = _mk(spark, path)
    got = _final(jv2)
    post = {"a": (1, 2), "b": (1, 5)}
    assert got in (pre, post), f"torn state at {stage}: {got}"
    if stage != "before_fact_commit":
        assert got == post  # fact table committed => batch applied
    # and the healed view keeps answering correctly under new writes:
    # re-upsert the migrated fact — a stale index entry would now
    # leave a duplicate in the old span
    jv2.upsert_facts(_facts_df(spark, [(10, 2, 9)]))
    if got == post:
        expect = {"a": (1, 2), "b": (1, 9)}
    else:  # batch never applied: fact 11 does not exist
        expect = {"b": (1, 9)}
    assert _final(jv2) == expect


def test_joinview_empty_group_drops_span_partials(spark, tmp_path):
    """Deleting a span's last fact drops its partial rows rather than
    leaving zombie groups behind."""
    jv = _mk(spark, str(tmp_path / "jv"))
    jv.upsert_dims(_dims_df(spark, [(1, "only")]))
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5)]))
    jv.delete_facts(spark.createDataFrame([(10,)], "okey bigint"))
    assert _final(jv) == {}


def test_joinview_time_travel_reads_archived_partials(spark, tmp_path):
    """Every write commits the partials exactly once, so
    final_df(version=N) is the view after its N-th delta batch —
    including versions whose cause was a dim change."""
    jv = _mk(spark, str(tmp_path / "jv"))
    jv.upsert_dims(_dims_df(spark, [(1, "a"), (2, "b")]))    # v1
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5), (11, 2, 3)]))  # v2
    jv.upsert_dims(_dims_df(spark, [(1, "moved")]))          # v3
    jv.delete_facts(spark.createDataFrame([(11,)], "okey bigint"))  # v4
    assert _final(jv) == {"moved": (1, 5)}

    def at(v):
        return {
            r["segment"]: (r["n"], r["sv"])
            for r in jv.final_df(version=v).collect()
        }

    assert at(1) == {}                          # dims only, no facts
    assert at(2) == {"a": (1, 5), "b": (1, 3)}  # pre-migration
    assert at(3) == {"moved": (1, 5), "b": (1, 3)}  # dim cause
    assert at(4) == {"moved": (1, 5)}           # delete cause


def test_joinview_vacuum_makes_erasure_stick_across_time_travel(
    spark, tmp_path
):
    """The erasure composition on the join view: delete_facts removes
    the victim from the CURRENT surface, but an archived partials
    version still reproduces it under final_df(version=...) until
    vacuum prunes the history — after which every surviving version
    either raises (pruned) or is victim-free, the q_takedown_erasure
    contract extended to this artifact."""
    jv = _mk(spark, str(tmp_path / "jv"))
    jv.upsert_dims(_dims_df(spark, [(1, "a")]))          # v1
    jv.upsert_facts(_facts_df(spark, [(10, 1, 5), (11, 1, 2)]))  # v2
    jv.delete_facts(spark.createDataFrame([(10,)], "okey bigint"))  # v3
    # pre-vacuum: time travel REPRODUCES the victim (the hole)
    pre = {
        r["segment"]: (r["n"], r["sv"])
        for r in jv.final_df(version=2).collect()
    }
    assert pre == {"a": (2, 7)}
    removed = jv.vacuum(keep_versions=0)
    assert removed > 0
    # post-vacuum: every surviving version is pruned or victim-free
    cur_v = jv._part_t.version
    for v in range(1, cur_v + 1):
        try:
            rows = jv.final_df(version=v).collect()
        except ValueError:
            continue  # pruned — acceptable erasure outcome
        assert {r["segment"]: (r["n"], r["sv"]) for r in rows} == {
            "a": (1, 2)
        }, f"version {v} still reproduces the victim"
    # and the victim's bytes are gone from the fact table's files
    import glob as _glob

    import pyarrow.parquet as _pq

    for f in _glob.glob(str(tmp_path / "jv" / "facts" / "**" / "*.parquet"),
                        recursive=True):
        t = _pq.read_table(f)
        assert 10 not in t.column("okey").to_pylist(), f


def test_joinview_racing_writer_raises_not_overwrites(spark, tmp_path):
    """OCC contract: a second writer committing between this writer's
    read and its commit must surface as ConcurrentCommitError on an
    overlapping span — never a silent lost update."""
    from updatable_persistent_map_reduce_spark.plans.store import (
        ConcurrentCommitError,
    )

    path = str(tmp_path / "jv")
    a = _mk(spark, path, n_spans=2)
    a.upsert_dims(_dims_df(spark, [(1, "x"), (2, "y")]))
    a.upsert_facts(_facts_df(spark, [(10, 1, 5), (11, 2, 3)]))

    # interleave: while A's upsert is between its fact-table read and
    # its commit, B lands a commit touching the same spans
    b = _mk(spark, path, n_spans=2)
    orig_write = a._fact_t.write_data

    def write_then_race(df, **kw):
        mapping = orig_write(df, **kw)
        b.upsert_facts(_facts_df(spark, [(12, 1, 7)]))  # racing commit
        return mapping

    a._fact_t.write_data = write_then_race
    with pytest.raises(ConcurrentCommitError):
        a.upsert_facts(_facts_df(spark, [(10, 1, 9)]))
    # the loser's journal is live; reopening heals to a consistent
    # state that includes the WINNER's batch
    c = _mk(spark, path, n_spans=2)
    assert _final(c) == {"x": (2, 12), "y": (1, 3)}


# ---------------------------------------------------------------------------
# hypothesis model-based property: random write sequences vs the dict
# model (shrinking finds MINIMAL divergent sequences, which the fixed-
# seed interleaving test above cannot)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_jv_step = st.one_of(
    # fact batch: {okey: (ckey, v)} — latest-wins, may migrate keys
    st.dictionaries(
        st.integers(0, 14),
        st.tuples(st.integers(0, 5), st.integers(0, 50)),
        min_size=1,
        max_size=4,
    ).map(lambda d: ("facts", d)),
    # dim batch: {ckey: segment}
    st.dictionaries(
        st.integers(0, 5), st.sampled_from(["a", "b", "c"]),
        min_size=1, max_size=3,
    ).map(lambda d: ("dims", d)),
    # delete: set of okeys (no-ops for unknown ids)
    st.sets(st.integers(0, 14), min_size=1, max_size=3).map(
        lambda s: ("delete", s)
    ),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_jv_step, min_size=1, max_size=6))
def test_joinview_model_based_random_sequences(spark, tmp_path_factory, steps):
    """ANY write sequence leaves final_df() equal to the dict model —
    hypothesis shrinks failures to minimal sequences (e.g. the exact
    migrate-then-delete pair that would expose an index bug)."""
    import tempfile as _tf

    jv = _mk(spark, _tf.mkdtemp(prefix="jv_hyp_"), n_spans=4)
    facts: dict[int, tuple[int, int]] = {}
    dims: dict[int, str] = {}
    for kind, payload in steps:
        if kind == "facts":
            facts.update(payload)
            jv.upsert_facts(
                _facts_df(
                    spark, [(k, c, v) for k, (c, v) in payload.items()]
                )
            )
        elif kind == "dims":
            dims.update(payload)
            jv.upsert_dims(
                _dims_df(spark, list(payload.items()))
            )
        else:
            for k in payload:
                facts.pop(k, None)
            jv.delete_facts(
                spark.createDataFrame(
                    [(k,) for k in sorted(payload)], "okey bigint"
                )
            )
    assert _final(jv) == _expected(facts, dims)
