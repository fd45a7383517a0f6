"""Round-12 additions: the computed attestation-rotation rule
(priority_order / stale_queries over CORRECTNESS_r*.json histories)
and its live-tree invariants.

The r11 verdict's items 1 + 7: the sample order the external driver
consumes is now a pure function of the driver's own attestation
artifacts — changed first, never-attested next, then strictly
least-recently-attested — so a stale tier (like the 29-query r6 tier
that aged five rounds under the hand-maintained list) can never
silently re-accumulate. These tests drive the rule with SYNTHETIC
histories (no Spark session needed) and then pin the live tree's
computed order against the real CORRECTNESS_r*.json files.
"""

from __future__ import annotations

from updatable_persistent_map_reduce_spark.operators import (
    _CHANGED,
    _ROWS_ONLY_LAST,
    _STALE_ROUNDS,
    _attestation_history,
    _vintages,
    all_queries,
    priority_order,
    stale_queries,
)


def _green():
    return {"rows_match": True, "schema_match": True, "hash_match": True}


def _red():
    return {"rows_match": True, "schema_match": True, "hash_match": False}


def _err():
    return {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "err": "boom",
    }


NAMES = ["q_a", "q_b", "q_c", "q_d", "q_e", "q_rows_only"]


def test_vintage_is_latest_green_row_only():
    history = {
        1: {"q_a": _green(), "q_b": _green()},
        2: {"q_a": _red()},  # red row must NOT advance q_a's vintage
        3: {"q_b": _green(), "q_c": _err()},  # error: no vintage for q_c
    }
    v = _vintages(history)
    assert v == {"q_a": 1, "q_b": 3}


def test_order_changed_then_new_then_oldest_first_then_rows_only():
    history = {
        5: {"q_a": _green(), "q_b": _green(), "q_c": _green()},
        7: {"q_b": _green()},
    }
    # q_d never attested (new); q_e changed; q_rows_only must be last
    # even though it was never attested either.
    order = priority_order(
        NAMES, history, changed=["q_e"], rows_only=["q_rows_only"]
    )
    assert order == ["q_e", "q_d", "q_a", "q_c", "q_b", "q_rows_only"]


def test_stale_query_precedes_every_younger_one():
    # q_a green at r1 and never since; q_b..q_e refreshed recently.
    history = {
        1: {"q_a": _green()},
        8: {n: _green() for n in ["q_b", "q_c", "q_d", "q_e"]},
    }
    order = priority_order(NAMES, history, rows_only=["q_rows_only"])
    stale = stale_queries(NAMES, history, rows_only=["q_rows_only"])
    assert stale == ["q_a"]
    # the staleness-cap invariant: every stale query sorts before
    # every non-stale unchanged one (here: before all of q_b..q_e)
    assert order.index("q_a") < min(order.index(n) for n in
                                    ["q_b", "q_c", "q_d", "q_e"])


def test_stale_threshold_boundary():
    # newest attestation round 10 -> next sample is round 11; a query
    # last green at round 11 - _STALE_ROUNDS is exactly stale, one
    # round younger is not.
    edge = 11 - _STALE_ROUNDS
    history = {
        edge: {"q_a": _green()},
        edge + 1: {"q_b": _green()},
        10: {"q_c": _green()},
    }
    assert stale_queries(["q_a", "q_b", "q_c"], history) == ["q_a"]


def test_changed_list_order_is_preserved_at_head():
    history = {9: {n: _green() for n in NAMES}}
    order = priority_order(
        NAMES, history, changed=["q_c", "q_a"], rows_only=["q_rows_only"]
    )
    assert order[:2] == ["q_c", "q_a"]


def test_empty_history_degrades_to_new_tier_alphabetical():
    order = priority_order(NAMES, {}, rows_only=["q_rows_only"])
    assert order == sorted(NAMES[:-1]) + ["q_rows_only"]


def test_rows_only_last_even_when_stale_or_changed_free():
    history = {1: {"q_rows_only": _green()}, 9: {"q_a": _green()}}
    order = priority_order(
        ["q_a", "q_rows_only"], history, rows_only=["q_rows_only"]
    )
    assert order[-1] == "q_rows_only"


# ----- live tree ------------------------------------------------------------


def test_live_order_clears_the_r6_tier_within_a_50_slot_sample():
    """r11 verdict item 1: the oldest vintage tier (r6 as of r12) plus
    every changed/new query must fit inside the driver's 50-query
    sample prefix, so one round fully clears the backlog's oldest
    tier. Also pins the global invariants on the real artifacts:
    stale-before-fresh, rows-only last."""
    history = _attestation_history()
    assert history, "CORRECTNESS_r*.json artifacts missing from repo root"
    qs = all_queries()
    order = list(qs)
    vintage = _vintages(history)
    oracle_backed = [n for n in order if n not in _ROWS_ONLY_LAST]

    # rows-only are exactly the final entries
    assert order[-len(_ROWS_ONLY_LAST):] == [
        n for n in order if n in _ROWS_ONLY_LAST
    ]

    # every stale oracle-backed query precedes every fresher
    # unchanged one
    stale = set(stale_queries(oracle_backed, history,
                              rows_only=_ROWS_ONLY_LAST))
    changed_or_new = set(_CHANGED) | {
        n for n in oracle_backed if n not in vintage
    }
    fresh = [
        n for n in oracle_backed
        if n not in stale and n not in changed_or_new
    ]
    if stale and fresh:
        assert max(order.index(n) for n in stale) < min(
            order.index(n) for n in fresh
        )

    # the OLDEST tier + changed + new fit in the 50-slot sample
    oldest_round = min(
        vintage[n] for n in oracle_backed if n in vintage
    )
    oldest_tier = {
        n for n in oracle_backed if vintage.get(n) == oldest_round
    }
    must_sample = oldest_tier | changed_or_new
    assert len(must_sample) <= 50, (
        f"{len(must_sample)} queries need slots; the oldest tier "
        "cannot clear this round"
    )
    prefix = set(order[:50])
    missing = must_sample - prefix
    assert not missing, f"not in the 50-slot prefix: {sorted(missing)}"


# ---------------------------------------------------------------------------
# takedown kill matrix (r11 verdict item 6): InvertedIndex.delete's
# sentinel -> doc_index -> stats commit chain killed at every stage,
# asserting BM25 serving correctness at each intermediate state and
# exact healing — the crash-at-every-stage treatment
# tests/test_recovery.py gives the view's commit protocol.

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.search import (  # noqa: E402
    QUERY_TERMS,
)
from updatable_persistent_map_reduce_spark.plans.text_index import (  # noqa: E402
    InvertedIndex,
)

_MINI_DOCS = [
    (1, "hash join window functions in the engine"),
    (2, "the hash table spills to disk"),
    (3, "window aggregation over a sliding hash join window"),
    (4, "broadcast join beats shuffle join for small tables"),
    (5, "sort merge join and window ranking"),
    (6, "a plain document about parquet footers"),
    (7, "hash partitioning and bucketed joins with window frames"),
    (8, "statistics pruning skips files"),
    (9, "watermarks bound state in streaming windows"),
    (10, "the join reorders under cost based optimization"),
]
_VICTIM = 3  # scores on all three query terms


def _mini_docs(spark):
    return spark.createDataFrame(_MINI_DOCS, "doc_id long, text string")


def _vic_df(spark):
    return spark.createDataFrame([(_VICTIM,)], "doc_id long")


def _bm25_list(ti):
    return [
        (r.doc_id, r.score) for r in ti.bm25(QUERY_TERMS, k=20).collect()
    ]


def _ti(spark, path, docs=None):
    ti = InvertedIndex(spark, str(path), n_spans=4, n_doc_spans=2)
    if docs is not None:
        ti.build(docs)
    return ti


def _expected_after_delete(spark, tmp_path):
    ref = _ti(
        spark,
        tmp_path / "ref",
        _mini_docs(spark).filter(F.col("doc_id") != _VICTIM),
    )
    return _bm25_list(ref), ref.stats()


def _raise(*a, **kw):
    raise RuntimeError("injected crash")


def test_takedown_kill_before_sentinel_leaves_index_intact(spark, tmp_path):
    """Crash at the sentinel commit (stage 1): no commit landed, so a
    fresh handle serves the PRE-delete state exactly, and re-running
    the delete completes to the exact post-delete index."""
    ti = _ti(spark, tmp_path / "a", _mini_docs(spark))
    pre = _bm25_list(ti)
    pre_stats = ti.stats()
    ti._repl.commit = _raise
    with pytest.raises(RuntimeError, match="injected crash"):
        ti.delete(_vic_df(spark))

    ti2 = _ti(spark, tmp_path / "a")
    assert _bm25_list(ti2) == pre
    assert ti2.stats() == pre_stats

    ti2.delete(_vic_df(spark))
    exp, exp_stats = _expected_after_delete(spark, tmp_path)
    assert _bm25_list(ti2) == exp
    assert ti2.stats() == exp_stats


def test_takedown_kill_after_sentinel_hides_victim_then_heals(
    spark, tmp_path
):
    """Crash at the doc_index commit (stage 2): the sentinel landed,
    so the victim is ALREADY out of every result (the delete's
    serving-correctness guarantee); the doc_index and stats are stale
    (n_docs still counts the victim — the documented bounded drift).
    Re-running the delete heals everything exactly."""
    ti = _ti(spark, tmp_path / "b", _mini_docs(spark))
    n_before = ti.stats()["n_docs"]
    ti._docs.commit = _raise
    with pytest.raises(RuntimeError, match="injected crash"):
        ti.delete(_vic_df(spark))

    ti2 = _ti(spark, tmp_path / "b")
    assert all(d != _VICTIM for d, _ in _bm25_list(ti2))  # victim gone NOW
    assert ti2.stats()["n_docs"] == n_before  # bounded drift, not healed yet

    ti2.delete(_vic_df(spark))  # the retry sees the victim and finishes
    exp, exp_stats = _expected_after_delete(spark, tmp_path)
    assert _bm25_list(ti2) == exp
    assert ti2.stats() == exp_stats


def test_takedown_kill_before_stats_write_refresh_heals_exactly(
    spark, tmp_path
):
    """Crash between the doc_index commit and the stats write (stage
    3 — the window the r11 verdict asked to kill-test): the victim is
    out of results AND out of the doc_index; only (n_docs, total_dl)
    drift, and refresh_stats() squares them away exactly, restoring
    the bit-exact post-delete BM25 scores."""
    ti = _ti(spark, tmp_path / "c", _mini_docs(spark))
    n_before = ti.stats()["n_docs"]
    ti.stats = _raise  # delete reads stats() right before the write
    with pytest.raises(RuntimeError, match="injected crash"):
        ti.delete(_vic_df(spark))

    ti2 = _ti(spark, tmp_path / "c")
    assert all(d != _VICTIM for d, _ in _bm25_list(ti2))
    assert ti2.stats()["n_docs"] == n_before  # stale scalars, bounded
    idx = ti2._docs.read(spark)
    assert idx.filter(F.col("doc_id") == _VICTIM).count() == 0  # docs healed

    healed = ti2.refresh_stats()
    exp, exp_stats = _expected_after_delete(spark, tmp_path)
    assert healed == exp_stats
    assert _bm25_list(ti2) == exp

    # idempotence: a replayed takedown after healing changes nothing
    ti2.delete(_vic_df(spark))
    assert _bm25_list(ti2) == exp
    assert ti2.stats() == exp_stats


# ---------------------------------------------------------------------------
# right-to-erasure lifecycle (r11 verdict item 3): independent of the
# registered q_takedown_erasure, walk EVERY version of EVERY table of
# all four artifacts after delete + compact + vacuum and assert each
# is pruned or victim-free, then raw-scan every parquet byte left on
# disk for the victim's key.


def test_erasure_every_surviving_version_is_pruned_or_victim_free(
    spark, tmp_path
):
    from updatable_persistent_map_reduce_spark.plans.ann_index import (
        IvfIndex,
    )
    from updatable_persistent_map_reduce_spark.plans.neardup_index import (
        NearDupIndex,
    )
    from updatable_persistent_map_reduce_spark.plans.view import (
        MapReduceView,
    )
    import os

    docs = _mini_docs(spark)
    embs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5 * i, 2.0]) for i, _ in _MINI_DOCS],
        "vec_id long, embedding array<float>",
    )
    victim_text = dict(_MINI_DOCS)[_VICTIM]

    ti = _ti(spark, tmp_path / "text", docs)
    ann = IvfIndex(spark, str(tmp_path / "ann"), n_cells=4)
    ann.build(embs)
    nd = NearDupIndex(
        spark, str(tmp_path / "nd"), n_perm=16, n_bands=16,
        n_spans=8, n_doc_spans=2,
    )
    nd.build(docs)
    view = MapReduceView(
        spark,
        str(tmp_path / "view"),
        id_col="doc_id",
        group_cols=["parity"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=2,
        n_doc_spans=2,
    )
    view.execute(
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            (F.col("doc_id") % 2).alias("parity"),
        )
    )

    vic_uid = str(_VICTIM).upper()
    tables = [
        ("text_post", ti._post, "doc_id", _VICTIM),
        ("text_docs", ti._docs, "doc_id", _VICTIM),
        ("text_repl", ti._repl, "doc_id", _VICTIM),
        ("ann_listed", ann._listed, "vec_id", _VICTIM),
        ("nd_shingles", nd._sh, "doc_id", _VICTIM),
        ("nd_bands", nd._bands, "doc_id", _VICTIM),
        ("view_map", view._map_t, "uid", vic_uid),
        ("view_idx", view._idx_t, "uid", vic_uid),
        ("view_l1", view._l1_t, "uid", vic_uid),
        ("view_fin", view._fin_t, "uid", vic_uid),
    ]
    pre_v = {n: t.version for n, t, _, _ in tables}

    # the hole exists before erasure: pre-delete postings time-travel
    # back with the victim in them
    ti.delete(_vic_df(spark))
    old = ti._post.read(spark, version=pre_v["text_post"])
    assert old.filter(F.col("doc_id") == _VICTIM).count() > 0

    ann.delete(
        spark.createDataFrame(
            [(_VICTIM, [float(_VICTIM), 1.0, 0.5 * _VICTIM, 2.0])],
            "vec_id long, embedding array<float>",
        )
    )
    nd.delete(
        spark.createDataFrame(
            [(_VICTIM, victim_text)], "doc_id long, text string"
        )
    )
    view.delete_docs([str(_VICTIM)])

    ti.compact()
    ann.compact()
    nd.compact()
    view.compact_index()

    ti.compact()  # one more post-delete version for the retained branch
    ti._post.vacuum(keep_versions=2)
    ti._docs.vacuum(keep_versions=0)
    ti._repl.vacuum(keep_versions=0)
    ann.vacuum(keep_versions=0)
    nd.vacuum(keep_versions=0)
    view.vacuum(keep_versions=0)

    retained_postdelete = 0
    for name, t, col, val in tables:
        cur = t.version
        for v in range(1, cur + 1):
            try:
                df = t.read(spark, version=v) if v < cur else t.read(spark)
            except ValueError:
                continue  # pruned — not time-travelable
            assert v > pre_v[name], (
                f"{name} v{v}: a pre-delete version is still travelable"
            )
            if df is not None and col in df.columns:
                assert df.filter(F.col(col) == val).count() == 0, (
                    f"{name} v{v} reproduces the victim"
                )
            if name == "text_post" and pre_v[name] < v < cur:
                retained_postdelete += 1
    # the retained-but-victim-free branch was actually exercised
    assert retained_postdelete >= 1

    # physical erasure: no parquet byte on disk carries the victim key
    for name, t, col, val in tables:
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(t.path)
            for f in fs
            if f.endswith(".parquet")
        ]
        if not files:
            continue
        raw = spark.read.option("mergeSchema", "true").parquet(*files)
        if col in raw.columns:
            assert raw.filter(F.col(col) == val).count() == 0, (
                f"{name}: victim bytes remain on disk"
            )


def test_erasure_pq_index_codes_tier_pruned_or_victim_free(
    spark, tmp_path
):
    """The PQ variant's erasure parity: IvfPqIndex.delete tombstones
    BOTH tiers (codes + listed); after compact + vacuum every
    surviving version of both tables is pruned or victim-free and no
    parquet byte under the index root carries the victim's vec_id."""
    from updatable_persistent_map_reduce_spark.plans.ann_index import (
        IvfPqIndex,
    )
    import os

    embs = spark.createDataFrame(
        [
            (i, [float(i % 5), 1.0 + i, 0.25 * i, 2.0, float(i % 3), 0.5])
            for i in range(24)
        ],
        "vec_id long, embedding array<float>",
    )
    victim = 7
    vemb = [float(victim % 5), 1.0 + victim, 0.25 * victim, 2.0,
            float(victim % 3), 0.5]

    idx = IvfPqIndex(spark, str(tmp_path / "pq"), n_cells=4, m=2)
    idx.build(embs)
    tables = [("codes", idx._codes), ("listed", idx._listed)]
    pre_v = {n: t.version for n, t in tables}

    idx.delete(
        spark.createDataFrame(
            [(victim, vemb)], "vec_id long, embedding array<float>"
        )
    )
    # the hole: the pre-delete codes snapshot still carries the victim
    old = idx._codes.read(spark, version=pre_v["codes"])
    assert old.filter(F.col("vec_id") == victim).count() == 1

    idx.compact()
    idx.vacuum(keep_versions=0)

    for name, t in tables:
        cur = t.version
        for v in range(1, cur + 1):
            try:
                df = t.read(spark, version=v) if v < cur else t.read(spark)
            except ValueError:
                continue
            assert v > pre_v[name], (
                f"pq {name} v{v}: pre-delete version still travelable"
            )
            if df is not None:
                assert (
                    df.filter(F.col("vec_id") == victim).count() == 0
                ), f"pq {name} v{v} reproduces the victim"
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(t.path)
            for f in fs
            if f.endswith(".parquet")
        ]
        if files:
            raw = spark.read.option("mergeSchema", "true").parquet(*files)
            assert raw.filter(F.col("vec_id") == victim).count() == 0, (
                f"pq {name}: victim bytes remain on disk"
            )

    # the survivors still serve: exact full-probe search with the
    # victim's embedding returns a SURVIVOR
    got = idx.search_pq([(-1, vemb)], k=1, nprobe=idx.n_cells).collect()
    assert got and got[0].vec_id != victim


# ---------------------------------------------------------------------------
# Late-r12 operators: Kleene-plus pattern matching, spatial grid
# join, curriculum pacing.

import datetime as _dt  # noqa: E402
import os as _os  # noqa: E402

from updatable_persistent_map_reduce_spark.operators import (  # noqa: E402
    all_queries as _all_queries,
)

_Q = _all_queries()


def _write_events(spark, td, rows):
    """rows: (event_id, seconds, user_id, event_type)."""
    base = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (eid, base + _dt.timedelta(seconds=s), uid, et, 1.0, "{}")
            for eid, s, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(_os.path.join(td, "events.parquet"))


def test_pattern_match_kleene_plus_variable_burst(spark, tmp_path):
    """PATTERN (view click+ purchase): a 3-click burst matches once
    (no fixed lead/lag arity), interleaved second matches count, and
    missing view / missing purchase / empty click runs never match."""
    td = str(tmp_path)
    rows = [
        # user 1: view click click click purchase -> 1 match, burst 3
        (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "click"),
        (4, 40, 1, "click"), (5, 50, 1, "purchase"),
        # user 2: two matches, bursts 1 then 2 -> n=2, max=2
        (6, 10, 2, "view"), (7, 20, 2, "click"), (8, 30, 2, "purchase"),
        (9, 40, 2, "view"), (10, 50, 2, "click"), (11, 60, 2, "click"),
        (12, 70, 2, "purchase"),
        # user 3: click purchase (no leading view) -> 0
        (13, 10, 3, "click"), (14, 20, 3, "purchase"),
        # user 4: view purchase (empty click run must NOT match) -> 0
        (15, 10, 4, "view"), (16, 20, 4, "purchase"),
        # user 5: view click click (no purchase after) -> 0
        (17, 10, 5, "view"), (18, 20, 5, "click"), (19, 30, 5, "click"),
    ]
    _write_events(spark, td, rows)
    got = {
        r.user_id: (r.n_matches, r.max_click_run)
        for r in _Q["q_pattern_match"].fn(spark, td).collect()
    }
    assert got[1] == (1, 3)
    assert got[2] == (2, 2)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)
    assert got[5] == (0, 0)


def test_pattern_match_run_compression_ties_by_event_id(spark, tmp_path):
    """Equal timestamps fall to the event_id tie-break: the same
    events in a different insertion order produce identical output."""
    td1, td2 = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [
        (1, 10, 7, "view"), (2, 10, 7, "click"),
        (3, 10, 7, "click"), (4, 10, 7, "purchase"),
    ]
    _write_events(spark, td1, rows)
    _write_events(spark, td2, list(reversed(rows)))
    a = sorted(map(tuple, _Q["q_pattern_match"].fn(spark, td1).collect()))
    b = sorted(map(tuple, _Q["q_pattern_match"].fn(spark, td2).collect()))
    assert a == b == [(7, 1, 2)]


def test_spatial_grid_join_equals_brute_force(spark, tmp_path):
    """The 9-cell grid equi-join is LOSSLESS: its output equals the
    O(n*m) distance product filter, row for row, on a synthetic pair
    dense enough (400 x 60 points) that matches genuinely occur —
    sf0.001's 10 suppliers expect < 1 within-radius pair, which would
    leave the residual filter untested."""
    from updatable_persistent_map_reduce_spark.operators.relational import (
        _SPG_AX, _SPG_AY, _SPG_BX, _SPG_BY, _SPG_MOD, _SPG_R,
    )
    from updatable_persistent_map_reduce_spark.sources.tables import Catalog

    td = str(tmp_path)
    spark.createDataFrame(
        [(i, float(100 + i)) for i in range(1, 401)],
        "c_custkey long, c_acctbal double",
    ).coalesce(1).write.parquet(_os.path.join(td, "customer.parquet"))
    spark.createDataFrame(
        [(i,) for i in range(1, 61)], "s_suppkey long"
    ).coalesce(1).write.parquet(_os.path.join(td, "supplier.parquet"))

    cat = Catalog(spark, td)
    c = cat.customer.select(
        "c_custkey",
        ((F.col("c_custkey") * _SPG_AX) % _SPG_MOD).alias("x"),
        ((F.col("c_custkey") * _SPG_AY) % _SPG_MOD).alias("y"),
        "c_acctbal",
    )
    s = cat.supplier.select(
        "s_suppkey",
        ((F.col("s_suppkey") * _SPG_AX + _SPG_BX) % _SPG_MOD).alias("sx"),
        ((F.col("s_suppkey") * _SPG_AY + _SPG_BY) % _SPG_MOD).alias("sy"),
    )
    dx, dy = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
    brute = (
        s.crossJoin(c)
        .filter(dx * dx + dy * dy <= _SPG_R * _SPG_R)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_near"),
            F.floor(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")) * 100
            ).cast("bigint").alias("bal_cents"),
        )
    )
    expected = {
        r.s_suppkey: (r.n_near, r.bal_cents) for r in brute.collect()
    }
    got = {
        r.s_suppkey: (r.n_near, r.bal_cents)
        for r in _Q["q_join_spatial_grid"].fn(spark, td).collect()
    }
    # unmatched suppliers appear as (0, 0) in the operator output
    for k, v in got.items():
        assert expected.get(k, (0, 0)) == v, (k, v, expected.get(k))
    assert set(expected) <= set(got)
    assert any(v[0] > 0 for v in got.values())  # join genuinely fires


def test_curriculum_pacing_schedule_invariants(spark, sf_dir):
    """sqrt-competence schedule invariants: pr/unlock monotone in
    difficulty order, unlock == ceil(T*pr^2/1e12) exactly, quartile
    tiers balanced to +/-1, endpoints pinned."""
    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _CUR_STEPS, _CUR_TIERS,
    )

    rows = _Q["q_curriculum_pacing"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 10
    by_rank = sorted(rows, key=lambda r: (r.difficulty_ppm, r.doc_id))
    prs = [r.pr_ppm for r in by_rank]
    assert prs == sorted(prs)
    assert prs[0] == 0 and prs[-1] == 1_000_000
    # exact percentile + unlock arithmetic, recomputed in Python ints
    for i, r in enumerate(by_rank):
        pr = (i * 1_000_000) // max(n - 1, 1)
        assert r.pr_ppm == pr, (i, r)
        assert (
            r.unlock_step
            == (pr * pr * _CUR_STEPS + 10**12 - 1) // 10**12
        ), r
        assert r.tier == (i * _CUR_TIERS) // n + 1
    assert by_rank[0].unlock_step == 0
    assert by_rank[-1].unlock_step == _CUR_STEPS
    from collections import Counter

    tiers = Counter(r.tier for r in rows)
    assert set(tiers) == set(range(1, _CUR_TIERS + 1))
    assert max(tiers.values()) - min(tiers.values()) <= 1


def test_curriculum_pack_width_guard_raises(spark, tmp_path):
    """A doc_id at the pack width must fail loudly, never silently
    misorder the packed (difficulty, doc_id) rank key."""
    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _CUR_PACK,
    )

    td = str(tmp_path)
    spark.createDataFrame(
        [(_CUR_PACK, "a b c", "en", "web", 5)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.parquet(_os.path.join(td, "documents.parquet"))
    with pytest.raises(RuntimeError, match="pack width"):
        _Q["q_curriculum_pacing"].fn(spark, td)


# ---------------------------------------------------------------------------
# q_dataloader_resume — resume == slice-of-full, lockstep truncation


def test_dataloader_resume_is_slice_of_full_schedule(spark, sf_dir):
    """The resume window must be byte-identical to the same steps cut
    from the FULL schedule enumerated from step 0 — the property that
    makes a mid-epoch checkpoint restart exact without a position
    log."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _DL_BATCH,
        _DL_SHARDS,
        _DL_WINDOW,
        epoch_hash_frame,
        q_dataloader_resume,
    )
    from updatable_persistent_map_reduce_spark.sources import Catalog

    got = {
        tuple(r)
        for r in q_dataloader_resume(spark, sf_dir).collect()
    }

    # full schedule, enumerated driver-side from the same hash stream
    h = epoch_hash_frame(
        Catalog(spark, sf_dir).documents, n_epochs=2, shards=_DL_SHARDS
    ).collect()
    by_es: dict[tuple[int, int], list] = {}
    for r in h:
        by_es.setdefault((r["epoch"], r["shard"]), []).append(
            (r["hv"], r["doc_id"])
        )
    full = []
    steps_per_epoch: dict[int, int] = {}
    for (ep, sh), rows in by_es.items():
        rows.sort()
        n_full = len(rows) // _DL_BATCH
        steps_per_epoch[ep] = min(
            steps_per_epoch.get(ep, n_full), n_full
        )
    for (ep, sh), rows in by_es.items():
        for i, (_, doc) in enumerate(rows[: (len(rows) // _DL_BATCH) * _DL_BATCH]):
            full.append((ep, i // _DL_BATCH, sh, i % _DL_BATCH, doc))
    want = set()
    for ep, n_steps in steps_per_epoch.items():
        s0 = n_steps // 2
        want |= {
            t
            for t in full
            if t[0] == ep and s0 <= t[1] < min(s0 + _DL_WINDOW, n_steps)
        }
    assert got == want
    # lockstep sanity: every emitted step exists on EVERY shard
    for ep in steps_per_epoch:
        steps = {t[1] for t in got if t[0] == ep}
        for st in steps:
            shards = {t[2] for t in got if t[0] == ep and t[1] == st}
            assert shards == set(range(_DL_SHARDS))
            slots = [
                t[3] for t in got if t[0] == ep and t[1] == st
            ]
            assert len(slots) == _DL_SHARDS * _DL_BATCH


def test_pack_boundary_attention_consistent_with_pack_tokens(spark, sf_dir):
    """The boundary metadata must describe exactly the packs
    q_pack_tokens emits: same (shard, seq_id) key set, n_segments ==
    its n_docs, boundaries ascending from 0 with one offset per
    segment, every offset < the pack budget, and n_new_docs ==
    n_segments minus (1 if the pack starts with a continuation)."""
    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _PACK_BUDGET,
        q_pack_boundary_attention,
        q_pack_tokens,
    )

    packs = {
        (r["shard"], r["seq_id"]): r["n_docs"]
        for r in q_pack_tokens(spark, sf_dir).collect()
    }
    got = q_pack_boundary_attention(spark, sf_dir).collect()
    assert {(r["shard"], r["seq_id"]) for r in got} == set(packs)
    for r in got:
        offs = [int(x) for x in r["boundaries"].split(",")]
        assert r["n_segments"] == packs[(r["shard"], r["seq_id"])]
        assert len(offs) == r["n_segments"]
        assert offs == sorted(offs) and offs[0] == 0
        assert all(0 <= o < _PACK_BUDGET for o in offs)
        assert len(set(offs)) == len(offs)
        assert r["n_new_docs"] in (r["n_segments"], r["n_segments"] - 1)
