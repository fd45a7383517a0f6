"""Crash-safety of the manifest store: the reference's durability
contract is that state survives process lifetimes (its filesystem
trees are the only cross-process channel, MapReduce/Executer.cs:165-203).
These tests kill a batch at every interesting point of the commit
protocol and assert the store reopens as either "batch fully applied"
or "batch not applied" — never a torn mix — plus the maintenance
surface that protocol enables (vacuum, snapshot time travel).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.plans import MapReduceView


def people_view(spark, path, **kw):
    return MapReduceView(
        spark,
        str(path),
        id_col="id",
        group_cols=["state"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=8,
        n_doc_spans=8,
        **kw,
    )


def people_df(spark, rows):
    return spark.createDataFrame(rows, "id string, state string")


def counts(view):
    return {r["state"]: r["cnt"] for r in view.final_df().collect()}


def _raise(*a, **kw):
    raise RuntimeError("injected crash")


def test_crash_before_any_commit_drops_batch(spark, tmp_path):
    """Kill after data writes but before the first manifest commit:
    the batch's files are unreferenced, so reopening shows the store
    exactly as before the batch (batch not applied)."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX")]))
    v._idx_t.commit = _raise  # first commit in the protocol
    with pytest.raises(RuntimeError, match="injected crash"):
        v.execute(people_df(spark, [("a", "TX"), ("c", "NY")]))
    assert os.path.exists(v._journal_path)

    v2 = people_view(spark, store)  # recovery runs on open
    assert counts(v2) == {"CA": 1, "TX": 1}
    assert not os.path.exists(v2._journal_path)
    # and the store still accepts the batch afterwards
    v2.execute(people_df(spark, [("a", "TX"), ("c", "NY")]))
    assert counts(v2) == {"TX": 2, "NY": 1}


def test_crash_between_map_and_finals_commit_recovers(spark, tmp_path):
    """Kill inside the map-commit -> finals-commit window: map_results
    (the source of truth) holds the new batch but finals are stale.
    Reopening must re-aggregate the journaled spans so the view shows
    the batch fully applied — including a key migration."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX")]))
    v._fin_t.commit = _raise  # last commit in the protocol
    with pytest.raises(RuntimeError, match="injected crash"):
        v.execute(people_df(spark, [("a", "TX"), ("c", "NY")]))
    assert os.path.exists(v._journal_path)

    v2 = people_view(spark, store)
    assert counts(v2) == {"TX": 2, "NY": 1}  # a moved CA->TX, c inserted
    assert not os.path.exists(v2._journal_path)


def test_crash_recovery_two_level(spark, tmp_path):
    """Same window through the materialized reduce tree: recovery must
    rebuild reduce_l1 partials as well as finals."""
    store = tmp_path / "tl"
    v = MapReduceView(
        spark,
        str(store),
        id_col="id",
        map_fn=lambda df: df.withColumn("cnt", F.lit(1)),
        group_cols=["state"],
        agg_exprs=[F.sum("cnt").alias("cnt")],
        n_key_spans=4,
        n_doc_spans=4,
        two_level=True,
        n_sub_buckets=8,
    )
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX"), ("c", "CA")]))
    v._fin_t.commit = _raise
    with pytest.raises(RuntimeError, match="injected crash"):
        v.execute(people_df(spark, [("a", "TX")]))

    v2 = MapReduceView(
        spark,
        str(store),
        id_col="id",
        map_fn=lambda df: df.withColumn("cnt", F.lit(1)),
        group_cols=["state"],
        agg_exprs=[F.sum("cnt").alias("cnt")],
        n_key_spans=4,
        n_doc_spans=4,
        two_level=True,
        n_sub_buckets=8,
    )
    assert counts(v2) == {"CA": 1, "TX": 2}
    # L1 partials were re-published consistently: a follow-up
    # incremental batch through the tree still lands correctly
    v2.execute(people_df(spark, [("d", "NY")]))
    assert counts(v2) == {"CA": 1, "TX": 2, "NY": 1}


def test_orphan_files_invisible_and_vacuumed(spark, tmp_path):
    """Files from a crashed write are never referenced by a manifest:
    readers don't see them, and vacuum() reclaims them."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX")]))
    before = counts(v)

    # simulate a crashed write: a data dir full of rows, no commit
    map_path = v._map_t.path
    src = next(
        os.path.join(map_path, d)
        for d in os.listdir(map_path)
        if d.startswith("data-")
    )
    shutil.copytree(src, os.path.join(map_path, "data-deadbeefcafe"))

    assert counts(v) == before  # orphan rows invisible to readers
    assert v.vacuum() > 0
    assert not os.path.exists(os.path.join(map_path, "data-deadbeefcafe"))
    assert counts(v) == before  # vacuum never touches referenced files


def test_vacuum_reclaims_replaced_spans(spark, tmp_path):
    """A copy-on-write rewrite leaves the old span files unreferenced;
    vacuum reclaims them without changing any result."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [(f"p-{i}", "CA") for i in range(50)]))
    v.execute(people_df(spark, [("p-1", "TX")]))  # rewrite CA's span
    before = counts(v)
    files_before = v.stats()["map_results"]["files"]
    removed = v.vacuum()
    assert removed > 0
    assert v.stats()["map_results"]["files"] == files_before
    assert counts(v) == before


def test_time_travel_and_version_retention(spark, tmp_path):
    """Every commit archives the previous manifest: final_df(version=N)
    reads the store as of an earlier batch; vacuum(keep_versions=...)
    bounds the archive."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "CA")]))
    v1 = v._fin_t.version
    v.execute(people_df(spark, [("a", "TX"), ("c", "NY")]))

    assert counts(v) == {"CA": 1, "TX": 1, "NY": 1}
    asof = {
        r["state"]: r["cnt"] for r in v.final_df(version=v1).collect()
    }
    assert asof == {"CA": 2}  # the snapshot before batch 2

    v.vacuum(keep_versions=0)
    with pytest.raises(ValueError, match="no archived manifest"):
        v.final_df(version=v1)
    # current snapshot unaffected by trimming history
    assert counts(v) == {"CA": 1, "TX": 1, "NY": 1}


def test_recovery_is_idempotent(spark, tmp_path):
    """A crash *during* recovery (journal still present) just reruns
    it: opening the store twice in a row converges to the same state."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX")]))
    v._fin_t.commit = _raise
    with pytest.raises(RuntimeError, match="injected crash"):
        v.execute(people_df(spark, [("a", "TX")]))

    v2 = people_view(spark, store)
    expected = counts(v2)
    # put the journal back as if recovery itself had been killed
    # after its writes but before clearing the journal
    v2._write_journal(list(range(8)))
    v3 = people_view(spark, store)
    assert counts(v3) == expected
    assert not os.path.exists(v3._journal_path)


def test_snapshot_isolation_under_concurrent_write(spark, tmp_path):
    """A reader racing execute() sees either the pre-batch or the
    post-batch view, never a torn mix — readers resolve a manifest
    snapshot atomically (the old directory-swap protocol could expose
    a half-swapped store to a concurrent reader)."""
    import threading

    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(
        people_df(spark, [(f"p-{i}", "CA") for i in range(400)])
    )

    observed: list[dict] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            observed.append(counts(v))

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    # migrate half the docs CA -> TX (a copy-on-write rewrite batch)
    v.execute(
        people_df(spark, [(f"p-{i}", "TX") for i in range(200)])
    )
    stop.set()
    t.join()

    before, after = {"CA": 400}, {"CA": 200, "TX": 200}
    torn = [o for o in observed if o not in (before, after)]
    assert not torn, f"torn snapshots observed: {torn[:3]}"
    assert observed, "reader never ran"
    assert counts(v) == after


def test_layout_persists_across_reopen(spark, tmp_path):
    """Span counts are store properties: reopening with different
    constructor args silently adopts the recorded layout (span
    assignment is baked into the persisted data)."""
    store = tmp_path / "v"
    v = people_view(spark, store)  # n_key_spans=8
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX")]))

    v2 = MapReduceView(
        spark,
        str(store),
        id_col="id",
        group_cols=["state"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=64,  # ignored: store records 8
        n_doc_spans=64,
    )
    assert v2.n_key_spans == 8 and v2.n_doc_spans == 8
    v2.execute(people_df(spark, [("a", "TX")]))
    assert counts(v2) == {"TX": 2}

    with pytest.raises(ValueError, match="two_level"):
        MapReduceView(
            spark,
            str(store),
            id_col="id",
            map_fn=lambda df: df.withColumn("cnt", F.lit(1)),
            group_cols=["state"],
            agg_exprs=[F.sum("cnt").alias("cnt")],
            two_level=True,
        )


def test_rescale_online(spark, tmp_path):
    """Resharding rebuilds every table under the new span counts with
    identical results, and the store keeps working afterwards."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(
        people_df(
            spark,
            [(f"p-{i}", s) for i, s in enumerate(["CA", "TX", "NY"] * 30)],
        )
    )
    before = counts(v)
    v.rescale(n_key_spans=32, n_doc_spans=16)
    assert counts(v) == before
    assert v.n_key_spans == 32

    # reopen adopts the rescaled layout; incremental updates still work
    v2 = people_view(spark, store)
    assert v2.n_key_spans == 32 and v2.n_doc_spans == 16
    v2.execute(people_df(spark, [("p-0", "WA")]))
    after = counts(v2)
    assert sum(after.values()) == sum(before.values())
    assert after["WA"] == 1


def test_rescale_crash_replays_on_reopen(spark, tmp_path):
    """A kill mid-rescale leaves the journaled target layout; reopening
    replays the rebuild deterministically."""
    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "CA"), ("c", "TX")]))
    v._fin_t.commit = _raise
    with pytest.raises(RuntimeError, match="injected crash"):
        v.rescale(n_key_spans=32)
    assert os.path.exists(v._journal_path)

    v2 = people_view(spark, store)
    assert v2.n_key_spans == 32
    assert counts(v2) == {"CA": 2, "TX": 1}
    assert not os.path.exists(v2._journal_path)
    v2.execute(people_df(spark, [("c", "CA")]))
    assert counts(v2) == {"CA": 3}


def test_span_hash_migration(spark, tmp_path):
    """A store recorded under a previous span-hash version refuses to
    open by default and rebuilds in place with migrate_span_hash=True
    (spans are derived data, so the rebuild is deterministic)."""
    import json

    store = tmp_path / "v"
    v = people_view(spark, store)
    v.execute(people_df(spark, [("a", "CA"), ("b", "TX"), ("c", "CA")]))
    before = counts(v)

    # age the store: layout written by a build before span-hash
    # versioning (no span_hash key == legacy xxhash64)
    meta = json.load(open(v._meta_path))
    del meta["layout"]["span_hash"]
    json.dump(meta, open(v._meta_path, "w"))

    with pytest.raises(ValueError, match="migrate_span_hash"):
        people_view(spark, store)

    v2 = people_view(spark, store, migrate_span_hash=True)
    assert counts(v2) == before
    assert v2.query_local("CA") == [{"state": "CA", "cnt": 2}]
    v2.execute(people_df(spark, [("a", "TX")]))
    assert counts(v2) == {"CA": 1, "TX": 2}
    # migrated layout is recorded: reopening needs no flag
    assert people_view(spark, store).n_key_spans == 8


def test_span_of_non_string_keys_match_spark(spark, tmp_path):
    """Driver-side span computation falls back to a Spark expression
    for key types whose str() differs from Spark's cast (floats,
    bools), so lookups always agree with the stored assignment."""
    v = people_view(spark, tmp_path)
    for key in [("CA",), (5,), (1e7,), (1e-4,), (True,), (None,), (0.5, "x")]:
        via_spark = (
            spark.range(1)
            .select(v._kspan(*[F.lit(x) for x in key]).alias("s"))
            .first()
            .s
        )
        assert v._span_of(key) == via_spark, key


def test_query_schema_stable_for_unknown_span(spark, tmp_path):
    """query() of a key whose span holds no files must return the same
    schema as a hit (callers select aggregate columns either way)."""
    v = people_view(spark, tmp_path)
    v.execute(people_df(spark, [("a", "CA")]))
    hit = v.query("CA")
    # find a key whose span differs from CA's (empty span)
    miss_key = next(
        k for k in ("NV", "OR", "WA", "AZ", "UT", "ID", "MT", "KS")
        if v._span_of((k,)) != v._span_of(("CA",))
    )
    miss = v.query(miss_key)
    assert miss.columns == hit.columns
    assert miss.select("cnt").count() == 0


def test_alter_crash_mid_recompute_replays_on_reopen(spark, tmp_path):
    """Kill alter_reduce INSIDE the recompute (after the journal, after
    the finals write began): reopening with the new reduce must replay
    the re-aggregation and land the altered finals."""
    store = tmp_path / "alt"
    v = MapReduceView(
        spark,
        str(store),
        id_col="id",
        group_cols=["grp"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=4,
        n_doc_spans=4,
    )
    mk = lambda rows: spark.createDataFrame(rows, "id string, grp string, v long")
    v.execute(mk([("a", "g", 2), ("b", "g", 3), ("c", "h", 7)]))
    new_aggs = [F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("v_sum")]
    v._fin_t.commit = _raise  # kill at the finals publish
    with pytest.raises(RuntimeError, match="injected crash"):
        v.alter_reduce(agg_exprs=new_aggs)
    assert os.path.exists(v._journal_path)

    v2 = MapReduceView(
        spark,
        str(store),
        id_col="id",
        group_cols=["grp"],
        agg_exprs=new_aggs,
        n_key_spans=4,
        n_doc_spans=4,
    )
    assert not os.path.exists(v2._journal_path)
    got = {r["grp"]: (r["cnt"], r["v_sum"]) for r in v2.final_df().collect()}
    assert got == {"g": (2, 5), "h": (1, 7)}
    # the store keeps upserting under the altered reduce
    v2.execute(mk([("b", "h", 10)]))
    got = {r["grp"]: (r["cnt"], r["v_sum"]) for r in v2.final_df().collect()}
    assert got == {"g": (1, 2), "h": (2, 17)}
