"""ManifestTable unit semantics: commit modes, snapshot reads,
version archive, vacuum — the storage contract the view builds on."""

from __future__ import annotations

import os

import pytest

from updatable_persistent_map_reduce_spark.plans.store import (
    ConcurrentCommitError,
    ManifestTable,
)


def mk_df(spark, rows):
    return spark.createDataFrame(rows, "kspan int, v string")


@pytest.fixture()
def table(tmp_path):
    return ManifestTable(str(tmp_path / "t"), "kspan")


def read_vals(table, spark, **kw):
    df = table.read(spark, **kw)
    return sorted((r["kspan"], r["v"]) for r in df.collect()) if df is not None else None


def test_write_commit_read_roundtrip(spark, table):
    m = table.write_data(mk_df(spark, [(0, "a"), (1, "b")]))
    assert set(m) == {0, 1}
    assert table.read(spark) is None  # invisible until commit
    table.commit(replace=m)
    assert read_vals(table, spark) == [(0, "a"), (1, "b")]
    # span pruning is driver-side file selection
    assert read_vals(table, spark, spans=[1]) == [(1, "b")]
    assert table.read(spark, spans=[7]) is None


def test_append_extends_replace_swaps_drop_removes(spark, table):
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a"), (1, "b")])))
    table.commit(append=table.write_data(mk_df(spark, [(0, "a2")])))
    assert read_vals(table, spark, spans=[0]) == [(0, "a"), (0, "a2")]
    table.commit(replace=table.write_data(mk_df(spark, [(0, "z")])))
    assert read_vals(table, spark, spans=[0]) == [(0, "z")]
    table.commit(drop=[0])
    assert table.read(spark, spans=[0]) is None
    assert read_vals(table, spark) == [(1, "b")]


def test_replace_all_substitutes_table(spark, table):
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a"), (1, "b")])))
    table.commit(replace_all=table.write_data(mk_df(spark, [(5, "q")])))
    assert read_vals(table, spark) == [(5, "q")]


def test_version_archive_and_time_travel(spark, table):
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    v1 = table.version
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v2")])))
    assert read_vals(table, spark) == [(0, "v2")]
    assert read_vals(table, spark, version=v1) == [(0, "v1")]
    with pytest.raises(ValueError, match="no archived manifest"):
        table.read(spark, version=999)


def test_vacuum_reclaims_only_unreferenced(spark, table):
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v2")])))
    # old snapshot still readable pre-vacuum
    assert table.vacuum(keep_versions=1) >= 1
    assert read_vals(table, spark) == [(0, "v2")]
    s = table.stats()
    assert s["files"] == 1 and s["spans"] == 1
    # keep_versions=1 retained exactly one archived manifest
    vdir = os.path.join(table.path, "_versions")
    assert len(os.listdir(vdir)) == 1


def test_compact_folds_spans_preserves_rows_and_history(spark, table):
    """Table-level OPTIMIZE: three appends accrete 3 files in span 0;
    compact folds them to 1 with the identical row multiset, the
    pre-compaction snapshot stays time-travelable, a below-threshold
    span is untouched, and vacuum then reclaims the dead files."""
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a"), (1, "x")])))
    table.commit(append=table.write_data(mk_df(spark, [(0, "b")])))
    table.commit(append=table.write_data(mk_df(spark, [(0, "c")])))
    pre_version = table.version
    assert len(table.spans()[0]) == 3
    r = table.compact(spark, min_files=2)
    assert r["spans_compacted"] == 1
    assert (r["files_before"], r["files_after"]) == (3, 1)
    # row multiset identical; single-file span untouched
    assert read_vals(table, spark) == [(0, "a"), (0, "b"), (0, "c"), (1, "x")]
    assert len(table.spans()[0]) == 1 and len(table.spans()[1]) == 1
    # pre-compaction snapshot still resolves to the old files
    assert read_vals(table, spark, version=pre_version) == [
        (0, "a"), (0, "b"), (0, "c"), (1, "x"),
    ]
    # idempotent: nothing left above threshold
    assert table.compact(spark, min_files=2)["spans_compacted"] == 0
    # vacuum reclaims exactly the superseded span-0 files
    assert table.vacuum() == 3
    assert read_vals(table, spark) == [(0, "a"), (0, "b"), (0, "c"), (1, "x")]


def test_manifest_stats_prune_and_lifecycle(spark, tmp_path):
    """Per-file min/max bounds ride the manifest: where= prunes files
    without footer reads, unknown columns never prune, appends merge
    new bounds, and replacing a span drops its files' stale stats."""
    t = ManifestTable(str(tmp_path / "s"), "kspan", stat_cols=("v",))
    df1 = spark.createDataFrame([(0, i) for i in range(10)], "kspan int, v int")
    df2 = spark.createDataFrame([(0, i) for i in range(100, 110)], "kspan int, v int")
    t.commit(replace=t.write_data(df1))
    t.commit(append=t.write_data(df2))
    assert len(t.select_files()) == 2
    # bounds prune: only the file covering [100, 109] survives
    assert len(t.select_files(where=("v", 105, 200))) == 1
    # disjoint range prunes everything
    assert t.read(spark, where=("v", 500, 600)) is None
    # a column with no recorded bounds never prunes (safe default)
    assert len(t.select_files(where=("nope", 0, 0))) == 2
    # pruned read + residual filter == full read + filter
    full = t.read(spark).filter("v >= 105").count()
    pruned = t.read(spark, where=("v", 105, 200)).filter("v >= 105").count()
    assert full == pruned == 5
    # multiple predicates AND: second range contradicts the first
    assert t.select_files(where=[("v", 105, 200), ("v", 0, 50)]) == []
    assert len(t.select_files(where=[("v", 105, 200), ("v", 0, 500)])) == 1
    # replace drops the span's old stats and installs the new bounds
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, 7)], "kspan int, v int")))
    assert len(t.select_files(where=("v", 100, 110))) == 0
    assert len(t.select_files(where=("v", 7, 7))) == 1


def test_sorted_write_splits_files_with_tight_bounds(spark, tmp_path):
    """sort_cols + max_records_per_file: one span splits into files
    covering contiguous key runs, so a narrow range resolves to a
    fraction of the files — the layout q_store_stats_prune relies on."""
    t = ManifestTable(str(tmp_path / "s"), "kspan", stat_cols=("v",))
    df = spark.createDataFrame([(0, i) for i in range(400)], "kspan int, v int")
    t.commit(replace=t.write_data(df, sort_cols=["v"], max_records_per_file=100))
    n = len(t.select_files())
    assert n == 4
    assert len(t.select_files(where=("v", 150, 160))) == 1
    # the conf did not leak into the session
    assert spark.conf.get("spark.sql.files.maxRecordsPerFile", None) in (None, "0")


def test_merge_update_insert_delete_and_cow_spans(spark, tmp_path):
    """MERGE semantics end to end: matched rows replaced by source
    (latest-wins), unmatched source rows inserted, delete_where rows
    deleted when matched / ignored when not — and only the spans the
    source names are rewritten (untouched spans keep the exact same
    files), with the pre-merge snapshot time-travelable."""
    t = ManifestTable(str(tmp_path / "m"), "kspan")
    base = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (1, 11, "c"), (2, 21, "d")],
        "kspan int, k int, v string",
    )
    t.commit(replace=t.write_data(base))
    pre_version = t.version
    span2_before = t.select_files(spans=[2])
    src = spark.createDataFrame(
        [
            (0, 1, "A", False),   # matched -> update
            (0, 2, "_", True),    # matched + delete_where -> delete
            (0, 3, "N", False),   # unmatched -> insert
            (1, 12, "_", True),   # unmatched + delete_where -> no-op
        ],
        "kspan int, k int, v string, dead boolean",
    )
    stats = t.merge(src, on=["k"], delete_where="dead")
    assert (stats["updated"], stats["inserted"], stats["deleted"]) == (1, 1, 1)
    assert stats["spans_touched"] == 2
    got = sorted((r["kspan"], r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(0, 1, "A"), (0, 3, "N"), (1, 11, "c"), (2, 21, "d")]
    # extra source column never lands in the table
    assert t.read(spark).columns == ["kspan", "k", "v"]
    # copy-on-write: span 2 was not in the source, its files are the same
    assert t.select_files(spans=[2]) == span2_before
    # pre-merge snapshot still reads
    old = sorted(
        (r["kspan"], r["k"], r["v"])
        for r in t.read(spark, version=pre_version).collect()
    )
    assert old == [(0, 1, "a"), (0, 2, "b"), (1, 11, "c"), (2, 21, "d")]


def test_merge_into_empty_table_inserts(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "m0"), "kspan")
    src = spark.createDataFrame([(0, 1, "a"), (1, 2, "b")], "kspan int, k int, v string")
    stats = t.merge(src, on=["k"])
    assert (stats["updated"], stats["inserted"], stats["deleted"]) == (0, 2, 0)
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_merge_fresh_table_with_delete_where_rejected(spark, tmp_path):
    """On a never-written table the source's columns define the schema,
    so condition-only extras would leak into it — rejected loudly."""
    t = ManifestTable(str(tmp_path / "mf"), "kspan")
    src = spark.createDataFrame([(0, 1, "a", False)],
                                "kspan int, k int, v string, dead boolean")
    with pytest.raises(ValueError, match="never-written"):
        t.merge(src, on=["k"], delete_where="dead")
    # but an EMPTY table with a committed schema drops extras fine
    t2 = ManifestTable(str(tmp_path / "me"), "kspan")
    t2.commit(replace=t2.write_data(
        spark.createDataFrame([(0, 9, "x")], "kspan int, k int, v string")))
    t2.commit(drop=[0])
    t3 = ManifestTable(str(tmp_path / "me"), "kspan")
    t3.merge(src, on=["k"], delete_where="dead")
    assert t3.read(spark).columns == ["kspan", "k", "v"]


def test_compact_detects_concurrent_commit(spark, tmp_path):
    """compact() pins its base snapshot: a commit landing between its
    read and its replace raises ConcurrentCommitError instead of
    silently dropping the interleaved append."""
    from updatable_persistent_map_reduce_spark.plans.store import (
        ConcurrentCommitError,
    )

    t = ManifestTable(str(tmp_path / "cc"), "kspan")
    t.commit(replace=t.write_data(mk_df(spark, [(0, "a")])))
    t.commit(append=t.write_data(mk_df(spark, [(0, "b")])))
    real_write = t.write_data

    def write_and_race(df, **kw):
        mapping = real_write(df, **kw)
        # another writer appends AFTER compact read its snapshot
        t2 = ManifestTable(str(tmp_path / "cc"), "kspan")
        t2.commit(append=t2.write_data(mk_df(spark, [(0, "late")])))
        return mapping

    t.write_data = write_and_race
    with pytest.raises(ConcurrentCommitError):
        t.compact(spark, min_files=2)
    t.write_data = real_write
    # the racing append survived
    assert (0, "late") in (read_vals(t, spark) or [])


def test_merge_span_emptied_by_delete_disappears(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "md"), "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, 1, "a"), (1, 2, "b")], "kspan int, k int, v string")))
    src = spark.createDataFrame([(0, 1, "a", True)],
                                "kspan int, k int, v string, dead boolean")
    stats = t.merge(src, on=["k"], delete_where="dead")
    assert stats["deleted"] == 1
    assert t.read(spark, spans=[0]) is None
    assert [r["k"] for r in t.read(spark).collect()] == [2]


def test_changes_append_replace_and_cancellation(spark, tmp_path):
    """CDF semantics: appends surface as inserts reading only the
    appended files; a replace that rewrites a row identically cancels
    out; updates surface as delete(old)+insert(new); compaction (same
    multiset, new files) yields an EMPTY feed."""
    t = ManifestTable(str(tmp_path / "c"), "kspan")
    t.commit(replace=t.write_data(mk_df(spark, [(0, "a"), (1, "b")])))
    v1 = t.version
    t.commit(append=t.write_data(mk_df(spark, [(0, "a2")])))
    v2 = t.version
    got = sorted(
        (r["kspan"], r["v"], r["_change_type"])
        for r in t.changes(spark, v1).collect()
    )
    assert got == [(0, "a2", "insert")]
    # replace span 0 with (a -> A, a2 kept identical): a2 cancels
    t.commit(replace=t.write_data(mk_df(spark, [(0, "A"), (0, "a2")])))
    got = sorted(
        (r["kspan"], r["v"], r["_change_type"])
        for r in t.changes(spark, v2).collect()
    )
    assert got == [(0, "A", "insert"), (0, "a", "delete")]
    # compaction rewrites files, not rows: empty feed
    v3 = t.version
    t.commit(append=t.write_data(mk_df(spark, [(0, "z")])))
    t.compact(spark, min_files=2)
    feed = t.changes(spark, v3).collect()
    assert sorted((r["v"], r["_change_type"]) for r in feed) == [
        ("z", "insert")
    ]
    # full-range feed from v1 never reads untouched span 1
    all_chg = t.changes(spark, v1)
    assert not [r for r in all_chg.collect() if r["kspan"] == 1]


def test_delete_keys_mor_lifecycle(spark, tmp_path):
    """Merge-on-read deletes: tombstones hide rows with ZERO data
    files rewritten; time travel shows the pre-delete rows; appends
    into a tombstoned span are rejected loudly (keyed tombstones
    would destroy re-inserted rows at materialization) while other
    spans append freely; compaction MATERIALIZES and clears the
    tombstones; vacuum never reaps live tombstones."""
    t = ManifestTable(str(tmp_path / "dv"), "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame(
            [(0, 1, "a"), (0, 2, "b"), (1, 11, "c")],
            "kspan int, k int, v string",
        )))
    v1 = t.version
    files_before = t.select_files()
    res = t.delete_keys(
        spark.createDataFrame([(0, 2)], "kspan int, k int"), on=["k"]
    )
    assert res["tombstone_files"] == 1
    # zero data files rewritten; the row is hidden at read time
    assert t.select_files() == files_before
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 11]
    assert sorted(
        r["k"] for r in t.read(spark, version=v1).collect()
    ) == [1, 2, 11]
    # an append into the TOMBSTONED span is rejected loudly (keyed
    # tombstones would hide re-inserted rows and compaction would
    # then destroy them); other spans append freely
    with pytest.raises(ValueError, match="tombstoned span"):
        t.commit(append=t.write_data(
            spark.createDataFrame([(0, 3, "d")],
                                  "kspan int, k int, v string")))
    t.commit(append=t.write_data(
        spark.createDataFrame([(1, 12, "e")], "kspan int, k int, v string")))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 11, 12]
    # vacuum must keep the live tombstone file
    t.vacuum()
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 11, 12]
    # compaction materializes: tombstones cleared, answers unchanged,
    # and the span accepts appends again — even of the deleted key
    t.compact(spark, min_files=2)
    m = t._load()
    assert "deletes" not in m
    t.commit(append=t.write_data(
        spark.createDataFrame([(0, 2, "b2")], "kspan int, k int, v string")))
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 11, 12]
    # deleting a key in a span with NO data files records nothing
    # (would be unmaterializable and pin delete_on forever)
    res2 = t.delete_keys(
        spark.createDataFrame([(7, 99)], "kspan int, k int"), on=["k"]
    )
    assert res2["spans_touched"] == 0
    assert "deletes" not in t._load()
    # a second delete keyed differently is rejected only while
    # tombstones exist; after materialization any key set is fine
    t.delete_keys(
        spark.createDataFrame([(1, "c")], "kspan int, v string"), on=["v"]
    )
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2, 12]
    with pytest.raises(ValueError, match="already keyed"):
        t.delete_keys(
            spark.createDataFrame([(0, 1)], "kspan int, k int"), on=["k"]
        )


def test_clone_is_zero_copy_and_diverges_independently(spark, tmp_path):
    """Shallow clone: hardlinked files (same inode — zero bytes
    copied), fresh history, and writes to either branch never show on
    the other; vacuuming one branch cannot break the other's reads."""
    t = ManifestTable(str(tmp_path / "orig"), "kspan")
    t.commit(replace=t.write_data(mk_df(spark, [(0, "a"), (1, "b")])))
    c = t.clone_to(str(tmp_path / "branch"))
    assert c.version == 1
    # zero-copy proof: same inode
    f_orig, f_clone = t.select_files()[0], c.select_files()[0]
    assert os.path.basename(f_orig) == os.path.basename(f_clone)
    assert os.stat(f_orig).st_ino == os.stat(
        os.path.join(str(tmp_path / "branch"),
                     os.path.relpath(f_orig, str(tmp_path / "orig")))
    ).st_ino
    assert read_vals(c, spark) == [(0, "a"), (1, "b")]
    # diverge the clone; the original is untouched
    c.commit(replace=c.write_data(mk_df(spark, [(0, "CHANGED")])))
    assert read_vals(c, spark) == [(0, "CHANGED"), (1, "b")]
    assert read_vals(t, spark) == [(0, "a"), (1, "b")]
    # diverge the original; the clone is untouched
    t.commit(append=t.write_data(mk_df(spark, [(1, "b2")])))
    assert read_vals(c, spark) == [(0, "CHANGED"), (1, "b")]
    # the clone's rewrite orphaned its copy of span 0's file; its
    # vacuum unlinks only the clone's name — the original still reads
    c.vacuum()
    assert read_vals(t, spark) == [(0, "a"), (1, "b"), (1, "b2")]
    with pytest.raises(ValueError, match="already exists"):
        t.clone_to(str(tmp_path / "branch"))


def test_schema_evolution_add_column_null_backfill(spark, tmp_path):
    """Add-column evolution: a later batch lands files with a new
    column; the manifest schema widens, old files read with NULL
    backfill, time travel keeps each snapshot's own schema, and a
    type CHANGE is rejected at commit."""
    path = str(tmp_path / "e")
    t = ManifestTable(path, "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, 1)], "kspan int, a int")))
    v1 = t.version
    t2 = ManifestTable(path, "kspan")
    t2.commit(append=t2.write_data(
        spark.createDataFrame([(0, 2, "x")], "kspan int, a int, b string")))
    df = t2.read(spark)
    assert df.columns == ["kspan", "a", "b"]
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [
        (1, None), (2, "x"),
    ]
    assert t2.read(spark, version=v1).columns == ["kspan", "a"]
    t3 = ManifestTable(path, "kspan")
    with pytest.raises(ValueError, match="may only ADD"):
        t3.commit(append=t3.write_data(
            spark.createDataFrame([(0, "s", "y")],
                                  "kspan int, a string, b string")))


def test_empty_write_yields_empty_mapping(spark, table):
    m = table.write_data(mk_df(spark, []))
    assert m == {}
    table.commit(replace=m)
    assert table.read(spark) is None


# ----- optimistic concurrency: the exclusive-create commit point ----------


def test_concurrent_commit_detected(spark, table):
    """A second writer that already claimed the next version makes
    this writer's commit fail loudly instead of silently losing it."""
    from updatable_persistent_map_reduce_spark.plans.store import (
        ConcurrentCommitError,
    )

    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    mapping = table.write_data(mk_df(spark, [(0, "v2-lost")]))
    # freeze this writer inside commit's load->publish window: it has
    # read base v1 when a second writer lands v2
    stale = table._load()
    table._load = lambda version=None: dict(stale)
    other = ManifestTable(table.path, "kspan")
    other.commit(replace=other.write_data(mk_df(spark, [(0, "v2-won")])))
    with pytest.raises(ConcurrentCommitError, match="version 2"):
        table.commit(replace=mapping)
    # the winner's snapshot is intact; loser's files are unreferenced
    # orphans a vacuum reclaims
    assert other.version == 2
    assert read_vals(other, spark) == [(0, "v2-won")]
    assert other.vacuum() >= 1
    assert read_vals(other, spark) == [(0, "v2-won")]


# ----- retry_commit: OCC retry-with-rebase (two writers both land) --------


def _race_once(victim: ManifestTable, rival_op):
    """Patch ``victim.write_data`` so its FIRST call runs ``rival_op``
    (a second writer's complete commit) after the victim has pinned its
    base snapshot but before its own commit — the deterministic
    compaction-daemon-vs-ingest interleaving. Subsequent calls (the
    rebased retry) run clean."""
    real = victim.write_data
    fired = {"done": False}

    def write_and_race(df, **kw):
        mapping = real(df, **kw)
        if not fired["done"]:
            fired["done"] = True
            rival_op()
        return mapping

    victim.write_data = write_and_race


def test_retry_commit_compact_vs_append_both_land(spark, tmp_path):
    """The real deployment race: a compaction daemon loses to an
    interleaved ingest append, rebases via retry_commit, and BOTH
    commits land — the appended row survives and ends up compacted."""
    from updatable_persistent_map_reduce_spark.plans.store import retry_commit

    path = str(tmp_path / "rc")
    t = ManifestTable(path, "kspan")
    t.commit(replace=t.write_data(mk_df(spark, [(0, "a")])))
    t.commit(append=t.write_data(mk_df(spark, [(0, "b")])))

    def rival():
        t2 = ManifestTable(path, "kspan")
        t2.commit(append=t2.write_data(mk_df(spark, [(0, "late")])))

    _race_once(t, rival)
    stats = retry_commit(lambda: t.compact(spark, min_files=2))
    assert stats["spans_compacted"] == 1
    # the rebased rewrite saw the rival's append: all three rows live
    assert read_vals(t, spark) == [(0, "a"), (0, "b"), (0, "late")]
    # and the span is genuinely compacted to one file
    assert [len(fs) for fs in t.spans().values()] == [1]
    # base(2) + rival append(3) + retried compact(4); the lost first
    # attempt never committed
    assert t.version == 4


def test_retry_commit_merge_vs_delete_keys_both_land(spark, tmp_path):
    """merge loses to an interleaved MoR delete, rebases, and both
    effects are visible: the merged row is updated, the rival-deleted
    key is gone."""
    from updatable_persistent_map_reduce_spark.plans.store import retry_commit

    path = str(tmp_path / "rm")
    t = ManifestTable(path, "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame(
            [(0, 1, "a"), (1, 2, "b")], "kspan int, k int, v string"
        )
    ))

    def rival():
        t2 = ManifestTable(path, "kspan")
        t2.delete_keys(
            spark.createDataFrame([(1, 2)], "kspan int, k int"), on=["k"]
        )

    _race_once(t, rival)
    src = spark.createDataFrame([(0, 1, "a2")], "kspan int, k int, v string")
    stats = retry_commit(lambda: t.merge(src, on=["k"]))
    assert stats["updated"] == 1
    rows = sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    )
    assert rows == [(1, "a2")]  # k=2 tombstoned by the rival, k=1 merged
    assert t.version == 3  # base(1) + rival delete(2) + retried merge(3)


def test_retry_commit_exhaustion_reraises(spark, tmp_path):
    """Under unbounded contention the loop gives up loudly after
    ``attempts`` losses (livelock guard)."""
    from updatable_persistent_map_reduce_spark.plans.store import (
        ConcurrentCommitError,
        retry_commit,
    )

    calls = {"n": 0}

    def always_loses():
        calls["n"] += 1
        raise ConcurrentCommitError("stale")

    with pytest.raises(ConcurrentCommitError):
        retry_commit(always_loses, attempts=3)
    assert calls["n"] == 3


def test_retry_commit_threaded_appends_both_land(spark, tmp_path):
    """Two REAL concurrent writers (threads, barrier-released) racing
    plain appends: whichever loses the exclusive-create commit point
    rebases and lands — no rows lost, versions strictly ordered."""
    import threading

    from updatable_persistent_map_reduce_spark.plans.store import retry_commit

    path = str(tmp_path / "rt")
    t0 = ManifestTable(path, "kspan")
    t0.commit(replace=t0.write_data(mk_df(spark, [(0, "base")])))
    # Spark jobs run serially up front; only the commit protocol races.
    writers = []
    for tag in ("w1", "w2"):
        ti = ManifestTable(path, "kspan")
        writers.append((ti, ti.write_data(mk_df(spark, [(0, tag)]))))
    barrier = threading.Barrier(2)
    errs: list[BaseException] = []

    def go(ti, mapping):
        try:
            barrier.wait(timeout=10)
            retry_commit(lambda: ti.commit(append=mapping))
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=go, args=w) for w in writers]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=30)
    assert not errs
    assert read_vals(t0, spark) == [(0, "base"), (0, "w1"), (0, "w2")]
    assert t0.version == 3


def test_restore_is_forward_commit(spark, table):
    """restore(v) republishes the archived snapshot as a NEW version:
    content rolls back, history (incl. the rolled-back version) stays
    time-travelable, files are re-referenced not rewritten, and a
    vacuumed-away target version raises."""
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    v1 = table.version
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v2")])))
    v2_spans = table.spans()
    v3 = table.restore(v1)
    assert v3 == 3 and table.version == 3
    assert read_vals(table, spark) == [(0, "v1")]
    assert table.spans() == table.spans(version=v1)  # zero-copy
    assert table.spans(version=2) == v2_spans  # history preserved
    # restoring the CURRENT state is a valid (no-op content) commit
    assert table.restore(3) == 4
    assert read_vals(table, spark) == [(0, "v1")]
    # a pruned target raises loudly
    table.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="no archived manifest"):
        table.restore(2)


def test_disjoint_span_writers_both_land_without_rebase(spark, tmp_path):
    """Span-level OCC conflict classes: a stale base_version commit
    whose touched spans are disjoint from every intervening commit's
    recorded set lands directly (no ConcurrentCommitError, no
    re-derive); overlapping spans still lose loudly."""
    path = str(tmp_path / "occ")
    t = ManifestTable(path, "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, "a0"), (1, "b0")], "kspan int, v string")))
    base = t.version  # == 1
    # two "writers" derive against the same base snapshot
    wa, wb = ManifestTable(path, "kspan"), ManifestTable(path, "kspan")
    map_a = wa.write_data(
        spark.createDataFrame([(0, "a1")], "kspan int, v string"))
    map_b = wb.write_data(
        spark.createDataFrame([(1, "b1")], "kspan int, v string"))
    assert wa.commit(replace={0: map_a[0]}, base_version=base) == 2
    # writer B's base is stale, but span 1 is untouched by A's commit
    assert wb.commit(replace={1: map_b[1]}, base_version=base) == 3
    assert read_vals(t, spark) == [(0, "a1"), (1, "b1")]
    # a third stale writer touching span 1 conflicts with B — loud
    wc = ManifestTable(path, "kspan")
    map_c = wc.write_data(
        spark.createDataFrame([(1, "b2")], "kspan int, v string"))
    with pytest.raises(ConcurrentCommitError, match="overlapping"):
        wc.commit(replace={1: map_c[1]}, base_version=base)
    # replace_all never fast-paths, even with disjoint history
    wd = ManifestTable(path, "kspan")
    map_d = wd.write_data(
        spark.createDataFrame([(7, "z")], "kspan int, v string"))
    with pytest.raises(ConcurrentCommitError):
        wd.commit(replace_all=map_d, base_version=base)


def test_disjoint_fastpath_is_conservative_about_history(spark, tmp_path):
    """The fast path must refuse when an intervening commit's touched
    set is unknowable: a metadata commit without a recorded set, a
    pre-feature manifest, or a vacuumed-away intervening manifest."""
    path = str(tmp_path / "occ2")
    t = ManifestTable(path, "kspan")
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, "a"), (1, "b")], "kspan int, v string")))
    base = t.version
    # stale writer against span 1, intervening delete_keys on span 0:
    # delete_keys RECORDS its touched span, so this still fast-paths
    t.delete_keys(
        spark.createDataFrame([(0, "a")], "kspan int, v string"), on=["v"])
    w = ManifestTable(path, "kspan")
    mp = w.write_data(
        spark.createDataFrame([(1, "b1")], "kspan int, v string"))
    assert w.commit(replace={1: mp[1]}, base_version=base) == 3
    # intervening manifest vacuumed away -> conservative rebase (two
    # disjoint commits so the FIRST is an archived manifest the check
    # must load; vacuum removes it)
    base2 = t.version
    t.commit(append=t.write_data(
        spark.createDataFrame([(5, "q")], "kspan int, v string")))
    t.commit(append=t.write_data(
        spark.createDataFrame([(6, "r")], "kspan int, v string")))
    t.vacuum(keep_versions=0)
    w2 = ManifestTable(path, "kspan")
    mp2 = w2.write_data(
        spark.createDataFrame([(1, "b2")], "kspan int, v string"))
    with pytest.raises(ConcurrentCommitError):
        w2.commit(replace={1: mp2[1]}, base_version=base2)


def test_restore_to_pre_schema_version_drops_cached_schema(
    spark, tmp_path
):
    """Restoring to a version whose manifest predates schema recording
    must also drop the evolved StructType cached on the object —
    otherwise the NEXT commit re-merges the stale evolved schema into
    the manifest and reads resurrect the rolled-back column."""
    path = str(tmp_path / "rs")
    t = ManifestTable(path, "kspan")
    t.commit(replace_all={})  # v1: empty commit, no schema recorded
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, 1)], "kspan int, a int")))
    t.commit(append=t.write_data(
        spark.createDataFrame([(0, 2, "x")], "kspan int, a int, b string")))
    assert t.read(spark).columns == ["kspan", "a", "b"]
    t.restore(1)  # v1's manifest predates any schema
    assert t._schema is None
    t.commit(replace=t.write_data(
        spark.createDataFrame([(0, 9)], "kspan int, a int")))
    assert t.read(spark).columns == ["kspan", "a"]  # b must NOT resurrect


def test_pointer_crash_self_heals(spark, table):
    """Crash between the commit point (_versions/<N>.json) and the
    pointer update: the next load adopts the committed version and
    repairs the pointer."""
    import json

    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    mapping = table.write_data(mk_df(spark, [(0, "v2")]))
    committed = {
        "version": 2,
        "spans": {str(s): fs for s, fs in mapping.items()},
    }
    vdir = os.path.join(table.path, "_versions")
    with open(os.path.join(vdir, "2.json"), "w") as f:
        json.dump(committed, f)  # commit point landed; pointer did not
    assert table.version == 2
    assert read_vals(table, spark) == [(0, "v2")]
    with open(os.path.join(table.path, "manifest.json")) as f:
        assert json.load(f)["version"] == 2  # pointer repaired


def test_history_lists_commits_newest_first(spark, table):
    table.commit(replace=table.write_data(mk_df(spark, [(0, "v1")])))
    table.commit(append=table.write_data(mk_df(spark, [(1, "v2")])))
    h = table.history()
    assert [e["version"] for e in h] == [2, 1]
    assert h[0]["spans"] == 2 and h[0]["files"] == 2
    assert h[1]["spans"] == 1
    assert all(e["committed_at"] is not None for e in h)
    # a vacuumed version remains listed, membership gone
    table.vacuum(keep_versions=0)
    h = table.history()
    assert [e["version"] for e in h] == [2, 1]
    assert h[0]["spans"] == 2  # current: readable through the pointer
    assert h[1]["spans"] is None


def test_commit_algebra_model_based(spark, table):
    """Model-based: a random sequence of replace/append/drop/vacuum
    operations against an in-memory dict model — the committed
    snapshot's spans and row contents must match the model after every
    step, and version history must stay readable until vacuumed."""
    import random

    rng = random.Random(1234)
    model: dict[int, list[str]] = {}  # span -> list of row values
    seq = 0
    for step in range(14):
        op = rng.choice(["replace", "append", "drop", "vacuum"])
        spans = sorted(rng.sample(range(4), rng.randint(1, 2)))
        if op in ("replace", "append"):
            rows = []
            for s in spans:
                for _ in range(rng.randint(1, 3)):
                    rows.append((s, f"v{seq}"))
                    seq += 1
            mapping = table.write_data(mk_df(spark, rows))
            if op == "replace":
                table.commit(replace=mapping)
                for s in spans:
                    model[s] = [v for sp, v in rows if sp == s]
            else:
                table.commit(append=mapping)
                for s in spans:
                    model.setdefault(s, []).extend(
                        v for sp, v in rows if sp == s
                    )
        elif op == "drop":
            table.commit(drop=spans)
            for s in spans:
                model.pop(s, None)
        else:
            table.vacuum(keep_versions=2)
        got = read_vals(table, spark) or []
        want = sorted((s, v) for s, vs in model.items() for v in vs)
        assert got == want, f"step {step} ({op} {spans})"
        assert table.spans().keys() == {
            s for s, vs in model.items() if vs
        }
    # history is consistent: versions strictly descending, current first
    versions = [e["version"] for e in table.history()]
    assert versions == sorted(versions, reverse=True)
    assert versions[0] == table.version


def test_base_version_from_the_future_raises(spark, table):
    """A base snapshot AHEAD of the current manifest (regressed table
    pointer or caller bug) must refuse loudly — the span-disjointness
    walk over an empty intervening range would otherwise vacuously
    pass and the commit would silently land."""
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a")])))
    mp = table.write_data(mk_df(spark, [(0, "b")]))
    with pytest.raises(ConcurrentCommitError, match="future"):
        table.commit(replace=mp, base_version=table.version + 3)
    # and the refused commit left no trace
    assert read_vals(table, spark) == [(0, "a")]


def test_reader_snapshot_survives_compaction_and_vacuum(spark, table):
    """Snapshot isolation under maintenance churn: a reader holding a
    resolved plan (fixed file list) from version N keeps reading N's
    rows while compact + vacuum land, because vacuum's retention guard
    keeps every file referenced by a manifest inside the retention
    window. Past retention, the stale version resolves to nothing —
    loudly, not to wrong rows."""
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a0"), (1, "b0")])))
    table.commit(append=table.write_data(mk_df(spark, [(0, "a1")])))
    v_n = table.version  # the reader's snapshot (2 files in span 0)
    reader = table.read(spark)  # resolved file list pinned at v_n
    # maintenance lands: compaction rewrites span 0, then an overwrite
    table.compact(spark, min_files=2)
    table.commit(replace=table.write_data(mk_df(spark, [(0, "a2")])))
    # vacuum WITH v_n inside the retention window: the reader's files
    # (and time travel to v_n) must survive
    table.vacuum(keep_versions=table.version - v_n + 1)
    assert sorted((r["kspan"], r["v"]) for r in reader.collect()) == [
        (0, "a0"), (0, "a1"), (1, "b0"),
    ]
    assert read_vals(table, spark, version=v_n) == [
        (0, "a0"), (0, "a1"), (1, "b0"),
    ]
    # current state unaffected by retention bookkeeping
    assert read_vals(table, spark) == [(0, "a2"), (1, "b0")]
    # past retention the pruned version raises instead of misreading
    table.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="no archived manifest"):
        table.read(spark, version=v_n)


def test_append_materializing_narrows_to_intersecting_spans(
    spark, tmp_path
):
    """r11 advice: rule 2 must materialize ONLY the spans whose own
    tombstone key sets intersect the batch keys — one matched key must
    no longer force a rewrite of every span with pending deletes."""
    t = ManifestTable(str(tmp_path / "n"), "kspan")
    t.commit(
        replace=t.write_data(
            mk_df(spark, [(0, "k1"), (1, "k2"), (2, "k3")])
        )
    )
    # tombstone k1 in span 0 and k2 in span 1 (two separate spans)
    t.delete_keys(mk_df(spark, [(0, "k1")]), on=["v"])
    t.delete_keys(mk_df(spark, [(1, "k2")]), on=["v"])
    assert t.tombstoned_spans() == [0, 1]

    # re-append k1 into span 2 (disjoint from both tombstoned spans):
    # span 0's tombstone intersects the batch key and MUST materialize;
    # span 1's (k2) does not and MUST survive as a pending tombstone
    mapping = t.write_data(mk_df(spark, [(2, "k1")]))
    v = t.append_materializing(
        spark, mapping, keys=mk_df(spark, [(2, "k1")]).select("v")
    )
    assert v == t.version
    assert t.tombstoned_spans() == [1], (
        "narrowing failed: span 1's non-intersecting tombstone was "
        "materialized (or span 0's intersecting one survived)"
    )
    # the re-appended k1 row is live; k2 is still deleted; k3 untouched
    assert read_vals(table=t, spark=spark) == [(2, "k1"), (2, "k3")]


def test_append_materializing_pins_base_version(spark, tmp_path):
    """r11 advice: the append commit carries the snapshot's lineage, so
    a tombstone racing into the appended spans between the rule checks
    and the commit fails loudly instead of silently key-hiding the new
    rows."""
    t = ManifestTable(str(tmp_path / "p"), "kspan")
    t.commit(replace=t.write_data(mk_df(spark, [(0, "a"), (1, "b")])))

    orig_commit = t.commit

    def racing_commit(*a, **kw):
        # a delete_keys lands on span 0 AFTER append_materializing took
        # its snapshot but BEFORE its append commit
        t.commit = orig_commit
        t.delete_keys(mk_df(spark, [(0, "a")]), on=["v"])
        return orig_commit(*a, **kw)

    mapping = t.write_data(mk_df(spark, [(0, "a2")]))
    t.commit = racing_commit
    with pytest.raises(ConcurrentCommitError):
        t.append_materializing(
            spark, mapping, keys=mk_df(spark, [(0, "a2")]).select("v")
        )
