"""Round-11 additions: int64-safe mask hash, NULL-text score parity,
single-sort attribution, tokenizer-coverage audit, takedown cascade.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.operators import all_queries

QUERIES = all_queries()


def test_mask_hash_in_int64_at_any_position(spark):
    """The r11 advice fix: pos^2 is reduced mod 2^32 BEFORE the MIX
    multiply, so the mask hash stays inside int64 at ANY position. The
    unreduced form left int64 near pos ~ 3e6 (ANSI DuckDB raises,
    non-ANSI Spark silently wraps — divergence, not a shared failure).
    Pin: at positions far past that bound, Spark's engine expression,
    DuckDB's oracle expression, and an arbitrary-precision Python
    reference all agree; and for positions below 65536 the reduction
    is the identity (fixture results unchanged)."""
    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _KNUTH,
        _M32,
        _MLM_POS_MIX,
    )

    doc_id = 123
    positions = [1, 2147, 65_535, 65_536, 3_000_000, 50_000_000]

    def ref(pos):
        return (doc_id * _KNUTH + (pos * pos % _M32) * _MLM_POS_MIX) % _M32

    # Spark: the exact engine sub-expression over long positions
    rows = (
        spark.createDataFrame([(p,) for p in positions], "pos long")
        .select(
            "pos",
            (
                (
                    F.lit(doc_id) * _KNUTH
                    + (F.col("pos") * F.col("pos") % _M32)
                    * F.lit(_MLM_POS_MIX)
                )
                % _M32
            ).alias("h"),
        )
        .collect()
    )
    got_spark = {r.pos: r.h for r in rows}
    # DuckDB: the exact oracle sub-expression (ANSI — would RAISE on
    # int64 overflow, so a green run proves the bound, not just parity)
    con = duckdb.connect()
    got_duck = {
        p: con.execute(
            # CAST: in the registered oracle the position comes from
            # range(), which is already BIGINT; a bare test literal
            # would be INT32 and overflow at the multiply
            f"SELECT ({doc_id} * {_KNUTH} + "
            f"((CAST({p} AS BIGINT) * CAST({p} AS BIGINT)) % {_M32}) "
            f"* {_MLM_POS_MIX}) % {_M32}"
        ).fetchone()[0]
        for p in positions
    }
    for p in positions:
        assert got_spark[p] == got_duck[p] == ref(p), p
    # identity below 65536: the reduced and unreduced forms coincide
    for p in [1, 2147, 65_535]:
        unreduced = (doc_id * _KNUTH + p * p * _MLM_POS_MIX) % _M32
        assert ref(p) == unreduced, p


def test_qc_score_null_text_is_zero(spark):
    """NULL-text docs score 0 (not NULL) in the shared classifier
    column, matching QC_SCORE_SQL's COALESCE — so q_preference_pairs
    ranks a NULL-text doc identically in both engines (r10 advice)."""
    from updatable_persistent_map_reduce_spark.operators.text_analysis import (
        qc_score_col,
    )

    rows = (
        spark.createDataFrame(
            [(1, None), (2, ""), (3, "the the")],
            "doc_id long, text string",
        )
        .select("doc_id", qc_score_col(F.col("text")).alias("score"))
        .collect()
    )
    got = {r.doc_id: r.score for r in rows}
    assert got[1] == 0 and got[2] == 0
    assert got[3] is not None and got[3] != 0


def test_tokenizer_coverage_invariants(spark, sf_dir):
    """Structural invariants of the audit on the real fixture: every
    (lang, source) group satisfies n_words <= n_subwords <= n_chars
    (each word is >= 1 subword, each subword >= 1 char), rates live in
    [0, 10000] bp, and the corpus-wide totals agree with
    q_tokenize_bpe's per-doc accounting on words/chars (the merge
    TABLES differ — iterative vs single-generation — so subword totals
    legitimately differ)."""
    rows = QUERIES["q_tokenizer_coverage"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.n_words > 0
        assert r.n_words <= r.n_subwords <= r.n_chars, r
        assert 0 <= r.fallback_bp <= 10000, r
        assert r.chars_per_subword_bp >= 10000, r  # >= 1 char/subword
    tb = QUERIES["q_tokenize_bpe"].fn(spark, sf_dir).collect()
    assert sum(r.n_words for r in rows) == sum(x.n_words for x in tb)
    assert sum(r.n_chars for r in rows) == sum(x.n_chars for x in tb)


def test_tokenizer_coverage_early_exhausted_corpus(spark):
    """A corpus whose pairs exhaust before all 6 training generations:
    the Spark loop stops early and the oracle's LEFT JOIN ON TRUE
    generations degrade to the identity (an empty rule's NULL
    comparisons all fail) — engine == oracle instead of the CROSS JOIN
    form's emptied-vocabulary divergence."""
    import os
    import tempfile

    # one distinct bigram: training learns 'ab' in gen 1, then runs dry
    rows_in = [(1, "ab ab", "en", "s1"), (2, "ab", "en", "s1")]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows_in, "doc_id long, text string, lang string, source string"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = QUERIES["q_tokenizer_coverage"].fn(spark, td).collect()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{td}/documents.parquet/*.parquet'"
        )
        want = con.execute(
            QUERIES["q_tokenizer_coverage"].oracle
        ).fetchall()
    assert len(got) == len(want) == 1
    g = got[0]
    assert tuple(g) == want[0]
    # 'ab' merged everywhere: 3 word occurrences, each ONE subword
    assert (g.n_words, g.n_subwords, g.n_chars) == (3, 3, 6)
    assert g.fallback_bp == 0


def _takedown_docs(spark):
    return spark.createDataFrame(
        [
            (i, f"hash join window doc {i} " + "common text here " * 3)
            for i in range(20)
        ]
        + [(99, "hash join window " * 3)],
        "doc_id long, text string",
    )


def test_text_index_takedown_lifecycle(spark):
    """InvertedIndex.delete: the victim stops scoring the moment the
    dead sentinel commits (zero postings rewritten), stats track the
    takedown, compact() materializes without changing results, and a
    later re-upsert of the id scores its NEW text only — the old
    postings stay dead (the live_gen pin; without it they would
    physically resurrect, since they exist until compact)."""
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.text_index import (
        InvertedIndex,
    )

    docs = _takedown_docs(spark)
    idx = InvertedIndex(spark, tempfile.mkdtemp(prefix="ti_td_"))
    idx.build(docs)
    terms = ["hash", "join", "window"]
    assert idx.bm25(terms, k=1).collect()[0].doc_id == 99
    files_before = sum(len(v) for v in idx._post.spans().values())
    idx.delete(spark.createDataFrame([(99,)], "doc_id long"))
    # MoR: the delete wrote NO postings files
    assert sum(len(v) for v in idx._post.spans().values()) == files_before
    post = idx.bm25(terms, k=25).collect()
    assert 99 not in {r.doc_id for r in post}
    assert idx.stats()["n_docs"] == 20
    # idempotent re-run
    idx.delete(spark.createDataFrame([(99,)], "doc_id long"))
    assert idx.stats()["n_docs"] == 20
    idx.compact()
    assert [tuple(r) for r in idx.bm25(terms, k=25).collect()] == [
        tuple(r) for r in post
    ]
    # fresh index: re-upsert WITHOUT compacting first
    idx2 = InvertedIndex(spark, tempfile.mkdtemp(prefix="ti_td2_"))
    idx2.build(docs)
    idx2.delete(spark.createDataFrame([(99,)], "doc_id long"))
    idx2.upsert(
        spark.createDataFrame(
            [(99, "zebra zebra zebra")], "doc_id long, text string"
        )
    )
    assert idx2.stats()["n_docs"] == 21
    # old text's postings stay dead...
    assert 99 not in {r.doc_id for r in idx2.bm25(terms, k=25).collect()}
    # ...new text's postings are live
    assert 99 in {r.doc_id for r in idx2.bm25(["zebra"], k=5).collect()}


def test_neardup_index_takedown_lifecycle(spark):
    """NearDupIndex.delete: tombstones land in the victim's own
    recomputed spans, probes stop returning it immediately, probe-side
    span pruning is UNCHANGED by the delete (the probe-cost pin), and
    a subsequent append whose rows hash into tombstoned spans
    triggers a MINOR COMPACTION of exactly those spans (materializing
    the delete) instead of blocking ingest — including the re-append
    of the taken-down id itself, which lands exactly one live copy."""
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.neardup_index import (
        NearDupIndex,
    )

    docs = _takedown_docs(spark)
    nd = NearDupIndex(spark, tempfile.mkdtemp(prefix="nd_td_"))
    nd.build(docs)
    probe = spark.createDataFrame(
        [(-1, "hash join window " * 3)], "doc_id long, text string"
    )
    p1 = nd.probe(probe).collect()
    cost1 = dict(nd.last_probe)
    assert any(r.doc_b == 99 and r.jaccard_bp == 10000 for r in p1)
    nd.delete(
        spark.createDataFrame(
            [(99, "hash join window " * 3)], "doc_id long, text string"
        )
    )
    p2 = nd.probe(probe).collect()
    cost2 = dict(nd.last_probe)
    assert not any(r.doc_b == 99 for r in p2)
    # probe-cost pin: tombstones must not widen the probed span set
    assert cost2["band_spans_read"] == cost1["band_spans_read"]
    # re-append of the taken-down id WITH REVISED TEXT — the hard
    # case: the new band rows hash to DIFFERENT spans than the
    # tombstones, so a span-overlap-only compaction would leave stale
    # doc-99 tombstones that hide (and on compact, destroy) the live
    # rows; append_materializing detects the tombstoned key and
    # materializes ALL tombstoned spans first
    revised = "scan filter sort " * 3
    nd.append(
        spark.createDataFrame(
            [(99, revised)], "doc_id long, text string"
        )
    )
    assert nd._sh.tombstoned_keys(spark) is None  # materialized away
    assert nd._bands.tombstoned_keys(spark) is None
    probe_rev = spark.createDataFrame(
        [(-2, revised)], "doc_id long, text string"
    )
    p3 = nd.probe(probe_rev).collect()
    assert sum(r.doc_b == 99 for r in p3) == 1  # live under NEW text
    assert not any(
        r.doc_b == 99 for r in nd.probe(probe).collect()
    )  # old text gone
    # explicit full compact still works and changes nothing
    nd.compact()
    assert sorted(map(tuple, nd.probe(probe_rev).collect())) == sorted(
        map(tuple, p3)
    )


def test_neardup_delete_of_never_indexed_id_is_a_true_noop(spark):
    """Review regression: delete() of an id that was NEVER indexed
    (or a replayed takedown of an already-deleted id) must write no
    tombstones — a stray doc-keyed tombstone would force pointless
    minor compactions on later appends into its spans and, worse,
    silently anti-join away any LIVE rows sharing the id."""
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.neardup_index import (
        NearDupIndex,
    )

    nd = NearDupIndex(spark, tempfile.mkdtemp(prefix="nd_noop_"))
    nd.build(_takedown_docs(spark))
    ghost = spark.createDataFrame(
        [(777, "never indexed text")], "doc_id long, text string"
    )
    nd.delete(ghost)  # never indexed: must not tombstone
    nd.append(ghost)  # and its first append must succeed
    assert nd._sh.tombstoned_keys(spark) is None
    # replayed takedown of a REAL victim: second call is a no-op that
    # does not double the tombstone set
    vic = spark.createDataFrame(
        [(99, "hash join window " * 3)], "doc_id long, text string"
    )
    nd.delete(vic)
    t1 = nd._sh.tombstoned_keys(spark).count()
    nd.delete(vic)
    assert nd._sh.tombstoned_keys(spark).count() == t1 == 1


def test_ann_upsert_after_delete_materializes_and_lands_one_copy(spark):
    """The ANN legs of the append-time minor compaction: after
    delete(), an upsert whose vectors land in tombstoned cells
    materializes those cells first — ingest proceeds, a re-upserted
    vec_id serves exactly once, and probes stay exact."""
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.ann_index import (
        IvfPqIndex,
    )

    vecs = [
        (i, [float((i * 7 + d * 3) % 13) for d in range(8)])
        for i in range(40)
    ]
    idx = IvfPqIndex(
        spark, tempfile.mkdtemp(prefix="ann_mc_"), n_cells=4, m=4, ksub=4
    )
    idx.build(
        spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    )
    victim = vecs[5]
    vdf = spark.createDataFrame(
        [victim], "vec_id long, embedding array<float>"
    )
    idx.delete(vdf)
    got = idx.search([(-1, victim[1])], k=3, nprobe=4).collect()
    assert victim[0] not in {r.vec_id for r in got}
    # re-upsert with a RE-EMBEDDED vector that assigns to a different
    # cell than the tombstones — append_materializing must clear the
    # stale same-key tombstones everywhere or the key-global read
    # anti-join hides (and compact destroys) the live row
    new_emb = [float(x) for x in vecs[30][1]]  # far from victim's cell
    vdf2 = spark.createDataFrame(
        [(victim[0], new_emb)], "vec_id long, embedding array<float>"
    )
    idx.upsert(vdf2)
    assert idx._listed.tombstoned_keys(spark) is None
    assert idx._codes.tombstoned_keys(spark) is None
    got = idx.search([(-1, new_emb)], k=5, nprobe=4).collect()
    assert sum(r.vec_id == victim[0] for r in got) == 1
    top1 = next(r for r in got if r.rnk == 1)  # order-safe: rnk, not
    # collect() row order (a window filter does not guarantee it)
    assert top1.cos_sim == 1.0  # the re-embedded vector serves
    idx.compact()
    after = idx.search([(-1, new_emb)], k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, got))


def test_text_index_random_interleavings_equal_rebuild(spark):
    """The incremental≡full property applied to the serving index:
    for seeded random interleavings of upsert / delete / compact /
    refresh_stats, the incrementally-maintained InvertedIndex must
    rank EXACTLY like a fresh index built from the surviving
    latest-wins corpus — same top-k doc ids AND rounded scores (which
    pins n_docs, avgdl, df, tf, and the live/dead posting set all at
    once). This is the reference's defining property
    (Executer.cs:91,240-261) extended over the r11 delete leg."""
    import random
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.text_index import (
        InvertedIndex,
    )

    words = ["hash", "join", "window", "scan", "merge", "probe"]

    def text_for(rng):
        return " ".join(rng.choices(words, k=rng.randint(3, 12)))

    terms = ["hash", "join", "window"]
    for seed in (7, 23):
        rng = random.Random(seed)
        model: dict[int, str] = {
            i: text_for(rng) for i in range(12)
        }
        idx = InvertedIndex(
            spark,
            tempfile.mkdtemp(prefix=f"ti_prop{seed}_"),
            n_spans=8,
            n_doc_spans=4,
            auto_compact_files_per_span=None,
        )
        idx.build(
            spark.createDataFrame(
                list(model.items()), "doc_id long, text string"
            )
        )
        for _ in range(8):
            op = rng.choice(["upsert", "delete", "compact", "refresh"])
            if op == "upsert":
                batch = {
                    rng.randint(0, 19): text_for(rng)
                    for _ in range(rng.randint(1, 3))
                }
                idx.upsert(
                    spark.createDataFrame(
                        list(batch.items()), "doc_id long, text string"
                    )
                )
                model.update(batch)
            elif op == "delete":
                ids = rng.sample(sorted(model) + [99], 2)
                idx.delete(
                    spark.createDataFrame(
                        [(i,) for i in ids], "doc_id long"
                    )
                )
                for i in ids:
                    model.pop(i, None)
            elif op == "compact":
                idx.compact()
            else:
                idx.refresh_stats()
        fresh = InvertedIndex(
            spark,
            tempfile.mkdtemp(prefix=f"ti_fresh{seed}_"),
            n_spans=8,
            n_doc_spans=4,
        )
        fresh.build(
            spark.createDataFrame(
                list(model.items()), "doc_id long, text string"
            )
        )
        got = [tuple(r) for r in idx.bm25(terms, k=25).collect()]
        want = [tuple(r) for r in fresh.bm25(terms, k=25).collect()]
        assert got == want, (seed, got, want)
        assert idx.refresh_stats() == fresh.refresh_stats(), seed


def test_neardup_index_random_interleavings_equal_rebuild(spark):
    """incremental≡full for the band index: seeded random append /
    delete / compact sequences must leave probe() returning exactly
    the pairs a fresh index over the surviving corpus returns — the
    maintained band+shingle tables and their tombstones never drift
    from the rebuild."""
    import random
    import tempfile

    from updatable_persistent_map_reduce_spark.plans.neardup_index import (
        NearDupIndex,
    )

    base = "hash join window scan merge probe filter sort"

    def text_for(i):
        # doc i is a near-dup of doc i % 4 (4 content families with
        # per-doc suffix noise) so probes always have real matches
        return f"{base} fam{i % 4} {base} tail{i}"

    probe = None
    for seed in (11,):
        rng = random.Random(seed)
        model: dict[int, str] = {i: text_for(i) for i in range(10)}
        nd = NearDupIndex(
            spark,
            tempfile.mkdtemp(prefix=f"nd_prop{seed}_"),
            n_spans=16,
            n_doc_spans=4,
        )
        nd.build(
            spark.createDataFrame(
                list(model.items()), "doc_id long, text string"
            )
        )
        next_id = 10
        for _ in range(6):
            op = rng.choice(["append", "delete", "compact"])
            if op == "append":
                batch = {
                    next_id + j: text_for(next_id + j)
                    for j in range(rng.randint(1, 2))
                }
                next_id += len(batch)
                nd.append(
                    spark.createDataFrame(
                        list(batch.items()), "doc_id long, text string"
                    )
                )
                model.update(batch)
            elif op == "delete":
                ids = rng.sample(sorted(model), 2)
                nd.delete(
                    spark.createDataFrame(
                        [(i, model[i]) for i in ids],
                        "doc_id long, text string",
                    )
                )
                for i in ids:
                    del model[i]
            else:
                nd.compact()
        fresh = NearDupIndex(
            spark,
            tempfile.mkdtemp(prefix=f"nd_fresh{seed}_"),
            n_spans=16,
            n_doc_spans=4,
        )
        fresh.build(
            spark.createDataFrame(
                list(model.items()), "doc_id long, text string"
            )
        )
        probe = spark.createDataFrame(
            [(-1, text_for(0)), (-2, text_for(1))],
            "doc_id long, text string",
        )
        got = sorted(map(tuple, nd.probe(probe).collect()))
        want = sorted(map(tuple, fresh.probe(probe).collect()))
        assert got == want and want, (seed, got, want)


def test_takedown_cascade_metric_semantics(spark, sf_dir):
    """The registered cascade's before/after pairs: the victim is
    present in its artifacts before the delete and absent after, and
    the ANN top-1 flips from the victim itself to a survivor."""
    rows = {
        r.metric: r.value
        for r in QUERIES["q_takedown_cascade"].fn(spark, sf_dir).collect()
    }
    victim = rows["victim_doc"]
    assert rows["text_victim_hits_before"] == 1  # victim was top-ranked
    assert rows["text_victim_hits_after"] == 0
    assert rows["text_top1_after"] != victim
    assert rows["neardup_victim_pairs_before"] >= 1
    assert rows["neardup_victim_pairs_after"] == 0
    assert rows["ann_top1_before"] == victim  # nearest to itself
    assert rows["ann_top1_after"] != victim
    n_after = sum(
        v for m, v in rows.items() if m.startswith("view_docs_")
    )
    assert n_after == rows["text_n_docs_after"]


def test_graph_fixpoint_round_plans_are_equi_joins(
    spark, sf_dir, monkeypatch
):
    """Restores the positive plan pins the a6e6dbc guard-checkpoint
    change removed from the audit (r10 verdict item 5): the REGISTERED
    queries' per-round frames are captured at the moment they are
    localCheckpoint'ed — i.e. the real pre-checkpoint physical plans
    the fixpoint loops execute — and every one must be built from hash
    equi-joins: no cartesian product, no nested-loop join, no pickled-
    row Python anywhere in any round of q_pagerank or q_graph_kcore."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the facade
    # base in Spark 4 and instances carry the classic subclass's own
    # localCheckpoint, which would shadow a base-class patch
    from pyspark.sql.classic.dataframe import DataFrame

    captured: list[str] = []
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **k):
        captured.append(
            self._jdf.queryExecution().executedPlan().toString()
        )
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)

    # k-core at the smoke sf can converge with ZERO peel rounds (every
    # node is already >= k), which checkpoints no round frames — drive
    # the SHARED kcore_peel_trace on a planted path graph instead: its
    # degree-1 endpoints peel one layer per round (k=2), guaranteeing
    # several real rounds of the identical registered loop.
    from updatable_persistent_map_reduce_spark.operators.graph import (
        kcore_peel_trace,
    )

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "u long, v long"
    )

    runs = {
        "q_pagerank": lambda: QUERIES["q_pagerank"]
        .fn(spark, sf_dir)
        .collect(),
        "kcore_peel_trace": lambda: kcore_peel_trace(
            path_edges, k=2
        ).collect(),
    }
    for q, run in runs.items():
        captured.clear()
        run()
        assert len(captured) >= 3, q  # the loop really checkpoints
        joiny = 0
        for plan in captured:
            assert "CartesianProduct" not in plan, q
            # at most ONE BroadcastNestedLoopJoin per round plan: the
            # sanctioned 1-row scalar cross join (pagerank's broadcast
            # dangling-mass aggregate). An edge-sized NLJ would show as
            # a second occurrence — and the equi-join count below going
            # to zero.
            assert plan.count("BroadcastNestedLoopJoin") <= 1, (q, plan)
            assert "BatchEvalPython" not in plan, q
            if any(
                m in plan
                for m in (
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastHashJoin",
                )
            ):
                joiny += 1
        # the per-round update frames join on the edge key
        assert joiny >= 2, (q, len(captured))


def test_attribution_single_sort_plan(spark, sf_dir):
    """The derived descending rank (rd = n - ra + 1) must leave exactly
    ONE Sort below the window in the physical plan — the r10 form
    planned two opposite-order sorts over the same cid exchange."""
    plan = QUERIES["q_attribution"].fn(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    import re

    # assert directly on the extracted Sort operator list (r11 advice:
    # the previous substring counts were vacuous): exactly one Sort
    # orders by the touch timestamp, it is ASCENDING, it partitions by
    # the window key, and no DESC tts sort survives anywhere
    sorts = re.findall(r"Sort \[([^\]]*)\]", plan)
    tts_sorts = [s for s in sorts if "tts" in s]
    assert len(tts_sorts) == 1, tts_sorts
    assert any(
        "tts" in s and "ASC" in s for s in tts_sorts
    ), tts_sorts
    assert "DESC" not in tts_sorts[0], tts_sorts
    assert "cid" in tts_sorts[0], tts_sorts  # sorted within the cid window
