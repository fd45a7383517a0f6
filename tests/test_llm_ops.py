"""Semantic invariants of the round-3 LLM-pipeline operators that the
row/oracle gate cannot express: SemDeDup's greedy guarantees and the
nested-sample property of stratified hash sampling."""

from __future__ import annotations

import numpy as np
import pytest

from updatable_persistent_map_reduce_spark.operators import all_queries

QUERIES = all_queries()


@pytest.fixture(scope="module")
def semdedup(spark, sf_dir):
    rows = QUERIES["q_dedup_semantic"].fn(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    for v in emb.values():
        v /= np.linalg.norm(v)
    return rows, emb


def test_semdedup_covers_every_vector_once(semdedup, spark, sf_dir):
    rows, emb = semdedup
    assert sorted(r.vec_id for r in rows) == sorted(emb)


def test_semdedup_dropped_vectors_have_a_qualifying_keeper(semdedup):
    from updatable_persistent_map_reduce_spark.operators.dedup import SEM_TAU

    rows, emb = semdedup
    kept = {(r.cell, r.vec_id) for r in rows if r.kept}
    dropped = [r for r in rows if not r.kept]
    assert dropped, "sf data should produce at least one semantic dup"
    for r in dropped:
        assert (r.cell, r.kept_by) in kept, r
        assert float(emb[r.vec_id] @ emb[r.kept_by]) >= SEM_TAU - 1e-9, r


def test_semdedup_kept_set_is_an_independent_set(semdedup):
    """Greedy guarantee: no two KEPT members of a cell are mutual
    semantic duplicates (each later keeper was checked against all
    earlier keepers)."""
    from updatable_persistent_map_reduce_spark.operators.dedup import SEM_TAU

    rows, emb = semdedup
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        if r.kept:
            by_cell.setdefault(r.cell, []).append(r.vec_id)
    for members in by_cell.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert float(emb[a] @ emb[b]) < SEM_TAU + 1e-9, (a, b)


def test_semdedup_deterministic(spark, sf_dir, semdedup):
    rows, _ = semdedup
    again = QUERIES["q_dedup_semantic"].fn(spark, sf_dir).collect()
    key = lambda r: r.vec_id  # noqa: E731
    assert sorted(rows, key=key) == sorted(again, key=key)


def test_stratified_sample_nests_inside_higher_rates(spark, sf_dir):
    """Same hash, different rates => membership nests: the 10% English
    stratum is exactly the flat 10% sample restricted to English, and
    every stratum is a subset of what a higher rate would keep."""
    flat = {
        r.doc_id
        for r in QUERIES["q_sample_hash"].fn(spark, sf_dir).collect()
        if r.lang == "en"
    }
    strat = QUERIES["q_sample_stratified"].fn(spark, sf_dir).collect()
    assert {r.doc_id for r in strat if r.lang == "en"} == flat
    # non-en strata (rates >= 20%) must contain their own 10% core
    from updatable_persistent_map_reduce_spark.operators.pipeline import (
        _KNUTH,
        _M32,
    )

    kept = {r.doc_id for r in strat}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        if (d.doc_id * _KNUTH) % _M32 % 100 < 10:
            assert d.doc_id in kept, d.doc_id
