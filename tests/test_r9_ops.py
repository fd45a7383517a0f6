"""Semantic invariants of the round-9 operators that the row/oracle
gate cannot express: the oracle proves Spark == DuckDB, these prove
the AGREED answer has the properties the operator exists to provide
(both engines agreeing on a wrong pipeline would still hash-match)."""

from __future__ import annotations

from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.operators import all_queries

QUERIES = all_queries()


def test_html_extract_strips_markup_and_bans_the_nav(spark, sf_dir):
    """Every clean_text is tag-free, the pure-link nav div's words are
    gone, the script/style payloads are gone, and the document's own
    words survive — the actual boilerplate-extraction contract."""
    rows = QUERIES["q_html_extract"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert "<" not in r.clean_text and ">" not in r.clean_text, r
        # nav anchor text banned by link-density banding
        for nav_word in ("home", "about", "contact"):
            assert nav_word not in r.clean_text.split(), r
        # script/style bodies never leak into text
        assert "var v=" not in r.clean_text
        assert "margin:0" not in r.clean_text
        # the document's first word survives extraction
        first = docs[r.doc_id].split()[0]
        assert first in r.clean_text.split(), (r.doc_id, first)
        assert r.dropped_segments >= 1  # the nav div, at minimum
        assert 0 < r.link_chars < r.text_chars


def test_chat_template_turns_alternate_and_cap_holds(spark, sf_dir):
    """Templates parse back into exactly n_turns pieces, roles strictly
    alternate user/assistant from turn 1, and the 8-turn context cap
    is never exceeded."""
    rows = QUERIES["q_chat_template"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_turns <= 8
        assert len(r.template) == r.template_chars
        pieces = [p for p in r.template.split("<|end|>") if p]
        assert len(pieces) == r.n_turns, r.user_id
        for i, p in enumerate(pieces):
            want = "user" if i % 2 == 0 else "assistant"
            assert p.startswith(f"<|{want}|>"), (r.user_id, i, p[:30])


def test_substring_remove_accounting_and_residue(spark, sf_dir):
    """removed_chars + len(clean_text) == original length for every
    doc, zero-span docs are untouched, and no surviving doc still
    holds a REMOVED window verbatim (the excision actually excised
    the detected spans from the surviving text)."""
    rows = QUERIES["q_dedup_substring_remove"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    n_touched = 0
    for r in rows:
        orig = docs[r.doc_id]
        assert r.removed_chars + len(r.clean_text) == len(orig), r.doc_id
        if r.n_dup_spans == 0:
            assert r.clean_text == orig
        else:
            n_touched += 1
    assert n_touched > 0, "synthetic corpus must have cross-doc repeats"


def test_interval_overlap_bounds_and_coverage(spark, sf_dir):
    """Per-window totals are sane: overlap_ms is nonnegative (a
    zero-length session — one event that day — strictly inside a
    window overlaps with measure zero, legitimately) and bounded by
    n_sessions * window length; a 3h window inside the event month
    overlaps at least one session at every sf, and most windows have
    positive total overlap."""
    rows = QUERIES["q_join_interval_overlap"].fn(spark, sf_dir).collect()
    assert rows
    positive = 0
    for r in rows:
        assert r.n_sessions >= 1
        assert 0 <= r.overlap_ms <= r.n_sessions * 10_800_000, r
        positive += int(r.overlap_ms > 0)
    assert positive > len(rows) * 9 // 10, (positive, len(rows))


def test_ngram_novelty_conservation_and_first_doc(spark, sf_dir):
    """The lowest doc_id is 100% novel by definition, novelty is a
    valid basis-point value, and the corpus-wide novel count equals
    the number of DISTINCT shingles (each shingle is first-seen in
    exactly one doc — conservation)."""
    rows = QUERIES["q_ngram_novelty"].fn(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    first = by_id[min(by_id)]
    assert first.n_novel == first.n_shingles
    assert first.novelty_bp == 10000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert 0 <= r.novelty_bp <= 10000
    from updatable_persistent_map_reduce_spark.functions.text import (
        shingle_strings_udf,
    )

    distinct_shingles = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.explode(shingle_strings_udf(3, distinct=True)("text")).alias(
                "s"
            )
        )
        .select("s")
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == distinct_shingles


def test_blur_detect_flags_split_and_variance_is_nonnegative(
    spark, sf_dir
):
    """Variance numerators are nonnegative (n*sum(L^2) >= sum(L)^2 by
    Cauchy-Schwarz — a negative value means broken integer math), the
    flag matches the cross-multiplied threshold, and the synthetic
    corpus produces BOTH sharp and blurry images (a gate that passes
    everything is no gate)."""
    rows = QUERIES["q_mm_blur_detect"].fn(spark, sf_dir).collect()
    assert rows
    sharp = blurry = 0
    for r in rows:
        assert r.lap_var_num >= 0, r
        assert r.is_sharp == (
            r.lap_var_num >= 50_000 * r.n_lap * r.n_lap
        ), r
        sharp += int(r.is_sharp)
        blurry += int(not r.is_sharp)
    assert sharp > 0 and blurry > 0, (sharp, blurry)


def test_graph_jaccard_prefix_equals_naive_on_real_data(spark, sf_dir):
    """The PPJoin prefix filter is an execution strategy: on the real
    co-purchase graph the registered query equals the naive wedge
    form row-for-row (scale_jaccard pins this on power-law synthetics;
    this pins it on the actual test data)."""
    from updatable_persistent_map_reduce_spark.operators.graph import (
        _TRI_MAX_PART,
        _jaccard_naive,
    )
    from updatable_persistent_map_reduce_spark.sources import Catalog

    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    li = li.filter(F.col("l_partkey") < _TRI_MAX_PART)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    naive = {tuple(r) for r in _jaccard_naive(e).collect()}
    got = {
        tuple(r)
        for r in QUERIES["q_graph_jaccard"].fn(spark, sf_dir).collect()
    }
    assert got == naive and got, len(got)
