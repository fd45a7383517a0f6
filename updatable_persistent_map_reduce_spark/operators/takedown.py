"""Tier B — GDPR/takedown cascade across every derived artifact.

The reference's defining update rule is delete-and-reschedule: a
re-submitted document first removes its old map output everywhere,
then contributes fresh rows (Executer.cs:240-261). A takedown event is
the same contract WITHOUT the fresh rows — and on a 100 TB corpus it
must reach every DERIVED artifact, not just the view: the materialized
finals, the near-dup band index, the BM25 postings, and the ANN vector
index all hold rows deriving from the doc. r10 closed the ANN leg
(plans/ann_index.py delete()); r11 adds TextIndex.delete and
NearDupIndex.delete (same merge-on-read tombstone pattern) and this
operator attests the WHOLE cascade in one externally-checked query.

Scale shape: each leg is O(the victim's own rows), never an artifact
scan — the view re-aggregates only the victim's dirty key-spans, the
text index lands one dead sentinel + rewrites the victim's doc-index
span, the band index writes O(bands) tombstone rows, and the ANN index
one (cell, vec_id) tombstone; every probe afterwards reads its normal
manifest-pruned span set plus a broadcast-sized tombstone anti-join.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog
from . import register
from .search import (
    QUERY_TERMS,
    TOP_DOCS,
    bm25_chain_sql,
    bm25_score_frame,
)

_SHINGLE_CTE = r"""
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
         END AS sh
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> t <> '') AS tk
        FROM documents))
"""


def _takedown_oracle() -> str:
    # the BM25 chain runs twice — victim selection + pre-delete top-k
    # over the full corpus, then the post-delete serving state over
    # corpus-minus-victim — both from search.bm25_chain_sql, the ONE
    # source of the scoring SQL (never a local copy that could drift)
    vic = "(SELECT doc_id FROM vic)"
    cos = (
        "round(list_cosine_similarity("
        "list_transform(q.qe, x -> CAST(x AS DOUBLE)), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6)"
    )
    return (
        "WITH "
        + bm25_chain_sql()
        + ", vic AS MATERIALIZED (SELECT doc_id FROM sc "
        "WHERE doc_id IN (SELECT vec_id FROM embeddings) "
        "ORDER BY score DESC, doc_id LIMIT 1), "
        "pre20 AS (SELECT doc_id FROM sc "
        f"ORDER BY score DESC, doc_id LIMIT {TOP_DOCS}), "
        + bm25_chain_sql("2", f" WHERE doc_id <> {vic}")
        + ", post20 AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY score DESC, doc_id) AS rn FROM sc2 "
        f"ORDER BY score DESC, doc_id LIMIT {TOP_DOCS}), "
        + _SHINGLE_CTE
        + f", vsh AS (SELECT sh AS v FROM sh WHERE doc_id = {vic}), "
        "q AS (SELECT embedding AS qe FROM embeddings "
        f"WHERE vec_id = {vic}) "
        "SELECT metric, value FROM ("
        f"SELECT 'victim_doc' AS metric, CAST({vic} AS BIGINT) AS value "
        "UNION ALL SELECT 'text_victim_hits_before', "
        f"(SELECT count(*) FROM pre20 WHERE doc_id = {vic}) "
        "UNION ALL SELECT 'text_n_docs_after', "
        "(SELECT count(*) - 1 FROM documents) "
        "UNION ALL SELECT 'text_top1_after', "
        "(SELECT doc_id FROM post20 WHERE rn = 1) "
        "UNION ALL SELECT 'text_victim_hits_after', "
        f"(SELECT count(*) FROM post20 WHERE doc_id = {vic}) "
        "UNION ALL SELECT 'ann_top1_before', "
        f"(SELECT e.vec_id FROM embeddings e CROSS JOIN q "
        f"ORDER BY {cos} DESC, e.vec_id LIMIT 1) "
        "UNION ALL SELECT 'ann_top1_after', "
        f"(SELECT e.vec_id FROM embeddings e CROSS JOIN q "
        f"WHERE e.vec_id <> {vic} "
        f"ORDER BY {cos} DESC, e.vec_id LIMIT 1) "
        "UNION ALL SELECT 'neardup_victim_pairs_before', "
        "(SELECT count(*) FROM sh b CROSS JOIN vsh "
        f"WHERE b.doc_id = {vic} "
        "AND 2 * len(list_intersect(b.sh, vsh.v)) >= "
        "len(list_distinct(list_concat(b.sh, vsh.v)))) "
        "UNION ALL SELECT 'neardup_victim_pairs_after', "
        "(SELECT count(*) FROM sh b CROSS JOIN vsh "
        f"WHERE b.doc_id = {vic} AND b.doc_id <> {vic} "
        "AND 2 * len(list_intersect(b.sh, vsh.v)) >= "
        "len(list_distinct(list_concat(b.sh, vsh.v)))) "
        "UNION ALL SELECT 'neardup_pairs_after', "
        "(SELECT count(*) FROM sh b CROSS JOIN vsh "
        f"WHERE b.doc_id <> {vic} "
        "AND 2 * len(list_intersect(b.sh, vsh.v)) >= "
        "len(list_distinct(list_concat(b.sh, vsh.v)))) "
        "UNION ALL SELECT 'view_docs_' || COALESCE(lang, '?'), "
        "CAST(count(*) AS BIGINT) FROM documents "
        f"WHERE doc_id <> {vic} GROUP BY lang"
        ") m"
    )


@register(
    "q_takedown_cascade",
    oracle=_takedown_oracle(),
    doc="TAKEDOWN CASCADE (r11) — one document is deleted from EVERY "
    "derived artifact, and every artifact's post-delete serving state "
    "is attested against the same reads over the filtered corpus: "
    "(1) the materialized VIEW's per-lang finals (MapReduceView."
    "delete_docs — dirty-span-only re-aggregation), (2) the persisted "
    "BM25 index (InvertedIndex.delete — a live_gen=-1 dead sentinel "
    "kills every posting of the doc with zero postings files "
    "rewritten, doc_index CoW + stats decrement keep (N, avgdl) "
    "exact, so the post-delete top-k equals BM25 over corpus-minus-"
    "victim), (3) the persisted near-dup band index (NearDupIndex."
    "delete — doc-keyed MoR tombstones in the exact recomputed "
    "band/shingle spans, shingle tier first per the crash-ordering "
    "rule; probing with the victim's own text finds its partners but "
    "never the victim), and (4) the ANN index (the r10 IvfIndex."
    "delete MoR path; exact full-probe search with the victim's "
    "embedding returns the nearest SURVIVOR). The victim is data-"
    "derived (top BM25 doc carrying an embedding — deterministic "
    "rounded-score/doc_id order in both engines), and before/after "
    "metric pairs prove presence then absence. This completes the "
    "reference's delete-and-reschedule contract (Executer.cs:240-261) "
    "across every artifact the engine materializes. All index builds "
    "are the operators' own attested build paths; each delete leg is "
    "O(victim rows), never an artifact scan.",
)
def q_takedown_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.ann_index import IvfIndex
    from ..plans.neardup_index import NearDupIndex
    from ..plans.text_index import InvertedIndex
    from ..plans.view import MapReduceView

    # all four persisted artifacts live under ONE temp root removed in
    # the finally below (r11 advice: mkdtemp per artifact leaked four
    # index trees per run — including every driver attestation round)
    root = tempfile.mkdtemp(prefix="upmr_takedown_")

    cat = Catalog(spark, sf_dir)
    d = cat.documents.select("doc_id", "text", "lang")
    e = cat.embeddings.select("vec_id", "embedding")

    # victim: top BM25 doc that carries an embedding (rounded score
    # DESC, doc_id — deterministic in both engines). 1-row collect.
    cand = (
        bm25_score_frame(cat.documents)
        .join(e.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi")
        .orderBy(F.desc("score"), "doc_id")
        .limit(1)
        .collect()
    )
    if not cand:
        raise ValueError(
            "takedown cascade: no document matching the query terms "
            "carries an embedding — no deterministic victim"
        )
    victim = int(cand[0]["doc_id"])
    victim_text = d.filter(F.col("doc_id") == victim).collect()[0]["text"]
    vemb = e.filter(F.col("vec_id") == victim).collect()[0]["embedding"]
    vic_df = spark.createDataFrame([(victim,)], "doc_id long")
    vic_docs = spark.createDataFrame(
        [(victim, victim_text)], "doc_id long, text string"
    )

    metrics: list[tuple[str, int]] = [("victim_doc", victim)]

    try:
        # ---- (2) persisted BM25 index --------------------------------
        # span counts sized for the gate corpora (hundreds-of-docs
        # scale); they are pure physical-placement knobs — results are
        # span-layout invariant (q_store_rescale attests exactly that)
        # and a 100 TB deployment raises them with the corpus
        ti = InvertedIndex(
            spark,
            os.path.join(root, "text"),
            n_spans=16,
            n_doc_spans=8,
        )
        ti.build(d.select("doc_id", "text"))
        pre = ti.bm25(QUERY_TERMS, k=TOP_DOCS).collect()
        metrics.append(
            ("text_victim_hits_before", sum(r.doc_id == victim for r in pre))
        )
        ti.delete(vic_df)
        post = ti.bm25(QUERY_TERMS, k=TOP_DOCS).collect()
        metrics.append(("text_n_docs_after", int(ti.stats()["n_docs"])))
        metrics.append(("text_top1_after", int(post[0].doc_id)))
        metrics.append(
            ("text_victim_hits_after", sum(r.doc_id == victim for r in post))
        )

        # ---- (4) ANN index --------------------------------------------
        ann = IvfIndex(spark, os.path.join(root, "ann"))
        ann.build(e)
        probe_q = [(-1, [float(x) for x in vemb])]
        pre_a = ann.search(probe_q, k=1, nprobe=ann.n_cells).collect()
        metrics.append(("ann_top1_before", int(pre_a[0].vec_id)))
        ann.delete(
            spark.createDataFrame(
                [(victim, list(vemb))], "vec_id long, embedding array<float>"
            )
        )
        post_a = ann.search(probe_q, k=1, nprobe=ann.n_cells).collect()
        metrics.append(("ann_top1_after", int(post_a[0].vec_id)))

        # ---- (3) near-dup band index ----------------------------------
        nd = NearDupIndex(
            spark,
            os.path.join(root, "neardup"),
            n_spans=16,
            n_doc_spans=8,
        )
        nd.build(d.select("doc_id", "text"))
        probe_b = spark.createDataFrame(
            [(-1, victim_text)], "doc_id long, text string"
        )
        p1 = nd.probe(probe_b).collect()
        metrics.append(
            ("neardup_victim_pairs_before", sum(r.doc_b == victim for r in p1))
        )
        nd.delete(vic_docs)
        p2 = nd.probe(probe_b).collect()
        metrics.append(
            ("neardup_victim_pairs_after", sum(r.doc_b == victim for r in p2))
        )
        metrics.append(("neardup_pairs_after", len(p2)))

        # ---- (1) the materialized view --------------------------------
        view = MapReduceView(
            spark,
            os.path.join(root, "view"),
            id_col="doc_id",
            group_cols=["lang"],
            agg_exprs=[F.count(F.lit(1)).alias("cnt")],
            n_key_spans=4,
            n_doc_spans=8,
        )
        view.execute(
            d.select(F.col("doc_id").cast("string").alias("doc_id"), "lang")
        )
        view.delete_docs([str(victim)])
        finals = view.final_df().select("lang", "cnt").collect()
        metrics.extend(
            (f"view_docs_{r.lang if r.lang is not None else '?'}", int(r.cnt))
            for r in finals
        )
    finally:
        # metrics are plain Python ints by here — the artifacts are
        # pure scratch, never part of the result
        shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [(m, int(v)) for m, v in metrics], "metric string, value long"
    )
