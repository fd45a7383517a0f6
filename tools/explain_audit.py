"""Physical-plan audit: assert each headline query compiles to the
plan shape we want at scale.

For every audited query this checks the formatted physical plan for
the markers that matter at 100 TB — filters reaching the parquet scan,
pruned read schemas, broadcast joins where a side is dimension-sized,
partial+final hash aggregation, top-k as TakeOrderedAndProject — and
fails loudly when a plan regresses to a shape that would not survive a
1000-executor deployment (row-at-a-time Python in a hot path, full
scans feeding a projection, sort-based top-k).

Usage: python tools/explain_audit.py [-v] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from updatable_persistent_map_reduce_spark.operators import all_queries  # noqa: E402
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> (must-contain markers, must-NOT-contain markers)
# A marker starting with "re:" is a regex (re.search over the
# formatted plan); anything else is a plain substring. Regexes exist
# for shape assertions substrings can't express — e.g. "the Window
# operator's partition spec names the series column" vs merely "a
# Window exists somewhere".
EXPECTATIONS: dict[str, tuple[list[str], list[str]]] = {
    # pruned scan: only the 3 projected columns reach the reader
    "q_scan_parquet": (["ReadSchema: struct<l_orderkey", "l_quantity"], ["l_comment"]),
    # predicates pushed into the parquet scan
    "q_filter_pred": (["PushedFilters: ["], []),
    "q_project_expr": (["Project"], ["Exchange"]),  # pure map task, no shuffle
    # dim side broadcast, no sort-merge
    "q_join_broadcast": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "q_join_inner": (["Join"], ["CartesianProduct"]),
    "q_join_semi": (["LeftSemi"], ["CartesianProduct"]),
    "q_join_anti": (["LeftAnti"], ["CartesianProduct"]),
    # partial (map-side) + final aggregation — Spark's 2-level reduce tree
    "q_group_count": (["HashAggregate"], []),
    "q_rereduce": (["HashAggregate"], []),
    "q_agg_multi": (["HashAggregate"], []),
    # top-k must not be a global sort
    "q_sort_limit": (["TakeOrderedAndProject"], []),
    # token counting is pure JVM expression work — no Python at all
    "q_token_count": (["Scan parquet"], ["Python", "Exchange"]),
    # learned quality gate: weight lookup + dot product are JVM array
    # expressions over ONE scan — no Python, no shuffle (r10)
    "q_quality_classifier": (["Scan parquet"], ["Python", "Exchange"]),
    "q_dedup_exact": (["HashAggregate"], ["Python"]),
    # ANN brute force: broadcast of the query set over one corpus scan
    "q_sim_search": (["Broadcast"], ["SortMergeJoin"]),
    # binary sketch ANN: integer pre-rank, broadcast queries, no SMJ
    "q_sim_search_binary": (["Broadcast"], ["SortMergeJoin"]),
    # RRF: pool-then-fuse — no Python, no cartesian anywhere
    "q_rank_fusion": ([], ["BatchEvalPython", "CartesianProduct"]),
    # PMI: adjacency from transform(sequence) — no self-join, no Python
    "q_pmi_collocations": (["HashAggregate"], ["BatchEvalPython"]),
    # bucketed co-located join: the shuffle was paid at write time —
    # no hash-partitioning exchange for the join OR the aggregation
    "q_join_bucketed": (["SortMergeJoin"], ["hashpartitioning"]),
    # as-of join must be an equi-join + window, not a cartesian/NLJ
    "q_join_asof": (["Join"], ["CartesianProduct", "BroadcastNestedLoop"]),
    # IVF probe: candidates come from a broadcast equi-join on the
    # cell key, never a cartesian scan of corpus x queries
    "q_sim_search_ivf": (["Broadcast"], ["CartesianProduct", "BroadcastNestedLoop"]),
    # deterministic sample is a pure scan predicate, no shuffle
    "q_sample_hash": (["Scan parquet"], ["Exchange"]),
    # decontamination broadcasts the (small) eval shingle set
    "q_decontaminate": (["Broadcast"], ["CartesianProduct"]),
    # full outer keeps both sides shuffled — never broadcast, never NLJ
    "q_join_full": (["SortMergeJoin FullOuter"], ["BroadcastNestedLoop"]),
    # correlated EXISTS decorrelates to one semi join of the subquery
    "q_sql_exists": (["LeftSemi"], ["CartesianProduct", "BroadcastNestedLoop"]),
    # salted skew join stays an equi-join (salt explode, no NLJ)
    "q_join_salted": (["Join"], ["CartesianProduct", "BroadcastNestedLoop"]),
    # dense-spine gap fill: sequence/explode + equi left join, no NLJ
    # fill window must be PARTITIONED BY the series key (event_type) —
    # a window with an empty partition spec ("[], [day") serializes the
    # whole spine through one task
    "q_gap_fill": (
        ["Join", "Window", r"re:\[event_type#\d+\], \[day#\d+ ASC"],
        [
            "CartesianProduct",
            "BroadcastNestedLoop",
            r"re:\], \[\], \[day#",
        ],
    ),
    # pivot compiles to conditional aggs in ONE pass — no per-value scans
    "q_pivot": (["HashAggregate"], ["Python"]),
    # grouping sets / rollup / cube: one Expand + a single aggregation
    "q_agg_grouping_sets": (["Expand", "HashAggregate"], []),
    "q_agg_rollup": (["Expand", "HashAggregate"], []),
    "q_agg_cube": (["Expand", "HashAggregate"], []),
    # analytics windows: one Window operator, JVM-side only
    "q_window_rank": (["Window"], ["Python", "CartesianProduct"]),
    "q_window_frame": (["Window"], ["Python"]),
    "q_window_ntile": (["Window"], ["Python"]),
    # event-time windows aggregate JVM-side
    "q_stream_tumbling": (["HashAggregate"], ["Python"]),
    # corpus prep composes into one plan: the quality predicate must
    # actually reach the scan (the named filter, not the vacuous
    # "PushedFilters: [" prefix that every scan prints)
    # prefix sums are the two-pass distributed plan: bucket-partitioned
    # windows + literal bucket offsets — NEVER a global single-task
    # window (the "Exchange SinglePartition" smell)
    "q_corpus_prep": (
        ["Window", "GreaterThanOrEqual(n_chars,50)"],
        ["Python", "Exchange SinglePartition"],
    ),
    "q_shard_pack": (
        ["Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    "q_batch_256": (
        ["Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # text analysis is pure JVM expression work — no Python stage, no
    # shuffle beyond the aggregation's own
    "q_text_stats": (["HashAggregate"], ["Python"]),
    "q_lang_id": (["Scan parquet"], ["Python", "SortMergeJoin"]),
    "q_quality_score": (["Scan parquet"], ["Python", "SortMergeJoin"]),
    # Python where it belongs: Arrow-batched pandas evaluation, NEVER
    # the row-at-a-time pickled path
    "q_mm_features": (["MapInPandas"], ["BatchEvalPython"]),
    "q_dedup_near": (["Python"], ["BatchEvalPython"]),
    "q_udf_surface": (["Python"], ["BatchEvalPython"]),
    # SQL front end produces the same shapes as the DataFrame API
    "q_sql_tpch_q1": (["HashAggregate"], ["CartesianProduct"]),
    "q_sql_tpch_q3": (["HashAggregate"], ["CartesianProduct"]),
    # stratified sample is a pure scan predicate + projection, no shuffle
    "q_sample_stratified": (["Scan parquet"], ["Exchange", "Python"]),
    # n-gram top-k: Arrow-batched shingling (never row-at-a-time),
    # partial+final agg, top-k never a global sort
    "q_ngram_stats": (
        ["HashAggregate", "TakeOrderedAndProject", "ArrowEvalPython"],
        ["BatchEvalPython", "Sort "],
    ),
    # funnel: one scan -> content-hash window -> 1-row conditional agg
    # (the global agg's SinglePartition exchange is fine: partial
    # aggregation runs first, so it moves O(partitions) rows, not O(n))
    "q_quality_funnel": (
        ["HashAggregate", "Window"],
        ["Python", "CartesianProduct"],
    ),
    # semantic dedup (r8: integer-exact dominance form, oracle-backed):
    # quantization/assignment are codegen against centroid literals;
    # in-cell pair generation is ONE hash/merge self-join keyed by
    # cell; argmin-dominator is a partial+final agg. NO Python at all
    # (the float greedy production variant, semantic_dedup_greedy,
    # keeps the one-Arrow-shuffle shape and is pytest-attested).
    "q_dedup_semantic": (
        ["re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # ViT patchify: two chained Arrow kernels, per-partition map (the
    # only Exchange is spread()'s deliberate repartition)
    "q_mm_patchify": (
        ["MapInPandas"],
        ["BatchEvalPython", "Join", "CartesianProduct"],
    ),
    # SCD2 point-in-time lookup: one window builds the version
    # intervals; the lookup is a key equi-join with the interval
    # predicate residual (broadcast dim here) — never a product
    "q_scd2_lookup": (
        ["Window", "BroadcastHashJoin"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # MAD outliers: two percentile agg passes, each a tiny per-type
    # threshold table broadcast back onto the fact scan
    "q_anomaly_mad": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["Python", "CartesianProduct", "SortMergeJoin"],
    ),
    # grouped-agg pandas UDAF: one hash shuffle feeding the Arrow
    # aggregate operator (Spark 4 names it ArrowAggregatePython;
    # older releases AggregateInPandas), never row-at-a-time
    "q_udaf_pandas": (
        ["re:(ArrowAggregatePython|AggregateInPandas)"],
        ["BatchEvalPython", "CartesianProduct", "Join"],
    ),
    # triangle counting: ordered-edge wedge join + closure join —
    # hash equi-joins on node keys, never a product
    "q_graph_triangles": (
        ["re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
         "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # streaming near-dup gate: the returned frame is the drained
    # decisions table (the probes/appends ran inside foreachBatch)
    "q_stream_neardup_gate": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # product quantization: 8x4 subspace distances as codegen against
    # codebook literals over ONE scan — no shuffle, no join, no Python
    "q_embed_pq": (
        ["Scan parquet"],
        ["Exchange", "Python", "Join"],
    ),
    # length-bucketed batching: ONE window keyed by (bucket, shard) —
    # shard count derived from corpus size via the sanctioned 1-row
    # broadcast cross join (r8) — + partial+final agg
    "q_length_bucket_batches": (
        ["Window", "HashAggregate",
         r"re:hashpartitioning\(bucket"],
        ["Python", "CartesianProduct"],
    ),
    # scene-cut: two chained Arrow kernels, per-partition map (the
    # only Exchange is spread()'s deliberate core-spreading
    # repartition of the narrow id scan, as in every q_mm_* op)
    "q_mm_scene_cut": (
        ["MapInPandas"],
        ["BatchEvalPython", "Join", "CartesianProduct"],
    ),
    # BPE tokenizer: merges run over the DISTINCT vocab (two hash
    # aggs) against 8 broadcast rule literals, then ONE join back to
    # per-doc occurrences — pure Catalyst HOFs, no Python, no product
    "q_tokenize_bpe": (
        ["HashAggregate",
         "re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # persisted MinHash band index probe: Arrow-batched signature UDF
    # (never row-at-a-time), candidates via (band, sig) equi-join over
    # span-pruned manifest reads, exact verify joins — no product
    "q_neardup_index_persisted": (
        ["re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
         "ArrowEvalPython"],
        ["BatchEvalPython", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # sliding windows: map-side window assignment feeding one
    # partial+final aggregation — JVM-only
    "q_stream_sliding": (["HashAggregate"], ["Python"]),
    # int8 quantization is a pure map over one scan: no shuffle at all
    "q_embed_quantize": (["Scan parquet"], ["Exchange", "Python"]),
    # index vocabulary: partial+final agg, top-k never a global sort
    "q_inverted_index": (
        ["HashAggregate", "TakeOrderedAndProject"],
        ["Python", "Sort "],
    ),
    # BM25: query-term filter BEFORE the posting aggregation, corpus
    # scalars broadcast, top-k as TakeOrdered — no global sort
    "q_bm25": (
        ["TakeOrderedAndProject", "Broadcast"],
        ["Python", "CartesianProduct"],
    ),
    # length histogram: map-side banding + tiny agg, no Python
    "q_doc_len_histogram": (["HashAggregate"], ["Python"]),
    # lag(): user-partitioned window (parallel), never single-task
    "q_window_lag": (
        ["Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # TPC-H Q5: dims broadcast, date filter pushed, no cartesian
    "q_sql_tpch_q5": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct"],
    ),
    # RANGE frame: partitioned window, never single-task
    "q_window_range_frame": (
        ["Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # p99 outliers: tiny threshold table broadcast onto the fact scan
    "q_anomaly_p99": (
        ["Broadcast", "HashAggregate"],
        ["Python", "CartesianProduct", "SortMergeJoin"],
    ),
    # SCD2: user-partitioned window, parallel, never single-task
    "q_scd2_history": (
        ["Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # cohorts: two aggs + equi join, no cartesian, no Python
    "q_retention_cohort": (
        ["HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # cross-snapshot dedup: hash-key equi join, no payload shuffle
    "q_dedup_cross_snapshot": (
        ["Join"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # ORC round-trip reads through the columnar ORC scan
    "q_scan_orc": (["Scan orc"], ["Python"]),
    # sketch rollup: partial+final agg of mergeable sketches
    "q_sketch_union": (["HashAggregate"], ["Python", "CartesianProduct"]),
    # weighted resampling: map-side explode, no shuffle at all
    "q_resample_weighted": (["Generate"], ["Exchange", "Python"]),
    # snapshot read: manifest-resolved parquet scan, no recompute
    "q_time_travel": (["Scan parquet"], ["Python"]),
    "q_upsert_enriched": (["Scan parquet"], ["Python"]),
    # ---- blanket coverage: every remaining registered query --------
    # Tier A core: pruned scans / projections / single aggregations
    "q_source_batch": (["Scan parquet"], ["Python", "Exchange"]),
    "q_map_project": (["Scan parquet"], ["Python", "Exchange"]),
    "q_map_flat": (["Generate"], ["Python"]),
    "q_bucket_hash": (["Scan parquet"], ["Python", "Exchange"]),
    "q_distinct_ids": (["HashAggregate"], ["Python"]),
    # engine-view reads: materialized finals = manifest-pruned scans
    "q_upsert_recount": (["Scan parquet"], ["Python", "CartesianProduct"]),
    "q_rereduce_tree": (["Scan parquet"], ["Python", "CartesianProduct"]),
    "q_key_migration": (["Scan parquet"], ["Python", "CartesianProduct"]),
    "q_dedup_incremental": (["Scan parquet"], ["Python", "CartesianProduct"]),
    # point lookups: q_point_lookup is the aggregate-on-demand contrast
    # (filter pushed to the scan + one agg); q_store_point_lookup is
    # the engine's materialized read — a filtered span scan, NO shuffle
    "q_point_lookup": (["PushedFilters: [IsNotNull(c_nationkey)", "HashAggregate"], ["Python"]),
    "q_store_point_lookup": (["Scan parquet"], ["Python", "Exchange"]),
    # joins / set ops
    "q_join_left": (["Join"], ["CartesianProduct", "Python"]),
    # range (theta) join is NLJ by nature — forbid Python, not NLJ
    "q_join_range": (["Join"], ["Python"]),
    "q_union_all": (["Union"], ["Python", "CartesianProduct"]),
    "q_intersect": (["Join"], ["Python", "CartesianProduct"]),
    "q_except": (["Join"], ["Python", "CartesianProduct"]),
    # aggregations
    "q_agg_quantile": ([], ["Python", "CartesianProduct"]),
    "q_agg_approx_quantile": ([], ["Python", "CartesianProduct"]),
    "q_approx_distinct": (["HashAggregate"], ["Python"]),
    "q_string_agg": ([], ["Python", "CartesianProduct"]),
    "q_json_struct": (["HashAggregate"], ["Python"]),
    # scalar / array expression surfaces stay JVM-side
    "q_scalar_funcs": (["Scan parquet"], ["Python"]),
    "q_array_map_funcs": (["Scan parquet"], ["BatchEvalPython"]),
    "q_doc_fingerprint": (["Scan parquet"], ["Python", "Exchange"]),
    # non-parquet sources read through their own scan nodes
    "q_scan_json": (["Scan json"], ["Python"]),
    "q_scan_csv": (["Scan csv"], ["Python"]),
    # dedup family — the returned labels are post-localCheckpoint, so
    # the iterative joins are already executed; the candidate-edge
    # plan shape is asserted by test_cluster_edges_are_bucket_joined
    "q_dedup_cluster": (
        [],
        ["CartesianProduct", "BroadcastNestedLoop", "BatchEvalPython"],
    ),
    "q_dedup_simhash": (["HashAggregate"], ["BatchEvalPython"]),
    # declared O(n^2) correctness baselines: only forbid row-at-a-time
    "q_dedup_ngram": ([], ["BatchEvalPython"]),
    # post-localCheckpoint read-back (r10 guard change) — the O(n^2)
    # brute-force shape is the declared baseline, nothing to pin
    "q_dedup_embed": ([], ["BatchEvalPython"]),
    "q_sim_search_lsh": (
        ["Broadcast"],
        ["CartesianProduct", "BatchEvalPython"],
    ),
    # text analysis: pure JVM expressions
    "q_pii_scrub": (["Scan parquet"], ["Python"]),
    "q_repetition_filter": (["Scan parquet"], ["Python"]),
    # multimodal: Arrow-batched only
    "q_mm_resize": (["MapInPandas"], ["BatchEvalPython"]),
    "q_mm_frame_sample": (["MapInPandas"], ["BatchEvalPython"]),
    # session windows aggregate JVM-side
    "q_stream_session": ([], ["Python", "CartesianProduct"]),
    # pagerank result: checkpointed ranks, so the returned plan is a
    # read-back and carries no positive pins; the per-round join shape
    # is asserted by tests/test_r11_ops.py::
    # test_graph_fixpoint_round_plans_are_equi_joins (pre-checkpoint
    # plan) and measured per-octave in tools/scale_triangles.py;
    # semantics pinned by test_pagerank_matches_numpy_power_iteration
    "q_pagerank": ([], ["BatchEvalPython", "CartesianProduct"]),
    # k-core peel trace: checkpointed per-round degree aggs — same
    # compensating coverage: the pre-checkpoint round plan is asserted
    # by test_graph_fixpoint_round_plans_are_equi_joins, per-octave
    # peel cost measured in tools/scale_triangles.py, semantics by
    # test_kcore_peel_trace_invariants + the planted-graph reference
    "q_graph_kcore": ([], ["BatchEvalPython", "CartesianProduct"]),
    # tokenizer-coverage audit (r11): the trained segmentation is a
    # checkpointed vocab-sized frame; the returned rollup joins it to
    # the occ aggregate JVM-side — one HashAggregate, no Python, no
    # cartesian anywhere
    "q_tokenizer_coverage": (
        ["HashAggregate"],
        ["BatchEvalPython", "CartesianProduct"],
    ),
    # takedown cascade (r11): the returned frame is a driver-assembled
    # bounded metric table (LocalTableScan) — the real plans ran inside
    # the four artifact legs, whose shapes are asserted by their own
    # audit entries (q_text_index_persisted, q_neardup_index_persisted,
    # q_sim_index_persisted, q_upsert_delete) and the r11 lifecycle
    # pytests (tests/test_r11_ops.py) with probe-cost pins
    "q_takedown_cascade": ([], ["BatchEvalPython", "CartesianProduct"]),
    # join view: bounded metric-table result (one row per segment);
    # the real plans run inside the maintenance legs — span-pruned
    # co-partitioned joins per dirty span — pinned by
    # tests/test_r12_joinview.py's touched-span manifest assertions
    "q_join_view_incremental": ([], ["BatchEvalPython", "CartesianProduct"]),
    "q_join_view_time_travel": ([], ["BatchEvalPython", "CartesianProduct"]),
    # erasure: same bounded metric-table shape as the cascade — the
    # real plans ran inside the artifact legs plus the version walk
    # (each a manifest-pruned read), all asserted by their own entries
    # and tests/test_r12_ops.py's per-version enumeration pytest
    "q_takedown_erasure": ([], ["BatchEvalPython", "CartesianProduct"]),
    # calibration anchor: deliberately engine-free — two codegen
    # aggregates and a parquet roundtrip, never Python or a join
    "q_bench_anchor": ([], ["BatchEvalPython", "CartesianProduct"]),
    # streaming takedown: result read back from the persisted view
    # finals (same shape as q_stream_view_upsert)
    "q_stream_takedown": ([], ["BatchEvalPython", "CartesianProduct"]),
    # Kleene-plus pattern matching: both row_numbers, the run
    # aggregate and the run window all share user-keyed exchanges —
    # no join, no Python, no single-task stage
    "q_pattern_match": (
        ["Window", "HashAggregate", r"re:hashpartitioning\(user_id"],
        ["Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # spatial grid join: the 9-cell neighborhood explode stays on the
    # broadcast (dimension) side; candidates meet in a cell equi-join
    # with the squared-distance residual — never a nested-loop theta
    "q_join_spatial_grid": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # curriculum pacing: the corpus-wide difficulty rank is the
    # range-bucketed two-pass prefix count — local windows per
    # bucket, never a partition-less (single-task) window
    "q_curriculum_pacing": (
        ["Window"],
        ["Python", "Join", "Exchange SinglePartition"],
    ),
    # unpivot: one map-side Expand, single pass, no join/Python
    "q_unpivot": (["Expand"], ["Python", "Join"]),
    # UDTF runs Arrow-batched, never the pickled row path
    "q_udtf_surface": ([], ["BatchEvalPython", "CartesianProduct"]),
    # session funnel: JVM session windows + conditional agg
    "q_session_conversion": ([], ["Python", "CartesianProduct"]),
    # Q6: every predicate reaches the scan; no joins anywhere
    "q_sql_tpch_q6": (
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        ["Join", "Python"],
    ),
    # Q10: top-k via TakeOrdered, dims broadcast, no cartesian
    "q_sql_tpch_q10": (
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        ["CartesianProduct", "Python"],
    ),
    # quarantine ingest: one JSON scan + 1-row agg, no Python
    "q_ingest_corrupt": (["Scan json", "HashAggregate"], ["Python"]),
    # null semantics: one outer join + one aggregation
    "q_null_semantics": (["Join", "HashAggregate"], ["Python", "CartesianProduct"]),
    # argmin/argmax: single-pass aggregate, no window
    "q_argminmax": ([], ["Python", "Window", "CartesianProduct"]),
    # map explode is map-side; one aggregation shuffle
    "q_map_type_ops": (["Generate", "HashAggregate"], ["Python"]),
    # streaming-path queries return a drained memory sink — the read
    # plan is a local/memory scan; the streaming job's own shape is
    # exercised in tests/test_streaming.py
    "q_stream_interval_join": ([], ["CartesianProduct", "BatchEvalPython"]),
    "q_stream_dedup": ([], ["CartesianProduct", "BatchEvalPython"]),
    # streaming quota gate: decisions read-back — codegen scoring per
    # batch, no pickled-row Python, no cartesian anywhere
    "q_stream_quality_gate": ([], ["CartesianProduct", "BatchEvalPython"]),
    "q_stream_sessionize": ([], ["CartesianProduct", "BatchEvalPython"]),
    # streaming CEP: result read from the drained memory sink; the
    # automaton ran inside the streaming query (Arrow state path)
    "q_stream_pattern": ([], ["CartesianProduct", "BatchEvalPython"]),
    "q_stream_enrich": ([], ["CartesianProduct", "BatchEvalPython"]),
    # persisted-index probe: broadcast cell equi-join over the listed
    # table's manifest-resolved files — never a cartesian/NLJ scan
    "q_sim_index_persisted": (
        ["Broadcast"],
        ["CartesianProduct", "BroadcastNestedLoop", "BatchEvalPython"],
    ),
    # blur gate: two Arrow mapInPandas stages, per-partition map
    "q_mm_blur_detect": (["MapInPandas"], ["BatchEvalPython", "Join"]),
    # interval overlap: band-key hash join, canonical-band dedup-free
    # emit — never a nested-loop product
    "q_join_interval_overlap": (
        ["re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
         "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # novelty: Arrow shingle explode + shingle-keyed min agg + self
    # equi-join + per-doc agg — the substring-dedup shuffle skeleton
    "q_ngram_novelty": (
        ["ArrowEvalPython", "HashAggregate",
         "re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["BatchEvalPython", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # doc-level CC labels: checkpointed min-label fixpoint, final plan
    # is a projection over the checkpoint — no Python, no product
    "q_dedup_near_clusters": ([], ["BatchEvalPython", "CartesianProduct"]),
    # chat-template assembly: one user-keyed window + one groupBy,
    # ordered concat via array_sort(collect_list) — no Python, no join
    "q_chat_template": (
        ["Window", "HashAggregate"],
        ["Python", "CartesianProduct", "Join"],
    ),
    # common-neighbor jaccard: the returned frame is a checkpoint of
    # the prefix-filtered join (r10: one execution shared by guard +
    # collect); the wedge equi-join shape itself is measured and
    # asserted in tools/scale_jaccard.py
    "q_graph_jaccard": (
        [],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # MRL energy profile: posexplode + vec-keyed window + groupBy —
    # integer-exact, no Python, no join
    "q_embed_mrl": (
        ["Window", "HashAggregate"],
        ["Python", "CartesianProduct", "Join"],
    ),
    # substring-remove: detect shuffles + one per-doc starts agg +
    # left join; the string rebuild is HOF codegen — no Python, no NLJ
    "q_dedup_substring_remove": (
        ["HashAggregate",
         "re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # boilerplate extraction: chained regex + HOF array ops over ONE
    # scan — map-only, no shuffle, no join, no Python
    "q_html_extract": (
        ["Scan parquet"],
        ["Exchange", "Python", "Join"],
    ),
    # IVF-PQ ADC probe: integer LUT sums in codegen over the codes
    # spans + broadcast probe frame; exact re-rank join — no Python,
    # never a cartesian/NLJ scan
    "q_sim_index_pq": (
        ["Broadcast"],
        ["CartesianProduct", "BroadcastNestedLoop", "BatchEvalPython"],
    ),
    # persisted postings score: manifest-pruned postings scan, df
    # broadcast, top-k never a global sort
    "q_text_index_persisted": (
        ["Broadcast", "TakeOrderedAndProject"],
        ["CartesianProduct", "Python", "Sort "],
    ),
    # engine-store reads: materialized finals = manifest-pruned scans
    "q_upsert_delete": (["Scan parquet"], ["Python", "CartesianProduct"]),
    "q_store_rescale": (["Scan parquet"], ["Python", "CartesianProduct"]),
    # compacted store serves the same manifest-resolved parquet read
    "q_store_compaction": (["Scan parquet"], ["Python", "CartesianProduct"]),
    # stat-pruned manifest read: residual filter pushed to the scan
    "q_store_stats_prune": (
        ["Scan parquet", "PushedFilters: ["],
        ["Python", "CartesianProduct"],
    ),
    # post-merge read is a plain pruned scan + aggregate
    "q_store_merge": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # union-schema read: one scan, NULL backfill happens in the reader
    "q_store_schema_evolution": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # exact recount plan: candidate broadcast join + hash agg + top-k;
    # the MG candidate pass is mapInPandas (Arrow), never row-Python
    "q_heavy_hitters": (
        ["MapInPandas", "BroadcastHashJoin", "TakeOrderedAndProject"],
        ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
    ),
    # returned plan reads the materialized result; the bloom-filtered
    # join plan is asserted in-query (bloom_filter_agg + might_contain)
    "q_join_bloom_runtime": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # CDF: multiset diff of changed files only (exceptAll -> hash agg)
    "q_store_cdc": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # post-materialization read: tombstones cleared, plain scan + agg
    "q_store_delete_vectors": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # two-branch union of plain pruned scans + aggregates
    "q_store_clone": (
        ["Scan parquet", "HashAggregate", "Union"],
        ["Python", "CartesianProduct"],
    ),
    # assignment step: centroid literals, codegen distances — one scan,
    # one agg, never a cross join against the centroid set
    "q_kmeans_assign": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # MV refresh: base rollup + signed delta agg, no table re-scan
    "q_cdc_incremental_rollup": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # z-ordered read: filter pushed to the clustered scan, no Python
    "q_layout_zorder": (
        ["PushedFilters: [", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # mix scheduler: tiny threshold table broadcasts onto the corpus
    # scan; the sampling predicate is pure codegen, never Python
    "q_data_mix": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["Python", "CartesianProduct", "SortMergeJoin"],
    ),
    # the whole point: a runtime dynamicpruning PartitionFilter on the
    # fact scan, fed by the broadcast dim — and never a sort-merge
    "q_dpp_prune": (
        ["dynamicpruning", "BroadcastHashJoin"],
        ["Python", "SortMergeJoin", "CartesianProduct"],
    ),
    # moments family: one partial+final aggregate, no window/join
    "q_agg_stats": (
        ["HashAggregate"],
        ["Python", "Window", "Join", "CartesianProduct"],
    ),
    # grouped top-k: window over the PRE-AGGREGATED frame, partitioned
    # by group — never a single-task window, never raw-row ranking
    "q_topk_per_group": (
        ["HashAggregate", "Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # Q18: lineitem aggregates FIRST, survivors broadcast
    "q_sql_tpch_q18": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "Python"],
    ),
    # crosstab: one pair-key aggregation, driver-side cell pivot
    "q_cross_tab": ([], ["CartesianProduct", "BatchEvalPython"]),
    # period-over-period: lag over the aggregated month series,
    # partitioned by priority — never single-task
    "q_percent_change": (
        ["HashAggregate", "Window"],
        ["Python", "Exchange SinglePartition"],
    ),
    # containment: prefix-filtered shingle equi-join, Arrow shingler
    # (never row-at-a-time), exact array_intersect verify
    "q_minhash_containment": (
        ["HashAggregate", "Join", "ArrowEvalPython"],
        ["CartesianProduct", "BroadcastNestedLoop", "BatchEvalPython"],
    ),
    # URL canonicalization is map-side string work + one agg
    "q_dedup_url": (["HashAggregate"], ["Python", "Join"]),
    # TF-IDF: two aggs + broadcast scalar + per-doc window; the 1-row
    # corpus-size cross join is a legitimate BroadcastNestedLoop
    "q_tfidf_vectors": (
        ["HashAggregate", "Window", "Broadcast"],
        ["Python", "CartesianProduct"],
    ),
    # LSH similarity join: the returned frame is post-localCheckpoint
    # (r10: one execution shared by guard + collect), so the forbidden
    # list only polices the read-back; the bucket equi-join shape is
    # asserted by test_cluster_edges_are_bucket_joined on the shared
    # candidate-edge builder
    "q_sim_join_threshold": (
        [],
        ["CartesianProduct", "BroadcastNestedLoop", "BatchEvalPython"],
    ),
    # Q14: part broadcasts; shipdate pushed to the lineitem scan;
    # one conditional partial+final agg
    "q_sql_tpch_q14": (
        ["BroadcastHashJoin", "HashAggregate", "PushedFilters"],
        ["CartesianProduct", "Python", "SortMergeJoin"],
    ),
    # Q19: OR-of-ANDs must still resolve to a hash join on the
    # factored-out equi-key, never a nested loop over the disjunction
    "q_sql_tpch_q19": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # chunking: scan-local tokenize+explode — no shuffle, no Python
    "q_chunk_split": (
        ["Generate", "Scan parquet"],
        ["Python", "Exchange", "Join"],
    ),
    # entropy: two partial+final aggs, map-side explode — no Python,
    # no join, no window
    "q_char_entropy": (
        ["Generate", "HashAggregate"],
        ["Python", "Join", "Window", "CartesianProduct"],
    ),
    # engine-store read after reduce evolution: materialized finals
    "q_alter_reduce": (["Scan parquet"], ["Python", "CartesianProduct"]),
    # streaming-built store: the returned plan reads materialized
    # finals, same as the batch-built twin
    "q_stream_view_upsert": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # checkpoint-resume twin: same materialized-finals read; the
    # two-run recovery protocol happens before the returned plan
    "q_stream_checkpoint_recovery": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # late-data attestation: returned plan reads the emitted-windows
    # dir and takes latest-run-wins per window — the row_number window
    # partitions by (win_start, event_type), never a bare ORDER BY
    "q_stream_late_data": (
        ["Scan parquet", "Window", r"re:\[win_start#\d+, event_type#\d+\]"],
        ["Python", "CartesianProduct", r"re:\[\], \[run_tag"],
    ),
    # outer-join attestation: returned plan reads the drained sink dir
    "q_stream_outer_join": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    "q_stream_full_outer_join": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # two chained Arrow kernels (synth producer + feature decode); the
    # one Exchange is spread()'s deliberate width-repartition of the
    # narrow test scan, not a key shuffle — no agg, no row-Python
    "q_mm_audio_features": (
        ["MapInPandas"],
        ["BatchEvalPython", "CartesianProduct", "HashAggregate"],
    ),
    # bytes->aHash kernel then (band, val)-bucketed candidate join —
    # a real equi-join (broadcast at test scale, shuffled at 100 TB),
    # never an all-pairs nested loop
    "q_mm_image_phash_dedup": (
        ["MapInPandas", "HashJoin"],
        ["BatchEvalPython", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # un-windowed update-mode attestation: returned plan reads the
    # emitted-keys dir, latest-emission-wins per key (partitioned
    # row_number, never a bare ORDER BY)
    "q_stream_update_mode": (
        ["Scan parquet", "Window", r"re:\[event_type#\d+\]"],
        # an unpartitioned row_number would show Window [..], [], [batch_id
        ["Python", "CartesianProduct", r"re:\[\], \[batch_id"],
    ),
    # EXISTS projected as a flag compiles to ExistenceJoin — a hash
    # join emitting the match bit, never a per-row probe
    "q_join_existence": (
        ["ExistenceJoin", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # LATERAL top-1: decorrelated to window rank + broadcast join —
    # never one subquery execution per outer row
    "q_join_lateral": (
        ["Window", "BroadcastHashJoin"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # drop audit: exemplars via rank-filter (row_number <= 3 per
    # reason) — bounded per-group state, no Python, no product; the
    # content-hash dedup window partitions by sha2(text), never empty
    "q_drop_audit": (
        ["Window", "HashAggregate", "Join"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # bigram fluency: pair construction is map-side (zip of slices,
    # Generate), then one count shuffle + one join-back — no Python,
    # no window, no product
    "q_bigram_fluency": (
        ["Generate", "HashAggregate", "Join"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop", "Window"],
    ),
    # parameterized SQL: the bound :cutoff date must reach the scan as
    # an ordinary pushed literal — parameterization costs no pushdown
    "q_sql_parameterized": (
        ["PushedFilters: [IsNotNull(o_orderdate)", "HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # pipe syntax compiles to the same broadcast-join + agg plan as
    # the nested SELECT — readable syntax costs nothing
    "q_sql_pipe": (
        ["BroadcastHashJoin", "HashAggregate",
         "PushedFilters: [IsNotNull(l_shipdate)"],
        ["Python", "CartesianProduct", "SortMergeJoin"],
    ),
    # scripting block: BEGIN..END executes EAGERLY — the returned
    # relation is the script's materialized (tiny, aggregated) final
    # result, so the visible plan is a LocalTableScan by design
    "q_sql_scripting": (
        ["LocalTableScan"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # exact substring dedup: window explode is map-side (Generate),
    # repeated-set reduction is a semi join — all codegen, no Python,
    # no product, no window operator anywhere
    "q_dedup_substring": (
        ["Generate", "LeftSemi", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop", "Window"],
    ),
    # hashed twin: same shape, but the shuffle key is the 8-byte
    # xxhash64 of the window, computed map-side before the exchange
    "q_dedup_substring_hashed": (
        ["Generate", "LeftSemi", "HashAggregate", "xxhash64"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop", "Window"],
    ),
    # engine-maintained fingerprint index: materialized finals read
    "q_simhash_incremental": (
        ["Scan parquet"],
        ["Python", "CartesianProduct"],
    ),
    # hamming join: band equi-join on (band, value) — bucketed
    # candidates, never a product, all-codegen (no Arrow needed)
    "q_dedup_hamming": (
        ["HashAggregate", "Join"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q17: correlated scalar subquery DECORRELATED into a per-part
    # aggregate + joins — never a per-row re-scan
    "q_sql_tpch_q17": (
        ["HashAggregate", "Join"],
        ["CartesianProduct", "Python"],
    ),
    # Q15: aggregate once, broadcast the 1-row max into the filter
    "q_sql_tpch_q15": (
        ["HashAggregate", "Join"],
        ["CartesianProduct", "Python", "SortMergeJoin"],
    ),
    # Q7: both nation aliases broadcast; no product despite the
    # symmetric pair disjunction
    "q_sql_tpch_q7": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "Python"],
    ),
    # Q8: 8-relation join — every dim broadcasts
    "q_sql_tpch_q8": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "Python"],
    ),
    # Q13: outer join preserved (zero-order bucket), two aggregates
    "q_sql_tpch_q13": (
        ["HashAggregate", "Join"],
        ["CartesianProduct", "Python"],
    ),
    # Q2: single-scan window rewrite — the per-part min is min() OVER
    # (PARTITION BY partkey) on the one pass, dims broadcast, and the
    # negative regex pins that lineitem is scanned exactly ONCE (two
    # Location lines naming it = the decorrelated double read came
    # back)
    "q_sql_tpch_q2": (
        ["Window", "HashAggregate", "BroadcastHashJoin"],
        [
            "CartesianProduct",
            "BroadcastNestedLoop",
            "Python",
            r"re:(?s)lineitem\.parquet.*lineitem\.parquet",
        ],
    ),
    # Q9: LIKE-filtered part dim still broadcasts; one fact shuffle
    "q_sql_tpch_q9": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python", "SortMergeJoin"],
    ),
    # Q11: aggregate once per branch, scalar total broadcasts into
    # the filter — no per-row re-aggregation, no product
    "q_sql_tpch_q11": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q12: date range pushed to the lineitem scan before the join
    "q_sql_tpch_q12": (
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q16: NOT IN -> anti join (broadcast), two-level distinct agg
    "q_sql_tpch_q16": (
        ["HashAggregate", "Join"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q20: nested INs -> chained semi joins, zero products
    "q_sql_tpch_q20": (
        ["LeftSemi", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q21: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti on orderkey
    "q_sql_tpch_q21": (
        ["LeftSemi", "LeftAnti"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # Q22: scalar subqueries as 1-row broadcasts, anti join, never NLJ
    "q_sql_tpch_q22": (
        ["LeftAnti", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoop", "Python"],
    ),
    # text round-trip: scan + one aggregate, no Python, no join
    "q_scan_text": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # binaryFile round-trip: scan + one aggregate
    "q_scan_binary": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # XML round-trip: schema-first scan, no Python, no join
    "q_scan_xml": ([], ["Python", "Join", "CartesianProduct"]),
    # VARIANT: parse + path extract stay in the scan stage's project,
    # one partial+final aggregate
    "q_variant_type": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # recursive CTE: engine-side iteration, no Python, no product
    "q_recursive_cte": (
        ["HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # SQL UDF must INLINE: codegen aggregate, zero Python nodes
    "q_sql_udf": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # collation: comparison semantics in the type — and the physical
    # cost is visible: collated keys have no binary-stable hash, so
    # the aggregate is SortAggregate (partial+final), not hash
    "q_collation": (
        ["SortAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # Python data source: the feed itself IS a Python scan (that's
    # the surface under test); downstream agg is JVM partial+final
    "q_python_datasource": (
        ["HashAggregate"],
        ["Join", "CartesianProduct"],
    ),
    # null-safe equality is still a HASH join key — never a
    # nested-loop fallback for the NULL handling
    "q_join_null_safe": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop",
         "SortMergeJoin"],
    ),
    # both distribution functions share ONE Window node / one shuffle
    "q_window_distribution": (
        ["Window"],
        # the node-detail headers "(N) Window" appear once per physical
        # Window node — two of them = the functions stopped sharing a
        # single window spec
        ["Python", "Join", "CartesianProduct",
         r"re:(?s)\(\d+\) Window.*\(\d+\) Window"],
    ),
    # codegen boolean aggregates, map-side partials, no joins
    "q_agg_boolean": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # packing: token count in the scan stage, one window shuffle keyed
    # by shard, bounded sequence explode, partial+final agg — pure JVM
    "q_pack_tokens": (
        ["Window", "Generate", "HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # boundary metadata rides the SAME packing plan — window + bounded
    # explode + aggregate; no extra pass, no join, no Python
    "q_pack_boundary_attention": (
        ["Window", "Generate", "HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # restored snapshot read: plain pruned scan + aggregate
    "q_store_restore": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # banded interval join: computed band key -> HASH join, the exact
    # range predicate is a residual filter; the NLJ q_join_range
    # tolerates for its 10-row dim is the bug here
    "q_join_range_banded": (
        ["Generate", "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # ordered funnel: first-touch aggregate + EQUI-join on user_id
    # (time bounds as residual filter) + the sanctioned 1-row scalar
    # crossJoin; a time-range NLJ over the fact would drop the
    # required hash-join marker
    "q_event_funnel": (
        ["HashAggregate", "re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct"],
    ),
    # cogrouped-map UDF: Arrow FlatMapCoGroupsInPandas, one shuffle
    # per side — never row-pickled Python
    "q_cogroup_udf": (
        ["FlatMapCoGroupsInPandas"],
        ["BatchEvalPython", "CartesianProduct"],
    ),
    # OHLC: one window shuffle keyed by (series, hour) — parallel per
    # bucket, never a SinglePartition gather — then partial+final agg
    # OHLC: min_by/max_by selection over struct(ts, event_id) — one
    # partial+final aggregate, Window-free by requirement (r8:
    # replaced two opposite-order row_number sorts). The struct
    # ordering buffer forces SortAggregate (not hash), but
    # partial_min_by proves map-side combine: the exchange moves
    # candles, not events.
    "q_ohlc_rollup": (
        ["SortAggregate", "partial_min_by"],
        ["Window", "Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # time-weighted avg: one lead() window keyed by series + agg
    "q_time_weighted_avg": (
        ["Window", "HashAggregate"],
        ["Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # epoch shuffle: codegen hash in the scan stage, window keyed by
    # (epoch, shard) — never a global-order SinglePartition sort
    "q_epoch_shuffle": (
        ["Window"],
        ["Python", "CartesianProduct", "Exchange SinglePartition"],
    ),
    # resume schedule: shard-local windows + a BROADCAST of the tiny
    # per-epoch lockstep-length frame — never a global sort, never a
    # shuffled join against the 2-row side
    "q_dataloader_resume": (
        ["Window", "BroadcastHashJoin"],
        ["Python", "CartesianProduct", "SortMergeJoin"],
    ),
    # edit-distance ER: blocked pair generation is a HASH join on the
    # block key — never corpus x corpus
    "q_dedup_edit": (
        ["re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # exact-quota split: ONE window exchange keyed by the stratum
    # (rank and count ride it together), never a global sort
    "q_split_exact": (
        ["Window", r"re:hashpartitioning\(lang"],
        ["Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # cumulative reach: the per-user first-touch window must be
    # hash-partitioned (parallel); the only SinglePartition frame is
    # the per-DAY running sum over ~dozens of rows — allowed by design
    "q_cumulative_distinct": (
        ["Window", r"re:hashpartitioning\(user_id"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # post-vacuum read: plain pruned scan + aggregate (GC must never
    # change the current snapshot's plan or content)
    "q_store_vacuum": (
        ["Scan parquet", "HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # the skew=true attestation happens in-query under pinned confs;
    # the RETURNED frame recomputes under defaults (dim broadcasts)
    "q_join_skew_aqe": (
        ["HashAggregate"],
        ["Python", "CartesianProduct"],
    ),
    # gaps-and-islands: every stage keyed by user — never a global
    # window
    "q_streak_days": (
        ["Window", "HashAggregate", r"re:hashpartitioning\(user_id"],
        ["Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # nearest-event join: EQUI-join on the entity key + per-click
    # window — never a time-theta nested loop
    "q_join_asof_nearest": (
        ["Window",
         r"re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # hour->day re-merge: consumes the hour rollup's frame, one more
    # tiny aggregate — never re-touches raw events via a join
    # remerge consumes q_ohlc_rollup's Window-free SortAggregate hour
    # candles (r8), then one more tiny aggregate over hour rows
    "q_ohlc_remerge": (
        ["SortAggregate", "partial_min_by"],
        ["Window", "Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # priority sampling: top-(k+1) must be TakeOrdered (partition
    # heaps + driver merge), never a global sort; the tau cross-join
    # is the sanctioned 1-row scalar shape so NLJ is expected
    "q_sample_priority": (["TakeOrderedAndProject"], ["BatchEvalPython"]),
    # masked-LM corruption: one scan, index-bearing HOF transforms —
    # map-only, no Python, no shuffle
    "q_mask_lm": (["Scan parquet"], ["Python", "Exchange"]),
    # DPO pair assembly: both row_number windows share ONE (lang,
    # source) exchange; per-group extremes join on the group key
    "q_preference_pairs": (
        ["Window",
         r"re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
    # constraint audit: per-check scalar aggregates + FK anti-joins;
    # the n_rows x n_violations combine is the 1-row scalar shape
    "q_constraint_audit": (
        ["HashAggregate", "re:(LeftAnti|anti)"],
        ["BatchEvalPython"],
    ),
    # k-anonymity: one keyed rollup — map-side partial counts, one
    # shuffle on the QI tuple, no Python, no join
    "q_k_anonymity": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct",
         "Exchange SinglePartition"],
    ),
    # BPE training returns the learned merge table (a bounded local
    # relation); the per-generation vocab plans are pinned by the
    # pytest invariants in tests/test_r10_ops.py
    "q_bpe_train": ([], ["BatchEvalPython", "CartesianProduct"]),
    # span corruption: the O(n) struct-accumulator fold is pure HOF
    # codegen over one scan — no Python, no shuffle
    "q_span_corruption": (["Scan parquet"], ["Python", "Exchange"]),
    # bounded-hop BFS: final frame is a checkpointed projection; the
    # per-round join+min-agg shape matches pagerank/kcore
    "q_graph_bfs": ([], ["BatchEvalPython", "CartesianProduct"]),
    # attribution: user-keyed equi-join (never a time-theta product)
    # + ONE conversion-keyed window with ONE ascending sort (r11: the
    # descending rank derives as n - ra + 1, so a DESC sort on the
    # touch timestamp reappearing means the second sort crept back)
    "q_attribution": (
        ["Window",
         r"re:(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)",
         "HashAggregate"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop",
         r"re:tts#\d+L? DESC"],
    ),
    # path mining: both leads in ONE user-keyed Window operator,
    # deterministic top-k via TakeOrdered — never a global sort
    "q_path_analysis": (
        ["Window", "TakeOrderedAndProject",
         r"re:hashpartitioning\(user_id"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # covariance sufficient stats: ONE vectorized partial scatter per
    # partition (MapInPandas), shuffle carries only partial rows into
    # a keyed sum — no pickled-row Python, no pair explosion join
    "q_embed_covariance": (
        ["MapInPandas", "HashAggregate"],
        ["BatchEvalPython", "CartesianProduct", "Join"],
    ),
    # incremental covariance: the returned frame is the view's
    # materialized finals — a manifest-resolved parquet read
    "q_covariance_incremental": ([], ["BatchEvalPython", "CartesianProduct"]),
    # catalog profile: per-column full-scan aggregates (exact NDV is
    # the one shuffle); no Python, no join anywhere
    "q_catalog_stats": (
        ["HashAggregate"],
        ["Python", "Join", "CartesianProduct"],
    ),
    # streaming covariance: scatter-sum state rows read back from the
    # drained sink; latest-emission window, no pickled Python, no
    # product
    "q_stream_covariance": (
        ["Window"],
        ["BatchEvalPython", "CartesianProduct"],
    ),
    # streaming join view: the registered plan reads the drained sink
    # (latest emission per key -> re-aggregate); the stateful work ran
    # inside the stream (applyInPandasWithState — Python by design,
    # Arrow-batched, audited by the streaming tests, not this plan)
    "q_stream_join_view": (
        ["Window"],
        ["CartesianProduct"],
    ),
    # snapshot diff: full outer join of two manifest-pruned snapshot
    # reads on the key — an equi-join, never a product; no Python
    "q_store_diff": (
        ["re:(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).*FullOuter"],
        ["Python", "CartesianProduct", "BroadcastNestedLoop"],
    ),
}


def marker_hit(marker: str, plan: str) -> bool:
    """True when ``marker`` matches ``plan``: "re:"-prefixed markers
    are regexes, anything else is a plain substring."""
    if marker.startswith("re:"):
        return re.search(marker[3:], plan) is not None
    return marker in plan


def main() -> int:
    verbose = "-v" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(
        EXPECTATIONS
    )
    spark = get_spark("upmr-explain-audit")
    qs = all_queries()
    failures = 0
    for name in names:
        want, avoid = EXPECTATIONS.get(name, ([], []))
        df = qs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        missing = [m for m in want if not marker_hit(m, plan)]
        present = [m for m in avoid if marker_hit(m, plan)]
        ok = not missing and not present
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}"
              + (f"  missing={missing} forbidden={present}" if not ok else ""))
        if verbose or not ok:
            print(plan)
        failures += 0 if ok else 1
    print(f"\n{len(names) - failures}/{len(names)} plans match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
