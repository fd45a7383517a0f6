"""Query/operator registry.

Every operator the engine exposes is registered as a :class:`Query`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) the ANSI-SQL oracle string DuckDB runs
on the same parquet tables. The driver compares the two at sf0.01 —
that is the correctness gate; rows-only queries (approximate or
engine-stateful ops) carry ``oracle=None``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""
    # Tolerance-mode oracle for sketch/approximate queries: (exact
    # DuckDB SQL with IDENTICAL column names, relative tolerance).
    # The external driver still sees oracle=None (a hash compare of an
    # estimate is meaningless), but the LOCAL gate joins estimate to
    # exact on the key columns and enforces |est - exact| <=
    # tol * max(1, |exact|) — converting "ran cleanly" rows into
    # bounded-error checks.
    bound: tuple[str, float] | None = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bound: tuple[str, float] | None = None,
):
    """Decorator: register a query callable under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=doc, bound=bound
        )
        return fn

    return wrap


# Registry iteration order follows ONE rule, applied mechanically each
# round so any budget-bounded external checker that samples a prefix
# sees the queries whose external attestation is most valuable — i.e.
# the ones LEAST RECENTLY validated by the driver, never a flattering
# hand-picked subset:
#   1.  queries whose implementation changed since their last
#       attestation (the prior green row no longer covers the code —
#       the hand-declared ``_CHANGED`` list, reset each round);
#   2.  then queries that have never been attested (new this round;
#       any excess past a checker's sample size rolls to next round);
#   3.  then everything else, least-recently-attested first — which
#       ALSO encodes the staleness cap (r11 verdict item 7): any
#       oracle-backed query whose latest green row is
#       ``_STALE_ROUNDS``+ rounds old sorts ahead of every younger
#       one by construction, so freshness debt can never silently
#       re-accumulate behind a flattering rotation; only the (small)
#       changed/new sets ever precede a stale query.
#   4.  rows-only queries LAST (r10 verdict item 2): they can never
#       produce a green driver row (err: no_oracle), so a budget-
#       bounded sample reaching them burns a slot the oracle-backed
#       backlog could use; the LOCAL gate still bounds them every
#       round (Query.bound tolerances / recall pytests).
# Since r12 the vintage tiers are COMPUTED from the driver's own
# CORRECTNESS_r*.json artifacts at import (previously a hand-
# maintained list that let a 29-query r6 tier age five rounds), and
# the rule is pinned by tests/test_r12_ops.py over synthetic
# histories. The order never hides anything: the full local gate
# (tools/check_oracle.py, run per round) validates every registered
# query regardless of position, and the union of driver rounds covers
# all of them.

# Implementations changed since their last green driver row (reset
# each round). r12: the two exercisers of the narrowed
# store.append_materializing (single-snapshot + intersecting-span
# rule 2 + base_version-pinned append) and the takedown cascade
# (scratch-dir lifecycle rewrite). q_stream_view_upsert is re-listed
# because StreamingMapReduceView._apply_batch grew the takedown
# routing branch (a no-op at op_col=None, but it IS on the path).
_CHANGED = [
    "q_neardup_index_persisted",
    "q_stream_neardup_gate",
    "q_takedown_cascade",
    "q_stream_view_upsert",
    # r12 differential sweep fix: rank statistics emitted as exact ppm
    # integers instead of round(double, 6) (cross-engine half-ulp trap)
    "q_window_ntile",
    "q_window_distribution",
    # late-r12 addition: delta-join view maintenance (plans/join_view.py)
    "q_join_view_incremental",
    # late-r12 addition: checkpoint-resume dataloader schedule
    "q_dataloader_resume",
    # late-r12 addition: streaming twin of the delta-join view
    "q_stream_join_view",
    # late-r12 addition: time travel on the delta-join view
    "q_join_view_time_travel",
    # late-r12 addition: packing with attention-boundary metadata
    "q_pack_boundary_attention",
    # r12 optimization round: single-eval UDFs (asNondeterministic,
    # guide §4.4) on the shinglers / IVF assigner, footer-stats batch
    # bounds + scoped bootstrap count on the events view, and the
    # JoinView maintenance-scope/job-count work
    "q_dedup_near",
    "q_dedup_near_clusters",
    "q_minhash_containment",
    "q_upsert_recount",
    "q_key_migration",
    "q_store_compaction",
    "q_dedup_semantic",
    "q_dedup_embed",
    "q_dedup_cluster",
]

# Rows-only by design (oracle=None is intrinsic: sketches/ANN recall
# paths whose estimates a hash compare cannot adjudicate).
_ROWS_ONLY_LAST = [
    "q_sketch_union", "q_approx_distinct", "q_agg_approx_quantile",
    "q_sim_search_lsh", "q_sim_search_ivf",
]

# A query whose latest green driver row is this many rounds old is
# STALE: the ordering guarantees it precedes every younger query.
_STALE_ROUNDS = 4


def _attestation_history() -> dict[int, dict]:
    """round -> parsed CORRECTNESS_r{N}.json, from the repo root the
    package lives in. Missing/corrupt files are skipped — the order
    degrades to registration order, never to an import error."""
    import glob
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out: dict[int, dict] = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        mt = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not mt:
            continue
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            out[int(mt.group(1))] = data
    return out


def _vintages(history: dict[int, dict]) -> dict[str, int]:
    """query -> round of its LATEST green driver row (rows + schema +
    hash all matched). Errors/red rows never advance a vintage."""
    v: dict[str, int] = {}
    for rnd in sorted(history):
        for name, row in history[rnd].items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                v[name] = rnd
    return v


def priority_order(
    names: Iterable[str],
    history: dict[int, dict],
    changed: Sequence[str] = (),
    rows_only: Sequence[str] = (),
) -> list[str]:
    """The mechanical sample order described above, exposed as a pure
    function of the attestation history so tests can drive it with
    synthetic histories. Ties inside a tier break alphabetically —
    deterministic, never flattering."""
    names = list(names)
    vintage = _vintages(history)
    changed_set = {n for n in changed if n in names}
    rows_only_set = {n for n in rows_only if n in names}
    head = [n for n in changed if n in changed_set]
    new = sorted(
        n
        for n in names
        if n not in vintage
        and n not in changed_set
        and n not in rows_only_set
    )
    rest = sorted(
        (
            n
            for n in names
            if n in vintage
            and n not in changed_set
            and n not in rows_only_set
        ),
        key=lambda n: (vintage[n], n),
    )
    tail = [n for n in names if n in rows_only_set]
    return head + new + rest + tail


def stale_queries(
    names: Iterable[str],
    history: dict[int, dict],
    rows_only: Sequence[str] = (),
    stale_rounds: int = _STALE_ROUNDS,
) -> list[str]:
    """Oracle-backed queries whose latest green row is ``stale_rounds``
    or more rounds behind the newest attestation round — the set the
    ordering must place ahead of everything but changed/new."""
    if not history:
        return []
    vintage = _vintages(history)
    current = max(history) + 1  # the round about to be sampled
    return sorted(
        n
        for n in names
        if n not in set(rows_only)
        and n in vintage
        and current - vintage[n] >= stale_rounds
    )





def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text_analysis  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import windows  # noqa: F401
    from . import incremental  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import search  # noqa: F401
    from . import graph  # noqa: F401
    from . import stream_attested  # noqa: F401
    from . import layout  # noqa: F401
    from . import takedown  # noqa: F401
    from . import anchor  # noqa: F401

    order = priority_order(
        REGISTRY, _attestation_history(), _CHANGED, _ROWS_ONLY_LAST
    )
    return {n: REGISTRY[n] for n in order}
