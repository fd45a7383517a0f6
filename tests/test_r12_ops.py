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
