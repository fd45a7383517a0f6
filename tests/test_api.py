"""The reference's Program.cs smoke scenario through the
reference-shaped API (MapReduceTask + Executer.create/execute/query),
asserting the exact documented end state (Program.cs:26-49:
CA 397 -> 396, TX 256 -> 257, total conserved at 653)."""

from __future__ import annotations

from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark import Executer, MapReduceTask


def test_reference_program_through_api(spark, tmp_path):
    task = MapReduceTask(
        id_col="id",
        group_cols=["state"],
        map_fn=lambda df: df.select("id", "state", F.lit(1).alias("count")),
        agg_exprs=[F.sum("count").alias("count")],
        options={"n_key_spans": 8, "n_doc_spans": 8},
    )
    ex = Executer.create(spark, task, str(tmp_path / "people"))

    batch1 = [(f"people-{i}", "CA") for i in range(1, 398)] + [
        (f"people-{i}", "TX") for i in range(398, 654)
    ]
    ex.execute(spark.createDataFrame(batch1, "id string, state string"))
    first = {
        r.state: r["count"]
        for r in ex.query("CA").unionByName(ex.query("TX")).collect()
    }
    assert first == {"CA": 397, "TX": 256}

    # people-30 moves CA -> TX (Program.cs:35-39)
    ex.execute(spark.createDataFrame([("people-30", "TX")], "id string, state string"))
    second = {
        r.state: r["count"]
        for r in ex.query("CA").unionByName(ex.query("TX")).collect()
    }
    assert second == {"CA": 396, "TX": 257}
    assert sum(first.values()) == sum(second.values()) == 653

    # unknown key => empty, no error (Executer.cs:373-374)
    assert ex.query("ZZ").count() == 0


def test_survey_inventory_matches_registry():
    """SURVEY.md §2 (the coverage checklist) and the query registry may
    not drift: every registered query appears in §2 and every q_* id
    named in §2 is registered."""
    import os
    import re

    from updatable_persistent_map_reduce_spark.operators import all_queries

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    survey = open(os.path.join(root, "SURVEY.md")).read()
    sec2 = survey[
        survey.index("## 2. Operator inventory"):
        survey.index("## 3. Query lifecycle")
    ]
    survey_ids = set(re.findall(r"q_[a-z0-9_]+", sec2))
    reg = set(all_queries())
    assert reg - survey_ids == set(), f"not in SURVEY §2: {sorted(reg - survey_ids)}"
    assert survey_ids - reg == set(), f"phantom in SURVEY §2: {sorted(survey_ids - reg)}"


def test_api_maintenance_surface(spark, tmp_path):
    """The Spark-native extras on the reference-shaped handle:
    alter_reduce / stats / history reach the underlying view."""
    task = MapReduceTask(
        id_col="id",
        group_cols=["state"],
        map_fn=lambda df: df.select(
            "id", "state", F.lit(1).alias("count"), "v"
        ),
        agg_exprs=[F.sum("count").alias("count")],
        options={"n_key_spans": 4, "n_doc_spans": 4},
    )
    ex = Executer.create(spark, task, str(tmp_path / "m"))
    ex.execute(
        spark.createDataFrame(
            [("a", "CA", 2), ("b", "CA", 3), ("c", "TX", 5)],
            "id string, state string, v long",
        )
    )
    ex.alter_reduce(
        agg_exprs=[F.sum("count").alias("count"), F.sum("v").alias("v_sum")]
    )
    got = {
        r["state"]: (r["count"], r["v_sum"]) for r in ex.final_df().collect()
    }
    assert got == {"CA": (2, 5), "TX": (1, 5)}
    assert ex.stats()["batch_seq"] == 1
    assert "final_results" in ex.history()


def test_priority_order_covers_registry_exactly():
    """The computed least-recently-validated-first iteration order
    must name every registered query exactly once and nothing else,
    and the hand-declared changed/rows-only lists must never name a
    phantom query (a typo would silently demote a real query out of
    the driver's front-of-registry sample)."""
    from updatable_persistent_map_reduce_spark.operators import (
        _CHANGED,
        _ROWS_ONLY_LAST,
        REGISTRY,
        all_queries,
    )

    ordered = list(all_queries())
    assert len(ordered) == len(set(ordered)), "duplicate in order"
    assert set(ordered) == set(REGISTRY), (
        f"phantom: {sorted(set(ordered) - set(REGISTRY))}; "
        f"unlisted: {sorted(set(REGISTRY) - set(ordered))}"
    )
    assert set(_CHANGED) <= set(REGISTRY), sorted(
        set(_CHANGED) - set(REGISTRY)
    )
    assert set(_ROWS_ONLY_LAST) <= set(REGISTRY)
    # rows-only really are the ones without oracles, and vice versa
    no_oracle = {n for n, q in REGISTRY.items() if q.oracle is None}
    assert no_oracle == set(_ROWS_ONLY_LAST), no_oracle
