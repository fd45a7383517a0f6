"""Every registered query hash-matches its DuckDB oracle (driver t2 twin).

Runs at sf0.001 for speed; ``tools/check_oracle.py --sf .../sf0.01``
is the full-size local gate.
"""

from __future__ import annotations

import pytest

from updatable_persistent_map_reduce_spark.operators import all_queries
from updatable_persistent_map_reduce_spark.testing import check_query, duck_con

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con, sf_dir):
    problems = check_query(spark, con, QUERIES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_dtype_audit_catches_decimal(spark, con, sf_dir):
    """A seeded decimal-typed query must FAIL the local gate's dtype
    audit (the round-2 q_doc_fingerprint driver-hash bug class:
    DECIMAL(20,0) > 2^53 hashes differently via Arrow decimal128 vs
    Python Decimal even when values compare equal)."""
    from updatable_persistent_map_reduce_spark.operators import Query

    def fn(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from pyspark.sql import functions as F

        return d.select(
            "doc_id",
            (F.col("n_chars").cast("decimal(20,0)") * 12345678901234567)
            .alias("big"),
        ).limit(5)

    bad = Query(
        name="q_seeded_decimal",
        fn=fn,
        oracle=(
            "SELECT doc_id, CAST(n_chars AS DECIMAL(38,0)) * "
            "12345678901234567 AS big FROM documents LIMIT 5"
        ),
    )
    problems = check_query(spark, con, bad, sf_dir)
    assert any("decimal-typed column" in p for p in problems), problems


def test_arrow_dtype_audit_catches_uncast_hugeint(spark, con, sf_dir):
    """The r9 q_ngram_novelty driver-red class: an UNCAST DuckDB
    ``sum(...) * 10000 // count(*)`` promotes to HUGEINT. ``fetchall()``
    deserializes it as a plain Python int (value-equal → the old audit
    was blind), but the driver's ``.df()`` path surfaces it as float64
    vs Spark's int64 → hash mismatch. The hardened gate must fail this
    query locally even though every VALUE compares equal."""
    from updatable_persistent_map_reduce_spark.operators import Query

    def fn(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        from pyspark.sql import functions as F

        return d.groupBy("lang").agg(
            (F.sum("n_chars") * F.lit(10000) / F.count("*"))
            .cast("bigint")
            .alias("bp")
        )

    bad = Query(
        name="q_seeded_hugeint",
        fn=fn,
        oracle=(
            # deliberately UNCAST: sum() promotes to HUGEINT in DuckDB
            "SELECT lang, sum(n_chars) * 10000 // count(*) AS bp "
            "FROM documents GROUP BY lang"
        ),
    )
    problems = check_query(spark, con, bad, sf_dir)
    assert any(
        "driver-path dtype mismatch" in p or "Decimal objects" in p
        for p in problems
    ), problems
    # and the same query with the cast passes — proving the audit
    # flags the representation, not the values
    good = Query(name="q_seeded_hugeint_cast", fn=fn, oracle=(
        "SELECT lang, CAST(sum(n_chars) * 10000 // count(*) AS BIGINT) "
        "AS bp FROM documents GROUP BY lang"
    ))
    assert not check_query(spark, con, good, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"group_key", "cnt"}


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


def test_bound_compare_catches_violation(spark, con, sf_dir):
    """A seeded out-of-tolerance 'estimate' must FAIL the bounded
    check (guards the tolerance oracle from silently passing on key
    mismatches or dead comparison paths)."""
    from pyspark.sql import functions as F

    from updatable_persistent_map_reduce_spark.operators import Query

    def fn(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # deliberately 2x the true per-lang count: far outside 15%
        return d.groupBy("lang").agg(
            (F.count(F.lit(1)) * 2).alias("n_docs")
        )

    bad = Query(
        name="q_seeded_bad_estimate",
        fn=fn,
        oracle=None,
        bound=(
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY lang",
            0.15,
        ),
    )
    problems = check_query(spark, con, bad, sf_dir)
    assert any("outside rel tol" in p for p in problems), problems


def test_bound_compare_catches_missing_key(spark, con, sf_dir):
    """A missing group in the estimate must be reported, not skipped."""
    from pyspark.sql import functions as F

    from updatable_persistent_map_reduce_spark.operators import Query

    def fn(spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        first = d.select(F.min("lang").alias("m"))
        return (
            d.join(F.broadcast(first))
            .filter(F.col("lang") != F.col("m"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    bad = Query(
        name="q_seeded_missing_key",
        fn=fn,
        oracle=None,
        bound=(
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY lang",
            0.15,
        ),
    )
    problems = check_query(spark, con, bad, sf_dir)
    assert any("missing key" in p for p in problems), problems
