"""Shared test/verification helpers: DuckDB oracle comparison.

Used by ``tests/`` and ``tools/check_oracle.py`` to replicate the
driver's t2 gate locally: row count + column names + order-insensitive
value comparison between a Spark result and its DuckDB oracle.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from .sources import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(v):
    """Make a cell comparable across engines."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def compare(spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    """Return a list of problems (empty = match)."""
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(
            f"columns: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    def row_key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    s = sorted(
        (tuple(normalize(r[i]) for i in order) for r in spark_rows), key=row_key
    )
    d = sorted(
        (tuple(normalize(r[i]) for i in dorder) for r in duck_rows), key=row_key
    )
    if s != d:
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                problems.append(f"first diff at sorted row {i}: spark={a} duck={b}")
                break
        else:
            problems.append("value mismatch")
    return problems


def driver_canon_probe(rows, cols) -> list[str]:
    """Replicate the DRIVER's canonicalization mechanics: it loads the
    result into pandas and ``sort_values`` by every column (name-sorted)
    before hashing. That crashes on unsortable cell types (lists, dicts,
    arrays — round 1's q_agg_approx_quantile failure), including for
    rows-only queries, so probe it here and report instead of crashing
    the gate."""
    import pandas as pd

    try:
        df = pd.DataFrame(rows, columns=cols)
        df = df.reindex(sorted(df.columns), axis=1)
        df.sort_values(by=list(df.columns), inplace=True)
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        return [f"driver canon would fail: {type(e).__name__}: {e}"]
    return []


def dtype_audit(spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    """Flag type-representation hazards the order-insensitive value
    compare is blind to but the DRIVER's pandas canonicalize-then-hash
    is not (round 2's q_doc_fingerprint: DECIMAL(20,0) values > 2^53
    hash differently via Arrow decimal128 vs Python Decimal).

    Two rules, both cheap:
    - any ``decimal.Decimal`` cell on either side (decimals should be
      cast to double or string before leaving a query);
    - a pandas dtype-kind mismatch between the two engines for the
      same column (int64 vs float64 vs object hash differently).
    """
    import pandas as pd

    problems = []
    for side, rows, cols in (
        ("spark", spark_rows, spark_cols),
        ("duck", duck_rows, duck_cols),
    ):
        for r in rows[:200]:  # bounded probe; type is uniform per column
            for c, v in zip(cols, r):
                if isinstance(v, decimal.Decimal):
                    problems.append(
                        f"decimal-typed column {c!r} on {side} side "
                        "(cast to DOUBLE or STRING in both engines)"
                    )
                    break
            else:
                continue
            break
    try:
        sdf = pd.DataFrame(spark_rows, columns=spark_cols)
        ddf = pd.DataFrame(duck_rows, columns=duck_cols)
    except Exception:  # noqa: BLE001 — canon probe reports this case
        return problems
    for c in sdf.columns:
        if c not in ddf.columns:
            continue
        sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
        if sk != dk and not sdf[c].isna().any() and not ddf[c].isna().any():
            problems.append(
                f"dtype mismatch for column {c!r}: "
                f"spark pandas kind={sk!r} vs duck kind={dk!r}"
            )
    return problems


def arrow_dtype_audit(spark_rows, spark_cols, duck_pdf) -> list[str]:
    """Probe the DRIVER's ACTUAL canonicalization path. The driver loads
    the DuckDB side via ``.df()`` (pandas through Arrow) before hashing;
    ``fetchall()`` deserializes HUGEINT as a plain Python int and hides
    the promotion — the class that cost two driver rows (r2
    ``q_doc_fingerprint``: DECIMAL(20,0); r9 ``q_ngram_novelty``: an
    uncast ``sum()*10000//count(*)`` promoted to HUGEINT, float64 /
    decimal128 through pandas vs Spark's int64). This audit takes the
    duck side AS A PANDAS FRAME from ``.df()`` and flags any per-column
    divergence from the Spark pandas frame the driver would hash:

    - a duck column arriving as ``decimal.Decimal`` objects (Arrow
      decimal128 — always a representational hazard, CAST in the oracle);
    - a dtype-kind mismatch (int64 vs float64 vs object) where neither
      side has NULLs (NULL-driven int->float widening is legitimate).
    """
    import pandas as pd

    problems = []
    try:
        sdf = pd.DataFrame(spark_rows, columns=spark_cols)
    except Exception:  # noqa: BLE001 — canon probe reports this case
        return problems
    if not len(sdf) or not len(duck_pdf):
        # an empty rows-list frame is all-object dtype regardless of
        # schema — kind comparison is meaningless (and the driver's
        # value hash of an empty frame carries no cell representation)
        return problems
    for c in sdf.columns:
        if c not in duck_pdf.columns:
            continue
        dcol = duck_pdf[c]
        if dcol.dtype.kind == "O" and any(
            isinstance(v, decimal.Decimal) for v in dcol.head(200)
        ):
            problems.append(
                f"duck column {c!r} reaches the driver's pandas frame as "
                "Decimal objects (HUGEINT/DECIMAL through Arrow) — "
                "CAST it to BIGINT or DOUBLE in the oracle"
            )
            continue
        sk, dk = sdf[c].dtype.kind, dcol.dtype.kind
        if sk != dk and not sdf[c].isna().any() and not dcol.isna().any():
            problems.append(
                f"driver-path dtype mismatch for column {c!r}: "
                f"spark pandas kind={sk!r} vs duck .df() kind={dk!r}"
            )
    return problems


def bound_compare(
    spark_rows, spark_cols, duck_rows, duck_cols, tol: float
) -> list[str]:
    """Tolerance compare for sketch queries: rows are keyed by their
    non-numeric columns (exact match required), numeric cells must be
    within ``tol`` relative error of the exact oracle value."""
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        return [
            f"columns: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        ]
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
        )

    def keyed(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = {}
        for r in rows:
            cells = [normalize(r[i]) for i in order]
            key = tuple(c for c in cells if not isinstance(c, (int, float)))
            out[key] = [c for c in cells if isinstance(c, (int, float))]
        return out

    s, d = keyed(spark_rows, spark_cols), keyed(duck_rows, duck_cols)
    for key, exact in d.items():
        if key not in s:
            problems.append(f"missing key {key}")
            continue
        for est, ex in zip(s[key], exact):
            if abs(est - ex) > tol * max(1.0, abs(ex)):
                problems.append(
                    f"key {key}: estimate {est} vs exact {ex} "
                    f"outside rel tol {tol}"
                )
    return problems


def check_query(spark, con, query, sf_dir: str) -> list[str]:
    """Run one registered Query against both engines; [] = pass."""
    sdf = query.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    problems = driver_canon_probe(spark_rows, spark_cols)
    if query.oracle is None:
        if query.bound is not None:
            exact_sql, tol = query.bound
            res = con.execute(exact_sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            problems += bound_compare(
                spark_rows, spark_cols, duck_rows, duck_cols, tol
            )
        return problems  # rows-only: runs + canonicalizable
    res = con.execute(query.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    # Second fetch via .df(): the driver's actual (pandas-through-Arrow)
    # path, where HUGEINT/DECIMAL promotions are visible. fetchall()
    # above stays the value-compare path (native Python cells).
    duck_pdf = con.execute(query.oracle).df()
    return (
        problems
        + compare(spark_rows, spark_cols, duck_rows, duck_cols)
        + dtype_audit(spark_rows, spark_cols, duck_rows, duck_cols)
        + arrow_dtype_audit(spark_rows, spark_cols, duck_pdf)
    )
