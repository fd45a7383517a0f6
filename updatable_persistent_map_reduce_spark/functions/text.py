"""Text column expressions — tokenization, shingles, fingerprints.

All JVM-side Catalyst expressions (split/transform/aggregate), no
Python UDFs: at 100 TB the tokenizer runs inside whole-stage codegen
on every executor core, and Arrow never enters the picture.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer shared by word-count / text-stats / dedup ops.
# \\s+ matches the oracle's regexp_split_to_array(text, '\\s+').
TOKEN_SPLIT_RE = r"\s+"

# BPE-ish word/punct splitter: runs of letters, runs of digits, or a
# single non-space symbol — approximates subword pre-tokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_M64 = 18446744073709551616  # 2**64 — fingerprint fold modulus


def tokens_expr(col: Column, lowercase: bool = True) -> Column:
    """array<string> of whitespace tokens (empties removed)."""
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(base, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def shingles_expr(tokens: Column, k: int = 3) -> Column:
    """array<string> of word k-shingles from a token array.

    ``sequence`` + ``transform`` + ``slice`` keeps this a pure Catalyst
    expression; a doc with < k tokens yields its single joined shingle.
    """
    n = F.size(tokens)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(tokens, i, k), " ")
    )


def shingle_strings_udf(k: int = 3, distinct: bool = False):
    """Arrow-batched word-k-shingle STRINGS: text -> array<string>.

    Semantics identical to ``shingles_expr(tokens_expr(col), k)`` —
    ``str.lower().split()`` is exactly the lowercase + \\s+ split with
    empties removed — but higher-order array expressions run
    *interpreted* in Spark (outside whole-stage codegen), and the HOF
    pipeline measures 4.1 s vs 0.8 s for this UDF on the sf0.1 n-gram
    frequency query (5000 docs, 1.4M shingles). Same measured
    trade as the dedup minhash signer (operators/dedup.py). Use the
    expression form only where a plan must stay Python-free.

    ``distinct=True`` dedups per doc (order-preserving) — for
    consumers that count each shingle once per doc.
    """

    @F.pandas_udf("array<string>")
    def sh(texts: pd.Series) -> pd.Series:
        def f(t: str) -> list[str]:
            toks = t.lower().split()
            if len(toks) <= k:
                out = [" ".join(toks)]
            else:
                out = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            return list(dict.fromkeys(out)) if distinct else out

        return texts.map(f)

    # asNondeterministic: q_minhash_containment filters on
    # size(ws) > 0 above a spread() repartition, and the optimizer
    # pushed that filter below the exchange by DUPLICATING this UDF —
    # every doc paid the shingler twice (two stacked ArrowEvalPython
    # nodes over the same input). The marker blocks the duplication
    # (optimization guide §4.4); the function is genuinely
    # deterministic.
    return sh.asNondeterministic()


def fingerprint_expr(col: Column) -> Column:
    """64-bit rolling (polynomial) hash of a string — document
    fingerprinting primitive. h <- (h*1000003 + codepoint) mod 2^64,
    expressed with DECIMAL(38) intermediate so it is exactly
    reproducible in ANSI SQL (no native u64 in either engine).

    Emitted as STRING: a u64 exceeds int64 range, and DECIMAL(20,0)
    round-trips differently through Arrow (decimal128) vs DuckDB
    (Python Decimal) in pandas-level canonicalization — a digit string
    is representation-identical in every engine.
    """
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("decimal(38,0)"))
    m64 = F.lit(str(_M64)).cast("decimal(38,0)")  # 2**64 overflows a long lit
    h = F.aggregate(
        codes,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: (acc * F.lit(1000003) + c) % m64,
    )
    return h.cast("decimal(20,0)").cast("string")


def fingerprint_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`fingerprint_expr` (STRING-typed, see above)."""
    return (
        "CAST(CAST(list_reduce("
        f"list_prepend(CAST(0 AS DECIMAL(38,0)), "
        f"list_transform(list_filter(string_split({col_sql}, ''), c -> c <> ''), "
        "c -> CAST(ascii(c) AS DECIMAL(38,0)))), "
        f"(acc, c) -> (acc * 1000003 + c) % CAST({_M64} AS DECIMAL(38,0))"
        ") AS DECIMAL(20,0)) AS VARCHAR)"
    )
