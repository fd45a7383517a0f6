"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``):
the dot product compiles to a JVM loop inside whole-stage codegen, so
brute-force similarity scans stay off the Python path entirely. For
very high dimensional / very hot paths a vectorized pandas_udf over
Arrow batches is the alternative (see operators/similarity.py), but
for d=32..1024 the native expression is competitive and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))
