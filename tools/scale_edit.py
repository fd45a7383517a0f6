"""Measure edit-distance blocking cost vs corpus size: composite
length-band key vs the old (lang, source)-only key.

The claim (operators/dedup.py:edit_blocked_pairs) is that composing
``floor(prefix_len / 51)`` into the blocking key with a same+adjacent
band join is (a) LOSSLESS for the <= 50 Levenshtein threshold — the
distance bounds length drift to <= 50 < 51, so no qualifying pair can
sit two bands apart — and (b) bounds candidate volume by
LENGTH-LOCALITY instead of whole-corpus block mass: where the old key
produced ~corpus²/|blocks| pairs (quadratic per octave), the banded
key's per-band populations stay put as a growing corpus spreads over
a growing length range, so candidates per doc stay FLAT.

This tool measures both directly on a Catalyst-synthetic corpus
(no driver-side text building):

- doc lengths uniform over [150, l_max]; l_max doubles with the
  corpus each octave (the realistic growth mode: more sources, more
  formats, more length diversity — the regime blocking keys are FOR);
- content is per-doc hash-hex (min length 150 keeps random-pair edit
  distance comfortably above the 50 threshold: ~0.5 * 150 = 75);
- 1 doc pair in 50 is a PLANTED near-dup: the odd twin is the even
  twin's text + "xyz" (distance exactly 3; the +3 length drift also
  exercises the adjacent-band arm of the join whenever the base doc
  sits within 3 chars of a band boundary).

Three things are ASSERTED, not just printed:
1. planted recall is 100% at every octave — every planted pair
   appears in the banded result with dist == 3, and exactly once
   (duplicate emission would double-count);
2. at the smallest octave the banded result EQUALS the unblocked
   (lang, source)-only brute force, row for row — the losslessness
   proof executed, not just argued;
3. banded candidates per doc do not grow across octaves (flat within
   25% slack), while the old key's pair count quadruples per octave
   (computed arithmetically as sum(block²) — never materialized).

Usage: python tools/scale_edit.py [n1 n2 ...]  (default 20000 40000 80000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.dedup import (  # noqa: E402
    _EDIT_MAX,
    edit_blocked_pairs,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

L_MIN = 150       # random-pair dist ~0.5*len stays well above _EDIT_MAX
PLANT_EVERY = 50  # even/odd doc pairs (2k, 2k+1) with k%50==0 are twins


def synth_corpus(spark: SparkSession, n_docs: int, l_max: int) -> DataFrame:
    """(doc_id, lang, source, p): hash-hex strings, lengths uniform in
    [L_MIN, l_max]. Twin docs share a generator id (gid) so the odd
    member reproduces the even member's text, then appends 'xyz'."""
    df = spark.range(n_docs).repartition(
        spark.sparkContext.defaultParallelism
    )
    doc_id = F.col("id")
    is_twin = (doc_id % 2 == 1) & ((doc_id / 2).cast("long") % PLANT_EVERY == 0)
    gid = F.when(is_twin, doc_id - 1).otherwise(doc_id)
    length = F.lit(L_MIN) + F.pmod(
        F.xxhash64(gid * 7 + 1), F.lit(l_max - L_MIN + 1)
    )
    n_chunks = l_max // 16 + 1
    base = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_chunks - 1)),
            lambda i: F.lpad(
                F.hex(F.abs(F.xxhash64(gid * 1000003 + i))), 16, "0"
            ),
        ),
        "",
    )
    p = base.substr(F.lit(1), length)
    p = F.when(is_twin, F.concat(p, F.lit("xyz"))).otherwise(p)
    return df.select(
        doc_id.alias("doc_id"),
        F.concat(F.lit("lang"), gid % 4).alias("lang"),
        F.concat(F.lit("src"), gid % 8).alias("source"),
        p.alias("p"),
    )


def banded_result(d: DataFrame) -> DataFrame:
    return (
        edit_blocked_pairs(d)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= _EDIT_MAX)
    )


def brute_result(d: DataFrame) -> DataFrame:
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "source",
        F.col("p").alias("pa"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), "lang", "source",
        F.col("p").alias("pb"),
    )
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= _EDIT_MAX)
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 40_000, 80_000]
    spark = get_spark("upmr-scale-edit")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    # --- losslessness, executed: banded == brute at a small corpus ---
    small = synth_corpus(spark, 2_000, 400).cache()
    banded = {tuple(r) for r in banded_result(small).collect()}
    brute = {tuple(r) for r in brute_result(small).collect()}
    assert banded == brute, (
        f"banded != brute at n=2000: only-banded={banded - brute} "
        f"only-brute={brute - banded}"
    )
    small.unpersist()
    print(f"n=    2,000  banded == unblocked brute force "
          f"({len(brute)} pairs) — losslessness executed OK")

    per_doc: dict[int, float] = {}
    old_pairs: dict[int, int] = {}
    l0 = 400
    for octave, n in enumerate(sizes):
        l_max = l0 * (n // sizes[0])  # length diversity grows with corpus
        d = synth_corpus(spark, n, l_max).cache()
        t0 = time.perf_counter()
        cand = edit_blocked_pairs(d).count()
        dt_cand = time.perf_counter() - t0
        # Planted recall WITHOUT scoring every candidate (the DP over
        # tens of millions of candidates is the production cost being
        # bounded, not something this tool needs to pay per octave):
        # restrict the candidate set to the planted id pairs, then DP
        # just those and demand dist == 3, present exactly once each.
        planted = (
            edit_blocked_pairs(d)
            .filter(
                (F.col("doc_a") % 2 == 0)
                & (F.col("doc_b") == F.col("doc_a") + 1)
                & ((F.col("doc_a") / 2).cast("long") % PLANT_EVERY == 0)
            )
            .select(
                "doc_a",
                "doc_b",
                F.levenshtein("pa", "pb").alias("dist"),
            )
            .collect()
        )
        n_planted_expected = len(
            [k for k in range(0, n // 2, PLANT_EVERY) if 2 * k + 1 < n]
        )
        assert len(planted) == n_planted_expected, (
            f"planted recall broken at n={n}: "
            f"{len(planted)} != {n_planted_expected}"
        )
        assert all(r["dist"] == 3 for r in planted), "planted dist != 3"
        # exactly once each (duplicate emission check)
        assert len({(r["doc_a"], r["doc_b"]) for r in planted}) == len(
            planted
        ), "duplicate pairs"
        n_planted_found = len(planted)
        # old-key pair volume, arithmetically: sum over blocks of C(b,2)
        old = (
            d.groupBy("lang", "source")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("p"))
            .collect()[0]["p"]
        )
        d.unpersist()
        per_doc[n] = cand / n
        old_pairs[n] = int(old)
        print(
            f"n={n:>9,} l_max={l_max:>5}  banded_candidates={cand:>10,} "
            f"({cand / n:6.1f}/doc, {dt_cand:5.1f}s)  "
            f"old_key_pairs={int(old):>13,}  planted={n_planted_found}"
        )

    if len(sizes) >= 2:
        a, b = sizes[0], sizes[-1]
        growth = per_doc[b] / per_doc[a]
        old_growth = old_pairs[b] / old_pairs[a]
        print(
            f"{b // a}x corpus: banded candidates/doc {growth:.2f}x "
            f"({'flat OK' if growth <= 1.25 else 'CHECK'}), "
            f"old-key pairs {old_growth:.1f}x "
            f"(quadratic: expected ~{(b / a) ** 2:.0f}x)"
        )
        assert growth <= 1.25, f"banded per-doc candidates grew {growth:.2f}x"


if __name__ == "__main__":
    main()
