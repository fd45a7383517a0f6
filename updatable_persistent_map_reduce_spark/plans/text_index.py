"""Persisted inverted text index — BM25 serving as a STORE artifact.

`q_bm25` re-tokenizes the corpus per query; a serving deployment
builds postings ONCE and scores queries against them. `InvertedIndex`
does that with the engine's storage machinery:

- **postings**: one :class:`ManifestTable` of (token, doc_id, tf, dl)
  rows, span column = ``tspan`` = pmod(xxhash64(token), n_spans) — a
  query's terms hash to a handful of spans, so scoring reads ONLY
  those spans' files (manifest span pruning applied to text
  retrieval; the reference's FinalResults-point-read contract,
  Executer.cs:370-376, for search). Document frequency is computed
  from the probed postings at query time, so it is always consistent
  with the files actually read.
- **corpus stats**: (n_docs, total_dl) as driver-side JSON — the BM25
  scalars, updated on append (the mergeable part of the statistics).
- **incremental upsert**: new documents' postings APPEND under an
  atomic manifest snapshot; no rebuild, queries immediately see them.
  (Replacing an existing doc_id routes through a doc-index exactly
  like the view's latest-wins path; growth-only here.)

At 100 TB: postings are the corpus's dominated-by-explode table —
written once, bucketed by term-hash span; a Q-term query scans
corpus·(Q/n_spans) worth of postings bytes, and scoring is one
partial+final aggregate plus a top-k, never a corpus scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from .store import ManifestTable

K1 = 1.2
B = 0.75


class InvertedIndex:
    def __init__(self, spark: SparkSession, path: str, n_spans: int = 32):
        self.spark = spark
        self.path = path
        self.n_spans = n_spans
        self._post = ManifestTable(os.path.join(path, "postings"), "tspan")
        self._stats_path = os.path.join(path, "stats.json")

    # ----- build / maintain ------------------------------------------------

    def _postings(self, docs: DataFrame) -> DataFrame:
        toks = docs.select(
            "doc_id", tokens_expr(F.col("text")).alias("toks")
        ).select("doc_id", F.size("toks").alias("dl"), "toks")
        return (
            toks.select("doc_id", "dl", F.explode("toks").alias("token"))
            .groupBy("token", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "tspan",
                F.pmod(F.xxhash64("token"), F.lit(self.n_spans)).cast("int"),
            )
        )

    def _doc_stats(self, docs: DataFrame) -> tuple[int, int]:
        [[n, dl]] = (
            docs.select(F.size(tokens_expr(F.col("text"))).alias("dl"))
            .agg(F.count(F.lit(1)), F.coalesce(F.sum("dl"), F.lit(0)))
            .collect()
        )
        return int(n), int(dl)

    def build(self, docs: DataFrame) -> None:
        """Tokenize ``docs`` (doc_id, text) into term-hash-bucketed
        postings; one write job, atomic publish."""
        mapping = self._post.write_data(self._postings(docs))
        self._post.commit(replace_all=mapping)
        n, dl = self._doc_stats(docs)
        with open(self._stats_path, "w") as f:
            json.dump({"n_docs": n, "total_dl": dl}, f)

    def upsert(self, new_docs: DataFrame) -> None:
        """Append new documents' postings + merge the corpus scalars —
        an incremental index update, crash-safe like every table."""
        mapping = self._post.write_data(self._postings(new_docs))
        self._post.commit(append=mapping)
        n, dl = self._doc_stats(new_docs)
        s = self.stats()
        with open(self._stats_path, "w") as f:
            json.dump(
                {
                    "n_docs": s["n_docs"] + n,
                    "total_dl": s["total_dl"] + dl,
                },
                f,
            )

    def stats(self) -> dict:
        with open(self._stats_path) as f:
            return json.load(f)

    # ----- serve -----------------------------------------------------------

    def _term_spans(self, terms: list[str]) -> list[int]:
        rows = (
            self.spark.createDataFrame([(t,) for t in terms], "token string")
            .select(
                F.pmod(F.xxhash64("token"), F.lit(self.n_spans)).cast("int")
            )
            .collect()
        )
        return sorted({r[0] for r in rows})

    def bm25(self, terms: list[str], k: int = 20) -> DataFrame:
        """Okapi BM25 top-k over the probed postings spans only.
        Identical scoring to operators/search.q_bm25 (fixed-order
        per-term sum, rounded before ranking); df comes from the
        probed postings, (n_docs, avgdl) from the merged stats."""
        s = self.stats()
        n_docs = int(s["n_docs"])
        avgdl = float(s["total_dl"]) / n_docs
        spans = self._term_spans(terms)
        post = self._post.read(self.spark, spans=spans)
        if post is None:
            return self.spark.createDataFrame(
                [], "doc_id long, score double"
            )
        tf = post.filter(F.col("token").isin(terms))
        dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        scored = tf.join(F.broadcast(dfreq), "token").select(
            "doc_id",
            "token",
            (
                F.log(
                    ((F.lit(n_docs) - F.col("df")) + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (
                    F.col("tf")
                    # literal 2.2, not K1+1.0: 1.2 is inexact in binary,
                    # so the sum differs from the literal by 1 ulp and
                    # would round() differently from the oracle's 2.2
                    * F.lit(2.2)
                    / (
                        F.col("tf")
                        + F.lit(K1)
                        * (
                            F.lit(1.0 - B)
                            + F.lit(B) * (F.col("dl") / F.lit(avgdl))
                        )
                    )
                )
            ).alias("sc"),
        )
        p = scored.groupBy("doc_id").agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("token") == t, F.col("sc"))),
                    F.lit(0.0),
                ).alias(f"s_{i}")
                for i, t in enumerate(terms)
            ]
        )
        total = F.col("s_0")
        if len(terms) == 3:
            # fixed evaluation order matching the oracle: s0 + (s1 + s2)
            total = F.col("s_0") + (F.col("s_1") + F.col("s_2"))
        else:
            for i in range(1, len(terms)):
                total = total + F.col(f"s_{i}")
        ranked = p.select(
            "doc_id", F.round(total, 4).alias("score")
        ).orderBy(F.desc("score"), "doc_id")
        return ranked.limit(k)
