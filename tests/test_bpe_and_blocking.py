"""Property tests for the r8 kernels whose exactness claims rest on
small combinatorial arguments: the BPE one-pass-per-rule merge
application (greedy leftmost == simultaneous marking, valid only
because self-pair rules are excluded) and the edit-distance length-band
blocking (same+adjacent bands lose no pair at threshold 50)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _apply_rule_py(toks: list[str], a: str, b: str) -> list[str]:
    """Reference greedy leftmost non-overlapping merge of (a, b)."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(toks[i] + toks[i + 1])
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


_CHARS = st.sampled_from("abc")
_WORDS = st.lists(_CHARS, min_size=1, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(_WORDS, min_size=1, max_size=6),
    data=st.data(),
)
def test_bpe_apply_matches_greedy_reference(spark, words, data):
    """The simultaneous-marking Catalyst rule application must equal
    greedy leftmost merging for EVERY rule chain without self-pairs —
    including rules over tokens produced by earlier rules."""
    from updatable_persistent_map_reduce_spark.operators.text_analysis import (
        bpe_apply_rules,
        chars_expr,
    )

    # rule chain: char pairs plus (sometimes) a second-generation rule
    # whose left side is a merged token
    pairs = data.draw(
        st.lists(
            st.tuples(_CHARS, _CHARS).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=3,
        )
    )
    rules = [{"a": a, "b": b} for a, b in pairs]
    if data.draw(st.booleans()):
        a0, b0 = pairs[0]
        c = data.draw(_CHARS)
        if a0 + b0 != c:  # self-pair guard on the composed rule
            rules.append({"a": a0 + b0, "b": c})

    expect = []
    for w in words:
        toks = list(w)
        for r in rules:
            toks = _apply_rule_py(toks, r["a"], r["b"])
        expect.append(toks)

    df = spark.createDataFrame(
        [("".join(w),) for w in words], "w string"
    ).withColumn("cs", chars_expr(F.col("w")))
    got = [
        r["cs"]
        for r in bpe_apply_rules(df, rules).orderBy("w").collect()
    ]
    want = [e for _, e in sorted(zip(["".join(w) for w in words], expect))]
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=130), min_size=2,
                  max_size=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_edit_banding_loses_no_pair(spark, lens, seed):
    """edit_blocked_pairs must emit EVERY pair the unblocked generator
    emits at dist <= 50, each exactly once — adversarial lengths near
    band boundaries included (the strategy draws raw lengths; the
    banding sees floor(len/51))."""
    import random

    from updatable_persistent_map_reduce_spark.operators.dedup import (
        _EDIT_MAX,
        edit_blocked_pairs,
    )

    rng = random.Random(seed)
    rows = []
    for i, ln in enumerate(lens):
        # half the docs are prefix-mutations of the previous doc so
        # qualifying pairs actually occur near band edges
        if i % 2 == 1 and rows:
            base = rows[-1][1]
            p = (base + "x" * 60)[:ln]
        else:
            p = "".join(rng.choice("abcdef") for _ in range(ln))
        rows.append((i, p))
    d = spark.createDataFrame(
        [(i, "l", "s", p) for i, p in rows],
        "doc_id long, lang string, source string, p string",
    )
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in edit_blocked_pairs(d)
        .select(
            "doc_a", "doc_b", F.levenshtein("pa", "pb").alias("dist")
        )
        .filter(F.col("dist") <= _EDIT_MAX)
        .collect()
    }
    # exactly-once: the generator's own output may not duplicate
    all_cand = edit_blocked_pairs(d).select("doc_a", "doc_b").collect()
    assert len(all_cand) == len({(r["doc_a"], r["doc_b"]) for r in all_cand})
    # unblocked brute force over the tiny corpus (Spark levenshtein,
    # the same DP the blocked path scores with)
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("p").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")
    )
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.levenshtein("pa", "pb") <= _EDIT_MAX)
        .collect()
    }
    assert banded == brute


# ---------------------------------------------------------------------------
# r10: iterative BPE TRAINING vs a Python reference trainer


def _train_py(words: list[str], gens: int):
    """Reference Sennrich trainer with the repo's conventions:
    occurrence-weighted pair counts over the vocab, (count DESC,
    pair ASC) tiebreak, self-pairs excluded, greedy leftmost apply."""
    from collections import Counter

    wf = Counter(words)
    vocab = {w: list(w) for w in wf}
    out = []
    for gen in range(1, gens + 1):
        pc = Counter()
        for w, toks in vocab.items():
            for x, y in zip(toks, toks[1:]):
                if x != y:
                    pc[(x, y)] += wf[w]
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w in vocab:
            vocab[w] = _apply_rule_py(vocab[w], a, b)
        sub = sum(wf[w] * len(t) for w, t in vocab.items())
        out.append((gen, a, b, c, sub))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(st.lists(_WORDS, min_size=1, max_size=8),
                     min_size=1, max_size=5))
def test_bpe_train_matches_python_reference_trainer(spark, docs):
    """q_bpe_train's distributed count/pick/merge/recount loop must
    equal the sequential reference trainer on arbitrary corpora —
    including early stop when the corpus runs out of pairs."""
    import os
    import tempfile

    from updatable_persistent_map_reduce_spark.operators import all_queries

    texts = [" ".join("".join(w) for w in d) for d in docs]
    words = [w for t in texts for w in t.split()]
    want = _train_py(words, 6)

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = [
            (r.gen, r.a, r.b, r.pair_count, r.subwords_after)
            for r in sorted(
                all_queries()["q_bpe_train"].fn(spark, td).collect(),
                key=lambda r: r.gen,
            )
        ]
    assert got == want
