"""Property-based tests (hypothesis) for operator invariants that a fixed
fixture can't sweep: normalization idempotence, chunk coverage over
arbitrary (doc length, window, stride), and sampling monotonicity.

Each example is one tiny local Spark job, so examples are capped low;
deadline is disabled because JVM warmup makes the first example slow.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

pytestmark = pytest.mark.skipif(not HAVE_HYPOTHESIS,
                                reason="hypothesis not installed")

from pyspark.sql import functions as F

SETTINGS = dict(max_examples=15, deadline=None)


@settings(**SETTINGS)
@given(st.text(min_size=0, max_size=120))
def test_normalize_text_is_idempotent(spark, raw):
    from bda_spadochrony_spark.operators.text import normalize_text
    row = spark.createDataFrame([(raw,)], ["t"]).select(
        normalize_text("t").alias("once")).select(
        F.col("once"), normalize_text(F.col("once")).alias("twice")).first()
    assert row["once"] == row["twice"]
    # output alphabet: only lowercase-folded letters/digits/single spaces
    assert "  " not in row["once"]
    assert row["once"] == row["once"].strip()


@settings(**SETTINGS)
@given(n_tok=st.integers(min_value=1, max_value=200),
       size=st.integers(min_value=1, max_value=60),
       stride=st.integers(min_value=1, max_value=60))
def test_chunk_documents_covers_all_tokens_in_order(spark, n_tok, size, stride):
    from bda_spadochrony_spark.operators.text import chunk_documents
    text = " ".join(f"w{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", size, stride) \
        .orderBy("chunk_id").collect()
    # chunk ids are dense from 0
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    # every chunk matches its slice of the token stream exactly
    toks = text.split(" ")
    for r in rows:
        start = r["chunk_id"] * stride
        expect = toks[start:start + size]
        assert r["chunk"].split(" ") == expect
        assert r["chunk_tokens"] == len(expect)
    # stride covers every token iff stride <= size; verify when it holds
    if stride <= size:
        seen = set()
        for r in rows:
            seen.update(r["chunk"].split(" "))
        assert len(seen) == n_tok


@settings(**SETTINGS)
@given(f1=st.floats(min_value=0.0, max_value=1.0),
       f2=st.floats(min_value=0.0, max_value=1.0))
def test_hash_sample_is_monotone_in_fraction(spark, f1, f2):
    from bda_spadochrony_spark.operators.sampling import hash_sample
    lo, hi = sorted([f1, f2])
    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    small = set(r[0] for r in hash_sample(df, "doc_id", lo).collect())
    big = set(r[0] for r in hash_sample(df, "doc_id", hi).collect())
    assert small <= big


@settings(**SETTINGS)
@given(n_docs=st.integers(min_value=1, max_value=30),
       budget=st.integers(min_value=1, max_value=40),
       shards=st.integers(min_value=1, max_value=4))
def test_pack_documents_reconstructs_token_stream(spark, n_docs, budget, shards):
    from bda_spadochrony_spark.operators.corpus import pack_documents
    import random
    rng = random.Random(n_docs * 1000 + budget)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 15))))
            for i in range(n_docs)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = pack_documents(df, "doc_id", "text", budget=budget,
                          num_shards=shards).collect()
    assert len(rows) == n_docs
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % shards
        assert 0 <= r["pack_offset"] < budget
        by_shard.setdefault(r["shard"], []).append(r)
    # within a shard: each doc's start offset equals the running token
    # total of all preceding docs (the concat-and-cut invariant)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        total = 0
        for r in shard_rows:
            assert r["pack_id"] * budget + r["pack_offset"] == total
            total += r["n_tokens"]


@settings(**SETTINGS)
@given(overlap=st.integers(min_value=0, max_value=10))
def test_contamination_is_bounded_and_monotone(spark, overlap):
    from bda_spadochrony_spark.operators.corpus import contamination
    # corpus doc: 12 distinct tokens -> 10 distinct 3-gram shingles;
    # benchmark shares the first `overlap` shingles
    corp_toks = [f"c{i}" for i in range(12)]
    bench_toks = corp_toks[:overlap + 2] if overlap else ["z1", "z2", "z3"]
    corp = spark.createDataFrame([(1, " ".join(corp_toks))], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, " ".join(bench_toks))], ["doc_id", "text"])
    row = contamination(corp, bench, "doc_id", "text", 3).first()
    assert row["n_shingles"] == 10
    assert row["n_contaminated"] == overlap
    assert 0.0 <= row["contamination"] <= 1.0
