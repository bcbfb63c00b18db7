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


@settings(**SETTINGS)
@given(weights=st.lists(st.floats(min_value=0.05, max_value=1.0,
                                  allow_nan=False), min_size=2, max_size=5),
       salt=st.integers(min_value=0, max_value=1000))
def test_hash_split_is_total_and_salt_deterministic(spark, weights, salt):
    from bda_spadochrony_spark.operators.sampling import hash_split
    names = [f"s{i}" for i in range(len(weights))]
    splits = dict(zip(names, weights))
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", splits, salt=salt).collect()
    # total: every row assigned to exactly one declared split
    assert len(out) == 200
    assert {r["split"] for r in out} <= set(names)
    # deterministic: identical re-run, any input partitioning
    again = hash_split(df.repartition(7), "doc_id", splits,
                       salt=salt).collect()
    assert sorted((r["doc_id"], r["split"]) for r in out) == \
        sorted((r["doc_id"], r["split"]) for r in again)


@settings(**SETTINGS)
@given(pairs=st.lists(st.tuples(st.integers(min_value=0, max_value=255),
                                st.integers(min_value=0, max_value=255)),
                      min_size=1, max_size=30, unique=True))
def test_morton_key_is_injective_and_order_bounds(spark, pairs):
    from bda_spadochrony_spark.operators.layout import morton_key
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = [r["m"] for r in
           df.select(morton_key("a", "b", bits=8).alias("m")).collect()]
    # injective over the 8-bit domain: distinct inputs -> distinct codes
    assert len(set(got)) == len(pairs)
    # every code fits in 2*bits bits
    assert all(0 <= m < 2 ** 16 for m in got)


@settings(**SETTINGS)
@given(obs=st.lists(st.tuples(st.integers(min_value=0, max_value=2),
                              st.sampled_from(["A", "B", "C"])),
                    min_size=1, max_size=25))
def test_scd2_history_intervals_partition_each_keys_timeline(spark, obs):
    from datetime import datetime
    from bda_spadochrony_spark.operators.scd import scd2_history
    rows = [(k, v, datetime(2024, 1, 1, 0, i))
            for i, (k, v) in enumerate(obs)]
    df = spark.createDataFrame(rows, ["k", "v", "ts"])
    hist = scd2_history(df, "k", ["v"], "ts").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        # exactly one current version per key; intervals chain gaplessly
        assert sum(r["is_current"] for r in versions) == 1
        assert versions[-1]["valid_to"] is None
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["v"] != nxt["v"]   # consecutive dedup held


@settings(**SETTINGS)
@given(n_tok=st.integers(min_value=1, max_value=120),
       span=st.integers(min_value=2, max_value=30),
       stride=st.integers(min_value=1, max_value=30))
def test_duplicate_spans_count_and_ratio_bounds(spark, n_tok, span, stride):
    from bda_spadochrony_spark.operators.dedup import duplicate_spans
    uniq = " ".join(f"u{i}" for i in range(n_tok))     # all-unique tokens
    df = spark.createDataFrame(
        [(1, uniq), (2, uniq), (3, "z0 z1 z2 z3")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            duplicate_spans(df, "doc_id", "text", span_tokens=span,
                            stride=stride).collect()}
    if n_tok < span:
        assert 1 not in rows and 2 not in rows       # too short: no row
    else:
        expect_spans = len(range(1, n_tok - span + 2, stride))
        for d in (1, 2):                             # identical pair:
            assert rows[d]["n_spans"] == expect_spans
            assert rows[d]["n_dup_spans"] == expect_spans
            assert rows[d]["dup_ratio"] == 1.0       # every span shared
    if 3 in rows:                                    # unique doc: no dups
        assert rows[3]["n_dup_spans"] == 0 and rows[3]["dup_ratio"] == 0.0


@settings(**SETTINGS)
@given(tf_hi=st.integers(min_value=2, max_value=10))
def test_bm25_score_monotone_in_term_frequency(spark, tf_hi):
    from bda_spadochrony_spark.operators.corpus import bm25_topk
    # equal-length docs; doc 1 has MORE occurrences of the query term
    pad = lambda k: " ".join(f"p{i}" for i in range(12 - k))
    docs = spark.createDataFrame(
        [(1, ("q " * tf_hi) + pad(tf_hi)),
         (2, "q " + pad(1)),
         (3, pad(0))],                                # no query term
        ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, "doc_id", "text", ["q"], k=10).collect()}
    assert 3 not in got                               # termless doc absent
    assert got[1] > got[2] > 0                        # tf-monotone


@settings(**SETTINGS)
@given(sizes=st.lists(st.integers(min_value=1, max_value=40),
                      min_size=2, max_size=4),
       t1=st.floats(min_value=0.1, max_value=1.0),
       t2=st.floats(min_value=0.1, max_value=1.0))
def test_temperature_targets_shares_and_tail_monotonicity(spark, sizes,
                                                          t1, t2):
    from bda_spadochrony_spark.operators.sampling import temperature_targets
    rows, off = [], 0
    for g, n in enumerate(sizes):
        rows += [(off + i, f"g{g}") for i in range(n)]
        off += n
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    lo, hi = sorted([t1, t2])
    s_lo = temperature_targets(df, "lang", temperature=lo)
    s_hi = temperature_targets(df, "lang", temperature=hi)
    for s in (s_lo, s_hi):
        assert abs(sum(s.values()) - 1.0) < 1e-9
        assert all(v > 0 for v in s.values())
    # lower temperature weakly RAISES the smallest group's share
    smallest = f"g{sizes.index(min(sizes))}"
    assert s_lo[smallest] >= s_hi[smallest] - 1e-12
    # T=1 reproduces natural proportions exactly
    nat = temperature_targets(df, "lang", temperature=1.0)
    total = sum(sizes)
    for g, n in enumerate(sizes):
        assert abs(nat[f"g{g}"] - n / total) < 1e-9


@settings(**SETTINGS)
@given(n=st.integers(min_value=3, max_value=15),
       dup_of=st.integers(min_value=0, max_value=2))
def test_semantic_dedup_collapses_exact_duplicates(spark, n, dup_of):
    import random
    from bda_spadochrony_spark.operators.similarity import semantic_dedup
    rng = random.Random(n * 100 + dup_of)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
    rows.append((100, rows[dup_of][1]))       # exact duplicate, later id
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    # one cluster -> the duplicate pair is always examined
    out = {r["vec_id"] for r in
           semantic_dedup(df, "vec_id", n_clusters=1,
                          min_cosine=0.999999).collect()}
    assert 100 not in out                     # duplicate dropped
    assert dup_of in out                      # earlier id survives
    assert out == set(range(n))               # nothing else dropped
    # threshold above any possible cosine: nothing drops
    keep_all = {r["vec_id"] for r in
                semantic_dedup(df, "vec_id", n_clusters=1,
                               min_cosine=1.5).collect()}
    assert keep_all == set(range(n)) | {100}


@settings(**SETTINGS)
@given(qs=st.tuples(st.floats(min_value=0.01, max_value=0.49),
                    st.floats(min_value=0.51, max_value=0.99)))
def test_surprisal_band_is_ordered_and_within_range(spark, qs):
    import random
    from bda_spadochrony_spark.operators.corpus import surprisal_band
    rnd = random.Random(7)
    vocab = [f"v{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(i, " ".join(rnd.choice(vocab) for _ in range(20)))
         for i in range(25)], ["doc_id", "text"])
    lo, hi = surprisal_band(df, "doc_id", "text", qs[0], qs[1])
    assert lo <= hi
    wide_lo, wide_hi = surprisal_band(df, "doc_id", "text", 0.0, 1.0)
    assert wide_lo <= lo and hi <= wide_hi    # quantiles nest
