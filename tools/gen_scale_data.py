#!/usr/bin/env python
"""Generate a 10× scale-evidence dataset (VERDICT r5 ask #6).

Mirrors the driver testdata's schemas and distributions (measured from
/root/testdata/sf0.1 with DuckDB) for the three tables the dedup / ANN /
streaming / corpus family reads — documents, embeddings, events — at
``--mult`` times the sf0.1 row counts; the small TPC-H dims are copied
unscaled for incidental reads. Deterministic (seed=42): reruns produce
byte-identical tables.

Measured sf0.1 properties mirrored here:
- documents: 5,000 rows; n_tokens ~ Uniform(10,100);
  lang {en:41%, zh/es/fr/de ~15%}; 20 sources; ~5% of docs are
  near-copies of an earlier doc (1-5 token edits → Jaccard ≥ 0.5 pairs)
  and ~0.2% exact copies.
  FIXTURE v2 (round 7, VERDICT r6 #3): random tokens draw from a
  ZIPFIAN 10,000-type vocabulary (exponent 1.05) instead of the
  driver testdata's 31-token vocab. The tiny vocab made random-pair
  Jaccard ≈ 1e-3, so a constant fraction of ALL pairs band-collided
  and the r6 minhash 10× factor (16×) measured the fixture, not the
  operator (SCALE.md's own diagnosis, corroborated by the r6
  realistic-vocabulary recall test). With 10k Zipfian types,
  random-pair Jaccard ≈ 0 — only the PLANTED near/exact copies
  collide, which is the property a real corpus has. The explicit
  near-dup family is untouched, so dedup recall work is unchanged.
- embeddings: 2,000 rows; FLOAT[64]; 10 labels; per-value mean 0,
  sd 0.125 (label-cluster centers + noise — within-cluster cosine ≈ 0.5
  so the 0.42-threshold near-dup family has work to do at every scale).
- events: 100,000 rows; 30 days of event time, ts increasing with
  event_id (exponential gaps); user_id Uniform(0, 1500·mult);
  5 event types uniform; value ~ Exp(50); props = '{"k": 0..99}'.

Usage: python tools/gen_scale_data.py [--mult 10] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# FIXTURE v2: Zipfian 10k-type vocabulary (see module docstring). Rank-r
# probability ∝ 1/r^1.05 — the classic natural-language token curve.
VOCAB_TYPES = 10_000
_ranks = np.arange(1, VOCAB_TYPES + 1, dtype=np.float64)
_zipf_p = (1.0 / _ranks ** 1.05)
_zipf_p /= _zipf_p.sum()
_ZIPF_CDF = np.cumsum(_zipf_p)
VOCAB = [f"w{i:05d}" for i in range(VOCAB_TYPES)]
LANGS = (["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["de"] * 14)
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _draw_tokens(rng: np.random.Generator, n: int) -> list[str]:
    idx = np.searchsorted(_ZIPF_CDF, rng.random(n))
    return [VOCAB[int(i)] for i in idx]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.002:                      # exact copy
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.05:                       # near copy, 1-5 edits
            base = texts[int(rng.integers(0, i))].split(" ")
            edits = _draw_tokens(rng, int(rng.integers(1, 6)))
            for tok in edits:
                base[int(rng.integers(0, len(base)))] = tok
            texts.append(" ".join(base))
            continue
        ntok = int(rng.integers(10, 101))
        texts.append(" ".join(_draw_tokens(rng, ntok)))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[int(x)] for x in rng.integers(0, 100, n)],
                         pa.string()),
        "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, n)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    # Weak clusters calibrated against the driver's sf0.1 table: center
    # energy = 20% of the 0.125 per-value sd reproduces its ~441
    # cos>=0.42 pairs per 2000 vectors (mostly random-direction
    # coincidence, like the original). Cluster COUNT scales with n
    # (fixed ~200 members) so cluster-pair volume grows linearly, and an
    # explicit 2% near-dup family (copy + small noise, cos ~0.95) gives
    # the high-threshold dedup operators linearly-growing true dups —
    # the real-corpus property a scale study must preserve.
    k = max(10, n // 200)
    s_c = 0.125 * 0.2
    s_n = (0.125 ** 2 - s_c ** 2) ** 0.5
    centers = rng.normal(0.0, s_c, (k, 64))
    labels = rng.integers(0, k, n)
    vecs = centers[labels] + rng.normal(0.0, s_n, (n, 64))
    for i in range(n // 50):                      # 2% near-dup copies
        dst = int(rng.integers(n // 2, n))
        src = int(rng.integers(0, dst))
        vecs[dst] = vecs[src] + rng.normal(0.0, 0.02, 64)
        labels[dst] = labels[src]
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array((labels % 10).astype(np.int32), pa.int32()),
    })


def gen_events(n: int, mult: int, rng: np.random.Generator) -> pa.Table:
    span_us = 30 * 24 * 3600 * 1_000_000
    gaps = rng.exponential(span_us / n, n)
    ts = np.cumsum(gaps).astype(np.int64)
    ts = (ts * (span_us / max(1, ts[-1]))).astype(np.int64)  # pin 30-day span
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array((base + ts).astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 1500 * mult, n), pa.int64()),
        "event_type": pa.array([EVENT_TYPES[int(x)] for x in
                                rng.integers(0, 5, n)], pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, n), 2), pa.float64()),
        "props": pa.array([json.dumps({"k": int(x)}) for x in
                           rng.integers(0, 100, n)], pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(5000 * args.mult, rng),
                   f"{args.out}/documents.parquet")
    pq.write_table(gen_embeddings(2000 * args.mult, rng),
                   f"{args.out}/embeddings.parquet")
    pq.write_table(gen_events(100000 * args.mult, args.mult, rng),
                   f"{args.out}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{args.out}/{t}.parquet")
    for t in ["documents", "embeddings", "events"]:
        print(t, pq.read_metadata(f"{args.out}/{t}.parquet").num_rows, "rows")


if __name__ == "__main__":
    main()
