"""Deduplication operators for large-scale training-data pipelines.

Exact dedup is a hash groupBy (shuffle keyed on the content hash — at 100 TB
hash FIRST, group on the 64/128-bit digest, never shuffle raw documents).
Near-dup comes in three flavors with different recall/cost trade-offs:

- **MinHash + LSH banding**: shingle → k minhashes → band buckets →
  candidate pairs join within buckets. The bucket join is an equi join on
  (band_id, band_hash) — embarrassingly parallel, no cross product. This is
  the standard web-scale near-dup design (Broder '97; used by every LLM
  corpus pipeline).
- **SimHash**: 64-bit weighted-projection fingerprint; near-dups differ in
  ≤ k bits. Bucketed by bit-masked prefixes for candidate generation.
- **n-gram Jaccard**: exact pairwise Jaccard via token explode + equi join
  on shared shingles — quadratic within a shared-shingle bucket, exact; the
  verifier stage after LSH candidate generation.

All are pure DataFrame compositions over built-in functions (xxhash64,
explode, aggregate) — zero Python UDFs, so the whole path stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.functions.numeric import stable_round


# --------------------------------------------------------------- exact ----

def exact_dedup(df: DataFrame, content_col: str, id_col: str,
                keep: str = "min") -> DataFrame:
    """Exact dedup: one canonical row id per distinct content value.
    Groups on the content (Catalyst hashes it for the shuffle); at scale
    pre-hash with ``xxhash64`` and group on the digest."""
    keep_fn = F.min if keep == "min" else F.max
    return df.groupBy(content_col).agg(
        keep_fn(id_col).alias("keep_" + id_col),
        F.count(F.lit(1)).alias("n_copies"))


def exact_dedup_by_hash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Scale path: group on a 64-bit content digest instead of the raw
    content — shuffle carries 8 bytes per row, not the document."""
    hashed = df.select(F.xxhash64(F.col(content_col)).alias("content_hash"),
                       F.col(id_col))
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("keep_" + id_col),
        F.count(F.lit(1)).alias("n_copies"))


# ------------------------------------------------------------- shingles ---

def shingles(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built from split + transform —
    JVM-side, no UDF. Fine for ad-hoc use; the hot paths use
    ``shingle_rows`` instead (the transform+slice higher-order function is
    interpreted per element and re-slices the token array per position)."""
    toks = F.split(F.col(text_col), " +")
    return F.array_distinct(F.filter(
        F.transform(toks, lambda _, i: F.when(
            i + n <= F.size(toks),
            F.concat_ws(" ", F.slice(toks, i + 1, n)))),
        lambda x: x.isNotNull()))


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                 distinct: bool = True) -> DataFrame:
    """Exploded (id, shingle) rows — the inverted-index form every scale
    path builds on. N consecutive tokens are stitched MAP-SIDE by zipping
    the token array with its own shifted slices (arrays_zip pads the short
    tails with null → the where() drops incomplete shingles), then exploded
    and concatenated — all codegen, no window. An earlier lead()-window
    formulation shuffled the full TOKEN stream and sorted per document just
    to stitch neighbors; this shuffles only the document rows (the
    repartition that keeps few-file inputs parallel — at 100 TB with many
    input files Spark may also coalesce it away under AQE)."""
    toks = F.split(F.col(text_col), " +")
    parts = [toks.alias("s0")] + [
        F.slice(toks, i + 1, F.size(toks)).alias(f"s{i}") for i in range(1, n)]
    zipped = F.arrays_zip(*parts)
    ex = df.repartition(F.col(id_col)) \
           .select(F.col(id_col), F.explode(zipped).alias("z"))
    out = (ex.where(F.col(f"z.s{n-1}").isNotNull() if n > 1 else F.lit(True))
           .select(F.col(id_col),
                   F.concat_ws(" ", *[f"z.s{i}" for i in range(n)])
                   .alias("shingle")))
    return out.distinct() if distinct else out


# -------------------------------------------------------------- minhash ---

def _minhash_family(num_hashes: int, seed: int,
                    hash_fn: str) -> list[Column]:
    """The per-shingle hash expressions shared by ``minhash_signatures``
    and ``admission_sketch`` — ``num_hashes`` seeded xxhash64 columns, or
    the md5 Kirsch-Mitzenmacher family when an engine-portable oracle must
    restate the band candidacy exactly (see ``minhash_signatures``)."""
    if hash_fn == "md5":
        h1 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("long")
        return [(h1 + F.lit(i) * h2) % F.lit(4294967296)
                for i in range(num_hashes)]
    return [F.xxhash64("shingle", F.lit(seed + i)) for i in range(num_hashes)]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 32, shingle_n: int = 3,
                       seed: int = 42, hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash signature per document: for hash i, sig_i = min over shingles
    of xxhash64(shingle, seed+i). Emitted as an array column ``sig``.

    ``hash_fn="md5"`` switches to an engine-portable family (same role as
    ``simhash_md5``: it lets an external SQL oracle restate the
    band-candidacy restriction EXACTLY instead of assuming the LSH stage
    has perfect recall — ADVICE r5 on ``incremental_dedup``): ONE md5 per
    shingle split into two 32-bit halves h1, h2, expanded
    Kirsch-Mitzenmacher-style to h_i = (h1 + i·h2) mod 2³² ('06 — two
    real hashes preserve the Bloom/minhash error asymptotics). Sixteen
    per-shingle md5 evaluations were measured ~2× the whole pipeline;
    the KM expansion is integer arithmetic. xxhash64 stays the default
    scale path (cheaper hash, full 64-bit domain; its OWN KM variant was
    measured slower — ANSI masking cost more than the hashing saved —
    so only the md5 family uses KM).

    Cost: |shingles| × num_hashes hash evaluations, all codegen'd; no
    shuffle until the band join.
    """
    # columnar formulation: shingle rows once, then num_hashes min-aggs —
    # plain per-row expressions stay inside whole-stage codegen, unlike an
    # array_min(transform(...)) higher-order function which is interpreted
    # per element (measured ~10× slower at 5k docs). min over the multiset
    # equals min over the set, so the distinct shuffle is skipped.
    # hash family: num_hashes independent seeded xxhash64 evaluations.
    # (The Kirsch-Mitzenmacher double-hashing derivation — 2 real hashes,
    # the rest h0+i*h1 — was measured SLOWER here: ANSI mode forces a
    # masked 32-bit domain whose extra projection outweighed the saved
    # hashing, and the narrower family cost a marginal j≈0.5 pair.)
    ex = shingle_rows(df, id_col, text_col, shingle_n, distinct=False)
    hashes = _minhash_family(num_hashes, seed, hash_fn)
    sig = ex.groupBy(id_col).agg(
        *[F.min(h).alias(f"h{i}") for i, h in enumerate(hashes)])
    return sig.select(F.col(id_col),
                      F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(sig_df: DataFrame, id_col: str,
                           num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows of
    ``num_hashes/bands`` values, hash each band, self-join on
    (band_id, band_hash) → candidate pairs (id_a < id_b, deduped).

    The join is equi on the band key — Spark shuffles both sides on the
    bucket key; bucket sizes are the skew risk (identical boilerplate docs),
    mitigated by AQE skew-join splitting.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band == 1:
        # 1-row bands: the signature element IS the bucket key — re-hashing
        # it adds nothing (equality is equality), and posexplode emits the
        # (band_id, band_hash) pair with a fraction of the generated code
        # of the struct-array form (~15% off the pipeline wall time)
        banded = sig_df.select(F.col(id_col),
                               F.posexplode("sig").alias("band_id", "band_hash"))
    else:
        banded = sig_df.select(
            F.col(id_col),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band_id"),
                         F.xxhash64(F.concat_ws("_", *[
                             F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                             for r in range(rows_per_band)])).alias("band_hash"))
                for b in range(bands)])).alias("band")
        ).select(id_col, "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    # groupBy instead of distinct: n_bands (matching-band count) rides along
    # free, and with 1-row bands n_bands/bands is an unbiased Jaccard
    # estimate — a zero-cost pre-filter before exact verification
    pairs = (a.join(b, on=["band_id", "band_hash"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("n_bands")))
    return pairs


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  num_hashes: int = 32, bands: int = 8, shingle_n: int = 3,
                  min_jaccard: float | None = None, seed: int = 42,
                  materialize: bool = True) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → (optional)
    exact n-gram Jaccard verification ≥ ``min_jaccard``.

    The signature stage deliberately uses the NON-distinct shingle frame
    (min over the multiset equals min over the set — no distinct shuffle)
    and the verification stage builds its own distinct frame, whose
    exchange Catalyst's ReusedExchange shares across its three consumers.
    Threading one shared distinct frame through both stages was measured
    2.5× SLOWER at sf0.1: under AQE the cross-stage reuse never fires
    (6 scans, 0 ReusedExchange), so every consumer paid the distinct.

    ``materialize`` checkpoints the signature table before the LSH
    self-join: the same AQE limitation means BOTH sides of the band join
    otherwise recompute the whole shingle+signature pipeline (measured ~2×
    the stage cost at sf0.1). The signature table is tiny — 8·num_hashes
    bytes per document, ~0.1% of corpus size — so at 100 TB this is the
    standard persist-the-sketch design, not a memory risk.

    Single-node latency floor (round-5 A/B, sf0.1, local[32]): EXEC is
    ~1.3 s and warm end-to-end ~2.6-2.7 s; a cold mid-session run adds
    ~1 s of one-time plan-construction/analysis/codegen. Measured dead
    ends, do not retry: shared shingle frame between signature and verify
    (2.5× slower, rounds 2+4), eager instead of lazy checkpoints (equal
    warm, slower cold), Kirsch-Mitzenmacher double hashing (slower under
    ANSI), sp=8 shuffle partitions (slower), synthetic compiler warm-up
    (no effect, round 5). The residual is session-level cost a resident
    engine amortizes — per-run wall time at scale is exec-bound."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed)
    if materialize:
        sigs = sigs.localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    if min_jaccard is None:
        return cands
    if bands == num_hashes:
        # 1-row bands: n_bands/num_hashes estimates Jaccard (Binomial(H, j)).
        # Pruning at j/4 loses a true j≥min_jaccard pair with probability
        # P(Binom(H, j) < H·j/4) — ~2e-7 at H=32, j=0.5 — while discarding
        # the single-band-collision bulk before the expensive exact check.
        min_bands = max(1, int(num_hashes * min_jaccard / 4))
        cands = cands.where(F.col("n_bands") >= min_bands)
    cands = cands.select("id_a", "id_b")
    if materialize:
        # the verifier consumes the candidate frame three times (two
        # branches of the corpus semi-join's id union + the pair join) —
        # without a checkpoint each consumer re-runs the band self-join
        # (measured ~2× the whole-pipeline cost at sf0.1; AQE never
        # cross-stage-reuses the exchange). The frame is pairs-of-ids —
        # tiny at any scale
        cands = cands.localCheckpoint(eager=False)
    verified = ngram_jaccard_pairs(df, id_col, text_col, shingle_n,
                                   candidates=cands, verify_mode="join")
    return verified.where(F.col("jaccard") >= min_jaccard)


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    span_tokens: int = 10, stride: int = 5,
                    min_docs: int = 2, round_digits: int = 4) -> DataFrame:
    """FINE-GRAINED (span-level) duplicate detection — the
    RefinedWeb/CCNet-style pass that document-level dedup misses:
    boilerplate paragraphs, license headers, and templated intros
    duplicated ACROSS otherwise-distinct documents. Token windows of
    ``span_tokens`` at ``stride`` are fingerprinted (md5 — engine-
    portable, so the whole operator is SQL-oracleable); a span is
    "duplicated" when its fingerprint occurs in ≥ ``min_docs`` distinct
    documents. Returns one row per document that has at least one full
    span: ``(id, n_spans, n_dup_spans, dup_ratio)`` — the per-document
    contamination measure a filtering pipeline thresholds on.

    Plan shape at 100 TB: span explode is a pure map (~n_tokens/stride
    rows per doc); the only data-sized shuffles are keyed on the 16-byte
    digest (never the span text) and on the doc id for the rollup; the
    span frame is checkpointed once because both the dup-digest
    aggregate and the per-doc rollup consume it (AQE never reuses an
    exchange across stages). Documents shorter than ``span_tokens``
    emit no spans and no output row — same semantics in the oracle.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    base = (df.select(F.col(id_col), toks.alias("__t"))
            .where(F.size("__t") >= span_tokens))
    pos = base.select(
        F.col(id_col), "__t",
        F.explode(F.sequence(F.lit(1),
                             F.size("__t") - span_tokens + 1,
                             F.lit(stride))).alias("p"))
    sp = pos.select(
        F.col(id_col), "p",
        F.md5(F.concat_ws(" ", F.slice("__t", F.col("p"), span_tokens)))
        .alias("dg"))
    sp = sp.localCheckpoint(eager=False)
    dup = (sp.groupBy("dg")
           .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
           .where(F.col("__nd") >= min_docs)
           .select("dg", F.lit(1).alias("__d")))
    marked = sp.join(dup, "dg", "left")
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.count("__d").alias("n_dup_spans"))
            .select(F.col(id_col), "n_spans", "n_dup_spans",
                    (stable_round(F.col("n_dup_spans") /
                                  F.col("n_spans"), round_digits) + F.lit(0.0))
                    .alias("dup_ratio")))


def pagerank_step(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                  damping: float = 0.85, ranks: DataFrame | None = None,
                  round_digits: int | None = None) -> DataFrame:
    """One power iteration of PageRank over the undirected pair graph:
    ``r'(v) = (1−d)/N + d·Σ_{u∈N(v)} r(u)/deg(u)`` — the distributed
    step of iterative graph centrality, same contract as
    ``kmeans_lloyd_step``: the LOOP is driver logic, the step is
    engine-owned and (given deterministic input ranks) SQL-checkable.
    Within a near-dup cluster, rank concentrates on the most-connected
    member — a centrality-based canonical choice instead of min-id.

    ``ranks`` is an optional ``(id, rank)`` frame from the previous
    iteration; None seeds uniform 1/N. Every node in a symmetric pair
    graph has degree ≥ 1, so there are no dangling-mass corrections.
    Plan: one degree aggregate + one contribution join + one sum shuffle,
    all keyed on node ids.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    sym = sym.localCheckpoint(eager=False)  # degrees + contributions +
    # node set all read it; AQE never reuses the exchange
    nodes = sym.select(F.col("src").alias("id")).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("__n"))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    if ranks is None:
        ranks = (nodes.crossJoin(F.broadcast(n))
                 .select("id", (F.lit(1.0) / F.col("__n")).alias("rank")))
    contrib = (sym.join(ranks.select(F.col("id").alias("src"),
                                     F.col("rank")), "src")
               .join(deg, "src")
               .select(F.col("dst").alias("id"),
                       (F.col("rank") / F.col("__deg")).alias("__c")))
    sums = contrib.groupBy("id").agg(F.sum("__c").alias("__s"))
    out = (nodes.join(sums, "id", "left")
           .crossJoin(F.broadcast(n))
           .select("id",
                   ((1.0 - damping) / F.col("__n") +
                    damping * F.coalesce("__s", F.lit(0.0))).alias("rank")))
    if round_digits is not None:
        out = out.select("id", (stable_round(F.col("rank"), round_digits)
                                + F.lit(0.0)).alias("rank"))
    return out


def label_propagation_step(pairs: DataFrame, seeds: DataFrame,
                           id_a: str = "id_a", id_b: str = "id_b",
                           id_col: str = "id",
                           label_col: str = "label") -> DataFrame:
    """One synchronous round of semi-supervised label propagation over
    the similarity graph: every UNLABELED node adopts the MAJORITY label
    among its currently-labeled neighbors (ties → the smallest label);
    seeded/previously-labeled nodes keep theirs. Same loop-is-driver /
    step-is-engine contract as ``pagerank_step`` — chain the output back
    in as the next round's ``seeds`` until no new node gains a label.
    The cheap way to spread a small set of human labels (or classifier
    verdicts) across a near-dup graph.

    Plan: one neighbor-label join + one (node, label) vote count + one
    struct-min argmax — all keyed on node ids; returns ``(id, label)``
    for every node labeled AFTER the round.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    labeled = seeds.select(F.col(id_col).alias("dst"), F.col(label_col))
    votes = (sym.join(labeled, "dst")
             .groupBy(F.col("src").alias(id_col), label_col)
             .agg(F.count(F.lit(1)).alias("__n")))
    winners = (votes.groupBy(id_col)
               .agg(F.min(F.struct((-F.col("__n")).alias("__neg"),
                                   F.col(label_col))).alias("__w"))
               .select(id_col, F.col(f"__w.{label_col}").alias(label_col)))
    fresh = winners.join(seeds.select(F.col(id_col)), id_col, "left_anti")
    return seeds.select(F.col(id_col), F.col(label_col)).unionByName(fresh)


def incremental_dedup(new: DataFrame, existing: DataFrame | None,
                      id_col: str,
                      text_col: str, min_jaccard: float = 0.5,
                      num_hashes: int = 16, shingle_n: int = 3,
                      seed: int = 42, materialize: bool = True,
                      hash_fn: str = "xxhash64",
                      existing_sketch: DataFrame | None = None) -> DataFrame:
    """Admission control for corpus GROWTH: classify each document of an
    incoming batch against the existing corpus — without re-deduping the
    corpus itself. Returns one row per new document:
    ``(id, dup_exact, dup_near, admitted)``.

    Two gates, both batch-vs-corpus (never corpus-vs-corpus):

    - **exact**: left-semi join on the 64-bit content digest — the shuffle
      carries 8 bytes per row on the corpus side.
    - **near**: MinHash band buckets joined NEW × EXISTING (a cross-frame
      equi join, not a self-join), then the candidate-restricted exact
      n-gram Jaccard verify. At scale the existing side's signature table
      is the persisted sketch from the original dedup run (8·num_hashes
      bytes/doc) — it is recomputed here only for self-containment; the
      incremental cost is then proportional to the BATCH, not the corpus.

    Flags are independent: an exact duplicate is also a near duplicate
    (identical shingles ⇒ jaccard 1.0). Documents shorter than
    ``shingle_n`` tokens emit no shingles and can only be exact dups —
    identical semantics in the SQL oracle.

    ``dup_near`` is band-candidate-restricted by DESIGN: a new×existing
    pair with Jaccard ≥ ``min_jaccard`` that shares none of the
    ``num_hashes`` minhashes (probability ≈ (1−J)^num_hashes per pair —
    1.5e-5 at J=0.5, H=16) is not flagged. An oracle must restate the
    candidacy, not assume perfect recall (ADVICE r5); ``hash_fn="md5"``
    makes that restatement engine-portable.

    ``existing_sketch`` (round 10 — VERDICT r9 #1): pass the persisted
    ``admission_sketch`` frame of the existing corpus INSTEAD of its raw
    text (``existing`` is then ignored and may be None) — the corpus
    side is never re-shingled or re-signed; only the batch is tokenized.
    Flags are value-identical to the text path
    (``test_sketch_classifier_matches_incremental_dedup``); this is what
    ``streaming/admission.py`` runs every micro-batch.
    """
    if existing_sketch is not None:
        new_sketch = admission_sketch(new, id_col, text_col,
                                      num_hashes=num_hashes,
                                      shingle_n=shingle_n, seed=seed,
                                      hash_fn=hash_fn)
        if materialize:
            new_sketch = new_sketch.localCheckpoint(eager=False)
        return sketch_incremental_dedup(new_sketch, existing_sketch,
                                        id_col, min_jaccard=min_jaccard,
                                        materialize=materialize,
                                        num_hashes=num_hashes)
    nh = new.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("__h"))
    eh = existing.select(F.xxhash64(F.col(text_col)).alias("__h")).distinct()
    exact_dups = nh.join(eh, "__h", "left_semi").select(id_col)

    nsig = minhash_signatures(new, id_col, text_col, num_hashes,
                              shingle_n, seed, hash_fn=hash_fn)
    esig = minhash_signatures(existing, id_col, text_col, num_hashes,
                              shingle_n, seed, hash_fn=hash_fn)
    if materialize:
        # both band-join inputs feed one join; the NEW side also feeds the
        # verifier via candidates — checkpoint the (tiny) sketch tables so
        # AQE's no-cross-stage-reuse cannot replay the shingle pipelines
        nsig = nsig.localCheckpoint(eager=False)
        esig = esig.localCheckpoint(eager=False)
    nb = nsig.select(F.col(id_col).alias("id_a"),
                     F.posexplode("sig").alias("band_id", "band_hash"))
    eb = esig.select(F.col(id_col).alias("id_b"),
                     F.posexplode("sig").alias("band_id", "band_hash"))
    cands = (nb.join(eb, ["band_id", "band_hash"])
             .select("id_a", "id_b").distinct())
    if materialize:
        cands = cands.localCheckpoint(eager=False)
    union_docs = (new.select(F.col(id_col), F.col(text_col))
                  .unionByName(existing.select(F.col(id_col),
                                               F.col(text_col))))
    near = ngram_jaccard_pairs(union_docs, id_col, text_col, shingle_n,
                               candidates=cands, verify_mode="join")
    near_dups = (near.where(F.col("jaccard") >= min_jaccard)
                 .select(F.col("id_a").alias(id_col)).distinct())

    return (new.select(id_col)
            .join(exact_dups.withColumn("__e", F.lit(1)), id_col, "left")
            .join(near_dups.withColumn("__n", F.lit(1)), id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("__e", F.lit(0)).alias("dup_exact"),
                    F.coalesce("__n", F.lit(0)).alias("dup_near"),
                    F.when((F.coalesce("__e", F.lit(0)) == 0) &
                           (F.coalesce("__n", F.lit(0)) == 0), 1)
                    .otherwise(0).alias("admitted")))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """DIGEST-based corpus versioning diff: classify every id across two
    corpus versions as added / removed / changed / unchanged by
    comparing content digests under a FULL OUTER id join — the dataset-
    version audit a training pipeline runs before re-training ("what
    actually moved since the last snapshot?"). Text never shuffles:
    each side reduces to (id, md5) map-side first, so the exchange
    carries two slim columns however wide the documents are; at 100 TB
    the join is id-keyed and AQE-splittable. NULL text digests to NULL,
    and a NULL-vs-NULL id match compares as 'unchanged' (null-safe
    equality) — deletion of content (text -> NULL) reads as 'changed',
    matching the digest sketch's exact-gate convention."""
    o = old.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col)).alias("old_digest"),
                   F.lit(True).alias("in_old"))
    n = new.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col)).alias("new_digest"),
                   F.lit(True).alias("in_new"))
    j = o.join(n, "doc_id", "full_outer")
    # presence markers (not digest NULL-ness) decide added/removed: a
    # present row with NULL text digests to NULL, which must NOT read
    # as an absent side
    status = (F.when(F.col("in_old").isNull(), F.lit("added"))
              .when(F.col("in_new").isNull(), F.lit("removed"))
              .when(F.col("old_digest").eqNullSafe(F.col("new_digest")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("doc_id", status.alias("status"))


def admission_sketch(df: DataFrame, id_col: str, text_col: str,
                     num_hashes: int = 16, shingle_n: int = 3,
                     seed: int = 42, hash_fn: str = "xxhash64") -> DataFrame:
    """The per-document dedup SKETCH persisted at admission time:
    ``(id, digest, sig, shingles)`` — everything the incremental/streaming
    classifier needs from the existing-corpus side, so a later batch never
    re-reads or re-tokenizes the corpus's raw text (VERDICT r9 #1).

    - ``digest``: xxhash64 of the text — the exact-dup gate key (8 B/doc).
    - ``sig``: the MinHash signature array — band candidacy
      (8·num_hashes B/doc); same hash family as ``minhash_signatures``.
    - ``shingles``: the DISTINCT shingle set — the exact-Jaccard verify
      side. Stored as strings so verification against a sketch is
      bit-identical to verification against the raw text (the contract
      oracle restates string-shingle Jaccard); a deployment tighter on
      storage can hash these to 64-bit (Jaccard identical up to 2⁻⁶⁴
      collisions) — the classifier below only needs set semantics.

    ONE shingle pass feeds both the signature mins and the collect_set
    (min over the multiset equals min over the set, and collect_set dedups
    inside the aggregate — no distinct exchange), vs the two passes the
    self-contained ``incremental_dedup`` pays per call. Documents shorter
    than ``shingle_n`` tokens keep an empty sig/shingle set: they emit no
    band rows and can only ever be exact dups — same semantics as the
    text path.
    """
    ids = df.select(F.col(id_col),
                    F.xxhash64(F.col(text_col)).alias("digest"))
    ex = shingle_rows(df, id_col, text_col, shingle_n, distinct=False)
    hashes = _minhash_family(num_hashes, seed, hash_fn)
    agg = ex.groupBy(id_col).agg(
        *[F.min(h).alias(f"h{i}") for i, h in enumerate(hashes)],
        F.collect_set("shingle").alias("shingles"))
    agg = agg.select(
        F.col(id_col),
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"),
        F.col("shingles"))
    empty_sig = F.array().cast("array<bigint>")
    empty_sh = F.array().cast("array<string>")
    return (ids.join(agg, id_col, "left")
            .select(F.col(id_col), F.col("digest"),
                    F.coalesce("sig", empty_sig).alias("sig"),
                    F.coalesce("shingles", empty_sh).alias("shingles"))
            # set size denormalized next to the array: the verify's
            # Jaccard denominators then read an int column, never a
            # second scan of the (heavy) shingles column
            .withColumn("n_shingles", F.size("shingles")))


def _sketch_band_rows(sk: DataFrame, id_col: str, out_id: str,
                      rows_per_band: int, num_hashes: int) -> DataFrame:
    """Band a sketch's ``sig`` column into (band_id, band_hash) rows for
    the cross-frame candidate join. ``rows_per_band=1`` is the classic
    any-minhash-collision candidacy (the admission contract's oracled
    semantics); r>1 hashes r consecutive signature entries per band —
    the standard LSH knob that drops a band's collision rate from J to
    J^r, the lever when candidacy explodes on a boilerplate-heavy corpus
    (same construction as ``minhash_lsh_candidates``).

    Documents shorter than ``shingle_n`` tokens carry an EMPTY ``sig``
    (``admission_sketch`` keeps them exact-gate-only). ``posexplode`` of
    an empty array naturally emits no band rows; the r>1 path must filter
    them out explicitly — ``element_at`` on an empty array raises under
    Spark 4 ANSI mode, and one such row persisted by
    ``admission_batch_writer`` would poison every later drain. The filter
    also preserves the documented empty-sig-emits-no-band-rows semantics
    instead of colliding every short doc on the hash of ''."""
    if rows_per_band == 1:
        return sk.select(F.col(id_col).alias(out_id),
                         F.posexplode("sig").alias("band_id", "band_hash"))
    bands = num_hashes // rows_per_band
    sk = sk.filter(F.size("sig") == num_hashes)
    return sk.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.xxhash64(F.concat_ws("_", *[
                         F.element_at("sig",
                                      b * rows_per_band + r + 1)
                         .cast("string")
                         for r in range(rows_per_band)])).alias("band_hash"))
            for b in range(bands)])).alias("band")
    ).select(out_id, "band.band_id", "band.band_hash")


def sketch_incremental_dedup(new_sketch: DataFrame,
                             existing_sketch: DataFrame, id_col: str,
                             min_jaccard: float = 0.5,
                             materialize: bool = True,
                             rows_per_band: int = 1,
                             num_hashes: int = 16,
                             existing_digests: DataFrame | None = None,
                             existing_bands: DataFrame | None = None) \
        -> DataFrame:
    """``incremental_dedup`` computed ENTIRELY from persisted sketches —
    no raw text on either side. Same flags, same math: exact gate is a
    digest semi-join, band candidacy is the sig-element equi join, and
    the verify is exact Jaccard over the stored distinct-shingle sets
    (``array_intersect``/``array_union`` — the "array" verify mode of
    ``ngram_jaccard_pairs``, except the arrays are already materialized
    in the sketch so the collect_set cost it was measured to lose on is
    not paid here).

    This is the batch-proportional admission classifier (VERDICT r9 #1):
    per-batch COMPUTE on the corpus side is three column-pruned scans of
    the sketch table (digest / sig / shingles — each gate reads only its
    column), never a corpus re-shingle; the shuffles carry the batch side
    plus band-candidate rows only. The verify runs in "join" mode (the
    measured winner of ``ngram_jaccard_pairs`` at high pairs-per-doc:
    candidate pairs expand by the NEW side's shingle rows — narrow rows,
    never a per-pair materialization of both heavy shingle arrays, which
    an array_intersect formulation was measured to lose on 3× at 166k
    candidates), with the existing side's shingle arrays semi-joined down
    to candidate docs BEFORE the explode. Set sizes come free from
    ``size(shingles)`` — no count aggregate. The Jaccard divisor
    ``na+nb−i ≥ i ≥ 1`` on every surviving row (i ≤ min(na, nb)), so the
    division is ANSI-safe by construction.

    Layout-pruned reads (r11, VERDICT r10 #3): the digest and band gates
    accept pre-pruned frames so a bucketed sketch layout can turn the
    per-batch full-table scans into key-pruned slices —
    ``existing_digests`` (a frame with a ``digest`` column; pruned to the
    batch's digest buckets by the caller) replaces the exact gate's scan,
    and ``existing_bands`` (pre-banded ``(id_b, band_id, band_hash)``
    rows, pruned to the batch's band buckets) replaces the sig explode.
    Both pruning predicates are equality-safe: an equal digest shares its
    digest bucket, an equal (band_id, band_hash) shares its band bucket,
    so pruning can never drop a true match. The shingle verify stays on
    the FULL sketch frame (candidate-id semi-join — never bucket-pruned,
    candidates come from the gates). Defaults preserve the flat-layout
    behavior exactly.
    """
    new_keyed = new_sketch.select(F.col(id_col), "digest", "sig", "shingles")
    dig_src = (existing_digests if existing_digests is not None
               else existing_sketch)
    exact_dups = (new_keyed.select(id_col, "digest")
                  .join(dig_src.select("digest").distinct(),
                        "digest", "left_semi")
                  .select(id_col))
    nb = _sketch_band_rows(new_keyed, id_col, "id_a",
                           rows_per_band, num_hashes)
    eb = (existing_bands.select("id_b", "band_id", "band_hash")
          if existing_bands is not None
          else _sketch_band_rows(existing_sketch, id_col, "id_b",
                                 rows_per_band, num_hashes))
    cands = (nb.join(eb, ["band_id", "band_hash"])
             .select("id_a", "id_b").distinct())
    if materialize:
        cands = cands.localCheckpoint(eager=False)
    cand_b = cands.select(F.col("id_b").alias(id_col)).distinct()
    if materialize:
        # feeds two semi-joins (shingle rows + set sizes) — tiny id frame
        cand_b = cand_b.localCheckpoint(eager=False)
    # the heavy shingles column is scanned ONCE, candidate-restricted;
    # set sizes ride the denormalized n_shingles int column instead
    b_rows = (existing_sketch.select(id_col, "shingles")
              .join(cand_b, id_col, "left_semi")
              .select(F.col(id_col).alias("id_b"),
                      F.explode("shingles").alias("shingle")))
    a_rows = new_keyed.select(F.col(id_col).alias("id_a"),
                              F.explode("shingles").alias("shingle"))
    inter = (cands.join(a_rows, "id_a")
             .join(b_rows, ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i")))
    na = new_keyed.select(F.col(id_col).alias("id_a"),
                          F.size("shingles").alias("na"))
    nbsz = (existing_sketch.select(id_col, "n_shingles")
            .join(cand_b, id_col, "left_semi")
            .select(F.col(id_col).alias("id_b"),
                    F.col("n_shingles").alias("nb")))
    near_dups = (inter.join(na, "id_a").join(nbsz, "id_b")
                 .where((F.col("i") / (F.col("na") + F.col("nb")
                                       - F.col("i")))
                        >= F.lit(min_jaccard))
                 .select(F.col("id_a").alias(id_col)).distinct())
    return (new_keyed.select(id_col)
            .join(exact_dups.withColumn("__e", F.lit(1)), id_col, "left")
            .join(near_dups.withColumn("__n", F.lit(1)), id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("__e", F.lit(0)).alias("dup_exact"),
                    F.coalesce("__n", F.lit(0)).alias("dup_near"),
                    F.when((F.coalesce("__e", F.lit(0)) == 0) &
                           (F.coalesce("__n", F.lit(0)) == 0), 1)
                    .otherwise(0).alias("admitted")))


def _min_label_propagation(pairs: DataFrame, id_a: str, id_b: str,
                           max_iter: int) -> tuple[DataFrame, int]:
    """Minimum-label propagation: every round each node adopts
    min(own label, neighbors' labels). One shuffle-join per round;
    converges in O(component diameter) rounds. Returns (labels, rounds)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    labels = (edges.select(F.col("src").alias("id"))
              .union(edges.select("dst")).distinct()
              .withColumn("label", F.col("id")))
    for rounds in range(1, max_iter + 1):
        nbr = (sym.join(labels, sym.dst == labels.id)
               .groupBy("src").agg(F.min("label").alias("nbr_min")))
        merged = (labels.join(nbr, labels.id == nbr.src, "left")
                  .select(labels.id.alias("id"),
                          F.col("label").alias("old_label"),
                          F.least(F.col("label"),
                                  F.coalesce("nbr_min", F.col("label")))
                          .alias("label")))
        merged = merged.localCheckpoint(eager=True)  # cut lineage per round
        labels = merged
        if merged.where(F.col("label") != F.col("old_label")).isEmpty():
            return labels.select("id", F.col("label").alias("canonical_id")), rounds
    return None, max_iter  # non-converged sentinel — caller raises


def _star_contraction(pairs: DataFrame, id_a: str, id_b: str,
                      max_iter: int) -> tuple[DataFrame, int]:
    """Large-star/small-star contraction (Kiveris et al. '14, "Connected
    Components in MapReduce and Beyond"): alternate

    - LARGE-STAR: every node u links each strictly-larger neighbor to
      m = min(N(u) ∪ {u}) — emit (v, m) for v ∈ N(u), v > u;
    - SMALL-STAR: orient edges toward the larger endpoint (u > v), then
      u re-links its smaller neighborhood (and itself) to m = min(N(u)):
      emit (x, m) for x ∈ N(u) ∪ {u}, x ≠ m;

    until the edge set is stable. Converges in O(log n) rounds — the
    scale answer for chain-shaped near-dup graphs where propagation's
    O(diameter) stalls. Each half-round is one groupBy + one join on node
    id, the same shuffle primitive as propagation. At convergence every
    non-root node holds exactly one edge to its component minimum.
    Returns (labels-for-edge-nodes, rounds); roots are re-attached by the
    caller.
    """
    # canonical undirected edge set, self-loops dropped
    edges = (pairs.select(F.least(id_a, id_b).alias("lo"),
                          F.greatest(id_a, id_b).alias("hi"))
             .where(F.col("lo") != F.col("hi")).distinct()
             .localCheckpoint(eager=True))

    def signature(df: DataFrame) -> tuple[int, int]:
        # one tiny job: (row count, order-invariant hash-xor — stays in
        # the long domain under ANSI, unlike a hash SUM). Equal
        # signatures are a NECESSARY convergence condition checked every
        # round; set equality is CONFIRMED with one exceptAll only when
        # the signature matches — r5 spent 2 extra exceptAll jobs per
        # run on count-equal-but-still-moving rounds
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.bit_xor(F.xxhash64("lo", "hi")).alias("h")).first()
        return r["n"], r["h"]

    sig_edges = signature(edges)
    for rounds in range(1, max_iter + 1):
        # -- large-star: u's neighborhood from BOTH orientations
        sym = edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")) \
            .union(edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        # NOT distinct'ed: the duplicate relinks a multi-edge produces are
        # removed by the round-final distinct anyway, and the extra
        # exchange per round cost more than the duplicate rows it saved
        # (fanout through the small-star join is bounded by Σ deg(u)² of
        # the CONTRACTED graph, which shrinks geometrically per round)
        large = (sym.join(mins, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.least("v", "m").alias("lo"),
                         F.greatest("v", "m").alias("hi"))
                 .where(F.col("lo") != F.col("hi")))
        # -- small-star: orient toward the larger endpoint; u = hi, N(u) = lo.
        # Emit (m, x) for x ∈ N(u) ∪ {u}, x ≠ m — as a join, never a
        # collect_set (a hub's neighborhood must not materialize in one row)
        mins_s = large.groupBy("hi").agg(F.min("lo").alias("m"))
        relink = (large.join(mins_s, "hi")
                  .where(F.col("lo") != F.col("m"))
                  .select(F.col("m").alias("lo"), F.col("lo").alias("hi")))
        self_link = mins_s.select(F.col("m").alias("lo"), "hi")
        # LAZY checkpoint: the signature aggregate is the round's only
        # action, and its first pass materializes the checkpoint as a
        # side effect — one job per round where eager + count was two
        small = relink.union(self_link).distinct().localCheckpoint(eager=False)
        sig_small = signature(small)
        # both sides are DISTINCT sets: equal signature + one-direction
        # except empty ⟺ set equality
        if sig_small == sig_edges and small.exceptAll(edges).isEmpty():
            return small.select(F.col("hi").alias("id"),
                                F.col("lo").alias("canonical_id")), rounds
        edges, sig_edges = small, sig_small
    return None, max_iter


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   max_iter: int = 20,
                   algorithm: str = "star") -> DataFrame:
    """Connected components over near-duplicate PAIRS → one canonical id
    (the component minimum) per member — the step that turns pairwise
    near-dup output into keep/drop decisions for a corpus.

    ``algorithm="star"`` (default) runs large-star/small-star contraction,
    O(log n) rounds — the 100 TB path. ``algorithm="propagation"`` runs
    plain min-label propagation, O(diameter) rounds — kept as the simple
    twin for small/star-shaped graphs. Both produce identical output.

    Raises ValueError if the round budget is exhausted before convergence
    (a silent partial result would hand back multiple canonical ids for
    one component — data corruption for a dedup pipeline).

    Returns (id, canonical_id) for every node that appears in ``pairs``.
    """
    if algorithm == "propagation":
        labels, _ = _min_label_propagation(pairs, id_a, id_b, max_iter)
    elif algorithm == "star":
        star_labels, _ = _star_contraction(pairs, id_a, id_b, max_iter)
        if star_labels is None:
            labels = None
        else:
            # star labels cover non-root edge nodes; re-attach roots and
            # any self-pair-only nodes with canonical = self
            nodes = (pairs.select(F.col(id_a).alias("id"))
                     .union(pairs.select(F.col(id_b).alias("id"))).distinct())
            labels = (nodes.join(star_labels, "id", "left")
                      .select("id", F.coalesce("canonical_id", "id")
                              .alias("canonical_id")))
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if labels is None:
        raise ValueError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            f"rounds ({algorithm}) — raise max_iter, or use "
            f"algorithm='star' for chain-shaped components")
    return labels


# -------------------------------------------------------------- simhash ---

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64,
            shingle_n: int = 2) -> DataFrame:
    """SimHash fingerprint: per bit b, sum ±1 over shingle hashes' bit b,
    fingerprint bit = sign. Columnar formulation (explode + codegen'd sum
    aggregates per bit) for the same interpreted-HOF reason as
    ``minhash_signatures``."""
    # set-bit COUNTS, not ±1 sums: sign(Σ±1) ≡ (2·c_b > n) exactly, and a
    # plain sum of (h>>b)&1 evaluates one branchless expression per bit
    # where the when/otherwise form evaluated two (measured ~15% faster
    # warm, ~2.5× faster on the first codegen'd run at sf0.1)
    ex = shingle_rows(df, id_col, text_col, shingle_n, distinct=True) \
        .select(F.col(id_col), F.xxhash64("shingle").alias("h"))
    bit_counts = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}")
          for b in range(bits)])
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"c{b}") * 2 > F.col("n"),
                      F.lit(2 ** b if b < 63 else -(2 ** 63))) \
                .otherwise(F.lit(0)).cast("long")
        fp = term if fp is None else fp + term
    return bit_counts.select(F.col(id_col), fp.alias("simhash"))


def simhash_md5(df: DataFrame, id_col: str, text_col: str,
                bits: int = 32, shingle_n: int = 2) -> DataFrame:
    """Engine-portable SimHash twin: the shingle hash is the first 8 md5
    hex chars parsed base-16 (32-bit domain) instead of xxhash64, so the
    whole fingerprint — md5, bit tests, sign sums — is exactly
    reproducible in ANSI SQL / DuckDB for cross-engine verification.
    Same sign-of-bit-sum construction as ``simhash``; the production
    variant stays xxhash64/64-bit."""
    # same set-bit-count formulation as ``simhash`` (sign(Σ±1) ≡ 2·c_b > n)
    ex = shingle_rows(df, id_col, text_col, shingle_n, distinct=True) \
        .select(F.col(id_col),
                F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
                .cast("long").alias("h"))
    bit_counts = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}")
          for b in range(bits)])
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"c{b}") * 2 > F.col("n"), F.lit(2 ** b)) \
                .otherwise(F.lit(0)).cast("long")
        fp = term if fp is None else fp + term
    return bit_counts.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(fp_df: DataFrame, id_col: str, max_hamming: int = 3,
                       prefix_bits: int = 16, bits: int = 64,
                       materialize: bool = True) -> DataFrame:
    """Candidate pairs whose fingerprints share a ``prefix_bits`` block
    (bucketing) and differ in ≤ ``max_hamming`` bits overall. bit_count on
    XOR is a built-in — exact Hamming verification after the bucket join.

    ``materialize`` checkpoints the fingerprint frame before the bucket
    self-join: AQE never cross-stage-reuses an exchange, so both join
    sides otherwise recompute the whole shingle-explode + per-bit-sum
    fingerprint aggregate (the same failure ``minhash_dedup`` fixes — see
    its docstring). The fingerprint table is one long per document, so at
    100 TB this is the persist-the-sketch design, not a memory risk."""
    bucketed = fp_df.select(
        F.col(id_col), F.col("simhash"),
        F.shiftright("simhash", bits - prefix_bits).alias("bucket"))
    if materialize:
        bucketed = bucketed.localCheckpoint(eager=False)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (a.join(b, on="bucket")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                    .alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# ------------------------------------------------------ n-gram jaccard ----

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_n: int = 3,
                        candidates: DataFrame | None = None,
                        min_jaccard: float = 0.0,
                        verify_mode: str = "join") -> DataFrame:
    """Exact n-gram Jaccard similarity between document pairs.

    Without ``candidates``: all pairs sharing ≥1 shingle (explode + equi
    join on the shingle — the inverted-index pattern; shuffle is keyed on
    shingle, so stopword-like shingles are the skew risk). With
    ``candidates`` (from LSH): verification only, over the candidate pairs.

    ``verify_mode`` (candidates mode only):

    - ``"join"``: expand each pair by id_a's shingle rows and count matches
      against id_b's — never materializes a per-doc shingle array; row
      width stays constant, best when individual documents can be huge.
    - ``"array"``: build each candidate doc's distinct shingle ARRAY
      (collect_set-sized to the doc itself, ~1-2× its text) and score each
      pair with array_intersect/array_union — two doc-id-keyed joins and
      zero pair-expansion shuffle. Fewer stages but measured SLIGHTLY
      slower than join mode at sf0.1 (collect_set array building costs
      more than the expansion join saves at ~50-shingle docs); it wins
      when pairs-per-doc is high (expansion fan-out) and costs one
      doc-sized row per candidate doc. Join mode is the default.

    jaccard = |A∩B| / |A∪B| in both modes.
    """
    if candidates is not None:
        # verification mode only touches docs that appear in a candidate
        # pair — semi-join the corpus down BEFORE shingling, so the
        # distinct-shingle shuffle is sized to the candidate set, not the
        # corpus (at 100 TB the candidate set is orders of magnitude
        # smaller; callers pass an already-materialized candidate frame so
        # this does not recompute the LSH join)
        cand_ids = (candidates.select(F.col("id_a").alias(id_col))
                    .union(candidates.select(F.col("id_b").alias(id_col)))
                    .distinct())
        df = df.join(cand_ids, id_col, "left_semi")
    if candidates is not None and verify_mode == "array":
        # single-consumer path: NON-distinct shingle rows straight into
        # collect_set (dedup happens inside the aggregate, map-side partial
        # included) — no distinct exchange, no checkpoint needed
        sh = shingle_rows(df, id_col, text_col, shingle_n, distinct=False)
        arrs = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("sh"))
        return (candidates
                    .join(arrs.select(F.col(id_col).alias("id_a"),
                                      F.col("sh").alias("sh_a")), "id_a")
                    .join(arrs.select(F.col(id_col).alias("id_b"),
                                      F.col("sh").alias("sh_b")), "id_b")
                    .select("id_a", "id_b",
                            (F.size(F.array_intersect("sh_a", "sh_b")) /
                             F.size(F.array_union("sh_a", "sh_b")))
                            .alias("jaccard"))
                    .where(F.col("jaccard") >= min_jaccard))
    # no .cache(): Spark's ReusedExchange shares the distinct's shuffle
    # output across the exhaustive path's consumers, and an operator-held
    # cache would pin executor storage for the session lifetime
    sh = shingle_rows(df, id_col, text_col, shingle_n, distinct=True)
    if candidates is not None:
        # join mode has three consumers below (counts + both pair sides);
        # AQE does not cross-stage-reuse the distinct's exchange, so
        # checkpoint the candidate-restricted shingle frame once instead of
        # computing it three times (candidate-sized, not corpus-sized)
        sh = sh.localCheckpoint(eager=False)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if candidates is not None:
        # verification only: expand each candidate pair by id_a's shingles,
        # count how many also belong to id_b — two equi joins + a count,
        # all codegen'd; no array materialization
        inter = (candidates.join(a, "id_a")
                 .join(b, ["id_b", "shingle"])
                 .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i")))
    else:
        # inverted index: pairs sharing a shingle, intersection counted in
        # the same aggregation (shuffle keyed on shingle — stopword-like
        # shingles are the skew risk; AQE splits them)
        inter = (a.join(b, "shingle")
                 .where(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("i")))
    na = counts.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = counts.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= min_jaccard))


def dedup_survivors(df: DataFrame, id_col: str, pairs: DataFrame,
                    id_a: str = "id_a", id_b: str = "id_b",
                    keep_by: str | None = None) -> DataFrame:
    """The keep/drop MATERIALIZATION of a near-dup pipeline: resolve
    pairwise matches into connected components (``dedup_clusters``), keep
    one member per component plus every row that matched nothing, and
    annotate each survivor with its cluster size (``n_members`` = 1 for
    singletons) — the frame you actually write back out as the
    deduplicated corpus.

    ``keep_by=None`` keeps each component's minimum-id member (stable,
    zero extra joins). ``keep_by="quality"`` keeps the member with the
    LARGEST value of that ``df`` column instead (ties → smallest id) —
    the production policy that keeps the best-quality / longest copy of
    a near-dup family rather than an arbitrary one; costs two extra
    component-keyed aggregates + one join over the (bounded,
    matched-rows-only) label table. The tie-break takes ``min(id)``
    among the members attaining the max quality — no id negation — so
    the policy works for ANY orderable id type (string/date/decimal),
    same domain as the default min-id path (ADVICE r6: the previous
    ``max(struct(q, -id))`` form threw under ANSI for non-numeric ids).
    A component whose members all have NULL quality still keeps its
    min-id member (null-safe equality), never vanishing from the corpus.

    Plan shape on top of the component resolution: one count aggregate
    over the (bounded, component-keyed) label table and one left join
    from the corpus to it — survivors are the kept member or unlabeled.
    No extra scan of the pair set.
    """
    # labels fans out three ways (sizes, canonicals, dropped) and its
    # lineage reaches back through the pair generator (often an expensive
    # similarity self-join) — checkpoint or every consumer replays it
    # (AQE never reuses an exchange across stages)
    labels = dedup_clusters(pairs, id_a, id_b).localCheckpoint(eager=False)
    if keep_by is not None:
        # re-anchor each component on its best-quality member: one
        # id-keyed join to fetch quality, a component-keyed max of the
        # quality ALONE, then min(id) among the members attaining it.
        # labeled fans out to both aggregates — checkpoint or the
        # df-side scan replays per consumer (bounded: matched rows only)
        labeled = (labels.join(
            df.select(F.col(id_col).alias("id"), F.col(keep_by).alias("__q")),
            "id").localCheckpoint(eager=False))
        best_q = (labeled.groupBy("canonical_id")
                  .agg(F.max("__q").alias("__bq")))
        # eqNullSafe: max() skips NULL qualities, so __bq is NULL only
        # when EVERY member's quality is NULL — then all members tie and
        # min(id) decides, instead of the component losing its survivor
        best = (labeled.join(best_q, "canonical_id")
                .where(F.col("__q").eqNullSafe(F.col("__bq")))
                .groupBy("canonical_id")
                .agg(F.min("id").alias("__keep")))
        labels = (labels.join(best, "canonical_id")
                  .select("id", F.col("__keep").alias("canonical_id")))
    sizes = labels.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("n_members"))
    canon = (labels.where(F.col("id") == F.col("canonical_id"))
             .join(sizes, "canonical_id")
             .select(F.col("id").alias("__kid"), "n_members"))
    dropped = labels.where(F.col("id") != F.col("canonical_id")) \
                    .select(F.col("id").alias("__kid"))
    return (df.join(dropped, df[id_col] == dropped["__kid"], "left_anti")
            .join(canon, df[id_col] == canon["__kid"], "left")
            .select(df["*"],
                    F.coalesce("n_members", F.lit(1)).alias("n_members")))
