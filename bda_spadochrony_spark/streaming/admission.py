"""Streaming near-duplicate ADMISSION CONTROL (round 9): the streaming
twin of ``operators/dedup.incremental_dedup`` — each micro-batch of
incoming documents is classified against the ACCUMULATED admitted corpus
(exact digest semi-join + MinHash-band candidates with the exact n-gram
Jaccard verify), per-document flags land in a results table, and the
admitted documents append to the corpus — so every batch dedups against
everything admitted before it. This is the shape a 100 TB training-data
ingest actually runs: admission is a stream, the corpus only grows, and
cost per batch is batch-vs-corpus, never corpus².

Scale notes:

- The corpus side's shingle/signature pipelines are recomputed per batch
  here for self-containment (exactly like ``incremental_dedup``); a
  production deployment persists ``(id, digest, sig)`` at admission time
  and joins the 8·num_hashes-byte sketch instead — the batch-proportional
  cost claim is about SHUFFLE volume (bands join batch×corpus candidates
  only), and that already holds.
- foreachBatch is at-least-once: a failed epoch replays with the SAME
  batch_id. Both sinks therefore write ``batch_id=N`` partition
  directories with per-partition OVERWRITE (the ``serving_batch_writer``
  idempotency pattern), and the corpus read EXCLUDES the current
  batch_id — a replayed batch must not see its own earlier half-write as
  "existing corpus" and flag every one of its documents as a self-dup
  (which would overwrite the partition with an empty admitted set:
  silent data loss on recovery).
- Batch-INTERNAL duplicates are not flagged against each other — the
  operator is repeated batch-vs-corpus admission, the same contract as
  ``incremental_dedup``; run exact/MinHash dedup inside the batch first
  when batches can self-duplicate. Pinned by the oracle restatement of
  the contract query (batch 0 against the empty corpus admits
  everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def admission_batch_writer(corpus_path: str, results_path: str,
                           id_col: str, text_col: str,
                           min_jaccard: float = 0.5, num_hashes: int = 16,
                           shingle_n: int = 3, seed: int = 42,
                           hash_fn: str = "xxhash64"):
    """foreachBatch callback factory: classify ``batch_df`` against the
    admitted corpus at ``corpus_path``, write flags to ``results_path``
    and admitted documents back to the corpus (both idempotent per
    batch_id)."""
    from bda_spadochrony_spark.operators.dedup import incremental_dedup

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # admission batches are bounded (ingest slices, not the corpus);
        # one materialization feeds the signature build and both joins
        batch_df = batch_df.select(id_col, text_col).localCheckpoint()
        try:
            existing = (spark.read.parquet(corpus_path)
                        .where(F.col("batch_id") != F.lit(batch_id))
                        .select(id_col, text_col))
        except Exception:
            # first batch: no corpus yet — classify against empty
            existing = spark.createDataFrame([], batch_df.schema)
        flags = incremental_dedup(batch_df, existing, id_col, text_col,
                                  min_jaccard=min_jaccard,
                                  num_hashes=num_hashes,
                                  shingle_n=shingle_n, seed=seed,
                                  hash_fn=hash_fn)
        flags = flags.localCheckpoint()   # two consumers below
        flags.write.mode("overwrite") \
            .parquet(f"{results_path}/batch_id={batch_id}")
        admitted = batch_df.join(
            flags.where(F.col("admitted") == 1).select(id_col),
            id_col, "left_semi")
        admitted.write.mode("overwrite") \
            .parquet(f"{corpus_path}/batch_id={batch_id}")

    return admit


def stream_admission_dedup(stream_docs: DataFrame, id_col: str,
                           text_col: str, corpus_path: str,
                           results_path: str, checkpoint: str | None = None,
                           timeout_s: int = 300,
                           **dedup_kw) -> "StreamingQuery":
    """Start the admission stream (availableNow drain): every available
    micro-batch is classified and folded into the corpus sequentially.
    Pass the SAME ``checkpoint`` across drains and the stream RESUMES —
    already-admitted input is never re-read, so staging new files and
    draining again is the production backfill loop. Returns after the
    drain completes; read ``results_path`` for the flags and
    ``corpus_path`` for the admitted corpus."""
    from bda_spadochrony_spark.streaming.runner import run_foreach_batch
    fn = admission_batch_writer(corpus_path, results_path, id_col,
                                text_col, **dedup_kw)
    query = run_foreach_batch(stream_docs, fn, available_now=True,
                              checkpoint=checkpoint)
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"admission drain did not finish within {timeout_s}s")
    return query


def read_admission_results(spark: SparkSession,
                           results_path: str) -> DataFrame:
    """The flags table: one row per classified document with
    ``(id, dup_exact, dup_near, admitted, batch_id)``."""
    return spark.read.parquet(results_path)
