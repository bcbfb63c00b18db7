"""SparkSession factory.

The reference builds ad-hoc sessions per script with ``master("yarn")``
(reference ``pyspark/batch_openweather.py:49``). The engine centralizes
session construction with a scale-aware default config:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion) — the single biggest free win at
  100 TB where static ``spark.sql.shuffle.partitions`` is always wrong.
- Session timezone pinned to UTC so timestamp→date/hour derivations agree
  across engines and with the DuckDB oracle (SURVEY.md §7.4 risk 4).
- Arrow enabled for the (rare) Pandas-UDF paths (similarity / multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be cluster-submit configs; in local mode they make
# the same plans observable. Shuffle partitions start high and AQE coalesces.
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB scan splits
    "spark.sql.autoBroadcastJoinThreshold": "33554432",  # 32 MiB dims broadcast
    "spark.sql.shuffle.partitions": "32",
    # runtime Bloom-filter join pruning: when a selective filter sits on one
    # side of a shuffle join, Spark builds a bloom_filter_agg of the join
    # keys and injects might_contain() into the OTHER side's scan — rows
    # that cannot match die before the shuffle. Default-on upstream; pinned
    # here because at 100 TB it is the difference between shuffling the
    # fact table and shuffling the ~matching slice (the application-side
    # 10 GB scan threshold keeps it from firing at local test scale —
    # tests/test_skew.py lowers it to demonstrate the plan).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.sql.streaming.schemaInference": "false",
    # a resident analytics engine holds hundreds of distinct plans; the
    # default 100-entry generated-class cache evicts under that load and
    # recompilation re-bills codegen to whichever query runs late (the
    # round-5 bench regression's root cause — tools/bench_ab.py showed
    # r4's 54-plan session replayed at 0.97x while the 89-plan session
    # degraded 8%). Size the cache for the workload; generated classes
    # are KB-scale, so 5000 entries is a few hundred MB ceiling at most.
    "spark.sql.codegen.cache.maxEntries": "5000",
    # likewise the JVM's JIT code cache: 90+ pipelines of generated code
    # overflow the 240 MB default and flushing de-optimizes hot loops
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
    # local[N] runs every executor thread inside the driver JVM, whose
    # default 1g heap is sized for a thin cluster driver, not for N=32
    # concurrent tasks' shuffle/agg state (the 10x scale run OOMed the
    # default at a 18M-row band join). Allocated lazily, so idle
    # sessions don't pin it. On a real cluster this becomes
    # spark.executor.memory via submit conf. Overridable via
    # $SPARK_GRAFT_DRIVER_MEM (ADVICE r6: in a cgroup-limited container
    # a hard-pinned 24g can be OOM-killed mid-job — size it to the box).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    # testdata parquet stores TIMESTAMP(NANOS); read as long, convert in scan
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ under
    # Spark 4 defaults; pin to LTZ so every session (ours and the driver's)
    # sees one timestamp type — with the session tz fixed to UTC the values
    # are identical, but NTZ rejects casts LTZ allows (e.g. → double)
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # write MICROS (not legacy INT96) so our own output round-trips everywhere
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}

# Intra-op BLAS threads per Python worker (the Arrow/pandas stages:
# blocked matmuls, per-cell Gram matrices). Unpinned, OpenBLAS defaults
# to one thread PER CORE in EVERY concurrently-running worker —
# local[32] can fan out to ~32×32 threads, and the oversubscription
# thrash measured 3× on the pair-generation family (dedup_survivors
# 90 s → 30 s at sf1, r8). Parallelism belongs to Spark's partitioning
# — on a busy 1000-executor cluster every core already has a task, so
# intra-op threading only ever oversubscribes. Override via
# $SPARK_GRAFT_BLAS_THREADS for sparse-stage local experiments.
_BLAS_THREAD_VARS = ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                     "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS")


def _blas_threads() -> str:
    return os.environ.get("SPARK_GRAFT_BLAS_THREADS", "1")


def _pin_blas_env() -> None:
    """Pin the driver process env (inherited by the local-mode JVM and
    its pyspark.daemon workers). Respects pre-set values."""
    for var in _BLAS_THREAD_VARS:
        os.environ.setdefault(var, _blas_threads())


def get_session(app_name: str = "bda-spadochrony-spark",
                master: str | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass ``yarn``/``k8s`` or rely on spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    _pin_blas_env()
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = {**_BASE_CONF, **(extra_conf or {})}
    for var in _BLAS_THREAD_VARS:  # real-cluster executors
        # honor an individually pre-set var (e.g. OMP_NUM_THREADS=8) the
        # same way _pin_blas_env's setdefault does locally — otherwise a
        # user override would apply in local-mode workers but not on
        # real-cluster executors (ADVICE r8)
        conf.setdefault(f"spark.executorEnv.{var}",
                        os.environ.get(var, _blas_threads()))
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _pin_worker_env(spark)
    return spark


def _pin_worker_env(spark: SparkSession) -> None:
    """Thread the BLAS pin into ``sc.environment`` — the env-var dict
    every subsequently-created Python UDF ships to its worker. This is
    the path that reaches workers even when the session was built by an
    EXTERNAL harness (static executorEnv conf can't be set post-start,
    but sc.environment is driver-side and per-UDF)."""
    try:
        env = spark.sparkContext.environment
        for var in _BLAS_THREAD_VARS:
            env.setdefault(var, os.environ.get(var, _blas_threads()))
    except Exception:
        pass  # connect-mode sessions have no local SparkContext


# Sessions already configured — each conf.set is a py4j round-trip, and the
# harness calls configure() at the top of every query builder; once per
# session is enough (queries that need a different conf set it explicitly
# and restore it themselves).
_CONFIGURED: "weakref.WeakSet[SparkSession]" = None  # type: ignore[assignment]


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an externally-built
    session (e.g. the correctness driver's). Static configs (already-started
    JVM) are skipped automatically by Spark where not settable. Idempotent:
    repeat calls on the same session are a no-op."""
    global _CONFIGURED
    if _CONFIGURED is None:
        import weakref
        _CONFIGURED = weakref.WeakSet()
    if spark in _CONFIGURED:
        return spark
    for k, v in _BASE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep going
    _pin_blas_env()
    _pin_worker_env(spark)
    _CONFIGURED.add(spark)
    return spark
