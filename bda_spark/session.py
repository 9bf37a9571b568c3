"""SparkSession factory tuned for both local testing and cluster scale.

The reference runs `local[2..4]` with defaults and even disables the
vectorized parquet reader (reference: Deliverable_3/load_to_silver_layer.py:25);
we keep vectorized reads on and enable AQE so the same declarative plans
re-optimize at runtime on a real cluster (skew joins, partition coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32]/128GiB test harness; on a real cluster the
# same knobs are set by the submitter and AQE coalesces shuffle partitions
# to fit the data, so over-provisioning the static number is safe.
_DEFAULT_CONFS: dict[str, str] = {
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # dynamic broadcast conversion. Essential at 100 TB, free locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static shuffle parallelism; AQE coalesces below this when small.
    # Streaming state stores size from THIS number (AQE never applies
    # to them), so it stays workload-small; batch shuffles instead
    # start from initialPartitionNum below.
    "spark.sql.shuffle.partitions": "32",
    # spark.sql.adaptive.coalescePartitions.initialPartitionNum is
    # deliberately NOT set here. It is the right scale-out lever on a
    # real cluster (AQE can only MERGE shuffle partitions, never split
    # them, so the static 32 eventually becomes a per-partition volume
    # cliff; the submitter should set initialPartitionNum ~2-4x total
    # cores with executor memory sized to match) — but it was built,
    # measured, and REVERTED as a session default in r14:
    # (1) neutral where it was supposed to win — minhash_neardup_pairs
    #     t1000x 106 vs 105 s at the 1000x ladder rung (the apparent
    #     2x win in the first isolated A/B was cold-vs-warm JVM, not
    #     the conf); the rung's costs are linear-per-copy without it;
    # (2) actively harmful in small-heap sessions — past the
    #     200-partition bypass-merge threshold every shuffle write
    #     switches to UnsafeShuffleWriter, whose task memory demand
    #     OOMed the 1g-heap test harness (ShuffleExternalSorter heap
    #     OOM in test_scale_ladder's 10x re-fit).
    # Arrow for any pandas interchange (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: dims like region/nation/supplier always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Keep scans sized so a partition fits comfortably in executor memory.
    "spark.sql.files.maxPartitionBytes": "128m",
    # Correct session-local timezone handling for the epoch-millis ticks.
    "spark.sql.session.timeZone": "UTC",
    # Quiet the local UI; tests spin many sessions.
    "spark.ui.enabled": "false",
    # The driver-provided events table carries TIMESTAMP(NANOS) parquet
    # timestamps; read them as long and convert (see sources.batch).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "bda_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured, which matches the test harness.
    """
    from .functions.blas import blas_env, limit_blas_threads

    # r16: cap BLAS pools (see functions/blas.py). Three surfaces, all
    # needed: the DRIVER process (ctypes, works however late), the
    # LOCAL-mode JVM's python workers (inherit this process env — set
    # before the JVM launches), and CLUSTER executors (executorEnv).
    limit_blas_threads()
    for k, v in blas_env().items():
        os.environ.setdefault(k, v)
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    confs = dict(_DEFAULT_CONFS)
    for k, v in blas_env().items():
        confs.setdefault(f"spark.executorEnv.{k}", v)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
