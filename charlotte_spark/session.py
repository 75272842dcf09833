"""SparkSession factory for the engine.

Pins the settings the DuckDB oracle comparison depends on (UTC session
timezone, ANSI off for permissive casts) and the settings a 100 TB
deployment needs from day one (AQE + skew-join handling, Arrow for the
Python boundary). On a real cluster only ``master``/memory change; the
SQL-level configs are identical, so plans tested locally are the plans
that run at scale.

Reference parity: charlotte has no session concept — it is a daemon
(/root/reference/scripts/charlotte:42-52). Our equivalent of its Config
validation (charlotte/__init__.py:123-153) is this explicit builder.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

# Shuffle partitions: match local cores while testing; on a real cluster
# AQE coalesces the post-shuffle partitions anyway, so a higher initial
# number (e.g. 2000 for 100 TB inputs) only affects the pre-AQE plan.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def local_df(spark: SparkSession, rows, schema):
    """Small driver-local DataFrame as ONE partition.

    ``createDataFrame(list)`` splits rows across defaultParallelism
    pickled partitions; any downstream ``coalesce(1)`` (e.g. tiny dim
    writes) then pays one sequential Python-worker handoff per parent
    partition — measured ~5 s per tiny write at local[32]. One slice
    makes it one handoff (~0.3 s warm)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows or [], 1), schema)


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize an intermediate and cut its lineage, fault-tolerantly.

    ``localCheckpoint()`` pins blocks in executor memory: fast, but not
    recomputable — one lost executor kills a 100 TB job mid-flight, so
    it is banned from the engine's shared-intermediate pattern.
    ``checkpoint()`` writes to ``spark.checkpoint.dir``; a cluster
    deployment points that at the DFS, locally it defaults to RAM-backed
    scratch (the single-JVM stand-in for a fast DFS). The input is
    persisted first so the checkpoint write re-reads cached blocks
    instead of recomputing the whole lineage (the classic
    double-compute trap), then unpersisted — the checkpoint files are
    the only retained copy."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        base = os.environ.get("CHARLOTTE_CKPT_DIR") or (
            "/dev/shm/charlotte_ckpt"
            if os.access("/dev/shm", os.W_OK)
            else "/tmp/charlotte_ckpt"
        )
        sc.setCheckpointDir(base)
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    out = cached.checkpoint(eager=True)
    cached.unpersist()
    return out


def join_futures(futs) -> None:
    """Join concurrently submitted Spark jobs, surfacing the FIRST
    failure as soon as it happens (ADVICE r15): a plain
    ``for f in futs: f.result()`` loop only raises in submission order,
    so a crash in a later job is masked until every earlier job's
    result is consumed and sibling jobs keep running after one fails.
    Queued-but-unstarted siblings are cancelled; already-running Spark
    jobs finish on their own (harmless — their writes are idempotent
    overwrites/appends the caller retries or discards)."""
    from concurrent.futures import FIRST_EXCEPTION, wait

    done, not_done = wait(futs, return_when=FIRST_EXCEPTION)
    for f in done:
        exc = f.exception()
        if exc is not None:
            for nf in not_done:
                nf.cancel()
            raise exc
    for f in not_done:  # no failure: wait() returned with all done
        f.result()


def get_spark(app_name: str = "charlotte-spark", cpus: str | int | None = None) -> SparkSession:
    """Return the shared SparkSession, creating it on first call."""
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # --- correctness-critical (oracle parity, SURVEY §2 caveats) ---
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet INT64(TIMESTAMP(NANOS)) (events.ts) has no native Spark
        # type; read as epoch-nanos long and convert in catalog.load_table
        # (truncating to micros, exactly what DuckDB's reader does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scale-critical: identical on the 1000-executor cluster ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # GC reliable-checkpoint files once their RDDs are unreferenced
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # --- local-mode only ---
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        # Whole-stage codegen emits a fresh JIT-compiled class per plan;
        # a few hundred distinct queries in ONE JVM (the bench sweep)
        # fill the default 240 MB code cache, after which HotSpot stops
        # compiling and every late query runs interpreted (observed r11:
        # the bench tail degraded 2-12x — d102 6s->38s across its own
        # three runs — while the same queries ran at full speed in a
        # fresh process). On a real cluster executors are long-lived
        # too, so the bigger cache is the production setting, not a
        # bench hack.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/charlotte_spark_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
