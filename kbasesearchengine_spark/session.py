"""SparkSession factory with the configs this engine assumes.

Local-mode testing runs on ``local[N]``; production is spark-submit on a
multi-executor cluster — every knob here is also valid there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kbasesearchengine_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to cores (local mode — never 200).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        default_shuffle = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        default_shuffle = cores
    if shuffle_partitions is None:
        shuffle_partitions = default_shuffle

    # Python-worker allocator tuning, inherited through the JVM (set
    # BEFORE the gateway launches; glibc reads these at process start).
    # The posting kernel's numpy buffers are >32 MB, which glibc ALWAYS
    # serves via fresh mmap and returns via munmap — so every Arrow batch
    # re-pays first-touch page faults, a cost that is (a) kernel-side and
    # serializing under concurrency, (b) brutal on an oversubscribed
    # guest (measured here: up to 40x a warm write pass). Raising the
    # mmap/trim thresholds keeps those blocks on the heap free-list —
    # each worker faults its arena once and reuses it for every
    # subsequent batch. ~1-2 GB steady RSS per worker, by design.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

    # Preload numpy/pandas/pyarrow ONCE in the Python-worker daemon;
    # forked workers inherit the loaded modules copy-on-write instead of
    # each paying a cold import on its first task (worker_daemon.py).
    # PYTHONPATH must carry the repo root before the JVM gateway launches
    # so the daemon interpreter can import the module.
    preload = os.environ.get("KBSE_DAEMON_PRELOAD", "1") != "0"
    if preload:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        if repo_root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                repo_root + os.pathsep + pp if pp else repo_root
            )

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM hosts all executor threads — size the
        # heap for N concurrent sort/shuffle tasks, not for a driver
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    if preload:
        b = b.config(
            "spark.python.daemon.module",
            "kbasesearchengine_spark.worker_daemon",
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
