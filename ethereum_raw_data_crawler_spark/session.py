"""SparkSession factory.

Local-mode defaults tuned per the sandbox (single JVM, up to 32 threads,
128 GiB); on a real cluster the same code runs unchanged under
``spark-submit --py-files`` — nothing here assumes local mode except the
defaults. AQE stays ON (runtime coalescing + skew-join splitting is part
of the scale story, SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "crawl-frontier",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    if shuffle_partitions is None:
        # 3x cores smooths straggler tails on wide stages (measured: every
        # parallelism level of the 5M-round bench gained ~20-45% over
        # width == cores; AQE coalescing absorbs the extra partitions on
        # small stages)
        shuffle_partitions = max(3 * cores, 24)
    # SPARK_GRAFT_MASTER overrides the master URL — used by the scaling
    # harness to run local-cluster[N, C, M] (N real executor JVMs on one
    # box: separate heaps, separate GC, separate Python worker pools),
    # the honest single-machine proxy for an N-executor cluster. `cores`
    # then only sizes the shuffle width.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = driver-only: the heap hosts every cache and shuffle
        # buffer; an undersized heap turns into GC thrash that flattens
        # multi-core scaling (measured: 2.2x -> 1.4x at 32 cores on 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config(
            "spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEM", "8g")
        )  # only meaningful under local-cluster / a real cluster manager
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # single-node shuffle files on tmpfs: local-mode shuffles through one
    # shared disk otherwise, which serializes multi-core runs (a real
    # cluster's shuffle IO scales per-executor; tmpfs is the honest proxy)
    shm = os.environ.get("SPARK_LOCAL_DIRS")
    if shm is None and os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
    if shm:
        builder = builder.config("spark.local.dir", shm)
    # SPARK_GRAFT_CONF="key=value;key=value" — deploy-time conf overrides
    # (the local-mode stand-in for spark-submit --conf); applied before
    # `extra` so programmatic callers win
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in filter(None, env_conf.split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ERROR: the engine intentionally uses small bounded global windows
    # (popped batch numbering), whose WindowExec warnings would drown logs
    spark.sparkContext.setLogLevel("ERROR")
    return spark
