"""SparkSession factory tuned for the KG-construction pipeline.

Local-mode settings mirror what a 1000-executor cluster deployment would set
per-executor; see DESIGN.md §6 for why each knob matters at 10^12-row scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_prov",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]. Shuffle partitions default to the core count:
    at cluster scale this would be ~2-3x total cores, set by the submitter.

    master overrides the local[N] default; "local-cluster[N,C,M]" spawns N
    real executor JVMs with C cores / M MB each — the sandbox stand-in for a
    multi-executor cluster (one shared driver JVM at local[N] serializes GC,
    python-worker forks, and allocation bandwidth; separate executor JVMs
    scale like separate hosts). Executor python workers import this package
    via spark.executorEnv.PYTHONPATH.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0
    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores if cores else os.cpu_count() or 8)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if master.startswith("local-cluster"):
        os.environ.setdefault("SPARK_HOME", _pyspark_home())

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.executorEnv.PYTHONPATH", repo_root)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # contents are fat; cap Arrow batches so pandas-UDF workers stay bounded
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # this pipeline's per-byte compute is high (sha2 + window + line
        # explode per scan byte): 128 MB packed splits leave cores idle on
        # medium inputs (a 900 MB table -> 7 tasks); 32 MB keeps scan
        # parallelism >= cluster width without small-file pressure
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # idempotent per-partition re-runs for checkpoint/resume (DESIGN.md §6.9)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _pyspark_home() -> str:
    import pyspark

    return pyspark.__path__[0]
