"""SparkSession factory with the configuration the pipeline assumes.

Scale posture (SURVEY.md §4): AQE on (runtime coalesce + skew-join),
Arrow on with a bounded batch size so long-text scoring batches cannot
blow Python-worker memory, shuffle partitions sized to active cores in
local mode (the production submit overrides this per cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from kg import spec


def get_spark(
    app_name: str = "kg-pipeline",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``master`` defaults to ``local[N]`` with N from ``SPARK_GRAFT_CPUS``
    (driver convention) or all cores. On a real cluster pass
    ``master=None`` and let spark-submit own it.
    """
    # one BLAS thread per Python worker: Spark already runs one worker
    # per core; multi-threaded OpenBLAS inside each would oversubscribe
    # 32×32 threads and thrash (observed: 2-3× bench variance)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    # In local[N] the usable parallelism is N; 200 default shuffle
    # partitions would just add scheduling overhead at test scale.
    n_shuffle = shuffle_partitions or _parallelism_of(master, cpus)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(spec.ARROW_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                # local[N] runs everything in the driver JVM: a small
                # heap GC-thrashes at 32 concurrent tasks (measured 2×
                # slowdown at 8g)
                os.environ.get("KG_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _parallelism_of(master: str, default: int) -> int:
    if master.startswith("local["):
        inner = master[len("local["):-1]
        if inner == "*":
            return default
        try:
            return int(inner)
        except ValueError:
            return default
    return default
