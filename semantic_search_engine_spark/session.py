"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster: every knob here
(AQE, shuffle-partition sizing, Arrow) is the one you'd set on a
1000-executor cluster; ``local[N]`` only changes the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semantic_search_engine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master=None`` respects an already-running session / spark-submit
    master; tests pass ``local[4]`` etc. explicitly.
    """
    # Pin BLAS pools: every Arrow python worker would otherwise spawn
    # ncores BLAS threads → ncores² runnable threads (measured 2-3×
    # slowdown at local[32]). Spark supplies the parallelism; kernels
    # must stay single-threaded. Must be set before numpy loads in
    # workers (they inherit this process's env via pyspark.daemon).
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # local-cluster[n,c,m] (real executor JVMs) needs SPARK_HOME to
    # launch executors from the pip-installed distribution
    if "SPARK_HOME" not in os.environ:
        import pyspark

        os.environ["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    # Executors in non-thread-local masters (local-cluster, standalone,
    # YARN) unpickle UDF closures that import this package — ship the
    # repo on their PYTHONPATH. Real clusters use spark-submit
    # --py-files with the zip from scripts/make_pyfiles.py instead.
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = {
        "spark.executorEnv.PYTHONPATH": repo_dir,
        # AQE: runtime coalescing + skew-join splitting — mandatory at scale
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for every pandas UDF / createDataFrame / toPandas hop
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.files.maxPartitionBytes": "134217728",
        # floor scan parallelism at the session parallelism: the test
        # tables are single ~100MB files (lineitem: 6 row groups) that
        # otherwise scan as 1-2 tasks on a 32-core box; on real
        # many-file inputs the floor is already met and this is a no-op
        "spark.sql.files.minPartitionNum": str(shuffle_partitions),
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
