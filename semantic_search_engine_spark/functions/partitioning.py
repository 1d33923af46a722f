"""Scan-parallelism guard for small single-row-group inputs.

The driver's test tables are single parquet files with ONE row group
(e.g. sf1.0: embeddings 20k rows / 1 row group), so a scan — and every
narrow operator chained on it (LSH hashing, minhash md5 folds, cosine
scoring, PQ encode) — runs as ONE task no matter the core count;
``spark.sql.files.minPartitionNum`` cannot split inside a row group.
``spread_small_scan`` round-robin repartitions such inputs up to the
session's shuffle parallelism so per-row compute uses the machine.

Scale-adaptive by construction (the round-8 rule: no constants tuned to
one mode): at production scale the input already has ≥ parallelism
partitions and the function is a NO-OP — the exchange only exists when
the input is provably too narrow to feed the cores. Round-robin
repartition of a deterministic source is retry-safe (Spark sorts before
round-robin partitioning, SPARK-23207) and never changes values, only
placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: the session's shuffle
    parallelism) iff its current partition count is below half of it —
    a no-op whenever the source is already wide enough to feed the
    cores, so plans at real scale are unchanged."""
    spark = df.sparkSession
    if target is None:
        target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; spread is best-effort
        return df
    if cur * 2 < target:
        return df.repartition(target)
    return df
