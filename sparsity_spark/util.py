"""Small shared planning helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than cores.

    CPU-heavy per-row work (shingling, hashing, tokenizing) over a small
    number of large-ish files otherwise runs on one thread per file —
    parquet can't split below a row group. On a real cluster with many
    input files this is a no-op; the guard means we never pay a shuffle
    that isn't buying parallelism.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
