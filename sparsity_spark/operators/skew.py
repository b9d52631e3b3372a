"""Skew- and shuffle-management operators for the 100 TB posture.

* ``distinct_count_skew_safe`` — COUNT(DISTINCT x) per key without funneling
  any hot key through one reducer: salt by hash(x) % S so each (key, salt)
  partition sees a *disjoint* slice of x's value space; per-salt distinct
  counts then sum exactly (no approximation). Two ordinary hash aggregates.
* ``write_bucketed`` / ``bucketed_table`` — persist a frame's cells bucketed
  by key so repeated joins/aggregations on that key are co-located
  (no Exchange before the join — asserted in tests). This is the engine's
  answer to the reference's sorted ``divisions`` for *hash* access paths,
  as range-partitioned parquet is for *range* paths.

Spark's AQE skew-join splitting (enabled in session.py) covers the join-side
skew case at runtime; these helpers cover the aggregation-side and
repeated-access cases that AQE cannot rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distinct_count_skew_safe(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """Exact per-key distinct count via value-hash salting.

    Because the salt is a pure function of the counted value, the per-salt
    value sets are disjoint and their distinct counts are additive — the
    result is exact, and the hottest key's work spreads across num_salts
    reducers. Returns key_cols + (n_distinct: long)."""
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(num_salts)).alias("__salt__")
    partial = (
        df.select(*key_cols, F.col(distinct_col), salt)
        .groupBy(*key_cols, "__salt__")
        .agg(F.count_distinct(distinct_col).alias("__pd__"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__pd__").cast("long").alias("n_distinct"))


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP the table AND its managed location — a previous session may
    have left the directory behind without a catalog entry (fresh
    metastore, persistent warehouse dir), which makes saveAsTable fail
    with LOCATION_ALREADY_EXISTS."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations keyed on bucket_cols read it without a shuffle."""
    spark = df.sparkSession
    _drop_table_and_location(spark, table)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact⋈dim join with explicit key salting, for when the dim side
    is too large to broadcast and one fact key is hot enough to overwhelm a
    single shuffle partition even after AQE splitting.

    The dim side is replicated num_salts× (explode over the salt range —
    cheap: |dim|·S rows, dim ≪ fact); each fact row picks ONE deterministic
    salt from a hash of its whole row, spreading a hot key's rows over
    num_salts shuffle partitions. Exactly the plain join's result set —
    pinned against df.join in tests."""
    salt_col = "__salt__"
    fact_salted = fact.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    )
    dim_salted = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return fact_salted.join(dim_salted, on=[on, salt_col], how=how).drop(salt_col)
