"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline at sf0.001; ``queries()`` maps
one entry per implemented operator from SURVEY.md §2 (plus north-star
extensions) to a (spark, sf_dir) callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL for the driver's side-by-side correctness check.
Implementations live in sparsity_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events → one-hot
    event_type → groupby_sum(user_id) — the reference's signature pipeline
    (reference sparse_frame.py:196-231, 567-601) as one lazy Spark plan."""
    from sparsity_spark.queries import QUERIES

    return QUERIES["a1_onehot_groupby_sum"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparsity_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparsity_spark.queries import ORACLES

    return dict(ORACLES)
