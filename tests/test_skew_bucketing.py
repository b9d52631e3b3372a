"""Skew-safe distinct counting (exactness under salting) and bucketed-table
co-located joins (no shuffle before the join — plan-asserted)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sparsity_spark.operators.skew import (
    bucketed_table,
    distinct_count_skew_safe,
    write_bucketed,
)


def test_salted_distinct_count_exact(spark):
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame(
        {
            # key 0 is hot: 80% of rows
            "key": np.where(rng.rand(5000) < 0.8, 0, rng.randint(1, 20, 5000)),
            "val": rng.randint(0, 500, 5000),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        distinct_count_skew_safe(df, ["key"], "val", num_salts=16)
        .toPandas()
        .set_index("key")["n_distinct"]
        .sort_index()
    )
    want = pdf.groupby("key")["val"].nunique().sort_index()
    assert (got == want).all()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from sparsity_spark.data import load_table
    from tests.test_plans import formatted_plan

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    spend = ev.groupBy("user_id").agg(F.sum("value").alias("spend"))
    write_bucketed(counts, "t_counts", ["user_id"], num_buckets=8)
    write_bucketed(spend, "t_spend", ["user_id"], num_buckets=8)

    joined = bucketed_table(spark, "t_counts").join(
        bucketed_table(spark, "t_spend").hint("merge"), on="user_id"
    )
    plan = formatted_plan(joined)
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert joined.count() == counts.count()


def test_streaming_dedup_exact(spark, tmp_path):
    import datetime as dt

    from sparsity_spark.streaming.ingest import streaming_dedup_exact

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "aaa"),
        (2, t0 + dt.timedelta(minutes=1), "bbb"),
        (3, t0 + dt.timedelta(minutes=2), "aaa"),  # dup of 1
        (4, t0 + dt.timedelta(minutes=3), "ccc"),
        (5, t0 + dt.timedelta(minutes=4), "bbb"),  # dup of 2
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text, count(*) AS n FROM dedup_stream GROUP BY text").toPandas()
    assert len(got) == 3
    assert (got["n"] == 1).all()
