"""Structured Streaming: batch/stream parity for the flagship pipeline and
the custom stateful operator, driven with the availableNow trigger."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparsity_spark.data import load_table
from sparsity_spark.streaming import (
    stream_events,
    streaming_one_hot_counts,
    streaming_session_stats,
)


@pytest.fixture(scope="module")
def events_dir(spark):
    """Events written as proper micro-timestamp parquet (the raw testdata is
    TIMESTAMP(NANOS) which the streaming file source can't read either)."""
    d = tempfile.mkdtemp(prefix="stream_src_")
    load_table(spark, "/root/testdata/sf0.001", "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(d + "/events")
    yield d + "/events"
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name == "sessions" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    agg = streaming_one_hot_counts(stream, window_duration="1 day", watermark="2 days")
    # append mode only emits closed windows; availableNow + watermark keeps
    # the final (max-ts) window open, so compare on complete mode instead
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM wincounts").toPandas()

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 day"), F.col("event_type").alias("col"))
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "col",
            "value",
        )
        .toPandas()
    )
    key = ["window_start", "window_end", "col"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(batch)
    assert (got["value"].to_numpy() == batch["value"].to_numpy()).all()


def test_stateful_session_stats_match_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    q = _run_available_now(streaming_session_stats(stream), "sessions")
    got = spark.sql(
        "SELECT user_id, max_by(n_events, n_events) AS n_events,"
        " max_by(total_value, n_events) AS total_value FROM sessions GROUP BY user_id"
    ).toPandas().set_index("user_id").sort_index()

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == batch["n_events"]).all()
    # stateful path accumulates in micro-batch order; compare to 1e-6
    assert (got["total_value"] - batch["total_value"]).abs().max() < 1e-4
