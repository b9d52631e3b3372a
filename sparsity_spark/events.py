"""Event-log ingestion — the TrailDB scan path, Spark-first.

The reference ships a C fast path that walks every trail/event of a TrailDB
clickstream DB, dictionary-encodes one field into dense column ids in
*first-seen scan order*, and emits COO triplets keyed by (uuid, timestamp)
(reference traildb_coo.c:12-115, _traildb.pyx:17-44, io.py:10-24,
sparse_frame.py:410-421).  Its hand-rolled hashtable/linked-list machinery
(~3,300 vendored LoC) is exactly what a Spark hash exchange does natively.

Here the same semantics are one declarative pipeline over any event table:
dictionary ids via ``min(order_col)`` per value (reproducing first-seen
order), one-hot cells keyed by a composite (uuid, ts) key.  Everything is
built-in — no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparsity_spark.frame import COL, VAL, SparseFrame


def field_dictionary(
    events: DataFrame,
    field: str,
    order_col: str,
) -> DataFrame:
    """Dictionary-encode ``field`` values to dense ids in first-seen order
    (reference traildb_coo.c:59-76 assigns ids hashtable-miss-order, i.e.
    scan order).  Returns ``(value: string, col_id: int)``.

    The dictionary is tiny (lexicon-sized), so the ``row_number`` over a
    single global window runs on an already-aggregated frame — the heavy
    part, ``min(order_col) per value``, is a partial-aggregating hash agg
    over the full event stream.
    """
    firsts = (
        events.groupBy(F.col(field).cast("string").alias("value"))
        .agg(F.min(order_col).alias("__first__"))
    )
    w = Window.orderBy("__first__")
    return firsts.select(
        "value", (F.row_number().over(w) - F.lit(1)).cast("int").alias("col_id")
    )


def read_events(
    events: DataFrame,
    field: str,
    uuid_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> SparseFrame:
    """One-hot ``field`` of an event table keyed by (uuid, ts) —
    ``SparseFrame.read_traildb`` parity (reference sparse_frame.py:410-421).

    Column *order* follows first-seen dictionary order like the C scanner;
    the cells themselves need no dictionary join (labels are the values),
    so this is a zero-shuffle projection just like reshape.sparse_one_hot.
    """
    order_col = order_col or ts_col
    dictionary = field_dictionary(events, field, order_col)
    cats = [r["value"] for r in dictionary.orderBy("col_id").collect()]
    cells = events.select(
        F.col(uuid_col).alias(uuid_col),
        F.col(ts_col).alias(ts_col),
        F.col(field).cast("string").alias(COL),
        F.lit(1.0).alias(VAL),
    )
    index = events.select(uuid_col, ts_col)
    return SparseFrame(cells, [uuid_col, ts_col], cats, index)


def events_coo(
    events: DataFrame,
    field: str,
    uuid_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Raw COO triplet view: ``(row_idx, col_idx, uuid, ts)`` per event —
    parity with the C scanner's output buffers (reference traildb_cooc:77-91,
    io.py:10-24).  ``row_idx`` is the event's scan position, ``col_idx`` the
    first-seen dictionary id.

    The global ``row_number`` reproduces the single-threaded scan-order
    contract of the C path; for the 100 TB path prefer the natural key
    (uuid, ts) of :func:`read_events`, which needs no global ordering.
    """
    dictionary = field_dictionary(events, field, order_col)
    w = Window.orderBy(order_col)
    numbered = events.select(
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("row_idx"),
        F.col(field).cast("string").alias("value"),
        F.col(uuid_col).alias("uuid"),
        F.col(ts_col).alias("ts"),
    )
    return (
        numbered.join(F.broadcast(dictionary), on="value", how="inner")
        .select("row_idx", F.col("col_id").alias("col_idx"), "uuid", "ts")
    )
