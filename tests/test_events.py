"""TrailDB-shaped ingest goldens (FIXTURES.md §5, reference test_coo.py:11-22):
9 events, 3 users × 3 actions — scan-order row ids 0..8, first-seen
dictionary column ids [0,0,0,1,1,1,2,2,2]."""

import datetime as dt

import pandas as pd

from sparsity_spark.events import events_coo, field_dictionary, read_events


def tiny_events(spark):
    rows = []
    t0 = dt.datetime(2016, 1, 1)
    users = ["u1", "u2", "u3"]
    names = ["alice", "bob", "carol"]
    k = 0
    for uname in names:  # events ordered so dictionary ids assign 0,1,2
        for _ in range(3):
            rows.append((k, t0 + dt.timedelta(seconds=k), users[k % 3], uname, "act%d" % (k % 3)))
            k += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, uuid string, username string, action string"
    )


def test_coo_golden(spark):
    ev = tiny_events(spark)
    out = (
        events_coo(ev, "username", uuid_col="uuid", ts_col="ts", order_col="event_id")
        .orderBy("row_idx")
        .toPandas()
    )
    assert list(out.row_idx) == list(range(9))
    assert list(out.col_idx) == [0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_dictionary_first_seen_order(spark):
    ev = tiny_events(spark)
    d = field_dictionary(ev, "username", "event_id").orderBy("col_id").toPandas()
    assert list(d["value"]) == ["alice", "bob", "carol"]
    d2 = field_dictionary(ev, "action", "event_id").orderBy("col_id").toPandas()
    assert list(d2["value"]) == ["act0", "act1", "act2"]


def test_read_events_second_field_shape(spark):
    # reference test_sparse_frame.py:373-383: read_traildb(f, 'action') → (9, 3)
    ev = tiny_events(spark)
    sf = read_events(ev, "action", uuid_col="uuid", ts_col="ts", order_col="event_id")
    assert sf.shape == (9, 3)
    dense = sf.todense()
    assert dense.to_numpy().sum() == 9


def test_self_add_doubles(spark):
    ev = tiny_events(spark)
    sf = read_events(ev, "username", uuid_col="uuid", ts_col="ts", order_col="event_id")
    doubled = sf.add(sf, how="outer").todense()
    single = sf.todense()
    pd.testing.assert_frame_equal(doubled, single * 2, check_dtype=False)


def test_scan_order_ids_bucketed_branch(spark, monkeypatch):
    """Force the at-scale (bucketed) branch and check it produces the same
    global numbering as the single-partition branch."""
    import sparsity_spark.events as ev_mod

    ev = tiny_events(spark)
    small = (
        ev_mod.scan_order_ids(ev, "event_id")
        .select("event_id", "__scan_idx__")
        .toPandas()
        .sort_values("event_id")
    )
    monkeypatch.setattr(ev_mod, "SCAN_ORDER_SINGLE_PARTITION_MAX", 0)
    big = (
        ev_mod.scan_order_ids(ev, "event_id")
        .select("event_id", "__scan_idx__")
        .toPandas()
        .sort_values("event_id")
    )
    assert list(small["__scan_idx__"]) == list(big["__scan_idx__"]) == list(range(9))
