"""Pure-Python TrailDB binary reader (SURVEY §2 S3, closed fully in r4).

Golden source: the reference's own fixtures (tiny.tdb: test_coo.py:11-22's
9-event/3-column pattern; pydata.tdb: the 109,626-event ingest-benchmark
db) — read-only, gated behind existence so the repo stays standalone; the
writer round-trip covers the format without them.
"""

import os

import pytest

from sparsity_spark.traildb import (
    decode_trails,
    open_tdb,
    read_traildb,
    read_uuids,
    traildb_event_table,
    write_tdb,
)

TINY = "/root/reference/sparsity/test/tiny.tdb"
PYDATA = "/root/reference/sparsity/test/pydata.tdb"


@pytest.mark.skipif(not os.path.exists(TINY), reason="reference fixture absent")
def test_tiny_golden_coo_pattern():
    """Reference test_coo.py golden: 9 events, username column ids come in
    trail-major first-seen blocks [0,0,0,1,1,1,2,2,2]."""
    meta = open_tdb(TINY)
    assert meta.num_trails == 3 and meta.num_events == 9
    assert meta.fields == ["username", "action"]
    evs = list(decode_trails(meta))
    assert len(evs) == 9
    cols: dict = {}
    c_idx = [cols.setdefault(e[2]["username"], len(cols)) for e in evs]
    assert c_idx == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert [e[2]["action"] for e in evs] == ["open", "save", "close"] * 3
    ts = [e[1] for e in evs]
    assert min(ts) == meta.min_timestamp and max(ts) == meta.max_timestamp


@pytest.mark.skipif(not os.path.exists(PYDATA), reason="reference fixture absent")
def test_pydata_full_decode_counts():
    """The 109,626-event benchmark db decodes completely: exact event count
    and exact [min,max] timestamp range from the info header, exercising
    huffman bigrams, literals, and 37k-entry lexicons."""
    meta = open_tdb(PYDATA)
    n, tmin, tmax = 0, 1 << 62, 0
    for _, ts, _vals in decode_trails(meta):
        n += 1
        tmin, tmax = min(tmin, ts), max(tmax, ts)
    assert n == meta.num_events == 109626
    assert tmin == meta.min_timestamp and tmax == meta.max_timestamp


def test_write_read_roundtrip(tmp_path):
    """Literal-only writer → reader round trip, including edge encoding
    (unchanged fields re-surface on later events) and NULL (missing field
    before first set → empty string)."""
    path = str(tmp_path / "rt.tdb")
    trails = [
        (
            "0" * 31 + "1",
            [
                (1000, {"color": "red", "shape": "circle"}),
                (1060, {"shape": "square"}),  # color carries over
                (1060, {"color": "blue"}),  # same-ts event, shape carries
            ],
        ),
        (
            "0" * 31 + "2",
            [(1500, {"shape": "circle"})],  # color never set -> NULL
        ),
    ]
    write_tdb(path, trails)
    meta = open_tdb(path)
    assert meta.num_trails == 2 and meta.num_events == 4
    evs = list(decode_trails(meta))
    assert evs == [
        (0, 1000, {"color": "red", "shape": "circle"}),
        (0, 1060, {"color": "red", "shape": "square"}),
        (0, 1060, {"color": "blue", "shape": "square"}),
        (1, 1500, {"color": "", "shape": "circle"}),
    ]
    assert read_uuids(meta) == ["0" * 31 + "1", "0" * 31 + "2"]


@pytest.mark.skipif(not os.path.exists(TINY), reason="reference fixture absent")
def test_event_table_and_sparse_frame(spark):
    """Distributed decode → event table → SparseFrame one-hot parity:
    column order is first-seen in trail-scan order (the C scanner's
    ordering), todense row sums are all 1."""
    ev = traildb_event_table(spark, TINY, num_partitions=2)
    rows = ev.orderBy("row").collect()
    assert len(rows) == 9
    assert [r["action"] for r in rows] == ["open", "save", "close"] * 3

    sf = read_traildb(spark, TINY, "username")
    # first-seen = trail order (NOT time order): trail0's user is col 0
    first_user = rows[0]["username"]
    assert sf.columns[0] == first_user
    dense = sf.todense()
    assert dense.shape == (9, 3)
    assert dense.sum().sum() == 9.0
    assert (dense.sum(axis=1) == 1.0).all()


def test_event_table_distributed_partitions(spark, tmp_path):
    """Writer fixture through the Spark path with several partitions: every
    event lands exactly once regardless of the trail->partition split."""
    path = str(tmp_path / "many.tdb")
    trails = [
        (f"{i:032x}", [(1000 + 60 * j, {"kind": f"k{j % 3}"}) for j in range(5)])
        for i in range(17)
    ]
    write_tdb(path, trails)
    ev = traildb_event_table(spark, path, num_partitions=4)
    assert ev.count() == 17 * 5
    got = ev.groupBy("kind").count().orderBy("kind").collect()
    assert [(r["kind"], r["count"]) for r in got] == [
        ("k0", 34),
        ("k1", 34),
        ("k2", 17),
    ]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def tdb_trails(draw):
    """Random trail sets: 1-5 trails, 1-8 events each, 1-3 fields with
    values drawn from a small vocab plus sparse field presence (exercises
    edge encoding, NULL carry-in, equal timestamps, large deltas)."""
    fields = draw(st.lists(st.sampled_from(["f1", "f2", "f3"]), min_size=1, max_size=3, unique=True))
    n_trails = draw(st.integers(1, 5))
    base = draw(st.integers(0, 2**31))
    trails = []
    for t in range(n_trails):
        n_ev = draw(st.integers(1, 8))
        tss = sorted(
            draw(st.lists(st.integers(0, 10**6), min_size=n_ev, max_size=n_ev))
        )
        evs = []
        for ts_off in tss:
            vals = {}
            for f in fields:
                if draw(st.booleans()):
                    vals[f] = draw(st.sampled_from(["a", "bb", "ccc", "dddd"]))
            evs.append((base + ts_off, vals))
        trails.append((f"{t:032x}", evs))
    return trails


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(trails=tdb_trails())
def test_tdb_roundtrip_property(tmp_path_factory, trails):
    """write_tdb -> decode_trails reproduces every event with the edge-
    encoding carry semantics: each event shows each field's most recent
    value in the trail ('' before first set)."""
    path = str(tmp_path_factory.mktemp("tdbprop") / "p.tdb")
    write_tdb(path, trails)
    meta = open_tdb(path)
    got = list(decode_trails(meta))
    # build expected with pure-python carry
    fields = meta.fields
    expect = []
    for tid, (_, evs) in enumerate(trails):
        cur = {f: "" for f in fields}
        for ts, vals in evs:
            for f, v in vals.items():
                cur[f] = v
            expect.append((tid, ts, dict(cur)))
    assert got == expect
    assert meta.num_events == len(expect)


def test_wide_delta_literals_roundtrip(tmp_path):
    """Code-review r4: literals can need 1 + fid_bits + 56+ bits; an 8-byte
    read window silently truncated wide timestamp deltas. Pin a 2**55-second
    delta through the writer/decoder pair."""
    path = str(tmp_path / "wide.tdb")
    big = 2**55
    trails = [("ab" * 16, [(0, {"f": "a"}), (big, {"f": "b"})])]
    write_tdb(path, trails)
    meta = open_tdb(path)
    evs = list(decode_trails(meta))
    assert [e[1] for e in evs] == [0, big]
    assert [e[2]["f"] for e in evs] == ["a", "b"]


def test_sharded_writer_parity_with_single_file(spark, tmp_path):
    """VERDICT r5 #7: the distributed sharded writer + manifest reader must
    decode to the SAME events as the single-file write_tdb round trip —
    same (uuid, ts, field) multiset, same within-trail event order — with
    no corpus-sized driver materialization in the write path."""
    import pandas as pd

    from sparsity_spark.traildb import (
        traildb_event_table,
        write_tdb,
        write_tdb_sharded,
    )

    rows = []
    for uid in range(7):
        for j in range(uid + 1):
            rows.append((uid, 1000 + 10 * j + uid, f"t{j % 3}", j))
    events = spark.createDataFrame(
        rows, "uuid long, ts long, event_type string, event_id long"
    )

    # single-file reference
    single = str(tmp_path / "single.tdb")
    trails = {}
    for u, ts, et, eid in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        trails.setdefault(u, []).append((ts, {"event_type": et}))
    write_tdb(single, [(f"{u:032x}", evs) for u, evs in sorted(trails.items())])
    ref = traildb_event_table(spark, single).toPandas()

    # sharded distributed write (4 shards), read back through the manifest
    shard_dir = str(tmp_path / "sharded")
    write_tdb_sharded(
        events, shard_dir, field_cols=["event_type"], order_col="event_id",
        num_shards=4,
    )
    got = traildb_event_table(spark, shard_dir).toPandas()

    key = ["uuid", "ts", "event_type"]
    assert (
        got[key].sort_values(key).reset_index(drop=True).equals(
            ref[key].sort_values(key).reset_index(drop=True)
        )
    )
    # within-trail scan order preserved: pos sequence per uuid identical
    for df in (ref, got):
        df["pos"] = df["row"] % 4294967296
    for u in set(got.uuid):
        g = got[got.uuid == u].sort_values("pos")
        r = ref[ref.uuid == u].sort_values("pos")
        assert list(g.ts) == list(r.ts) and list(g.event_type) == list(r.event_type)
    # global trail numbering gap-free in shard order
    tids = sorted(set(got.trail_id))
    assert tids == list(range(len(tids)))


def test_sharded_writer_manifest_is_metadata_sized(spark, tmp_path):
    """The manifest lists one row per non-empty shard with exact counts."""
    import json

    from sparsity_spark.traildb import write_tdb_sharded

    events = spark.createDataFrame(
        [(u, 100 + u, "a", u) for u in range(5)],
        "uuid long, ts long, event_type string, event_id long",
    )
    d = str(tmp_path / "s2")
    write_tdb_sharded(events, d, field_cols=["event_type"], order_col="event_id", num_shards=3)
    m = json.load(open(d + "/manifest.json"))
    assert sum(e["n_events"] for e in m["shards"]) == 5
    assert sum(e["n_trails"] for e in m["shards"]) == 5
    assert all(e["file"].startswith("shard-") for e in m["shards"])
