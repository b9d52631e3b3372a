"""npz compat round-trip (reference io.py:26-47 layout) and parquet frame I/O."""

import os

import numpy as np
import pandas as pd

from sparsity_spark import from_pandas
from sparsity_spark.io import read_npz, to_npz


def test_npz_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(5)
    mat = rng.rand(20, 6)
    mat[mat < 0.6] = 0
    pdf = pd.DataFrame(mat, index=np.arange(100, 120), columns=[f"c{i}" for i in range(6)])
    sf = from_pandas(spark, pdf)
    path = str(tmp_path / "frame.npz")
    to_npz(sf, path)

    back = read_npz(spark, path)
    assert back.columns == [f"c{i}" for i in range(6)]
    dense = back.todense()
    np.testing.assert_allclose(dense.to_numpy(), mat)
    assert list(dense.index) == list(range(100, 120))


def test_npz_reference_layout_readable(spark, tmp_path):
    # write the CSR layout by hand exactly as the reference does (diag 1,2,3),
    # read with ours
    path = str(tmp_path / "ref.npz")
    np.savez(
        path,
        data=np.array([1.0, 2.0, 3.0]),
        indices=np.array([0, 1, 2], dtype="int32"),
        indptr=np.array([0, 1, 2, 3], dtype="int32"),
        shape=np.array([3, 3]),
        frame_index=np.array([7, 8, 9]),
        frame_columns=np.array(["x", "y", "z"]),
    )
    sf = read_npz(spark, path)
    dense = sf.todense()
    np.testing.assert_allclose(dense.to_numpy(), np.diag([1.0, 2.0, 3.0]))
    assert list(dense.index) == [7, 8, 9]


def test_csv_json_sources_roundtrip_events(spark, tmp_path):
    """CSV and JSON schema-applied reads must reproduce the parquet events
    exactly (timestamps pinned to one format, quoting handled by Spark)."""
    from sparsity_spark.data import (
        load_events_csv,
        load_events_json,
        load_table,
        write_events_text,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    want = ev.orderBy("event_id").toPandas()
    for fmt, loader in [("csv", load_events_csv), ("json", load_events_json)]:
        p = str(tmp_path / fmt)
        write_events_text(ev, p, fmt=fmt)
        got = loader(spark, p).orderBy("event_id").toPandas()
        assert got.shape == want.shape
        for c in want.columns:
            if want[c].dtype == object:
                assert (got[c].fillna("") == want[c].fillna("")).all(), (fmt, c)
            else:
                assert (got[c] == want[c]).all(), (fmt, c)


def test_compact_parquet_reduces_files_and_sorts(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from sparsity_spark.io import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(0, 10000).withColumnRenamed("id", "k").repartition(32).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 32
    compact_parquet(spark, src, dst, target_files=4, sort_cols=["k"])
    files = glob.glob(dst + "/part-*")
    assert len(files) == 4
    df = spark.read.parquet(dst)
    assert df.count() == 10000
    # range partitioning + in-file sort → a key-range filter prunes to ~1 file
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.filter(F.col("k") < 100).explain("formatted")
    assert "PushedFilters: [IsNotNull(k), LessThan(k,100)]" in buf.getvalue()


def test_zorder_write_tightens_all_dims(spark, tmp_path):
    """Z-order layout must (a) preserve rows and (b) give tighter per-file
    bounding boxes across BOTH dimensions than a 1-D sort — the property
    that makes footer-stat file pruning work for either predicate."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sparsity_spark.data import load_table
    from sparsity_spark.io import zorder_write

    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsus")
    )
    n = e.count()
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(e, ["user_id", "tsus"], zdir, n_files=16)
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def dim_spans(d):
        """Per-dimension average normalized per-file span."""
        boxes = []
        for f in glob.glob(d + "/*.parquet"):
            t = pq.read_table(f, columns=["user_id", "tsus"]).to_pandas()
            boxes.append({c: (t[c].min(), t[c].max()) for c in t})
        spans = {}
        for c in ("user_id", "tsus"):
            gmn = min(b[c][0] for b in boxes)
            gmx = max(b[c][1] for b in boxes)
            spans[c] = sum((b[c][1] - b[c][0]) / max(gmx - gmn, 1) for b in boxes) / len(boxes)
        return spans

    assert spark.read.parquet(zdir).count() == n
    z, lin = dim_spans(zdir), dim_spans(ldir)
    # 1-D sort: perfect on the sort key, NO pruning on the other dim
    # (its per-file ts span is ~the full range). Z-order bounds the span
    # on EVERY dim, so its worst dim must beat the linear worst dim by 2x.
    assert max(z.values()) < max(lin.values()) / 2, (z, lin)
    # and each z dim individually prunes (span well under the full range)
    assert all(v < 0.7 for v in z.values()), z


def test_load_table_normalizes_every_timestamp_encoding(spark, tmp_path):
    """Schema-drift guard (VERDICT r2 #5): the driver regenerates testdata and
    has already shipped TIMESTAMP(NANOS)-as-long and TIMESTAMP_NTZ encodings.
    Write an `events` table in each of the three encodings and assert
    load_table always yields TimestampType with identical values — so the
    next regeneration fails loudly here, not silently in the bench."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from sparsity_spark.data import load_table

    base = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype="int64"),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00.000001", "2024-01-02 12:34:56.789012",
                 "2024-03-05 23:59:59.999999", "2024-06-30 06:00:00.000000"]
            ),
            "user_id": np.array([1, 2, 3, 4], dtype="int64"),
            "event_type": ["a", "b", "a", "c"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}", "{}", "{}", "{}"],
        }
    )
    expect = sorted(base["ts"].astype("datetime64[us]").tolist())

    encodings = {
        "ntz_us": pa.timestamp("us"),          # TIMESTAMP_NTZ in Spark 4
        "nanos": pa.timestamp("ns"),           # legacy nanosAsLong path
        "utc_us": pa.timestamp("us", tz="UTC"),  # plain TimestampType
    }
    for name, typ in encodings.items():
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pandas(base, preserve_index=False)
        tbl = tbl.set_column(
            tbl.schema.get_field_index("ts"), "ts", tbl["ts"].cast(typ)
        )
        pq.write_table(tbl, f"{d}/events.parquet", use_deprecated_int96_timestamps=False)
        df = load_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), name
        got = sorted(r["ts"].replace(tzinfo=None) if r["ts"].tzinfo else r["ts"]
                     for r in df.select("ts").collect())
        assert got == expect, name


def test_read_npz_glob_vstack_and_sorted_contract(spark, tmp_path):
    """Multi-file npz read (reference dask/io.py:51-86): sorted path order,
    vstack of shards, divisions overlap check under sorted=True."""
    import numpy as np
    import pytest

    from sparsity_spark import from_pandas
    from sparsity_spark.io import read_npz_glob, to_npz

    a = pd.DataFrame(np.eye(3), index=[0, 1, 2], columns=["x", "y", "z"])
    b = pd.DataFrame(np.eye(3) * 2, index=[10, 11, 12], columns=["x", "y", "z"])
    to_npz(from_pandas(spark, a), str(tmp_path / "part0.npz"))
    to_npz(from_pandas(spark, b), str(tmp_path / "part1.npz"))

    sf = read_npz_glob(spark, str(tmp_path / "part*.npz"), sorted=True)
    dense = sf.todense()
    assert len(dense) == 6
    assert dense.loc[1, "y"] == 1.0 and dense.loc[11, "y"] == 2.0

    # overlapping shard ranges must raise under sorted=True
    c = pd.DataFrame(np.eye(3), index=[5, 6, 7], columns=["x", "y", "z"])
    to_npz(from_pandas(spark, c), str(tmp_path / "part2.npz"))
    with pytest.raises(ValueError, match="overlaps"):
        read_npz_glob(spark, str(tmp_path / "part*.npz"), sorted=True)
    # but reads fine unsorted
    assert len(read_npz_glob(spark, str(tmp_path / "part*.npz")).todense()) == 9


def test_sizeof_and_cells_bytes(spark):
    """__sizeof__ parity (reference sparse_frame.py:339-344): driver-side
    metadata footprint; cells_bytes estimates the distributed payload."""
    import numpy as np

    from sparsity_spark import from_pandas

    sf = from_pandas(spark, pd.DataFrame(np.eye(4), columns=list("abcd")))
    assert sf.__sizeof__() > 0
    est = sf.cells_bytes()
    assert est >= 4 * (8 + 8 + 1 + 8)  # 4 nnz, key+pos+col+val lower bound


def test_jsonl_roundtrip_escaping_nulls_and_pruning(spark, tmp_path):
    """r7 JSONL source/sink: content with embedded newlines, quotes,
    backslashes, unicode, and NULL fields must round-trip exactly; the
    columns parameter prunes; an explicit schema skips inference."""
    from sparsity_spark.io import read_jsonl, write_jsonl

    rows = [
        (1, 'line1\nline2\t"quoted" \\ back', "en", 10),
        (2, "naïve déjà-vu — ünïcode", None, 20),
        (3, None, "fr", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n long")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema="doc_id long, text string, lang string, n long")
    got = {r["doc_id"]: (r["text"], r["lang"], r["n"]) for r in back.collect()}
    assert got == {i: (t, l, n) for i, t, l, n in rows}
    pruned = read_jsonl(
        spark, path, schema="doc_id long, text string, lang string, n long",
        columns=["doc_id", "lang"],
    )
    assert pruned.columns == ["doc_id", "lang"]


def test_csv_orc_roundtrips(spark, tmp_path):
    """r7 generic CSV/ORC source-sink: quoted commas and unicode survive
    the CSV round trip under an explicit schema; ORC round-trips the full
    frame byte-exactly; column pruning applies at both readers."""
    import pandas as pd

    from sparsity_spark.io import read_csv, read_orc, write_csv, write_orc

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "s": ['comma, inside', 'quote " inside', "unicode ✓ works"],
            "x": [1.5, -2.25, 0.0],
        }
    )
    df = spark.createDataFrame(pdf)

    cpath = str(tmp_path / "csv")
    write_csv(df, cpath)
    back = read_csv(spark, cpath, schema="id long, s string, x double")
    got = back.toPandas().sort_values("id").reset_index(drop=True)
    assert got.equals(pdf)
    pruned = read_csv(spark, cpath, schema="id long, s string, x double", columns=["id"])
    assert pruned.columns == ["id"] and pruned.count() == 3

    opath = str(tmp_path / "orc")
    write_orc(df, opath)
    oback = read_orc(spark, opath).toPandas().sort_values("id").reset_index(drop=True)
    assert oback.equals(pdf)
    assert read_orc(spark, opath, columns=["s"]).columns == ["s"]
