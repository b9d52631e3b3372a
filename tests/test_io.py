"""npz compat round-trip (reference io.py:26-47 layout) and parquet frame I/O."""

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
