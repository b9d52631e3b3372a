"""Regression tests for the code-review findings: positional ops on
filtered frames, vstack pos collision, keep-first contract, NULL one-hot,
all-zero rows in indexed arrays, duplicate-label row sums, numpy-bool
masks, non-numeric scan order at scale."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparsity_spark import from_pandas, sparse_one_hot


def test_iloc_on_filtered_frame_uses_current_positions(spark):
    sf = from_pandas(spark, pd.DataFrame(np.identity(5), index=list("ABCDE")))
    sub = sf.loc[["B", "C", "E"]]  # absolute POS {1, 2, 4}
    first = sub.iloc[0].todense()
    assert list(first.index) == ["B"]
    last_two = sub.iloc[1:3].todense().sort_index()
    assert list(last_two.index) == ["C", "E"]
    taken = sub.take([0, 2]).todense().sort_index()
    assert list(taken.index) == ["B", "E"]
    masked = sub.loc_mask([False, True, False]).todense()
    assert list(masked.index) == ["C"]


def test_vstack_after_slicing_no_pos_collision(spark):
    sf = from_pandas(spark, pd.DataFrame(np.diag([1.0, 2, 3, 4, 5]), index=list("ABCDE")))
    a = sf.iloc[2:5]  # C, D, E (absolute pos 2..4)
    b = sf.iloc[0:3]  # A, B, C
    stacked = a.vstack(b)
    dense = stacked.todense()
    assert stacked.shape == (6, 5)
    assert len(dense) == 6  # no merged physical rows
    assert dense.to_numpy().sum() == (3 + 4 + 5) + (1 + 2 + 3)
    # order preserved: a's rows first, then b's
    assert list(dense.index) == ["C", "D", "E", "A", "B", "C"]


def test_drop_duplicate_idx_unordered_raises(spark):
    from sparsity_spark.frame import SparseFrame

    cells = spark.createDataFrame(
        [(1, "x", 2.0), (1, "x", 3.0)], "k long, col string, value double"
    )
    sf = SparseFrame(cells, ["k"], ["x"])
    with pytest.raises(ValueError, match="known row order"):
        sf.drop_duplicate_idx()


def test_one_hot_null_value_raises(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, cat string"
    )
    with pytest.raises(ValueError):
        sparse_one_hot(df, "cat", ["a", "b"], index_col="id")


def test_indexed_arrays_keep_all_zero_rows(spark):
    pdf = pd.DataFrame([[1.0, 0.0], [0.0, 0.0]], index=[7, 8], columns=["x", "y"])
    out = from_pandas(spark, pdf).to_indexed_arrays().toPandas().set_index("idx")
    assert len(out) == 2
    assert list(out.loc[8, "indices"]) == [] and list(out.loc[8, "values"]) == []


def test_sum_axis1_duplicate_labels_stay_distinct(spark):
    pdf = pd.DataFrame([[1.0], [2.0]], index=[5, 5], columns=["x"])
    sums = from_pandas(spark, pdf).sum(axis=1)
    assert list(sums) == [1.0, 2.0]  # two physical rows, not one merged 3.0


def test_numpy_bool_list_mask(spark):
    sf = from_pandas(spark, pd.DataFrame(np.identity(3), index=list("abc")))
    mask = list(np.array([1, 0, 1]) > 0)  # np.bool_ elements
    out = sf.loc[mask].todense().sort_index()
    assert list(out.index) == ["a", "c"]


def test_scan_order_non_numeric_falls_back(spark, monkeypatch):
    import sparsity_spark.events as ev_mod

    df = spark.createDataFrame(
        [("b", 1), ("a", 2), ("c", 3)], "k string, v int"
    )
    monkeypatch.setattr(ev_mod, "SCAN_ORDER_SINGLE_PARTITION_MAX", 0)
    out = ev_mod.scan_order_ids(df, "k").toPandas().sort_values("__scan_idx__")
    assert list(out.k) == ["a", "b", "c"]  # no crash, correct order


def test_melt_numeric_escapes_identifiers(spark):
    from sparsity_spark.io import melt_numeric

    df = spark.createDataFrame([(1, 2.0)], ["id", "it's"])
    out = melt_numeric(df, ["id"], ["it's"]).data.collect()
    assert len(out) == 1 and out[0]["col"] == "it's"
