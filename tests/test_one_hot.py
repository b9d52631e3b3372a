"""Phase 0 golden: the reference's signature pipeline.

clickstream → one_hot(weekday, categories) → groupby_sum(id) must equal
identity(7)*7 (reference test_sparse_frame.py:345-350); never-seen
categories stay as ordered all-zero columns (test_sparse_frame.py:353-363);
unknown values raise (test_sparse_frame.py:366-370).
"""

import numpy as np
import pandas as pd
import pytest

from sparsity_spark import sparse_one_hot
from tests.conftest import WEEKDAYS, sampledata


def test_one_hot_groupby_golden(spark):
    pdf = sampledata(49)
    df = spark.createDataFrame(pdf)
    sf = sparse_one_hot(df, "weekday", WEEKDAYS, index_col="id")
    res = sf.groupby_sum(by="id")
    dense = res.todense()
    assert list(dense.columns) == WEEKDAYS
    # id=0 ↔ Sunday, id=1 ↔ Monday, ... tile(0..6) over daily dates from a Sunday
    np.testing.assert_array_equal(dense.to_numpy(), np.identity(7) * 7)
    assert list(dense.index) == list(range(7))


def test_one_hot_extra_categories_all_zero(spark):
    # two never-occurring categories keep their positions (reference
    # test_sparse_frame.py:353-363)
    cats = WEEKDAYS[:6] + ["Never1"] + WEEKDAYS[6:] + ["Never2"]
    pdf = sampledata(49)
    sf = sparse_one_hot(spark.createDataFrame(pdf), "weekday", cats, index_col="id")
    dense = sf.groupby_sum(by="id").todense()
    assert list(dense.columns) == cats
    assert dense["Never1"].sum() == 0
    assert dense["Never2"].sum() == 0
    assert dense.to_numpy().sum() == 49


def test_one_hot_unknown_category_raises(spark):
    pdf = sampledata(49)
    with pytest.raises(ValueError):
        sparse_one_hot(spark.createDataFrame(pdf), "weekday", WEEKDAYS[:6], index_col="id")


def test_one_hot_composite_key(spark, clickstream):
    # MultiIndex analog: index_col=['ts','id'] (reference
    # test_sparse_frame.py:423-435, dask test_dask_sparse_frame.py:78-86)
    df = spark.createDataFrame(clickstream)
    sf = sparse_one_hot(df, "page_id", list("ABCDE"), index_col=["ts", "id"])
    assert sf.key_cols == ["ts", "id"]
    assert sf.shape == (100, 5)
    dense = sf.todense()
    assert dense.to_numpy().sum() == 100
    # groupby level 0 (ts) keeps daily granularity: every day has exactly 1 event
    g = sf.groupby_sum(level=0)
    gd = g.todense()
    assert gd.to_numpy().sum() == 100
    assert (gd.sum(axis=1) == 1).all()


def test_feature_hash_buckets_and_sums(spark):
    from sparsity_spark.reshape import feature_hash

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (1, "b", "x"), (2, "b", "y")],
        "k long, c string, d string",
    )
    sf = feature_hash(df, ["c"], "k", num_features=4)
    assert sf.columns == ["f0", "f1", "f2", "f3"]  # width fixed, not data-driven
    dense = sf.todense()
    assert dense.loc[1].sum() == 3.0  # mass = row count, collisions only merge
    assert dense.loc[2].sum() == 1.0
    # same token → same bucket in a separate invocation (md5, not RNG)
    again = feature_hash(df, ["c"], "k", num_features=4).todense()
    assert (again == dense).all().all()
    # multi-column hashing adds one unit of mass per column
    two = feature_hash(df, ["c", "d"], "k", num_features=8).todense()
    assert two.loc[1].sum() == 6.0 and two.loc[2].sum() == 2.0
