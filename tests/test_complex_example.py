"""The reference's complex_example fixture (FIXTURES.md §3, reference
test_sparse_frame.py:265-342): shuffled identity + two block frames,
axis=1 left joins checked against dense pandas join+fillna(0), chained
outer adds with full/partial/no key overlap."""

import numpy as np
import pandas as pd
import pytest

from sparsity_spark import from_pandas


@pytest.fixture()
def complex_frames():
    rng = np.random.RandomState(42)
    first = pd.DataFrame(
        np.identity(10)[rng.permutation(10)], index=rng.permutation(np.arange(10))
    )
    second_mat = np.zeros((4, 10))
    second_mat[np.arange(4)[:, None], np.arange(2, 6)] = 10.0
    second = pd.DataFrame(second_mat, index=rng.permutation(np.arange(2, 6)))
    third_mat = np.zeros((4, 10))
    third_mat[np.arange(4)[:, None], np.arange(6, 10)] = 20.0
    third = pd.DataFrame(third_mat, index=rng.permutation(np.arange(6, 10)))
    return first, second, third


def test_complex_left_joins_vs_dense_pandas(spark, complex_frames):
    first, second, third = complex_frames
    # columns must be disjoint for axis=1 join: suffix them
    s = second.add_suffix("_s")
    t = third.add_suffix("_t")
    got = (
        from_pandas(spark, first)
        .join(from_pandas(spark, s), axis=1, how="left")
        .join(from_pandas(spark, t), axis=1, how="left")
        .todense()
        .sort_index()
    )
    want = first.join(s, how="left").join(t, how="left").fillna(0).sort_index()
    want.index.name = got.index.name
    want.columns = [str(c) for c in want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("shift", [0, 2, 4])
def test_chained_outer_add_overlap_variants(spark, complex_frames, shift):
    """Reference test_sparse_frame.py:304-342: chained outer add where the
    third frame's keys fully / partially / not-at-all overlap the second's."""
    first, second, third = complex_frames
    third = third.copy()
    third.index = third.index + shift  # 6..9 → 6..9 / 8..11 / 10..13
    got = (
        from_pandas(spark, first)
        .add(from_pandas(spark, second), how="outer")
        .add(from_pandas(spark, third), how="outer")
        .todense()
        .sort_index()
    )
    want = (
        first.add(second, fill_value=0).add(third, fill_value=0).fillna(0).sort_index()
    )
    want.index.name = got.index.name
    want.columns = [str(c) for c in want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_boolean_mask_loc(spark):
    sf = from_pandas(spark, pd.DataFrame(np.identity(5), index=list("abcde")))
    out = sf.loc_mask([True, False, True, False, True]).todense().sort_index()
    assert list(out.index) == ["a", "c", "e"]
    np.testing.assert_array_equal(out.to_numpy(), np.identity(5)[[0, 2, 4]])
