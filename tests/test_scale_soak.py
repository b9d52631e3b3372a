"""Scale-soak (VERDICT r3 #4): deterministic linearity checks for the
quadratic-risk pair-generating operators, using tools/make_scale_data's
key-shifted, vocabulary-disjoint replicas.

Two invariants per operator, both on pair COUNTS (not wall-clock — the
container's noisy-neighbor variance swamps runtime ratios):

1. **Zero cross-replica pairs.** Replicas share no vocabulary, so any
   cross-replica candidate that survives verification means a blocking /
   bucketing key degenerated (the quadratic failure mode — exactly what
   the 8-bit-chunk and word-unit-PPJoin bugs in SCALE.md looked like).
2. **Bounded total growth.** 3x data → ≤ ~6x pairs. The slack above 3x is
   deliberate: renaming every token re-randomizes the hash draws, so
   borderline pairs flip in/out per replica (measured ±60% swing in
   per-replica simhash pair counts); a quadratic blow-up at 3 replicas
   would show ≥ 9x together with cross-replica leakage.

Run with ``pytest -m slow``; excluded from the default suite (pytest.ini
addopts).
"""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

SRC = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def scale_dirs(tmp_path_factory):
    from make_scale_data import replicate_sf

    base = tmp_path_factory.mktemp("soak")
    d1 = replicate_sf(SRC, str(base / "x1"), 1)
    d3 = replicate_sf(SRC, str(base / "x3"), 3)
    return d1, d3


def _docs(spark, d):
    from sparsity_spark.data import load_table

    return load_table(spark, d, "documents")


def _check(pairs1, pairs3, growth_cap=6.0):
    from make_scale_data import OFFSET

    n1, n3 = len(pairs1), len(pairs3)
    cross = pairs3[(pairs3["id_a"] // OFFSET) != (pairs3["id_b"] // OFFSET)]
    assert len(cross) == 0, f"{len(cross)} cross-replica pairs leaked through blocking"
    assert n3 <= growth_cap * n1 + 100, (n1, n3)


@pytest.mark.slow
def test_lsh_candidate_pairs_linear(spark, scale_dirs):
    from sparsity_spark.operators.dedup import lsh_candidate_pairs

    d1, d3 = scale_dirs
    p1 = lsh_candidate_pairs(_docs(spark, d1), num_hashes=16, bands=8).toPandas()
    p3 = lsh_candidate_pairs(_docs(spark, d3), num_hashes=16, bands=8).toPandas()
    _check(p1, p3)


@pytest.mark.slow
def test_simhash_pairs_linear(spark, scale_dirs):
    from sparsity_spark.operators.dedup import simhash_pairs

    d1, d3 = scale_dirs
    p1 = simhash_pairs(_docs(spark, d1)).toPandas()
    p3 = simhash_pairs(_docs(spark, d3)).toPandas()
    _check(p1, p3)


@pytest.mark.slow
def test_ppjoin_linear(spark, scale_dirs):
    from sparsity_spark.operators.dedup import jaccard_prefix_join

    d1, d3 = scale_dirs
    p1 = jaccard_prefix_join(_docs(spark, d1), threshold=0.6).toPandas()
    p3 = jaccard_prefix_join(_docs(spark, d3), threshold=0.6).toPandas()
    _check(p1, p3)
