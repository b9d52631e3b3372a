"""Cross-cutting robustness: composite-key algebra, partitioning
invariance of content-hash operators, and a non-empty guard over the whole
query registry (an empty Spark result would trivially 'match' an empty
oracle — this pins that every query actually produces rows)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparsity_spark import from_pandas


def test_composite_key_join_and_add(spark):
    idx = pd.MultiIndex.from_product([["u1", "u2"], [1, 2]], names=["uid", "slot"])
    a = pd.DataFrame(np.arange(8).reshape(4, 2) + 1.0, index=idx, columns=["x", "y"])
    b = pd.DataFrame(np.ones((4, 2)), index=idx, columns=["x", "y"])
    sfa, sfb = from_pandas(spark, a), from_pandas(spark, b)
    added = sfa.add(sfb, how="outer").todense().sort_index()
    np.testing.assert_array_equal(added.to_numpy(), a.to_numpy() + 1.0)

    c = pd.DataFrame(np.ones((4, 1)) * 5, index=idx, columns=["z"])
    joined = sfa.join(from_pandas(spark, c), axis=1, how="inner").todense().sort_index()
    assert list(joined.columns) == ["x", "y", "z"]
    assert (joined["z"] == 5.0).all()


def test_minhash_invariant_to_partitioning(spark):
    rows = [(i, " ".join(f"tok{(i * 7 + j) % 23}" for j in range(30))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from sparsity_spark.operators.dedup import minhash_signatures

    a = minhash_signatures(docs.repartition(2)).toPandas().sort_values(["doc_id", "seed"])
    b = minhash_signatures(docs.repartition(17)).toPandas().sort_values(["doc_id", "seed"])
    assert list(a.minhash) == list(b.minhash)


@pytest.mark.slow
def test_every_query_returns_rows(spark):
    """Every registry entry must produce >0 rows at sf0.001 — guards against
    a query regressing to empty output (which would still hash-match an
    equally empty oracle)."""
    from sparsity_spark.queries import QUERIES

    empty = []
    for name, fn in QUERIES.items():
        if fn(spark, "/root/testdata/sf0.001").limit(1).count() == 0:
            empty.append(name)
    assert not empty, f"queries with empty results: {empty}"
