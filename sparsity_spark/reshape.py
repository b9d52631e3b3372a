"""One-hot encoding — the reference's signature reshape op.

Reference: ``sparse_one_hot`` / ``_one_hot_series_csr``
(reference sparse_frame.py:567-601) and the dask per-partition variant
``one_hot_encode`` (reference dask/reshape.py:7-41).

Semantics pinned by the reference's tests:
* the given category order is preserved, including categories that never
  occur (all-zero columns) — reference test_sparse_frame.py:353-363;
* a value outside the category list raises — test_sparse_frame.py:366-370;
* ``index_col`` may be a single column or a list (composite/MultiIndex key).

Spark-first: in long format one-hot is a *projection*, not a pivot — each
input row becomes exactly one cell ``(keys..., value_of(column), 1.0)``.
No shuffle at all; the category check is one cheap aggregate over the
distinct values.  Spark is already partition-parallel, so the dask
``map_partitions`` wrapper collapses into the same expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparsity_spark.frame import COL, VAL, SparseFrame


def sparse_one_hot(
    df: DataFrame,
    column: str,
    categories: list[str],
    index_col: str | list[str] | None = None,
    validate: bool = True,
) -> SparseFrame:
    """One-hot encode ``column`` against an explicit ordered category list."""
    if index_col is None:
        raise ValueError("index_col is required (Spark rows have no implicit position)")
    keys = [index_col] if isinstance(index_col, str) else list(index_col)
    cats = [str(c) for c in categories]

    if validate:
        unknown = (
            df.select(F.col(column).cast("string").alias(COL))
            .distinct()
            # NULL must raise too: ~isin() alone evaluates to NULL for NULL
            # input and would slip through the filter
            .filter(~F.col(COL).isin(cats) | F.col(COL).isNull())
            .limit(1)
            .collect()
        )
        if unknown:
            raise ValueError(
                f"value {unknown[0][COL]!r} in column {column!r} not in categories"
            )

    cells = df.select(
        *keys,
        F.col(column).cast("string").alias(COL),
        F.lit(1.0).alias(VAL),
    )
    index = df.select(*keys)
    return SparseFrame(cells, keys, cats, index)


def one_hot_encode(
    df: DataFrame,
    column: str,
    categories: list[str],
    index_col: str | list[str],
) -> SparseFrame:
    """Distributed one-hot (reference dask/reshape.py:7-41).  Identical to
    :func:`sparse_one_hot` — Spark partitions transparently."""
    return sparse_one_hot(df, column, categories, index_col=index_col)


def feature_hash(
    df: DataFrame,
    columns: list[str],
    index_col: str | list[str],
    num_features: int = 64,
) -> SparseFrame:
    """Hashing-trick encoder: each "col=value" token is md5-bucketed into a
    fixed-width feature space (columns f0..f{D-1}); colliding tokens sum.
    Unlike one-hot, the schema never grows with cardinality — the standard
    trick for unbounded categorical vocabularies at training scale. One
    union of per-column zero-shuffle projections + ONE hash aggregate,
    work ∝ rows × |columns|; the md5 bucket is engine-reproducible."""
    from sparsity_spark.operators.pipeline import hash_bucket

    keys = [index_col] if isinstance(index_col, str) else list(index_col)
    parts = []
    for c in columns:
        tok = F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
        parts.append(
            df.select(
                *[F.col(k) for k in keys],
                F.concat(F.lit("f"), hash_bucket(tok, num_features)).alias(COL),
                F.lit(1.0).alias(VAL),
            )
        )
    cells = parts[0]
    for p in parts[1:]:
        cells = cells.unionByName(p)
    summed = cells.groupBy(*keys, COL).agg(F.sum(VAL).alias(VAL))
    index = df.select(*keys).distinct()
    return SparseFrame(
        summed, keys, [f"f{i}" for i in range(num_features)], index=index
    )
