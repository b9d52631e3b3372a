"""sparsity_spark — a PySpark-native sparse-labeled-matrix analytics engine.

A from-scratch re-expression of the query surface of kayibal/sparsity
(scipy-CSR SparseFrame + dask distributed layer) on Apache Spark.

Canonical physical representation is **long/COO**: one DataFrame row per
stored (non-zero) cell — ``(key_cols..., col: string, value: double)`` —
plus a small ordered column dictionary and an index DataFrame carrying the
frame's row labels (so all-zero rows and row count N survive).  This is the
shuffle-native, 100 TB-friendly layout: aggregations are single hash
aggregates whose work scales with nnz (the reference's sparse-matmul trick,
reference sparse_frame.py:228-230), joins are plain relational joins, and
implicit zeros materialize through outer-join NULL + ``coalesce`` instead of
the reference's sentinel zero row (reference sparse_frame.py:125-134).
"""

from sparsity_spark.frame import SparseFrame
from sparsity_spark.reshape import sparse_one_hot, one_hot_encode
from sparsity_spark.io import from_pandas, read_parquet_frame
from sparsity_spark.events import read_events

__all__ = [
    "SparseFrame",
    "sparse_one_hot",
    "one_hot_encode",
    "from_pandas",
    "read_parquet_frame",
    "read_events",
]

__version__ = "0.1.0"
