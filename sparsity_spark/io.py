"""Sources & sinks.

The reference persists frames as numpy ``.npz`` files (reference io.py:26-47)
and range-partitions pandas input by sorted index (reference dask/io.py:15-48).
On Spark the durable format is parquet in long/COO layout with a small JSON
sidecar for the ordered column dictionary; partition discovery, min/max
pruning and sorted-division semantics are all native parquet behaviors.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparsity_spark.frame import COL, POS, VAL, SparseFrame


def _pandas_ddl(pdf: pd.DataFrame) -> str:
    """DDL schema string from pandas dtypes (needed for empty frames, where
    Spark cannot infer)."""

    def _t(dt) -> str:
        if pd.api.types.is_datetime64_any_dtype(dt):
            return "timestamp"
        if pd.api.types.is_integer_dtype(dt):
            return "long"
        if pd.api.types.is_float_dtype(dt):
            return "double"
        if pd.api.types.is_bool_dtype(dt):
            return "boolean"
        return "string"

    return ", ".join(f"`{c}` {_t(t)}" for c, t in pdf.dtypes.items())


def from_pandas(
    spark: SparkSession,
    df: pd.DataFrame,
    npartitions: int | None = None,
) -> SparseFrame:
    """Ingest a dense/sparse pandas DataFrame as a SparseFrame
    (reference SparseFrame.__init__ sparse_frame.py:47-100 +
    dask from_pandas dask/io.py:15-48).

    Zero cells are dropped (they become implicit); the full index —
    including all-zero rows and duplicate labels — is retained in the
    index DataFrame together with a position column, so positional ops
    and keep-first dedup stay faithful.
    """
    if isinstance(df, pd.Series):
        df = df.to_frame()
    for c in df.columns:
        if not pd.api.types.is_numeric_dtype(df[c]):
            raise TypeError(f"SparseFrame cells must be numeric; column {c!r} is {df[c].dtype}")

    index_names = list(df.index.names)
    if index_names == [None]:
        index_names = ["idx"]
    index_names = [n if n is not None else f"level_{i}" for i, n in enumerate(index_names)]

    idx_pdf = df.index.to_frame(index=False)
    idx_pdf.columns = index_names
    idx_pdf[POS] = np.arange(len(df), dtype="int64")

    long_pdf = df.reset_index(drop=True).melt(ignore_index=False, var_name=COL, value_name=VAL)
    long_pdf[POS] = long_pdf.index.to_numpy(dtype="int64")
    long_pdf = long_pdf[long_pdf[VAL] != 0].dropna(subset=[VAL])
    long_pdf[COL] = long_pdf[COL].astype(str)
    long_pdf[VAL] = long_pdf[VAL].astype("float64")

    return _assemble_frame(
        spark, idx_pdf, long_pdf, index_names, [str(c) for c in df.columns], npartitions
    )


def _assemble_frame(
    spark: SparkSession,
    idx_pdf: pd.DataFrame,
    long_pdf: pd.DataFrame,
    index_names: list[str],
    columns: list[str],
    npartitions: int | None = None,
) -> SparseFrame:
    """Shared assembly: driver-side (pos, col, value) triplets + positional
    index labels → SparseFrame with labeled cells."""
    index_sdf = spark.createDataFrame(idx_pdf, schema=_pandas_ddl(idx_pdf) if len(idx_pdf) == 0 else None)
    cells_schema = f"`{POS}` long, `{COL}` string, `{VAL}` double"
    cells_sdf = spark.createDataFrame(long_pdf[[POS, COL, VAL]], schema=cells_schema).join(
        F.broadcast(index_sdf), on=POS, how="inner"
    )
    cells_sdf = cells_sdf.select(*index_names, POS, COL, VAL)
    if npartitions:
        cells_sdf = cells_sdf.repartitionByRange(npartitions, *index_names)
    return SparseFrame(cells_sdf, index_names, columns, index_sdf)


def read_npz(spark: SparkSession, filename: str) -> SparseFrame:
    """Read a frame persisted in the reference's ``.npz`` layout — keys
    ``data/indices/indptr/shape`` (the CSR) plus ``frame_index`` /
    ``frame_columns`` (reference io.py:26-47).  Driver-side compat path for
    interop with existing archives; the scale path is parquet.  CSR decode
    is done in plain numpy (no scipy in the runtime): the row id of stored
    entry j is the bucket of j in indptr."""
    with np.load(filename, allow_pickle=True) as z:
        data = np.asarray(z["data"], dtype="float64")
        indices = np.asarray(z["indices"], dtype="int64")
        indptr = np.asarray(z["indptr"], dtype="int64")
        shape = tuple(int(s) for s in z["shape"])
        index_values = z["frame_index"]
        columns = [str(c) for c in z["frame_columns"]]
    rows = np.repeat(np.arange(shape[0], dtype="int64"), np.diff(indptr))
    idx_pdf = pd.DataFrame({"idx": index_values})
    idx_pdf[POS] = np.arange(len(idx_pdf), dtype="int64")
    long_pdf = pd.DataFrame(
        {POS: rows, COL: [columns[c] for c in indices], VAL: data}
    )
    long_pdf = long_pdf[long_pdf[VAL] != 0]
    return _assemble_frame(spark, idx_pdf, long_pdf, ["idx"], columns)


def read_npz_glob(spark: SparkSession, pattern: str, sorted: bool = False) -> SparseFrame:
    """Multi-file ``.npz`` read (reference dask/io.py:51-86): ``pattern``
    may contain ``*``; shards are read in sorted path order and vstacked.
    With ``sorted=True`` the per-shard index ranges must be monotone
    non-overlapping — the reference's ``divisions`` contract
    (dask/io.py:89-112) — and a violation raises instead of silently
    producing an unsorted frame. Driver-side compat path like
    ``read_npz``; parquet is the scale path."""
    import builtins  # the reference-parity kwarg `sorted` shadows the builtin
    from glob import glob

    paths = sorted_paths = builtins.sorted(glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no npz files match {pattern!r}")
    frames = [read_npz(spark, p) for p in sorted_paths]
    cols0 = frames[0].columns
    for p, f in zip(paths[1:], frames[1:]):
        if f.columns != cols0:
            raise ValueError(f"npz shard {p} columns differ from first shard")
    if sorted:
        prev_max = None
        for p in paths:
            with np.load(p, allow_pickle=True) as z:
                vals = z["frame_index"]  # member-level lazy read
            if len(vals) == 0:
                continue  # an empty shard constrains nothing
            lo, hi = vals.min(), vals.max()
            if prev_max is not None and lo <= prev_max:
                raise ValueError(
                    f"sorted=True but shard {p} index range [{lo}, {hi}] "
                    f"overlaps the previous shard (max {prev_max})"
                )
            prev_max = hi
    out = frames[0]
    for f in frames[1:]:
        out = out.vstack(f)
    return out


def to_npz(sf: SparseFrame, filename: str):
    """Write a frame to the reference's ``.npz`` layout (reference
    io.py:31-35).  Materializes driver-side — compat/export only.  CSR
    encode in plain numpy: row-major sort of the nonzero triplets, indptr
    from per-row counts."""
    dense = sf.todense()
    if isinstance(dense, pd.Series):  # 1-col frames squeeze to Series
        dense = dense.to_frame()
    mat = dense.to_numpy()
    n, k = mat.shape
    r, c = np.nonzero(mat)
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    counts = np.bincount(r, minlength=n)
    np.savez(
        filename,
        data=mat[r, c],
        indices=c.astype("int32"),
        indptr=np.concatenate([[0], np.cumsum(counts)]).astype("int32"),
        shape=np.array([n, k]),
        frame_index=dense.index.to_numpy(),
        frame_columns=np.array(sf.columns),
    )


def read_parquet_frame(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    columns: list[str] | None = None,
) -> SparseFrame:
    """Read a long-format parquet directory as a SparseFrame (the npz
    multi-file glob read, reference dask/io.py:51-86 — partition discovery
    and footer-stat pruning are built into the parquet source)."""
    df = spark.read.parquet(path)
    if columns is None:
        meta_path = path.rstrip("/") + ".columns.json"
        try:
            with open(meta_path) as fh:
                columns = json.load(fh)
        except OSError:
            import warnings

            warnings.warn(
                f"column-dictionary sidecar {meta_path} not readable; "
                "reconstructing columns from distinct cell values — category "
                "ORDER is lost and all-zero columns disappear. Pass columns= "
                "explicitly to silence.",
                stacklevel=2,
            )
            columns = [r[COL] for r in df.select(COL).distinct().orderBy(COL).collect()]
    return SparseFrame(df, key_cols, columns)


def write_parquet_frame(sf: SparseFrame, path: str, mode: str = "overwrite"):
    """Persist a frame: long cells as range-partitioned parquet + column
    dictionary sidecar (order-preserving analog of the reference's columns
    array in the npz, reference io.py:26-38)."""
    sf.write_parquet(path, mode=mode)
    with open(path.rstrip("/") + ".columns.json", "w") as fh:
        json.dump(sf.columns, fh)


def melt_numeric(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> SparseFrame:
    """Turn numeric columns of an ordinary (dense) Spark DataFrame into a
    SparseFrame — the distributed version of constructing from an array.
    Uses the built-in ``stack`` expression (whole-stage codegen; no UDF)."""

    def _ident(c: str) -> str:  # backtick-escape identifiers
        return "`" + c.replace("`", "``") + "`"

    def _strlit(c: str) -> str:  # single-quote-escape the label literal
        return "'" + c.replace("'", "''") + "'"

    pairs = ", ".join([f"{_strlit(c)}, double({_ident(c)})" for c in value_cols])
    expr = f"stack({len(value_cols)}, {pairs}) as ({COL}, {VAL})"
    cells = df.select(*key_cols, F.expr(expr)).filter(F.col(VAL).isNotNull() & (F.col(VAL) != 0.0))
    index = df.select(*key_cols)
    return SparseFrame(cells, key_cols, value_cols, index)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a parquet dataset into target_files
    files, optionally range-sorted so footer min/max stats prune reads.
    The small-files problem is the dominant degradation mode of long-lived
    100 TB tables (every file costs a task + footer fetch); compaction is a
    single repartition(+sort) pass, no driver-side row handling."""
    df = spark.read.parquet(src)
    if sort_cols:
        df = df.repartitionByRange(target_files, *[F.col(c) for c in sort_cols])
        df = df.sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(target_files)
    df.write.mode("overwrite").parquet(dst)


def zorder_code(df: DataFrame, cols: list[str], bits: int = 10, out_col: str = "zcode"):
    """Morton (Z-order) interleave code over integral columns: each column
    is min/max-normalized into ``bits``-bit buckets (one tiny agg,
    broadcast back — no extra shuffle of the fact table), then the bucket
    bits are interleaved JVM-side with shift/and/or expressions (whole-stage
    codegen; no UDF).

    Z-ordering is the multi-dimensional data-skipping layout: sorting by
    the interleaved code clusters rows so EVERY participating dimension has
    tight per-file min/max footer stats — a predicate on any of the columns
    prunes files, not just the leading sort key. Timestamps should be
    passed as integer epochs (``F.unix_micros``)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = (mx - mn).cast("long")
        scaled = F.when(span <= 0, F.lit(0)).otherwise(
            F.expr(f"(({c} - __mn_{c}) * {top}) div (__mx_{c} - __mn_{c})").cast("long")
        )
        buckets.append(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * len(cols) + j)
            )
    return out.withColumn(out_col, z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame, cols: list[str], path: str, n_files: int = 8, bits: int = 10
):
    """Write ``df`` parquet clustered by the Z-order code of ``cols``:
    range-partition on the code (balanced files regardless of data skew in
    any single dimension) and sort within each file so parquet row-group
    stats are tight on all dimensions at once. The layout analog of
    compact_parquet, for multi-dimensional read patterns."""
    coded = zorder_code(df, cols, bits=bits)
    (
        coded.repartitionByRange(n_files, F.col("zcode"))
        .sortWithinPartitions("zcode")
        .drop("zcode")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Line-delimited JSON ingestion (r7) — the LLM-corpus interchange
    staple alongside parquet. Spark's native json source is line-splittable
    (each executor parses its own byte range, snapping to newline
    boundaries), so a 100 TB JSONL lake fans out without a driver-side
    listing bottleneck. Pass an explicit DDL ``schema`` in production:
    schema inference is a SECOND full scan before the first real job —
    fine at test scale, a doubled pass at 100 TB. ``columns`` prunes
    parser output early (Jackson still tokenizes each line, but pruning
    drops parsed values before they reach the row, and keeps downstream
    plans narrow)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.select(*columns) if columns else df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write line-delimited JSON shards — one file per partition, each a
    valid standalone JSONL (the property that makes the format splittable
    on the way back in)."""
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    """CSV ingestion (r7) — the remaining interchange staple next to
    parquet/JSONL. Spark's csv source is line-splittable like json (byte
    ranges snapped to newlines), with the same production discipline:
    pass an explicit DDL ``schema`` (inference is a second full scan) and
    prune columns at the reader. Quoting/escaping follow RFC 4180
    defaults; multiline records are deliberately NOT enabled — a
    multiline CSV is not splittable, which silently serializes a 100 TB
    scan onto whole-file tasks."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    return df.select(*columns) if columns else df


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Write CSV shards — one file per partition, RFC 4180 quoting, so
    every shard is a valid standalone CSV and the directory reads back
    splittably."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC ingestion (r7): Spark's native vectorized ORC reader — the
    second columnar interchange format after parquet, with the same
    pushdown surface (predicate pushdown + column pruning reach the
    stripe reader; min/max stripe stats prune like parquet footers)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC shards via the native writer (zlib default codec)."""
    df.write.mode(mode).orc(path)
