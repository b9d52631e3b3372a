"""Skew- and shuffle-management operators for the 100 TB posture.

* ``distinct_count_skew_safe`` — COUNT(DISTINCT x) per key without funneling
  any hot key through one reducer: salt by hash(x) % S so each (key, salt)
  partition sees a *disjoint* slice of x's value space; per-salt distinct
  counts then sum exactly (no approximation). Two ordinary hash aggregates.
* ``write_bucketed`` / ``bucketed_table`` — persist a frame's cells bucketed
  by key so repeated joins/aggregations on that key are co-located
  (no Exchange before the join — asserted in tests). This is the engine's
  answer to the reference's sorted ``divisions`` for *hash* access paths,
  as range-partitioned parquet is for *range* paths.

Spark's AQE skew-join splitting (enabled in session.py) covers the join-side
skew case at runtime; these helpers cover the aggregation-side and
repeated-access cases that AQE cannot rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distinct_count_skew_safe(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """Exact per-key distinct count via value-hash salting.

    Because the salt is a pure function of the counted value, the per-salt
    value sets are disjoint and their distinct counts are additive — the
    result is exact, and the hottest key's work spreads across num_salts
    reducers. Returns key_cols + (n_distinct: long)."""
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(num_salts)).alias("__salt__")
    partial = (
        df.select(*key_cols, F.col(distinct_col), salt)
        .groupBy(*key_cols, "__salt__")
        .agg(F.count_distinct(distinct_col).alias("__pd__"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__pd__").cast("long").alias("n_distinct"))


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP the table AND its managed location — a previous session may
    have left the directory behind without a catalog entry (fresh
    metastore, persistent warehouse dir), which makes saveAsTable fail
    with LOCATION_ALREADY_EXISTS."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True)


def bucket_partitioned(df: DataFrame, num_buckets: int, bucket_cols: list[str]) -> DataFrame:
    """One shuffle partition per bucket id ahead of a bucketed write
    (r11, guide §6 output file sizing): Spark's bucket writer splits each
    input TASK's rows by bucket id, so an unpartitioned write emits up to
    ``input_partitions × num_buckets`` files — measured 256-272 part
    files for KB-sized store tables, paying per-file commit on the write
    and per-file open on every later scan. ``repartition``'s
    HashPartitioning is the same murmur3-pmod the writer assigns bucket
    ids with, so partition i holds exactly bucket i and the write emits
    ONE file per non-empty bucket; ``num_buckets`` stays the caller's
    scale knob for target file size."""
    return df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations keyed on bucket_cols read it without a shuffle. The
    input is repartitioned to one partition per bucket id so the table
    is one file per bucket (see :func:`bucket_partitioned`)."""
    spark = df.sparkSession
    _drop_table_and_location(spark, table)
    writer = (
        bucket_partitioned(df, num_buckets, bucket_cols)
        .write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact⋈dim join with explicit key salting, for when the dim side
    is too large to broadcast and one fact key is hot enough to overwhelm a
    single shuffle partition even after AQE splitting.

    The dim side is replicated num_salts× (explode over the salt range —
    cheap: |dim|·S rows, dim ≪ fact); each fact row picks ONE deterministic
    salt from a hash of its whole row, spreading a hot key's rows over
    num_salts shuffle partitions. Exactly the plain join's result set —
    pinned against df.join in tests."""
    salt_col = "__salt__"
    fact_salted = fact.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    )
    dim_salted = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return fact_salted.join(dim_salted, on=[on, salt_col], how=how).drop(salt_col)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction (r7). Spark's own runtime row-group /
# bloom filters (AQE) are opaque and best-effort; this is the explicit,
# engine-deterministic form a 100 TB pipeline can rely on and reason about:
# the build side collapses to a driver-held bitmap whose size is chosen up
# front (m_bits/8 bytes — metadata, like a codebook or centroid set), the
# probe is a pure map-side expression on the big side (no exchange, no
# Python), and the final exact semi-join restores precise semantics — the
# bloom has no false negatives by construction, so the prefilter is
# lossless for the final result while cutting the big side's shuffle input
# by the filter's selectivity.
#
# Representation note (measured, r7): the bitmap travels as ONE binary
# literal (m_bits/8 bytes) probed with byte-positional substring + hex —
# O(1) per lookup, one py4j call to construct. Two rejected cuts, both
# measured on the 600 k-row sf0.1 probe: (a) an m/4-char hex STRING
# probed with substring(lit, pos, 1) — Spark's UTF8String substring is a
# codepoint SCAN from the start, ~80 KB of traffic per row, 105 s total;
# (b) an int-word ARRAY literal — O(1) per row, but PySpark builds
# F.lit(list) as one py4j lit() round trip PER ELEMENT, ~5 s of driver
# time at every plan construction (bench times plan+execute, so it
# recurs). The binary form is sub-second end to end. Hashing is native
# xxhash64 (seeded per probe index): the bitmap is engine-INTERNAL —
# correctness is pinned by the exact semi-join on the survivors, so no
# cross-engine hash portability is needed, and xxhash64 is an order of
# magnitude cheaper than md5-hex parsing.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 17  # 16 KiB bitmap — demo default; size to ~10 bits/key


def _bloom_positions(key, m_bits: int, k: int) -> list:
    """The k bloom bit positions of a key column: xxhash64 of the key with
    per-probe seed column j, reduced nonnegatively mod m_bits — identical
    across build and probe by construction."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)).cast("long")
        for j in range(k)
    ]


def _bloom_byte_rows(
    small: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = 5
) -> DataFrame:
    """The bitmap as ≤ m_bits/8 rows of (b, bits) — byte b covers bit
    positions 8b..8b+7, low bit first. One map + one tiny hash aggregate;
    this row form is both what the driver collects into bytes and what
    the persisted bloom STORE keeps on disk."""
    if m_bits % 8 != 0:
        raise ValueError("m_bits must be a multiple of 8")
    # NULL keys never match a semi-join; dropping them also keeps the
    # position arithmetic null-free
    pos = small.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 8).cast("int").alias("b"),
            # shiftleft needs a literal shift amount; 2^(pos%8) is exact in
            # double for 0..7 and casts back to the int bit mask
            F.pow(F.lit(2.0), (F.col("pos") % 8).cast("double")).cast("int").alias("m"),
        )
        .groupBy("b")
        .agg(F.bit_or("m").alias("bits"))
    )


def _rows_to_bytes(rows, m_bits: int) -> bytes:
    out = bytearray(m_bits // 8)
    for r in rows:
        out[r["b"]] = r["bits"]
    return bytes(out)


def bloom_build_bytes(
    small: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = 5
) -> bytes:
    """Build the bitmap driver-side: the (b, bits) aggregate collected —
    bitmap-sized metadata, never corpus-sized."""
    return _rows_to_bytes(
        _bloom_byte_rows(small, key_col, m_bits, k).collect(), m_bits
    )


def write_bloom_store(
    small: DataFrame, table: str, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = 5
) -> None:
    """Persist the corpus's bloom bitmap as a catalog table of (b, bits)
    rows (r8 — the membership member of the persisted-sketch family next
    to CMS counts and HLL distincts). Metadata-sized: a plain parquet
    overwrite; merges rewrite kilobytes, never the corpus."""
    sk = _bloom_byte_rows(small, key_col, m_bits, k).localCheckpoint(eager=True)
    _drop_table_and_location(small.sparkSession, table)
    sk.write.mode("overwrite").format("parquet").saveAsTable(table)


def bloom_store_bytes(
    spark: SparkSession, table: str, m_bits: int = BLOOM_M_BITS
) -> bytes:
    """Load a persisted bloom bitmap back into probe-ready driver bytes."""
    return _rows_to_bytes(spark.table(table).collect(), m_bits)


def merge_bloom_store(
    batch_df: DataFrame,
    table: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = 5,
) -> DataFrame:
    """Fold one increment into the persisted bitmap — full-outer
    byte-wise OR, the ONE code path batch appends and a streaming
    maintenance loop share. OR is IDEMPOTENT (set union): replaying a
    batch cannot change the bitmap — the at-least-once-safety property
    the HLL store has and counter sketches lack — and the maintained
    store is bit-equal to one built from everything ever seen
    (test-pinned). Frozen (localCheckpoint) before the overwrite so the
    write never reads its own target. Returns the merged (b, bits)."""
    spark = batch_df.sparkSession
    inc = _bloom_byte_rows(batch_df, key_col, m_bits, k)
    # table-absent is the ONLY condition that may fall back to the bare
    # increment: a transient read/metastore error swallowed here would
    # overwrite the persisted bitmap with one batch's bits, and since the
    # bloom is used as a semijoin PREFILTER the lost bits become silent
    # false negatives (dropped matches) downstream. Real errors propagate.
    if spark.catalog.tableExists(table):
        existing = spark.table(table)
        merged = (
            existing.withColumnRenamed("bits", "bits_a")
            .join(inc.withColumnRenamed("bits", "bits_b"), "b", "full_outer")
            .select(
                "b",
                (
                    F.coalesce(F.col("bits_a"), F.lit(0)).bitwiseOR(
                        F.coalesce(F.col("bits_b"), F.lit(0))
                    )
                ).alias("bits"),
            )
        )
    else:
        merged = inc
    merged = merged.localCheckpoint(eager=True)
    _drop_table_and_location(spark, table)
    merged.write.mode("overwrite").format("parquet").saveAsTable(table)
    return merged


def bloom_probe_expr(key, bitmap: bytes, m_bits: int = BLOOM_M_BITS, k: int = 5):
    """Membership-test expression over the driver-held bitmap: k O(1)
    byte-positional substring lookups into one binary literal plus bit
    tests — whole-stage codegen, zero shuffle, zero Python. May pass
    false positives (rate (1-e^(-kn/m))^k); never drops a present key."""
    blit = F.lit(bytearray(bitmap))
    conds = []
    for pos in _bloom_positions(key, m_bits, k):
        byte = F.conv(
            F.hex(F.substring(blit, (pos / 8).cast("int") + 1, 1)), 16, 10
        ).cast("int")
        bit = F.pow(F.lit(2.0), (pos % 8).cast("double")).cast("int")
        conds.append(byte.bitwiseAND(bit) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_semijoin(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = BLOOM_M_BITS,
    k: int = 5,
) -> DataFrame:
    """Exact semi-join with an explicit bloom prefilter on the big side.

    Build the bitmap from the small side (eager: one tiny job + a
    bitmap-sized collect), filter the big side map-side with
    :func:`bloom_probe_expr`, then run the precise left-semi join on the
    survivors — bitwise-equal to ``big.join(small, ..., "leftsemi")``
    (property-pinned), but at scale the shuffle/broadcast-probe input is
    only the prefilter's survivors. Use when the build side is too big to
    broadcast raw but its *bitmap* is metadata-sized — the regime between
    broadcast joins and full shuffle joins."""
    small_key = small_key or big_key
    bitmap = bloom_build_bytes(small, small_key, m_bits, k)
    pre = big.filter(bloom_probe_expr(F.col(big_key), bitmap, m_bits, k))
    return pre.join(
        small.select(small_key), pre[big_key] == small[small_key], "leftsemi"
    )
