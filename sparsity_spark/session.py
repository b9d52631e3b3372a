"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB posture: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), Arrow on (vectorized Python UDF
transfer), and shuffle partitions sized for the local harness (on a real
cluster AQE's coalescing makes the static number mostly a ceiling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _scratch_root() -> str:
    """Fast scratch for shuffle files, localCheckpoint blocks, and the
    bucketed-store warehouse (r11, guide §2.1/§6: provision shuffle and
    scratch I/O on the fastest local storage available — production
    clusters put spark.local.dir on local NVMe for exactly this reason).
    This sandbox's /tmp is a virtio disk whose fsync latency stalls for
    multi-second stretches under the bench's table-write bursts
    (measured: identical store-lifecycle rows swing 4.8-15.1 s on /tmp
    vs a stable 1.9-2.1 s on tmpfs); a RAM-backed scratch removes the
    artifact. Env-overridable for machines where RAM is the scarcer
    resource; the store tables are session-scratch (rebuilt per
    application id), so tmpfs volatility costs nothing."""
    root = os.environ.get("SPARK_GRAFT_SCRATCH")
    if root:
        return root
    if os.access("/dev/shm", os.W_OK):
        return "/dev/shm"
    return "/tmp"


def get_spark(app_name: str = "sparsity_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scratch = _scratch_root()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # a single ~100 MB parquet file scans as 1 split under the default
        # 128 MB maxPartitionBytes — compute-heavy per-row work after a
        # broadcast join then runs on ONE core (measured at sf1: jaccard
        # prefix join at 1.7 avg threads on a 32-core box). Asking for at
        # least one split per core fixes the local calibration; a real
        # cluster's many-file tables already exceed this floor.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # ... but minPartitionNum only bites if openCostInBytes lets it:
        # the default 4 MB open cost FLOORS the split size, so a ~6 MB
        # local table still scans as 2 splits and every map-side stage
        # before the first shuffle runs ~2 tasks on 32 cores (measured:
        # full-corpus ppjoin at sf1 33 s → 4-5 s once the scan splits,
        # r7). 256 KB keeps multi-MB scans honestly parallel while
        # leaving sub-MB sf0.1 tables at a handful of splits — 64 KB
        # shredded those into 32 micro-tasks and cost a diffuse
        # +0.2-0.5 s per query in scheduler overhead (measured, r7).
        # A real cluster's 100 MB+ files never feel this floor.
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed-table support without polluting the repo: warehouse +
        # shuffle/checkpoint scratch live on the fast scratch root (see
        # _scratch_root); derby metastore stays under /tmp
        .config("spark.sql.warehouse.dir", f"{scratch}/sparsity_spark_warehouse")
        .config("spark.local.dir", f"{scratch}/sparsity_spark_local")
        # ReservedCodeCacheSize: the default 240 MB JIT code cache cannot
        # hold two codegen-giant queries at once (simhash's 64-term
        # bit-majority fold, ppjoin's fold chains) — their compiled
        # whole-stage methods evict each other and every rerun recompiles,
        # measured as monotonically-degrading walls (ppjoin at sf1:
        # 7.9 → 16.4 s run-over-run; simhash's 114-665 cpu-s swings in
        # SCALE.md). 1 GiB reserves address space only (committed lazily)
        # and makes both stable AND faster (~5-7 s). Real codegen-heavy
        # Spark deployments ship exactly this flag.
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/sparsity_spark_derby "
            "-XX:ReservedCodeCacheSize=1g",
        )
        # the driver's testdata parquet carries TIMESTAMP(NANOS) columns,
        # which Spark only reads as long via this legacy flag; data.py
        # converts them back to proper timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
