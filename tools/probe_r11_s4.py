"""Isolated min-of-N probes for the fourth r11 session's target rows.

Usage: python tools/probe_r11_s4.py <query_name> [query_name ...] [--n 3]
Runs each named query end-to-end with the noop sink N times in one warm
session (after one untimed warm run) and prints min/median per row.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparsity_spark.session import get_spark


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_r11_s4")
    spark.sparkContext.setLogLevel("ERROR")
    from sparsity_spark.queries import QUERIES

    def run(name):
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in args:
        spark.sparkContext.setJobDescription(f"warm {name}")
        run(name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"probe {name} #{i}")
            t0 = time.perf_counter()
            run(name)
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(
            f"PROBE {name}: min={min(times):.3f} med={statistics.median(times):.3f} "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
