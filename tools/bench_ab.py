"""A/B the bench harness protocol on identical code (VERDICT r5 #1).

Runs bench.py twice on the current tree at the same sf, same machine:
once with SPARK_GRAFT_BENCH_PROTOCOL=r4 (no warm pass, no inter-query
clearCache/System.gc — the pre-r5 harness) and once with the default r5
steady-state protocol. Prints a per-query delta table so upticks can be
attributed to PROTOCOL (differs between the two runs here) vs PLAN
(differs from the r4-committed file under the r4 protocol too).

Usage: python tools/bench_ab.py [sf_dir]  (default /root/testdata/sf0.1)
Writes /tmp/bench_ab_{r4,r5}.json and prints the comparison.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGGED = [
    "q13_customer_distribution",
    "evt_funnel",
    "pipe_incremental_newdocs",
    "pipe_curriculum_shards",
    "pipe_weighted_sample",
]


def run(protocol: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_PROTOCOL"] = protocol
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    with open(f"/tmp/bench_ab_{protocol}.json", "w") as f:
        json.dump(parsed, f)
    return parsed


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    with open(os.path.join(REPO, "BENCH_r04.json")) as f:
        r4_committed = json.load(f)["parsed"]["queries"]

    print("== run 1: r4 protocol (no warm pass, no inter-query hygiene) ==")
    a = run("r4", sf_dir)
    print(f"r4-protocol total: {a['value']} s / {len(a['queries'])} queries")
    print("== run 2: r5 protocol (warm pass + clearCache/gc) ==")
    b = run("r5", sf_dir)
    print(f"r5-protocol total: {b['value']} s / {len(b['queries'])} queries")

    common = sorted(set(a["queries"]) & set(b["queries"]))
    c65 = [q for q in common if q in r4_committed]
    print(f"\nlike-for-like vs r4 file ({len(c65)} shared): "
          f"r4proto {sum(a['queries'][q] for q in c65):.1f} s, "
          f"r5proto {sum(b['queries'][q] for q in c65):.1f} s, "
          f"r4file {sum(r4_committed[q] for q in c65):.1f} s")

    print(f"\n{'query':34s} {'r4file':>7s} {'r4proto':>8s} {'r5proto':>8s} attribution")
    for q in FLAGGED:
        f4 = r4_committed.get(q)
        pa, pb = a["queries"].get(q), b["queries"].get(q)
        if f4 is None or pa is None or pb is None:
            continue
        # protocol-attributed if the r4-protocol rerun of current code is
        # close to the r4 file (same plan, harness explains the delta)
        attr = "PROTOCOL" if abs(pa - f4) < 0.6 * abs(pb - f4) + 0.05 else "PLAN?"
        print(f"{q:34s} {f4:7.3f} {pa:8.3f} {pb:8.3f} {attr}")

    print("\nfull per-query r4proto vs r5proto (delta > 0.1 s):")
    for q in common:
        d = b["queries"][q] - a["queries"][q]
        if abs(d) > 0.1:
            print(f"  {q:34s} {a['queries'][q]:7.3f} -> {b['queries'][q]:7.3f}  ({d:+.3f})")


if __name__ == "__main__":
    main()
