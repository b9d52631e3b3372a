"""Oracle degeneracy audit: flag oracle queries whose DuckDB output is
empty, errors, or carries constant columns (e.g. a boolean gate that never
fires, a dedup count that is always 1) — such a query can pass the value-
hash comparison forever while exercising only one side of its operator.

Run after adding queries: python tools/audit_oracles.py [sf_dir]

Round-4 findings fixed from this audit: the exact-dedup family ran on an
all-singleton corpus (no duplicate groups ever checked) and the
source-quality keep gate passed every source; see queries.py for the
duplicate-injection / threshold fixes. Remaining constant columns are
by-construction (one-hot value=1.0, fixed resize dims, exactly one
injected email per doc) and listed here so new regressions stand out.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparsity_spark.data import TABLES
from sparsity_spark.queries import ORACLES

# constant-by-construction columns, reviewed and accepted
KNOWN = {
    ("r1_one_hot_cells", "value"),          # one-hot cells are always 1.0
    ("s6_from_pandas", "col"),              # single-column frame fixture
    ("p4_loc_range", "value"),              # one-hot value again
    ("p6_dedup_first", "value"),
    ("multimodal_resize", "width"),         # fixed target dims
    ("multimodal_resize", "height"),
    ("multimodal_resize", "out_bytes"),
    ("text_source_quality", "n_docs"),      # uniform synthetic sources
    ("dedup_substring_spans", "n_spans"),   # corpus yields single spans
    ("text_redact_pii", "n_email"),         # exactly one injected per doc
    ("text_redact_pii", "n_phone"),
    ("text_redact_pii", "n_ssn"),
    ("text_redact_pii", "n_ipv4"),
    # FastSS searches edit distance ≤ 1 and identical strings are not
    # pairs, so every emitted pair has dist=1 by construction; the
    # DISCRIMINATIVE columns are the pair ids themselves
    ("dedup_edit_distance_pairs", "dist"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    issues = []
    for name, sql in ORACLES.items():
        try:
            df = con.execute(sql).df()
        except Exception as ex:  # noqa: BLE001 - report, don't crash the audit
            issues.append((name, "ERROR", str(ex)[:80]))
            continue
        if len(df) == 0:
            issues.append((name, "EMPTY", ""))
            continue
        for c in df.columns:
            if (name, c) in KNOWN:
                continue
            try:
                nuniq = df[c].nunique(dropna=False)
            except TypeError:
                # unhashable result column (list/array) — stringify first
                # rather than crashing mid-audit and skipping later oracles
                nuniq = df[c].astype(str).nunique(dropna=False)
            if nuniq == 1 and (df[c].dtype == bool or len(df) > 10):
                issues.append((name, "const-col", f"{c}={df[c].iloc[0]!r}"))
    for i in issues:
        print("DEGENERATE", *i)
    print(f"{len(ORACLES)} oracles audited, {len(issues)} degenerate")
    return 1 if issues else 0


if __name__ == "__main__":
    raise SystemExit(main())
