"""Local simulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf directory, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified). Run before every commit that touches queries.

Usage: python tools/check_oracles.py [--strict] [sf_dir] [query_name ...]

``--strict`` (r10 — VERDICT r9 #2): the default float handling rounds to
6 digits and compares with atol=1e-6, which is strictly WEAKER than the
driver's stringified-value hash — that gap is exactly how the r9
``graph_lpa_modularity`` ``-0.0`` vs ``0.0`` red shipped green locally.
Strict mode drops the round and the tolerance: every cell is stringified
(`str()` on the raw value — signed zeros, last-ulp drift, and int-vs-
float kind all surface as raw string differences) and the frames must be
string-identical. Run the full registry under --strict at sf0.01 AND
sf0.1 before each session close.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparsity_spark.data import TABLES
from sparsity_spark.session import get_spark

import __spark_entry__ as entrymod


def normalize(pdf: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf.columns = [str(c) for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            if strict:
                # the driver hashes stringified raw values: no rounding,
                # no tolerance — `str()` preserves -0.0 and every ulp
                pdf[c] = pdf[c].map(lambda v: str(v))
            else:
                pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    if strict:
        pdf = pdf.astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def dtype_kinds(pdf: pd.DataFrame) -> dict:
    """Per-column dtype KIND (int/float/other). The driver hashes
    STRINGIFIED values, so an int64 Spark column vs a float64 oracle
    column ("3" vs "3.0") is a hash mismatch even when the values are
    numerically equal — the r7 s7/skew_bloom red rows were exactly this
    (DuckDB SUM(BIGINT) → HUGEINT → float64 in pandas). assert_frame_equal
    with check_dtype=False cannot see it; this check can."""
    out = {}
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            out[c] = "int"
        elif pd.api.types.is_float_dtype(pdf[c]):
            out[c] = "float"
        else:
            out[c] = "other"
    return out


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check_oracles")  # env-var/cpu logic lives in get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"ERROR: unknown query names: {sorted(unknown)}")
            sys.exit(2)
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    rows_only = 0
    for name, fn in qs.items():
        try:
            raw_got = fn(spark, sf_dir).toPandas()
            got = normalize(raw_got, strict=strict)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"ROWS-ONLY {name}: {len(got)} rows (no oracle)")
            continue
        try:
            raw_want = con.execute(oracles[name]).fetchdf()
            want = normalize(raw_want, strict=strict)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            continue
        status = []
        if len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not status:
            gk, wk = dtype_kinds(raw_got), dtype_kinds(raw_want)
            drift = [
                f"{c}: spark={gk[c]} oracle={wk[c]}"
                for c in raw_got.columns
                if {gk[c], wk[c]} == {"int", "float"}
            ]
            if drift:
                status.append("dtype drift (driver hashes strings!): " + "; ".join(drift))
        if not status:
            if strict:
                if not got.equals(want):
                    neq = (got != want).any()
                    bad_cols = [c for c in got.columns if neq.get(c, False)]
                    n_bad = int((got != want).any(axis=1).sum())
                    sample = ""
                    for c in bad_cols[:1]:
                        m = got[c] != want[c]
                        i = m.idxmax()
                        sample = f"; e.g. {c}[{i}]: {got[c][i]!r} != {want[c][i]!r}"
                    status.append(
                        f"strict raw-string diff: {n_bad} rows, cols {bad_cols}{sample}"
                    )
            else:
                try:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-6)
                except AssertionError as e:
                    status.append("values differ: " + str(e).split("\n")[-2][:160])
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(got)} rows")
    spark.stop()
    matched = len(qs) - len(failures) - rows_only
    suffix = f" ({rows_only} rows-only, unverified)" if rows_only else ""
    print(f"\n{matched}/{len(qs) - rows_only} queries match{suffix}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
