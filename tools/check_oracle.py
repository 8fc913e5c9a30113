"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` SQL via DuckDB
on the same parquet tables, compares row count, column names/dtypes, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        if name not in oracles:
            # rows-only check: no value canon (list columns don't sort)
            n = len(to_pandas(fn(sf_dir)))
            print(f"{name:24s} rows={n} (no oracle: rows-only)")
            continue
        got = canon(to_pandas(fn(sf_dir)))
        want = canon(con.execute(oracles[name]).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                # exact, like the driver's value-hash: every double must
                # match bit-for-bit (oracles are engineered for this —
                # integer-derived ratios, dyadic weights, 6-dp rounding).
                # dtype-strict: a DuckDB HUGEINT vs engine int64 renders
                # differently in the driver's hash even when values agree
                # (this exact class caused 3 red rows in round 1).
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), want.reset_index(drop=True),
                    check_dtype=True, check_exact=True,
                )
                ok_vals = True
            except AssertionError as ex:
                print(f"  DIFF {name}: {str(ex)[:500]}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:24s} {status} rows {len(got)}/{len(want)} cols "
                  f"{list(got.columns)} vs {list(want.columns)}")
            if ok_rows and ok_cols:
                pass
            else:
                print("  got head:\n", got.head(3))
                print("  want head:\n", want.head(3))
        else:
            print(f"{name:24s} OK   rows={len(got)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
