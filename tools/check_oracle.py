"""Self-check harness mirroring the driver's DuckDB-oracle differential test.

Runs every registered query twice — the Spark plan and its oracle SQL in
DuckDB over the same parquet — and compares row count, column names, and
values (order-insensitive; floats with tight tolerance, plus an
exact-equality report so hash-sensitivity is visible before the driver's
own CORRECTNESS run).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from delfos_etl_pipeline_spark.sources.parquet import TABLES

    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize temporal dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s):
            import datetime as _dt

            first = s.dropna().iloc[0] if s.dropna().size else None
            # Spark DateType → datetime.date objects; DuckDB DATE →
            # datetime64. Same values, different pandas carriers — unify so
            # the dtype-drift check only flags genuine cross-engine drift
            # (the r1 driver hash-matched DATE columns, so this is safe).
            if isinstance(first, (pd.Timestamp, _dt.date, _dt.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
    sort_cols = list(df.columns)
    # Round floats before building the textual sort key: cross-engine repr
    # differences within tolerance must not reorder rows (misaligned pairing
    # shows up as spurious value mismatches for float-keyed results).
    key = df.copy()
    for c in key.columns:
        if pd.api.types.is_float_dtype(key[c]):
            key[c] = key[c].round(9)
    key = key.astype(str)
    order = key.sort_values(by=sort_cols, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def dtype_drift(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Cross-engine result-type drift report. The driver's value-hash folds
    in serialized values, so a DuckDB DOUBLE ('431.0') vs Spark BIGINT
    ('431') mismatches even when numerically equal (VERDICT r1). Kind-level
    drift (int vs float vs object) is a hard failure; width-only drift
    (int32 vs int64) is a warning."""
    issues = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        xk, yk = sdf[c].dtype, odf[c].dtype
        kx = "datetime" if pd.api.types.is_datetime64_any_dtype(xk) else xk.kind
        ky = "datetime" if pd.api.types.is_datetime64_any_dtype(yk) else yk.kind
        # Int column with NULLs surfaces as float64/object in pandas — only
        # flag when both sides are null-free (else it's a pandas artifact).
        if kx != ky:
            if sdf[c].isna().any() or odf[c].isna().any():
                issues.append(f"col {c}: WARN dtype {xk} vs {yk} (has nulls)")
            else:
                issues.append(f"col {c}: DTYPE DRIFT spark={xk} oracle={yk}")
        elif xk != yk:
            issues.append(f"col {c}: WARN dtype width {xk} vs {yk}")
    return issues


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"SCHEMA spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    a, b = canon(sdf), canon(odf)
    issues = dtype_drift(a, b)
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv = x.astype(float).to_numpy()
            yv = y.astype(float).to_numpy()
            close = np.isclose(xv, yv, rtol=1e-9, atol=1e-12, equal_nan=True)
            nan_match = np.isnan(xv) == np.isnan(yv)
            ok = (close | ~nan_match).all() and nan_match.all()
            exact = np.sum((xv == yv) | (np.isnan(xv) & np.isnan(yv)))
            if not ok:
                bad = np.where(~(close & nan_match))[0][:3]
                issues.append(
                    f"col {c}: {np.sum(~(close & nan_match))} mismatches e.g. "
                    + "; ".join(f"{xv[i]}!={yv[i]}" for i in bad)
                )
            elif exact < len(xv):
                issues.append(f"col {c}: WARN inexact {len(xv)-exact}/{len(xv)} (within tol)")
        else:
            xs = x.astype(str).to_numpy()
            ys = y.astype(str).to_numpy()
            # Nulls surface as 'None'/'NaT'/'nan' depending on dtype — unify.
            xs = np.where(pd.isna(x).to_numpy(), "<NULL>", xs)
            ys = np.where(pd.isna(y).to_numpy(), "<NULL>", ys)
            if not (xs == ys).all():
                bad = np.where(xs != ys)[0][:3]
                issues.append(
                    f"col {c}: {np.sum(xs != ys)} mismatches e.g. "
                    + "; ".join(f"{xs[i]!r}!={ys[i]!r}" for i in bad)
                )
    hard = [i for i in issues if "WARN" not in i]
    if hard:
        return False, " | ".join(issues)
    return True, " | ".join(issues) if issues else "exact"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from delfos_etl_pipeline_spark import get_spark
    from delfos_etl_pipeline_spark.queries import oracle_sql, queries

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs, oracles = queries(), oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle — rows-only check)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        dt = time.time() - t0
        if ok:
            print(f"PASS {name}: {len(sdf)} rows in {dt:.1f}s [{msg}]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
