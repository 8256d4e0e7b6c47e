"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, compares row count, sorted column names, and
order-insensitive values (exact for ints/strings/timestamps; exact for
doubles with a reported max-abs-diff so float risk is visible).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from spark_delta_lakehouse_nyctaxi_spark.queries import REGISTRY
from spark_delta_lakehouse_nyctaxi_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"row count spark={len(sdf)} oracle={len(odf)}"
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return False, f"columns spark={s_cols} oracle={o_cols}"
    s, o = norm_frame(sdf), norm_frame(odf)
    max_float_diff = 0.0
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc):
            both_nan = sc.isna() & oc.isna()
            diff = (sc - oc).abs()
            diff[both_nan] = 0.0
            if diff.isna().any():
                return False, f"col {c}: NaN mismatch"
            m = float(diff.max()) if len(diff) else 0.0
            max_float_diff = max(max_float_diff, m)
            if m != 0.0:
                return False, f"col {c}: max float diff {m:.3e}"
        else:
            eq = (sc == oc) | (sc.isna() & oc.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                return False, f"col {c}: first mismatch row {i}: spark={sc[i]!r} oracle={oc[i]!r}"
    return True, f"ok ({len(s)} rows, max_float_diff={max_float_diff:.1e})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    spark = get_spark("oracle-check")
    names = args.names or list(REGISTRY)
    n_pass = n_fail = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            odf = con.sql(spec.sql).df()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {msg} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass}/{len(names)} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
