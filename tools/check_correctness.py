"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares:

- row count,
- schema (sorted column names),
- values: columns sorted by name, rows sorted by all columns, compared
  BYTE-exactly (numpy tobytes — catches -0.0 vs 0.0 and any float
  drift the driver's value hash would catch).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "O" or k == "b":
            df[c] = df[c].astype(str)
        else:  # datetimes etc
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    out = {
        "rows_spark": len(sdf),
        "rows_oracle": len(odf),
        "rows_match": len(sdf) == len(odf),
        "schema_match": sorted(sdf.columns) == sorted(odf.columns),
        "hash_match": False,
    }
    if not (out["rows_match"] and out["schema_match"]):
        return out
    # Strict dtype-kind gate: the driver's value hash normalizes per
    # dtype, so an int64 Spark column against a float64 oracle column
    # (e.g. DuckDB HUGEINT -> pandas float64, the r10 sequence_pack
    # fail) hashes differently even when every value is equal. Catch
    # the skew here instead of letting the value-equality compare
    # below mask it.
    skew = {}
    for c in sorted(sdf.columns):
        ks = sdf[c].dtype.kind
        ko = odf[c].dtype.kind
        ks = "i" if ks in "iu" else ks
        ko = "i" if ko in "iu" else ko
        if {ks, ko} == {"i", "f"}:
            skew[c] = f"spark={sdf[c].dtype} oracle={odf[c].dtype}"
    if skew:
        out["dtype_skew"] = skew
    a, b = normalize(sdf), normalize(odf)
    mismatches = {}
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            equal = av.tobytes() == bv.tobytes()
            if not equal:
                diff = np.abs(av - bv)
                mismatches[c] = {
                    "max_abs_diff": float(np.nanmax(diff)) if len(diff) else 0.0,
                    "n_diff": int((av != bv).sum()),
                }
        else:
            equal = bool((av == bv).all()) if len(av) else True
            if not equal:
                bad = np.nonzero(av != bv)[0][:3]
                mismatches[c] = {
                    "n_diff": int((av != bv).sum()),
                    "examples": [(str(av[i]), str(bv[i])) for i in bad],
                }
    out["hash_match"] = not mismatches and not skew
    if mismatches:
        out["mismatches"] = mismatches
    return out


def main() -> int:
    only = set(sys.argv[1:])
    import __spark_entry__ as e
    from xarray_scipy_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, osql = e.queries(), e.oracle_sql()
    report, fails = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            report[name] = {"error": f"spark: {type(ex).__name__}: {ex}"[:500]}
            fails.append(name)
            print(f"FAIL {name}: spark error: {ex}", flush=True)
            continue
        t_spark = time.time() - t0
        if name not in osql:
            report[name] = {
                "rows_spark": len(sdf),
                "rows_only": True,
                "ok_rows_nonzero": len(sdf) > 0,
                "t_spark": round(t_spark, 2),
            }
            status = "rows-only" if len(sdf) else "ROWS-ONLY-EMPTY"
            print(f"{status:>16} {name}: {len(sdf)} rows [{t_spark:.1f}s]", flush=True)
            continue
        t0 = time.time()
        try:
            odf = con.sql(osql[name]).df()
        except Exception as ex:
            report[name] = {"error": f"oracle: {type(ex).__name__}: {ex}"[:500]}
            fails.append(name)
            print(f"FAIL {name}: oracle error: {ex}", flush=True)
            continue
        t_oracle = time.time() - t0
        res = compare(sdf, odf)
        res["t_spark"] = round(t_spark, 2)
        res["t_oracle"] = round(t_oracle, 2)
        report[name] = res
        ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
        if not ok:
            fails.append(name)
        print(
            f"{'PASS' if ok else 'FAIL':>16} {name}: rows {res['rows_spark']}/{res['rows_oracle']} "
            f"schema={res['schema_match']} hash={res['hash_match']} "
            f"[{t_spark:.1f}s/{t_oracle:.1f}s]",
            flush=True,
        )
        if not ok and "mismatches" in res:
            print(f"      mismatches: {json.dumps(res['mismatches'])[:400]}", flush=True)
        if not ok and "dtype_skew" in res:
            print(f"      dtype_skew: {json.dumps(res['dtype_skew'])[:400]}", flush=True)
    with open("/tmp/check_correctness.json", "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(f"\n{len(report) - len(fails)}/{len(report)} ok; failures: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
