#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<outDir>/<name> parquet (Spark result), runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB over the same sf tables, and compares
row sets exactly (columns sorted by name, rows sorted, values compared
with == after normalizing timestamps/decimals).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # datetime.date objects (Spark DATE via parquet) → datetime64
            import datetime as _dt
            import numpy as _np
            sample = next((v for v in df[c] if v is not None), None)
            if isinstance(sample, (list, dict, _np.ndarray)):
                # The driver's checker crashes on non-scalar cells
                # (pandas sort_values → unhashable ndarray). Refuse here
                # so gates must JSON-serialize array/struct columns.
                raise ValueError(f"non-scalar column {c!r}: gate must to_json it")
            if isinstance(sample, _dt.date) and not isinstance(sample, _dt.datetime):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = normalize(pd.read_parquet(res_dir))
            duck_df = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        if not spark_df.equals(duck_df):
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad_cols = [c for c in spark_df.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"  {c}[{i}]: spark={spark_df[c][i]!r} duck={duck_df[c][i]!r}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
