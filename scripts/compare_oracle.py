#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB with views over <sfDir>/*.parquet.
Columns sorted by name; rows compared in emitted order AND sorted order.
Additionally mimics the driver's pandas compare (sort_values over all
columns + hash_pandas_object), which is dtype-sensitive: e.g. DuckDB
HUGEINT becomes float64 in pandas and hash-mismatches an int64 Spark
column even when every value is equal, and array-typed columns make the
sort throw — both invisible to the repr()-based row compare below.
"""
import sys, os, json, math
import duckdb
import pandas.util as pdu

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if v is None:
                row.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v): row.append("NaN")
                else: row.append(repr(v))
            else:
                row.append(str(v))
        out.append(tuple(row))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = sorted(spark_rel.columns)
        spark_rows = canon(spark_rel.select(", ".join(f'"{c}"' for c in cols)).fetchall())
        if name not in oracle:
            print(f"{name:22s} rows={len(spark_rows):6d}  (no oracle — rows-only)")
            continue
        try:
            ora_rel = con.sql(oracle[name])
            ocols = sorted(ora_rel.columns)
            ora_rows = canon(ora_rel.select(", ".join(f'"{c}"' for c in ocols)).fetchall())
        except Exception as e:
            print(f"{name:22s} ORACLE SQL ERROR: {e}"); fails += 1; continue
        if ocols != cols:
            print(f"{name:22s} SCHEMA MISMATCH spark={cols} oracle={ocols}"); fails += 1; continue
        try:
            sdf = spark_rel.df()[cols].sort_values(cols).reset_index(drop=True)
            odf = ora_rel.df()[ocols].sort_values(ocols).reset_index(drop=True)
            if pdu.hash_pandas_object(sdf, index=False).sum() != \
               pdu.hash_pandas_object(odf, index=False).sum():
                dts = {c: (str(sdf[c].dtype), str(odf[c].dtype))
                       for c in cols if sdf[c].dtype != odf[c].dtype}
                print(f"{name:22s} PANDAS-HASH MISMATCH dtypes={dts}")
                fails += 1
                continue
        except Exception as e:
            print(f"{name:22s} PANDAS COMPARE ERROR: {e}")
            fails += 1
            continue
        ok_ordered = spark_rows == ora_rows
        ok_sorted = sorted(spark_rows) == sorted(ora_rows)
        if ok_ordered:
            print(f"{name:22s} OK rows={len(spark_rows)}")
        elif ok_sorted:
            print(f"{name:22s} OK-unordered rows={len(spark_rows)} (ordered compare differs)")
        else:
            fails += 1
            sset, oset = set(spark_rows), set(ora_rows)
            only_s = list(sset - oset)[:3]; only_o = list(oset - sset)[:3]
            print(f"{name:22s} MISMATCH spark_rows={len(spark_rows)} oracle_rows={len(ora_rows)}")
            for r in only_s: print(f"    spark-only:  {r}")
            for r in only_o: print(f"    oracle-only: {r}")
    print("FAILS:", fails)
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
