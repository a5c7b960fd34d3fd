#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only — the
engine itself is pure Scala/Spark). Runs graft.Verify output against the
DuckDB oracle on the same scale-factor dir and compares:
  - schema: column names (sorted)
  - rows: row count
  - hash: values, columns sorted by name, rows in produced order

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <out>"` first)
"""
import sys, os, json, hashlib, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)

def frame_sig(df):
    df = df[sorted(df.columns)]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(norm_cell(v) for v in row) + "\n").encode())
    return sorted(df.columns), len(df), h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            continue
        spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(spark_df)}
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = {"status": "oracle_error", "err": str(e).split("\n")[0]}
            continue
        sc, sr, sh = frame_sig(spark_df)
        dc, dr, dh = frame_sig(duck_df)
        ok = (sc == dc) and (sr == dr) and (sh == dh)
        results[name] = {"status": "match" if ok else "MISMATCH",
                         "rows": sr,
                         "schema_ok": sc == dc, "rows_ok": sr == dr, "hash_ok": sh == dh}
        if not ok:
            results[name]["spark_cols"] = sc
            results[name]["duck_cols"] = dc
            results[name]["spark_rows"] = sr
            results[name]["duck_rows"] = dr
            # show first differing row for debugging
            a = spark_df[sorted(spark_df.columns)]
            b = duck_df[sorted(duck_df.columns)] if sc == dc and sr == dr else None
            if b is not None:
                for i in range(len(a)):
                    ra = [norm_cell(v) for v in a.iloc[i]]
                    rb = [norm_cell(v) for v in b.iloc[i]]
                    if ra != rb:
                        results[name]["first_diff"] = {"i": i, "spark": ra, "duck": rb}
                        break
    n_match = sum(1 for r in results.values() if r["status"] == "match")
    n_bad = sum(1 for r in results.values() if r["status"] in ("MISMATCH", "oracle_error"))
    for k, v in results.items():
        flag = "OK " if v["status"] == "match" else ("--" if v["status"] == "rows_only" else "!!!")
        print(f"{flag} {k}: {json.dumps(v)[:400]}")
    print(f"\n{n_match} match, {n_bad} bad, {len(results)} total")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
