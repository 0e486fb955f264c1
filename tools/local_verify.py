#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then compare each result against DuckDB on the same tables.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [name ...]
Optional names restrict the comparison (pair with the same restriction
on graft.Verify for fast single-entry iteration).
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    res_glob = glob.glob(f"{outdir}/{name}/*.parquet")
    if not res_glob:
        bad.append((name, "NO RESULT PARQUET"))
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"SQL ERROR: {e}"))
        continue
    # driver semantics: its compare sorts/hashes CELLS in pandas, which
    # crashes on nested values (q59's round-10 err slipped past this
    # script because the string-compare below tolerates arrays). Fail
    # the same class here so local iteration matches the driver.
    import numpy as _np
    nested = [c for c in spark_df.columns
              if spark_df[c].map(lambda v: isinstance(v, (list, dict, _np.ndarray))).any()]
    if nested:
        bad.append((name, f"NON-SCALAR COLUMNS (driver compare would crash): {nested}"))
        continue
    # driver semantics: sort columns by name, then compare values
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    oracle_df = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(spark_df.columns) != list(oracle_df.columns):
        bad.append((name, f"SCHEMA: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}"))
        continue
    if len(spark_df) != len(oracle_df):
        bad.append((name, f"ROWS: spark={len(spark_df)} oracle={len(oracle_df)}"))
        continue
    # sort rows for order-insensitive compare, then exact-string compare
    sa = sorted("|".join(map(str, r)) for r in spark_df.astype(str).itertuples(index=False))
    sb = sorted("|".join(map(str, r)) for r in oracle_df.astype(str).itertuples(index=False))
    mism = [(a, b) for a, b in zip(sa, sb) if a != b]
    if mism:
        bad.append((name, f"VALUES: {len(mism)}/{len(sa)} rows differ; first: {mism[0]}"))
    else:
        ok.append(name)

for n in ok:
    print(f"PASS {n}")
for n, why in bad:
    print(f"FAIL {n}: {why}")
print(f"\n{len(ok)} pass / {len(bad)} fail")
sys.exit(1 if bad else 0)
