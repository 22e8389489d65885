#!/usr/bin/env python3
"""Local differential check: run after `sbt "runMain graft.Verify <sfDir> <out>"`.
Mimics the driver's DuckDB-oracle compare: for each query, load our parquet
result and run the oracle SQL in DuckDB over views named after the testdata
tables; compare schemas and values exactly (columns sorted by name)."""
import json, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            ours = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            theirs = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            continue
        ours = ours.reindex(sorted(ours.columns), axis=1)
        theirs = theirs.reindex(sorted(theirs.columns), axis=1)
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
            continue
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
            continue
        if [str(t) for t in ours.dtypes] != [str(t) for t in theirs.dtypes]:
            print(f"WARN {name}: dtypes {dict(zip(ours.columns,[str(t) for t in ours.dtypes]))} vs {dict(zip(theirs.columns,[str(t) for t in theirs.dtypes]))}")
        bad = 0
        for c in ours.columns:
            a, b = list(ours[c]), list(theirs[c])
            for i, (x, y) in enumerate(zip(a, b)):
                xn = None if (x is None or (isinstance(x,float) and math.isnan(x)) or str(x)=='NaT' or str(x)=='None') else x
                yn = None if (y is None or (isinstance(y,float) and math.isnan(y)) or str(y)=='NaT' or str(y)=='None') else y
                eq = (xn is None and yn is None) or (xn is not None and yn is not None and
                      (xn == yn or str(xn) == str(yn)))
                if not eq:
                    if bad == 0:
                        print(f"FAIL {name}: col {c} row {i}: ours={x!r} oracle={y!r}" +
                              (f" (diff={float(x)-float(y):.3e})" if isinstance(x,(int,float)) and isinstance(y,(int,float)) else ""))
                    bad += 1
        if bad == 0:
            n_ok += 1
            print(f"OK   {name} ({len(ours)} rows)")
        else:
            print(f"     {name}: {bad} mismatched cells")
    print(f"== {n_ok}/{len(oracles)} queries match ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
