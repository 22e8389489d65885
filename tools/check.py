#!/usr/bin/env python3
"""Local differential check: run after `sbt "runMain graft.Verify <sfDir> <out>"`.
Mimics the driver's DuckDB-oracle compare: for each query, load our parquet
result and run the oracle SQL in DuckDB over views named after the testdata
tables; compare schemas and values (columns sorted by name).

BIT-STRICT on doubles (round-9 hardening, matching the driver's hash gate):
  * floats compare by IEEE-754 bit pattern via struct.pack('>d', x), so
    -0.0 != 0.0 (this is exactly the class that shipped q30's round-8 red:
    the old `==` compare said -0.0 == 0.0 and the driver's hash disagreed);
  * NaN == NaN (any payload), but NaN != NULL and NaN != any number — we
    use fetchall() (Python objects, None for NULL) instead of fetchdf()
    precisely because pandas float columns collapse NULL into NaN;
  * everything non-float keeps the exact ==/str compare.
Pass --loose to restore the old value-equality compare (labeled LOOSE in
the output) for triaging whether a failure is bit-level or value-level.

Process rule: fuzz-seed rotations and any battery-domain change must pass
THIS gate (strict mode) at both sf0.001 and sf0.01 before commit.
"""
import json, sys, math, struct
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

LOOSE = "--loose" in sys.argv


def cells_eq(x, y):
    """Bit-strict cell compare: NULL==NULL, NaN==NaN, floats by bit pattern."""
    if x is None or y is None:
        return x is None and y is None
    xf, yf = isinstance(x, float), isinstance(y, float)
    if xf and yf:
        if math.isnan(x) or math.isnan(y):
            return math.isnan(x) and math.isnan(y)
        if LOOSE:
            return x == y
        return struct.pack('>d', x) == struct.pack('>d', y)
    if xf != yf:
        # mixed float/non-float (an int column drifting to double, a
        # dropped CAST on a SUM): the driver's typed gate would fail
        # this, so bit-strict mode fails it too; --loose keeps the old
        # value compare for triage
        if (xf and math.isnan(x)) or (yf and math.isnan(y)):
            return False
        if not LOOSE:
            return False
        try:
            return float(x) == float(y)
        except (TypeError, ValueError):
            return False
    return x == y or str(x) == str(y)


def fmt(v):
    if isinstance(v, float):
        return f"{v!r}[bits={struct.pack('>d', v).hex()}]"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            ours_sel = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            # DB-API description collapses types to NUMBER; DESCRIBE
            # gives the real DuckDB column types for the dtype warn
            ours_t = dict((r[0], r[1]) for r in
                          con.execute(f"DESCRIBE {ours_sel}").fetchall())
            theirs_t = dict((r[0], r[1]) for r in
                            con.execute(f"DESCRIBE {sql}").fetchall())
            cur = con.execute(ours_sel)
            ours_cols = [d[0] for d in cur.description]
            ours_rows = cur.fetchall()
            cur = con.execute(sql)
            theirs_cols = [d[0] for d in cur.description]
            theirs_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            continue
        # driver semantics: columns sorted by name before compare
        o_ix = [i for _, i in sorted((c, i) for i, c in enumerate(ours_cols))]
        t_ix = [i for _, i in sorted((c, i) for i, c in enumerate(theirs_cols))]
        o_names = [ours_cols[i] for i in o_ix]
        t_names = [theirs_cols[i] for i in t_ix]
        if o_names != t_names:
            print(f"FAIL {name}: columns {o_names} vs {t_names}")
            continue
        dt_bad = [c for c in o_names if str(ours_t[c]) != str(theirs_t[c])]
        if dt_bad:
            print(f"WARN {name}: dtypes differ on {dt_bad}: "
                  f"{[(c, str(ours_t[c]), str(theirs_t[c])) for c in dt_bad]}")
        if len(ours_rows) != len(theirs_rows):
            print(f"FAIL {name}: rows {len(ours_rows)} vs {len(theirs_rows)}")
            continue
        bad = 0
        for ri, (orow, trow) in enumerate(zip(ours_rows, theirs_rows)):
            for ci, (oi, ti) in enumerate(zip(o_ix, t_ix)):
                x, y = orow[oi], trow[ti]
                if not cells_eq(x, y):
                    if bad == 0:
                        print(f"FAIL {name}: col {o_names[ci]} row {ri}: "
                              f"ours={fmt(x)} oracle={fmt(y)}")
                    bad += 1
        if bad == 0:
            n_ok += 1
            print(f"OK   {name} ({len(ours_rows)} rows)"
                  + (" [LOOSE]" if LOOSE else ""))
        else:
            print(f"     {name}: {bad} mismatched cells")
    mode = "LOOSE" if LOOSE else "bit-strict"
    print(f"== {n_ok}/{len(oracles)} queries match ({mode}) ==")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0], args[1])
