#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare with the Verify.scala parquet
dumps (columns sorted by name, values compared exactly; floats bit-exact
unless --approx)."""
import json, math, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    approx = "--approx" in sys.argv
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{files[0]}'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        # dtype-strict, like the driver's hash: int-family widths may
        # normalize (int32 == int64), but int vs float is a FAIL even
        # when the values compare equal (1002248 == 1002248.0). DuckDB
        # types bare SUM(BIGINT) as HUGEINT -> pandas float64; the
        # declared oracle SQL must CAST so dtypes agree with the dump.
        def kind(d):
            k = d.kind
            return "i" if k in ("i", "u") else k
        dbad = [(c, str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if kind(got[c].dtype) != kind(want[c].dtype)]
        if dbad:
            c, dg, dw = dbad[0]
            print(f"FAIL {name}: dtype col={c} spark={dg} oracle={dw}")
            n_bad += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                # list columns may materialize as numpy arrays on either
                # side; normalize so == yields one bool, not elementwise
                if hasattr(x, "tolist"): x = x.tolist()
                if hasattr(y, "tolist"): y = y.tolist()
                if x is None and y is None: continue
                xnan = isinstance(x, float) and math.isnan(x)
                ynan = isinstance(y, float) and math.isnan(y)
                if xnan and ynan: continue
                eq = (x == y)
                if not eq and approx and isinstance(x, float) and isinstance(y, float):
                    eq = math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                if not eq:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
