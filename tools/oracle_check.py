#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first,
then this script compares each query's Spark parquet output against the
DuckDB oracle SQL, strictly (sorted columns, exact values).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            expected = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        actual = pd.read_parquet(files[0])
        # driver behavior: sort columns by name before hashing values
        expected = expected[sorted(expected.columns)]
        actual = actual[sorted(actual.columns)]
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != {list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
            n_fail += 1
            continue
        # driver hashes raw values, so an int64-vs-float64 dtype drift
        # (duckdb float division, HUGEINT sums) is a hash mismatch even
        # when values compare numerically equal — check dtypes strictly,
        # modulo timestamp unit/tz which the value loop already normalizes
        dtype_bad = None
        for c in expected.columns:
            ed, ad = str(expected[c].dtype), str(actual[c].dtype)
            if ed != ad and not (ed.startswith("datetime") and ad.startswith("datetime")):
                dtype_bad = (c, ed, ad)
                break
        if dtype_bad:
            c, ed, ad = dtype_bad
            print(f"FAIL {name}: col {c} dtype oracle={ed} spark={ad}")
            n_fail += 1
            continue
        bad = None
        for c in expected.columns:
            ev, av = expected[c].tolist(), actual[c].tolist()
            for i, (e, a) in enumerate(zip(ev, av)):
                same = (e == a) or (
                    isinstance(e, float) and isinstance(a, float)
                    and math.isnan(e) and math.isnan(a)) or (
                    e is None and (a is None or (isinstance(a, float) and math.isnan(a)))) or (
                    a is None and (e is None or (isinstance(e, float) and math.isnan(e))))
                if not same:
                    # timestamps: compare as instants regardless of unit/tz
                    # (naive values are driver-side UTC by construction)
                    try:
                        ta, tb = pd.Timestamp(e), pd.Timestamp(a)
                        if ta.tz is None:
                            ta = ta.tz_localize("UTC")
                        if tb.tz is None:
                            tb = tb.tz_localize("UTC")
                        if ta == tb:
                            continue
                    except Exception:
                        pass
                    bad = (c, i, e, a)
                    break
            if bad:
                break
        if bad:
            c, i, e, a = bad
            diff = ""
            if isinstance(e, float) and isinstance(a, float):
                diff = f" (absdiff {abs(e - a):.3e})"
            print(f"FAIL {name}: col {c} row {i}: oracle={e!r} spark={a!r}{diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(actual)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
