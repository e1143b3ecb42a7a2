#!/usr/bin/env python3
"""Differential-fuzz comparator, DuckDB side (verification tooling only —
never shipped engine code; same role as oracle_check.py).

Reads the dump `graft.fuzz.FuzzHarness` wrote (fixture.parquet +
cases.jsonl), replays each case's expression over the SAME parquet bytes in
DuckDB, and compares per-row values against the Spark-side canon strings.

Agreement rules:
  - both engines error on a case -> agreement (overflow, bad cast, ...);
    one-sided errors are divergences.
  - numerics compare with rel tol 1e-12 (libm last-ulp tails); NaN == NaN,
    infinities must match in sign; int-vs-float type skew (Spark floor ->
    BIGINT, DuckDB -> DOUBLE) is fine.
  - DuckDB date_trunc('day'/...) returns DATE where Spark keeps TIMESTAMP:
    dates canonicalize to midnight-UTC epoch micros.
  - strings/booleans/arrays compare exactly (arrays elementwise).

Oracle-vs-contract deviations are handled in the GENERATOR (guards at each
Sig in ExprGen.scala), not by an allowlist here: this script has no
expression-specific carve-outs, so any divergence it prints is a real
engine/oracle disagreement on the curated surface.

Usage: python3 tools/fuzz_check.py <dumpDir> [--max-print N]
Exit 0 iff all cases agree.
"""
import datetime
import json
import math
import sys
from decimal import Decimal

import duckdb

EPOCH_DT = datetime.datetime(1970, 1, 1)
EPOCH_D = datetime.date(1970, 1, 1)
US = datetime.timedelta(microseconds=1)


def canon_duck(v):
    """DuckDB value -> comparable python object (None/bool/int/float/str/list)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, datetime.datetime):
        return ("us", (v.replace(tzinfo=None) - EPOCH_DT) // US)
    if isinstance(v, datetime.date):
        return ("us", (v - EPOCH_D).days * 86400000000)
    if isinstance(v, Decimal):
        return v  # kept exact: Decimal-vs-Decimal compares without tolerance
    if isinstance(v, list):
        return [canon_duck(x) for x in v]
    return v


def parse_spark(s, ty):
    """Spark canon string -> comparable python object, guided by the
    reported Spark result type."""
    if s == "NULL":
        return None
    if s.startswith("us:"):
        return ("us", int(s[3:]))
    t = ty.upper()
    if t.startswith("ARRAY"):
        body = s[1:-1]
        if body == "":
            return []
        return [None if e == "NULL" else int(e) for e in body.split(",")]
    if t == "BOOLEAN":
        return s == "true"
    if any(k in t for k in ("BIGINT", "INT", "SMALLINT", "TINYINT")):
        return int(s)
    if "DECIMAL" in t:
        return Decimal(s)  # exact — float() would mask unit-size errors at 1e9+
    if any(k in t for k in ("DOUBLE", "FLOAT")):
        return float(s)  # parses "NaN", "Infinity", "1.0E-6"
    return s  # STRING / VARCHAR


def num_eq(a, b):
    # Exact-integer results compare exactly: BIGINT outputs beyond 2^53
    # (e.g. products of pool longs) would otherwise tolerate million-scale
    # differences under float conversion + rel_tol. Tolerance applies only
    # to float-typed (or mixed-type-skew) comparisons.
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    if math.isinf(fa) or math.isinf(fb):
        return fa == fb
    # 1e-9: JVM vs C libm last-ulp differences amplify through near-1
    # logarithms (log2(2+1e-6) has ~1e-10 relative error that nested logs
    # preserve — seed-555 case #1333 measured 7e-12) and near function
    # zeros (sin(pi) ~ 1.2e-16). Semantic divergences (sign flips,
    # NULL-vs-value, off-by-one) sit orders of magnitude above this.
    return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)


def values_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, Decimal) and isinstance(b, Decimal):
        return a == b  # exact; Decimal("1.50") == Decimal("1.5")
    if isinstance(a, Decimal) or isinstance(b, Decimal):
        return num_eq(float(a), float(b))  # type skew (floor -> int, etc.)
    if isinstance(a, tuple) or isinstance(b, tuple):  # ("us", micros)
        # DuckDB TIMESTAMP vs Spark TIMESTAMP (or DATE vs midnight)
        if isinstance(a, tuple) and isinstance(b, tuple):
            return a[1] == b[1]
        return False
    if isinstance(a, list) or isinstance(b, list):
        if not (isinstance(a, list) and isinstance(b, list)) or len(a) != len(b):
            return False
        return all(values_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return num_eq(a, b)
    return a == b


def main():
    dump = sys.argv[1]
    max_print = 20
    if "--max-print" in sys.argv:
        max_print = int(sys.argv[sys.argv.index("--max-print") + 1])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{dump}/fixture.parquet/*.parquet')")

    n = agree = both_err = 0
    divergences = []
    for line in open(f"{dump}/cases.jsonl"):
        case = json.loads(line)
        n += 1
        # Record shapes: scalar cases carry "expr" (replayed inside the
        # canonical per-row SELECT); aggregate/window/JSON cases carry the
        # full "sql" text plus per-output-column "tys" and list-shaped rows.
        # JSON cases additionally carry "duck_sql" — a hand-mapped DuckDB
        # equivalent (its function names differ) replayed INSTEAD of the
        # engine text.
        full_sql = "sql" in case
        label = case["sql"] if full_sql else case["expr"]
        sql = case.get("duck_sql") or (case["sql"] if full_sql else
            f"SELECT id, ({case['expr']}) AS r FROM t ORDER BY id")
        try:
            fetched = con.execute(sql).fetchall()
            duck_rows = [[canon_duck(v) for v in r] for r in fetched] if full_sql \
                else [[canon_duck(r[1])] for r in fetched]
            duck_err = None
        except Exception as e:
            duck_rows, duck_err = None, str(e).split("\n")[0][:200]

        if not case["ok"] and duck_err is not None:
            both_err += 1
            agree += 1
            continue
        if case["ok"] != (duck_err is None):
            divergences.append(
                (case["i"], label,
                 f"one-sided error: spark={'ok' if case['ok'] else case['err']} "
                 f"duck={'ok' if duck_err is None else duck_err}"))
            continue

        tys = case["tys"] if full_sql else [case["ty"]]
        raw_rows = case["rows"] if full_sql else [[s] for s in case["rows"]]
        spark_rows = [[parse_spark(s, ty) for s, ty in zip(row, tys)]
                      for row in raw_rows]
        if len(spark_rows) != len(duck_rows):
            divergences.append(
                (case["i"], label,
                 f"row count {len(spark_rows)} vs {len(duck_rows)}"))
            continue
        bad = next(((ri, ci, sv, dv)
                    for ri, (srow, drow) in enumerate(zip(spark_rows, duck_rows))
                    for ci, (sv, dv) in enumerate(zip(srow, drow))
                    if not values_eq(sv, dv)), None)
        if bad is not None:
            divergences.append(
                (case["i"], label,
                 f"row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r} "
                 f"(ty={tys[bad[1]]})"))
        else:
            agree += 1

    print(f"[fuzz-check] {n} cases: {agree} agree ({both_err} both-error), "
          f"{len(divergences)} divergences")
    for i, expr, why in divergences[:max_print]:
        print(f"  DIVERGE #{i}: {expr}\n    {why}")
    if len(divergences) > max_print:
        print(f"  ... {len(divergences) - max_print} more")
    sys.exit(1 if divergences else 0)


if __name__ == "__main__":
    main()
