#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB against the same
source tables, and diffs (columns sorted by name, values compared
row-by-row exactly, with a near-miss report for floats).

Dev-tool only — the engine itself is pure Scala/Spark.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return round(v, 9)
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name:24s} rows-only: {len(got)} rows")
            continue
        exp = con.execute(oracle[name]).fetchdf()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        # dtype parity: DuckDB sum() over integers yields HUGEINT which
        # pandas renders as float64/object — the driver's hash is
        # dtype-sensitive, so an int64-vs-float64 drift is a FAIL even
        # though python would compare 3 == 3.0 equal (burned in r1 on
        # pivot/json_agg/sessionize/simhash).
        elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            print(f"✗ {name}: dtypes {[str(t) for t in got.dtypes]} != "
                  f"{[str(t) for t in exp.dtypes]}")
            ok = False
        elif len(got) != len(exp):
            print(f"✗ {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            g = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
            e = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
            # exact positional compare first; fall back to sorted compare
            if g != e:
                if sorted(map(repr, g)) == sorted(map(repr, e)):
                    print(f"~ {name}: same multiset, different order")
                else:
                    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
                    print(f"✗ {name}: value mismatch, first diffs: {bad}")
                    ok = False
        if ok:
            print(f"✓ {name:24s} {len(got)} rows")
        else:
            failures.append(name)
    # a query that ERRORED in Verify dumps nothing — treat a missing
    # dump as a failure, not a silent skip (burned in r13 on a query
    # whose analysis failed only at action time)
    dumped = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for name in sorted(set(oracle) - dumped):
        print(f"✗ {name}: no dump (query failed in Verify?)")
        failures.append(name)
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
