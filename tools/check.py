#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `graft.Verify` has already written <outDir>/<query>/ parquet and
<outDir>/oracle_sql.json (run it via: sbt "runMain graft.Verify <sfDir> <outDir>").
Compares each Spark result against the oracle SQL run in DuckDB over
views named after the tables, with columns sorted by name and rows
sorted, exact equality.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(con, rel_sql):
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    srel = con.sql(f"SELECT {quoted} FROM ({rel_sql}) ORDER BY ALL")
    # The driver's hash is TYPE-sensitive (DuckDB SUM(BIGINT) widens to
    # HUGEINT; Spark writes BIGINT — equal Python ints, different hash).
    # Round 11 shipped 4 red rows because this gate compared values only.
    types = [str(t) for t in srel.types]
    rows = srel.fetchall()
    return cols, types, rows


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            ocols, otypes, orows = canon(con, sql)
            scols, stypes, srows = canon(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            failed.append(name)
            continue
        if otypes != stypes:
            diffs = [f"{c}: oracle={a} spark={b}"
                     for c, a, b in zip(ocols, otypes, stypes) if a != b]
            print(f"FAIL {name}: types differ — {'; '.join(diffs)}")
            failed.append(name)
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            failed.append(name)
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(orows, srows)):
            if not all(eq(a, b) for a, b in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  oracle: {bad[1]}\n  spark:  {bad[2]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(orows)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
