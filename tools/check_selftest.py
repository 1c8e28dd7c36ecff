#!/usr/bin/env python3
"""Regression test for the type-aware gate in tools/check.py.

Round 11 escape: check.py compared Python values only, so an oracle
whose SUM(BIGINT) silently widened to HUGEINT passed locally while the
driver's type-sensitive hash failed it. This self-test builds a minimal
outDir whose Spark-side parquet is BIGINT and whose oracle SQL SUMs a
BIGINT without casting back (=> HUGEINT), and asserts check.py FAILS it;
a second entry with the CAST asserts check.py still passes exact results.

Usage: python3 tools/check_selftest.py   (exits 0 iff the gate behaves)
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    tmp = tempfile.mkdtemp(prefix="check_selftest")
    sf = os.path.join(tmp, "sf")
    out = os.path.join(tmp, "out")
    os.makedirs(sf)
    os.makedirs(out)
    con = duckdb.connect()
    # Minimal table universe: check.py creates views for all TABLES names.
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"COPY (SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v) "
                f"TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
    # Spark-side results: BIGINT sums (what Spark writes for sum(long)).
    for name in ("t_hugeint_drift", "t_cast_ok"):
        os.makedirs(os.path.join(out, name))
        con.sql(f"COPY (SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS s) "
                f"TO '{out}/{name}/part.parquet' (FORMAT PARQUET)")
    oracles = {
        # Uncast SUM(BIGINT) -> HUGEINT: values equal, type differs. MUST FAIL.
        "t_hugeint_drift": "SELECT k, SUM(v) AS s FROM region GROUP BY k",
        # Cast back to BIGINT: MUST PASS.
        "t_cast_ok": "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM region GROUP BY k",
    }
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump(oracles, f)
    r = subprocess.run([sys.executable, os.path.join(HERE, "check.py"), sf, out],
                       capture_output=True, text=True)
    text = r.stdout + r.stderr
    ok = ("FAIL t_hugeint_drift" in text and "types differ" in text
          and "OK   t_cast_ok" in text and r.returncode == 1)
    print(text)
    print("SELFTEST " + ("PASS" if ok else "FAIL") +
          ": type gate catches HUGEINT drift and passes cast results")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
