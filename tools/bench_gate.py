#!/usr/bin/env python3
"""Gate a bench run on ambient machine load before trusting its numbers.

Usage: python3 tools/bench_gate.py [bench_out.json] [--max-load N]

Reads the env metadata graft.Bench embeds in its JSON line and exits
nonzero (refusing the "closing benchmark" label) when the box was
contended at bench START — load average above --max-load (default 4.0,
~12% of the 32-cpu box) or extra JVMs beyond the expected sbt+bench
pair. The convention (PERF.md round-7): a number recorded as a round's
closing benchmark must come from a run this gate passed; contended
runs are still useful for relative per-query comparison but their
totals must not be compared across rounds.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "bench_out.json"
max_load = 4.0
if "--max-load" in sys.argv:
    max_load = float(sys.argv[sys.argv.index("--max-load") + 1])

with open(path) as f:
    rec = json.load(f)

# A query timed as -1 (or missing/None) means it ERRORED inside the
# bench harness. Round-7 postmortem: BENCH_r07.json carried 55 such
# entries under rc=0 and was labeled a closing run. An errored query
# is disqualifying regardless of how quiet the box was — no load
# threshold can redeem a bench that didn't run its queries.
queries = rec.get("queries", {})
errored = sorted(n for n, t in queries.items()
                 if t is None or not isinstance(t, (int, float)) or t < 0)
if not queries:
    print(f"REFUSE: {path} has no per-query times")
    sys.exit(2)
if errored:
    print(f"REFUSE: {len(errored)}/{len(queries)} queries errored (-1/missing): "
          + ", ".join(errored[:10]) + ("..." if len(errored) > 10 else ""))
    sys.exit(1)

env = rec.get("env")
if env is None:
    print(f"REFUSE: {path} has no env metadata (pre-round-7 bench?)")
    sys.exit(2)

load = env.get("load_avg_start", -1.0)
jvms = env.get("java_procs_start", -1)
problems = []
if load > max_load:
    problems.append(f"load_avg_start {load} > {max_load}")
# sbt JVM + forked bench JVM are always present; a 3rd JVM means
# another build/bench/driver was running
if jvms > 2:
    problems.append(f"java_procs_start {jvms} > 2 (concurrent JVMs)")

if problems:
    print("REFUSE closing label: " + "; ".join(problems))
    sys.exit(1)
print(f"OK to label as closing: load_avg_start={load} java_procs_start={jvms} "
      f"(value={rec.get('value')}s over {len(rec.get('queries', {}))} queries)")
