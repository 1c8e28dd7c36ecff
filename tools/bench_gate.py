#!/usr/bin/env python3
"""Gate a bench run on ambient machine load AND per-query regressions
before trusting its numbers.

Usage: python3 tools/bench_gate.py [bench_out.json]
           [--max-load N] [--prev PATH|git] [--max-regress R]
           [--write-pin] [--record-watch]

Reads the env metadata graft.Bench embeds in its JSON line and exits
nonzero (refusing the "closing benchmark" label) when:

1. Any declared query ERRORED (-1/None time) or the artifact is
   malformed (non-numeric time) — round-7 postmortem: BENCH_r07.json
   carried 55 errored entries under rc=0 and was labeled closing.
2. The box was contended at bench START — load average above
   --max-load (default 4.0, ~12% of the 32-cpu box) or extra JVMs
   beyond the expected sbt+bench pair.
3. Any query comparable to the PREVIOUS closing bench regressed more
   than --max-regress (default 1.5x) — the r7->r8 lesson: per-query
   medians are the only cross-round-comparable signal, and a quiet-box
   total can still hide one operator that got 3x slower. The previous
   closing run is read from --prev (a bench_out.json-format file), or
   from git HEAD's committed bench_out.json when --prev git (the
   default: the closing artifact is committed each round, so HEAD
   holds the last gate-passed run while the candidate sits in the
   working tree). Queries present only in the candidate (new this
   round) or only in the previous run are reported but never refused.

The convention (PERF.md round-7): a number recorded as a round's
closing benchmark must come from a run this gate passed; contended
runs are still useful for relative per-query comparison but their
totals must not be compared across rounds.
"""
import json
import os
import subprocess
import sys

path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "bench_out.json"

# overridable so tools/gate_selftest.py can exercise the gate against
# synthetic pins/watchlists without touching the real ones
TOOLS_DIR = os.environ.get("GRAFT_GATE_TOOLS_DIR") \
    or os.path.dirname(os.path.abspath(__file__))
# Drift normalization bounds (round-16, from the round-15 ADVICE): an
# UNBOUNDED drift factor would absorb a real framework-wide regression
# (shared force() path, Catalog overhead, a kernel many faces use) into
# "box state" — most faces move near-uniformly, the median eats it, and
# the gate passes with only a note: the exact signature it exists to
# refuse. So (a) the factor APPLIED to thresholds is capped at
# DRIFT_CAP — beyond it, per-face slack stops growing and a uniformly
# slower run starts refusing faces; (b) a measured drift above
# DRIFT_REFUSE refuses outright — whether that is hypervisor state or a
# uniform code regression, the run must not be a round's record.
DRIFT_CAP = 1.5
DRIFT_REFUSE = 2.0
# Consecutive-round bimodal demotions before a face stops being
# excusable as machine state (the "two-strike" rule): state lives in
# tools/bench_watch.json, updated only via --record-watch (once per
# round, on the round's final gate-passed artifact) so iterating on the
# gate mid-round cannot inflate strike counts.
WATCH_FILE = os.path.join(TOOLS_DIR, "bench_watch.json")
WATCH_STRIKES = 2


def flag(name, default):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


max_load = float(flag("--max-load", 4.0))
max_regress = float(flag("--max-regress", 1.5))
# A pure ratio check on sub-second queries is jitter-triggered: three
# consecutive round-9 closing attempts each flagged a DIFFERENT fast
# query (0.12 s -> 0.20 s etc.) that re-timed at/below baseline in
# isolation. A real regression of the kind this gate exists for (the
# q1_agg pushdown loss: 1.86x on a >1 s query) clears any sane
# absolute floor, so a regression must ALSO exceed --min-delta
# seconds of absolute slowdown to refuse. Sub-floor ratio excursions
# are still printed as notes so a genuinely creeping fast query stays
# visible across rounds.
min_delta = float(flag("--min-delta", 0.25))
prev_src = flag("--prev", "git")

with open(path) as f:
    rec = json.load(f)


def is_time(t):
    # bool is an int subclass in Python: a True/False "time" is artifact
    # corruption, not a number — classify it as malformed, never numeric.
    return isinstance(t, (int, float)) and not isinstance(t, bool)


# A query timed as -1 (or missing/None) means it ERRORED inside the
# bench harness; any other non-numeric value means the artifact itself
# is corrupt. Both refuse, with distinct messages so a harness bug is
# not misread as a query failure.
queries = rec.get("queries", {})
errored = sorted(n for n, t in queries.items()
                 if t is None or (is_time(t) and t < 0))
malformed = sorted(n for n, t in queries.items()
                   if t is not None and not is_time(t))
if not queries:
    print(f"REFUSE: {path} has no per-query times")
    sys.exit(2)
if malformed:
    print(f"REFUSE: {len(malformed)}/{len(queries)} per-query times are "
          "non-numeric (corrupt artifact, not query failure): "
          + ", ".join(malformed[:10]) + ("..." if len(malformed) > 10 else ""))
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

# --- per-query regression diff against the previous closing run ---
prev = None
prev_label = None
if prev_src == "git":
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:bench_out.json"],
            capture_output=True, text=True, check=True)
        prev = json.loads(out.stdout)
        prev_label = "git HEAD bench_out.json"
    except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
        print("note: no committed bench_out.json at HEAD - "
              "skipping regression diff")
elif prev_src not in (None, "none"):
    with open(prev_src) as f:
        prev = json.load(f)
    prev_label = prev_src

demoted_faces = {}  # face -> list of (label, baseline, cand, p25, sdrift)


def diff_against(pq, label, refuse_list):
    """Diff candidate queries against baseline dict pq; regressions
    that clear BOTH the ratio and the absolute floor go to refuse_list.
    Returns the measured drift factor.

    Ratios are DRIFT-NORMALIZED first (round-15 policy): two quiet
    same-tree runs have measured 205.5s vs 285.7s with every face
    moving by a near-uniform factor — hypervisor/box state the load
    gate cannot see. The global drift factor is the MEDIAN of
    candidate/baseline over comparable faces (>50ms baseline, where
    ratios are stable); a real regression is a face that moved beyond
    drift x max_regress, because code changes move individual faces
    while box state moves all of them. The median is robust: one truly
    regressed face cannot masquerade as drift. Round-16 bounds: the
    factor applied to thresholds is capped at DRIFT_CAP, and a
    measured drift above DRIFT_REFUSE refuses the run outright (see
    the constants' comment — a uniform code regression must not pass
    as box state)."""
    common = {n: t for n, t in queries.items()
              if n in pq and is_time(t) and pq[n] > 0.05}
    if common:
        import statistics
        drift = statistics.median(t / pq[n] for n, t in common.items())
    else:
        drift = 1.0
    # a faster box never loosens the gate the other way: clamp at 1
    drift = max(drift, 1.0)
    if drift > DRIFT_REFUSE:
        print(f"REFUSE closing label: global drift {drift:.2f}x vs "
              f"{label} exceeds {DRIFT_REFUSE}x — either box state "
              "this bad makes the numbers worthless, or a "
              "framework-wide code regression is masquerading as "
              "drift; re-run on a quiet box (a uniform slowdown "
              "reproduces there)")
        refuse_list.append(label)
    # the factor thresholds are scaled by — capped so a uniform
    # slowdown beyond the cap starts refusing individual faces
    sdrift = min(drift, DRIFT_CAP)
    if drift > 1.1:
        print(f"note: global drift factor vs {label}: {drift:.2f}x "
              f"(median over {len(common)} faces) — per-query "
              f"regression thresholds scaled by {sdrift:.2f}x "
              f"(capped at {DRIFT_CAP}x); totals NOT "
              "cross-round comparable at this drift")
    drift_applied = sdrift
    # Bimodal-excursion demotion (round-15): a TRUE code regression
    # slows every rep; a JIT/GC-state excursion (the documented
    # q_kmv_distinct class — and q_unigram_encode this round: median
    # 1.69 -> 3.33 with p25 still 1.66 on a tree whose diff cannot
    # touch the path) leaves the fast reps at baseline. When the
    # run's LOW-quartile rep still lands within 1.2x of the
    # drift-scaled baseline, the median excursion is machine state,
    # reported loudly but not refused.
    spread = rec.get("spread", {})
    regressed = []
    jitter = []
    bimodal = []
    for n, t in sorted(queries.items()):
        if n in pq and t > pq[n] * drift_applied * max_regress:
            lo = spread.get(n, [None])[0]
            if lo is not None and is_time(lo) and \
                    lo <= pq[n] * drift_applied * 1.2:
                bimodal.append((n, pq[n], t, lo))
                demoted_faces.setdefault(n, []).append(
                    (label, pq[n], t, lo, drift_applied))
            elif t - pq[n] * drift_applied > min_delta:
                regressed.append((n, pq[n], t, t / pq[n]))
            else:
                jitter.append((n, pq[n], t, t / pq[n]))
    if bimodal:
        print(f"note: {len(bimodal)} bimodal excursions vs {label} "
              "(median tripped but the low-quartile rep still hits the "
              "baseline — machine state, not code; a repeat across "
              "rounds refuses via the two-strike watchlist): "
              + ", ".join(f"{n} {p:.2f}s->{t:.2f}s (p25 {lo:.2f}s)"
                          for n, p, t, lo in bimodal[:10]))
    if jitter:
        print(f"note: {len(jitter)} sub-{min_delta}s ratio excursions vs "
              f"{label} (jitter class, not refused): "
              + ", ".join(f"{n} {p:.2f}s->{t:.2f}s ({r:.2f}x)"
                          for n, p, t, r in jitter[:10]))
    new_qs = sorted(set(queries) - set(pq))
    gone_qs = sorted(set(pq) - set(queries))
    if new_qs:
        print(f"note: {len(new_qs)} queries new vs {label} "
              "(no regression baseline): " + ", ".join(new_qs[:10]))
    if gone_qs:
        print(f"note: {len(gone_qs)} queries present in {label} "
              "but missing now: " + ", ".join(gone_qs[:10]))
    if regressed:
        detail = ", ".join(f"{n} {p:.2f}s->{t:.2f}s ({r:.2f}x)"
                           for n, p, t, r in regressed[:10])
        print(f"REFUSE closing label: {len(regressed)} quer"
              f"{'y' if len(regressed) == 1 else 'ies'} regressed >"
              f"{max_regress}x vs {label} on a quiet box: {detail}"
              + ("..." if len(regressed) > 10 else ""))
        refuse_list.append(label)
    else:
        print(f"regression diff vs {label}: "
              f"{len(set(queries) & set(pq))} comparable, 0 refused")
    return drift


refusals = []
if prev is not None:
    pq = {n: t for n, t in prev.get("queries", {}).items()
          if is_time(t) and t > 0}
    diff_against(pq, prev_label, refusals)

# --- pinned historical baseline: closes the creep loophole ---
# The rolling HEAD baseline moves every round, so a query can slow by a
# sub-floor delta each round forever without refusing. The pin
# (tools/bench_pin.json, per-query times captured at a deliberately
# chosen round and only updated via --write-pin) does not roll, so
# accumulated creep eventually clears min_delta/max_regress against it.
# The pin's optional "floor" section carries per-query [build,plan,exec]
# from a bench_floor.json captured at pin time — exec is the phase that
# is cross-round comparable (the build/plan driver-job floor moves with
# hypervisor state; PERF.md round-15).


def load_json(p):
    try:
        with open(p) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


PIN = os.path.join(TOOLS_DIR, "bench_pin.json")
pin = None
pin_drift = 1.0
if "--write-pin" in sys.argv:
    pin_obj = {"queries": queries, "note":
               "pinned per-query baseline for bench_gate creep check"}
    fl = load_json(os.path.join(
        os.path.dirname(os.path.abspath(path)), "bench_floor.json"))
    if fl and fl.get("per_query"):
        pin_obj["floor"] = fl["per_query"]
        pin_obj["floor_note"] = ("per-query [build,plan,exec] from "
                                 "bench_floor.json at pin time — exec is the "
                                 "cross-round-comparable phase")
    with open(PIN, "w") as f:
        json.dump(pin_obj, f, indent=1, sort_keys=True)
    print(f"wrote pin {PIN} ({len(queries)} queries"
          + (f", floor for {len(pin_obj['floor'])}"
             if "floor" in pin_obj else "") + ")")
else:
    pin = load_json(PIN)
    if pin is None:
        print("note: no tools/bench_pin.json - pinned creep check skipped "
              "(create with --write-pin)")
    else:
        pinq = {n: t for n, t in pin.get("queries", {}).items()
                if is_time(t) and t > 0}
        pin_drift = diff_against(
            pinq, "pinned baseline (tools/bench_pin.json)", refusals)

# --- two-strike watchlist + exec-phase adjudication -----------------
# A bimodal demotion is a loud excuse, and the excuse EXPIRES: the same
# face demoted WATCH_STRIKES consecutive rounds is a creeping floor,
# not noise, and refuses — UNLESS the floor decomposition (candidate
# bench_floor.json vs the pin's "floor" section) shows its exec phase
# still at baseline, in which case the growth is the per-query
# driver-job floor moving with box state ("floor moved") and the
# demotion stands with that corroboration on record. Strike counts
# persist in tools/bench_watch.json and advance only via
# --record-watch (close_round runs it once, on the round's final
# artifact), so mid-round gate iteration cannot inflate them.
watch = load_json(WATCH_FILE) or {}
cand_floor = (load_json(os.path.join(
    os.path.dirname(os.path.abspath(path)), "bench_floor.json"))
    or {}).get("per_query", {})
pin_floor = (pin or {}).get("floor", {})
exdrift = min(max(pin_drift, 1.0), DRIFT_CAP)
for face in sorted(demoted_faces):
    strikes = watch.get(face, 0) + 1  # this run's demotion included
    cb, _, ce = (cand_floor.get(face) or [None, None, None])[:3]
    pb, _, pe = (pin_floor.get(face) or [None, None, None])[:3]
    verdict = None
    if is_time(ce) and is_time(pe) and ce >= 0 and pe > 0:
        exec_ok = ce <= pe * exdrift * 1.2 + 0.1
        # streaming faces do their real work in BUILD (the drain runs
        # inside fn()), so exoneration also requires build near
        # baseline — else a drain regression hides as "floor moved".
        # The build bound is looser (it carries the driver-job floor
        # that legitimately moves with box state).
        build_ok = (not (is_time(cb) and is_time(pb) and pb > 0)) or \
            cb <= pb * exdrift * 1.5 + 0.5
        if exec_ok and build_ok:
            verdict = (f"floor moved (exec {pe:.2f}s->{ce:.2f}s, "
                       "at baseline)")
        elif not exec_ok:
            verdict = f"exec moved ({pe:.2f}s->{ce:.2f}s, {ce / pe:.2f}x)"
        else:
            verdict = f"build moved ({pb:.2f}s->{cb:.2f}s, {cb / pb:.2f}x)"
    if strikes >= WATCH_STRIKES:
        if verdict is not None and verdict.startswith("floor moved"):
            print(f"note: watchlist face {face} demoted {strikes} "
                  f"consecutive rounds, but {verdict} — machine state "
                  "corroborated, demotion stands")
        else:
            print(f"REFUSE closing label: {face} bimodal-demoted "
                  f"{strikes} consecutive rounds"
                  + (f"; {verdict}" if verdict else
                     "; no floor decomposition to exonerate it (re-run "
                     "with SPARK_GRAFT_BENCH_FLOOR=1)")
                  + " — a repeated demotion is a creeping floor, not noise")
            refusals.append(f"watchlist:{face}")
    elif verdict is not None:
        print(f"note: demoted face {face}: {verdict}")

if "--record-watch" in sys.argv:
    new_watch = {f: watch.get(f, 0) + 1 for f in demoted_faces}
    with open(WATCH_FILE, "w") as f:
        json.dump(new_watch, f, indent=1, sort_keys=True)
    print(f"recorded watchlist {WATCH_FILE}: "
          + (", ".join(f"{k}={v}" for k, v in sorted(new_watch.items()))
             or "(empty — all faces clear)"))

if refusals:
    sys.exit(1)

print(f"OK to label as closing: load_avg_start={load} java_procs_start={jvms} "
      f"(value={rec.get('value')}s over {len(rec.get('queries', {}))} queries)")
