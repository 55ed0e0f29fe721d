#!/usr/bin/env python3
"""Gated bench capture: the round-close discipline from VERDICT r12 #1.

Runs graft.Bench only in a certified-calm window and repeats until two
captures agree within the band, so the committed BENCH_r13_local*.json
series carries agreement evidence instead of single-window luck:

  1. GATE: wait until 1-min loadavg < LOAD_GATE (default 2.0) and it is
     not rising (5-min >= 1-min would mean a run just ended; give the
     machine a settle pause).
  2. CAPTURE: full-surface graft.Bench (best-of-2 per query inside one
     JVM, stamps included), saved to BENCH_r13_local{a,b,...}.json.
  3. AGREE: stop once the two most recent captures' totals are within
     AGREE_PCT (default 5%); otherwise capture again (max N).

Driver-side tooling (not shipped library code).

Usage: python3 tools/capture.py [outPrefix] [maxRuns]
"""
import json, os, re, subprocess, sys, time

PREFIX = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r13_local"
MAX_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
LOAD_GATE = float(os.environ.get("LOAD_GATE", "2.0"))
AGREE_PCT = float(os.environ.get("AGREE_PCT", "5.0"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def loadavg():
    with open("/proc/loadavg") as f:
        a = f.read().split()
    return float(a[0]), float(a[1])


def wait_calm():
    while True:
        one, five = loadavg()
        if one < LOAD_GATE:
            print(f"[capture] calm: load {one:.2f}/{five:.2f}", flush=True)
            # settle pause so a just-finished run's cache/THP churn drains
            time.sleep(20)
            one2, _ = loadavg()
            if one2 < LOAD_GATE:
                return
        print(f"[capture] waiting for calm window (load {one:.2f}, gate {LOAD_GATE})",
              flush=True)
        time.sleep(30)


def capture(path):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS="32")
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    lines = [re.sub(r"^\[info\] ", "", l) for l in out.stdout.splitlines()
             if '"metric"' in l]
    if not lines:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise SystemExit("no bench output line")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    full = json.loads(lines[0])
    total = full["value"]
    calib = (full["calib_before_ms"] + full["calib_after_ms"]) / 2
    print(f"[capture] {path}: total {total:.1f} s, n {len(full.get('queries', {}))}, "
          f"load_before {full['load_before']}, calib {calib:.0f} ms, "
          f"steal p1 {full['cpu_pass1']['steal_pct']} p2 {full['cpu_pass2']['steal_pct']}",
          flush=True)
    return total


def main():
    totals = []
    for i in range(MAX_RUNS):
        wait_calm()
        path = f"{PREFIX}{chr(ord('a') + i)}.json"
        totals.append(capture(path))
        if len(totals) >= 2:
            a, b = totals[-2], totals[-1]
            diff = 100.0 * abs(a - b) / min(a, b)
            print(f"[capture] agreement: {a:.1f} vs {b:.1f} = {diff:.1f}%", flush=True)
            if diff <= AGREE_PCT:
                print(f"[capture] DONE: two captures within {AGREE_PCT}%", flush=True)
                return
    print("[capture] exhausted runs without agreement — commit the series anyway; "
          "the stamps carry the evidence", flush=True)


if __name__ == "__main__":
    main()
