#!/usr/bin/env python3
"""Compare two graft bench artifacts (the one-JSON-line files the
driver and the local runs emit): common-subset totals, new/removed
entries, and per-query regressions above a threshold.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio=1.4]

Cross-window caveat (SCALE.md variance studies): totals from
different machine windows are not directly comparable; the
common-subset delta and the per-query ratio list are the meaningful
signals, and single-query excursions under ~1 s are usually noise.
"""
import json, sys


def load(path):
    with open(path) as f:
        line = f.readline()
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    d = json.loads(line)
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    so = sum(qo[k] for k in common)
    sn = sum(qn[k] for k in common)
    print(f"old total {old['value']:.1f}s/{len(qo)}  new total {new['value']:.1f}s/{len(qn)}")
    print(f"common {len(common)}: {so:.1f}s -> {sn:.1f}s ({sn / so:.3f}x)")
    if added:
        print(f"added ({len(added)}, {sum(qn[k] for k in added):.1f}s): "
              + ", ".join(f"{k}={qn[k]:.2f}" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    regs = sorted(((qn[k] / qo[k], k) for k in common
                   if qo[k] > 0 and qn[k] / qo[k] >= thresh and qn[k] >= 1.0),
                  reverse=True)
    if regs:
        print(f"regressions >= {thresh}x (and >= 1s new):")
        for r, k in regs:
            print(f"  {k}: {qo[k]:.2f} -> {qn[k]:.2f} ({r:.2f}x)")
    else:
        print(f"no regressions >= {thresh}x at >= 1s")
    sys.exit(1 if regs else 0)


if __name__ == "__main__":
    main()
