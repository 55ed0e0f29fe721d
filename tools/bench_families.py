#!/usr/bin/env python3
"""Per-family subtotals of a bench artifact (VERDICT r12 item 7): the
2x bench bound binds per family, not just in aggregate, so composition
shifts (streaming entries carry a structural micro-batch floor) stop
masquerading as regressions.

Families:
  streaming  — micro-batch replay entries (file/memory-stream ingress,
               state stores, watermarks): every *_stream, *_tws,
               streaming-suffixed taxi/docs entries, AvailableNow.
  iterative  — driver-coordinated fixed-point loops (connected
               components, label prop, PageRank, k-means training,
               BPE merges, LSH s-curve calibration...).
  batch      — everything else (one-shot Catalyst plans).

Usage: python3 tools/bench_families.py BENCH_x.json [BENCH_y.json ...]
With two or more artifacts, also prints the per-family ratio of the
LAST vs the FIRST (common entries only).
"""
import json, sys

STREAMING_SUFFIXES = ("_stream", "_tws", "_bootstrap", "_complete",
                      "_foreach", "_available_now")
STREAMING_EXACT = {
    "taxi_sliding_file_stream", "taxi_dedup_stream", "taxi_late_drop",
    "taxi_early_stream", "taxi_early_fires", "events_state_reader",
}
ITERATIVE_EXACT = {
    "dedup_components", "dedup_label_prop", "dedup_pagerank",
    "dedup_triangles", "dedup_hop_distance", "dedup_community_compare",
    "dedup_semantic", "dedup_semantic_scaled", "dedup_lsh_scurve",
    "dedup_minhash_estimate", "knn_ivf_kmeans", "ivf_kmeans_centroids",
    "ivfpq_codebooks", "pq_codebooks", "text_bpe_train", "text_bpe_tokens",
    "text_vocab_growth", "orders_month_spine",
}


def family(name):
    if name.endswith(STREAMING_SUFFIXES) or name in STREAMING_EXACT:
        return "streaming"
    if name in ITERATIVE_EXACT:
        return "iterative"
    return "batch"


def load(path):
    for ln in open(path):
        ln = ln.strip()
        if '"queries"' in ln:
            return json.loads(ln[ln.index("{"):])
    raise SystemExit(f"{path}: no full bench line")


def subtotals(q):
    out = {}
    for name, sec in q.items():
        f = family(name)
        t, n = out.get(f, (0.0, 0))
        out[f] = (t + sec, n + 1)
    return out


def main():
    arts = [(p, load(p)) for p in sys.argv[1:]]
    for p, d in arts:
        q = d["queries"]
        print(f"\n{p}: total {d['value']:.1f} s / {len(q)} entries")
        for f, (t, n) in sorted(subtotals(q).items()):
            print(f"  {f:10s} {t:7.1f} s  ({n:3d} entries, {t / n:.2f} s/query)")
    if len(arts) >= 2:
        qa, qb = arts[0][1]["queries"], arts[-1][1]["queries"]
        common = set(qa) & set(qb)
        print(f"\ncommon-{len(common)} per-family ratio "
              f"({arts[-1][0]} vs {arts[0][0]}):")
        fams = {}
        for name in common:
            f = family(name)
            a, b = fams.get(f, (0.0, 0.0))
            fams[f] = (a + qa[name], b + qb[name])
        for f, (a, b) in sorted(fams.items()):
            print(f"  {f:10s} {a:7.1f} -> {b:7.1f} s  ({b / a:.3f}x)")


if __name__ == "__main__":
    main()
