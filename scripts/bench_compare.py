#!/usr/bin/env python3
"""Calibration-normalized bench-archive comparison (VERDICT r12 ask #4).

Usage: python3 scripts/bench_compare.py PREV.json CURR.json [--top N]

Rounds 9-12 each re-did the same attribution by hand: identical HEADs
measure 1.1-1.5x apart depending on producing context, so a raw
per-query delta conflates real regressions with host drift. This script
mechanizes the ritual: the calibration triple (q1_agg /
q2_filter_project / q14_datetime - trivial queries whose plans never
change) estimates the context drift between two archives as the
geometric mean of their time ratios; every per-query comparison is then
reported both raw and drift-normalized, and the common-subset total
delta is printed the same two ways. A mover whose NORMALIZED ratio stays
near 1.0 is context swing; one that stays elevated after normalization
is a real candidate for the isolated min-of-3 ritual.
"""
import json
import math
import sys

CALIBRATION = ["q1_agg", "q2_filter_project", "q14_datetime"]


def load(path):
    with open(path) as f:
        j = json.load(f)
    qs = {k: v for k, v in j.get("queries", {}).items() if v is not None and v > 0}
    return j, qs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top_n = 10
    for i, a in enumerate(sys.argv):
        if a == "--top" and i + 1 < len(sys.argv):
            top_n = int(sys.argv[i + 1])
    prev_path, curr_path = args[0], args[1]
    jp, prev = load(prev_path)
    jc, curr = load(curr_path)

    ratios = []
    for c in CALIBRATION:
        if c in prev and c in curr:
            ratios.append(curr[c] / prev[c])
    drift = math.exp(sum(math.log(r) for r in ratios) / len(ratios)) if ratios else 1.0

    common = sorted(set(prev) & set(curr))
    tp = sum(prev[q] for q in common)
    tc = sum(curr[q] for q in common)
    print(f"prev: {prev_path} (n={len(prev)}, producer="
          f"{jp.get('context', {}).get('producer', '?')})")
    print(f"curr: {curr_path} (n={len(curr)}, producer="
          f"{jc.get('context', {}).get('producer', '?')})")
    print(f"calibration drift factor (geomean curr/prev over "
          f"{'/'.join(CALIBRATION)}): {drift:.3f}")
    print(f"common subset: {len(common)} queries")
    print(f"  raw total:        {tp:8.1f} -> {tc:8.1f} s "
          f"({100 * (tc - tp) / tp:+.1f}%)")
    print(f"  drift-normalized: {tp:8.1f} -> {tc / drift:8.1f} s "
          f"({100 * (tc / drift - tp) / tp:+.1f}%)")

    movers = []
    for q in common:
        if prev[q] < 0.05:  # sub-50ms queries are pure noise
            continue
        raw = curr[q] / prev[q]
        movers.append((curr[q] / drift / prev[q], raw, q))
    movers.sort(reverse=True)
    print(f"\ntop {top_n} movers by NORMALIZED ratio (prev -> curr s, "
          "raw x, normalized x):")
    for norm, raw, q in movers[:top_n]:
        print(f"  {q:36s} {prev[q]:7.3f} -> {curr[q]:7.3f}  "
              f"raw {raw:5.2f}x  norm {norm:5.2f}x")
    only_curr = sorted(set(curr) - set(prev))
    if only_curr:
        t_new = sum(curr[q] for q in only_curr)
        print(f"\nnew queries ({len(only_curr)}): {t_new:.1f} s total")


if __name__ == "__main__":
    main()
