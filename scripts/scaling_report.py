#!/usr/bin/env python3
"""Per-query scaling exponents from Bench artifacts at multiple scale
factors. exponent = log(t_hi / t_lo) / log(rows_hi / rows_lo) on the
min-of-reps per-query times; < 1 means sub-linear (fixed overheads or
better), ~1 linear, > 1 super-linear. Small absolute times are noise-
dominated, so queries under --floor seconds at the LARGE sf are reported
but not flagged.

Usage: scaling_report.py <bench_lo.json> <bench_hi.json> <ratio> [--floor 0.5]
"""
import json
import math
import sys


def main() -> int:
    lo_path, hi_path, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    floor = float(sys.argv[sys.argv.index("--floor") + 1]) if "--floor" in sys.argv else 0.5
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    rows = []
    for q in sorted(set(lo["queries"]) & set(hi["queries"])):
        t_lo, t_hi = lo["queries"][q], hi["queries"][q]
        if t_lo <= 0 or t_hi <= 0:
            rows.append((q, t_lo, t_hi, None))
            continue
        rows.append((q, t_lo, t_hi, math.log(t_hi / t_lo) / math.log(ratio)))
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else 99))
    flagged = 0
    print(f"| query | t@lo (s) | t@hi (s) | exponent |")
    print(f"|---|---|---|---|")
    for q, t_lo, t_hi, e in rows:
        if e is None:
            print(f"| {q} | {t_lo:.2f} | {t_hi:.2f} | ERROR |")
            flagged += 1
            continue
        flag = " **super-linear**" if (e > 1.15 and t_hi >= floor) else ""
        if flag:
            flagged += 1
        print(f"| {q} | {t_lo:.2f} | {t_hi:.2f} | {e:.2f}{flag} |")
    tot_lo = sum(t for _, t, _, _ in rows if t > 0)
    tot_hi = sum(t for _, _, t, _ in rows if t > 0)
    print(f"\ntotal: {tot_lo:.1f}s -> {tot_hi:.1f}s on a {ratio:.0f}x corpus "
          f"(aggregate exponent {math.log(tot_hi / tot_lo) / math.log(ratio):.2f}); "
          f"{flagged} queries flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
