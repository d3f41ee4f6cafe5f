#!/usr/bin/env python3
"""Per-query bench comparison over the common keyset (the only valid
round-over-round comparison — totals are incomparable when the catalog
grows; see memory/bench-discipline). Usage:

    python3 tools/bench_compare.py BENCH_r08.json /tmp/bench_r09_idle.json
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d:  # driver-wrapped record
        d = d["parsed"]
    return d


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    print(f"common keys: {len(common)}  (a={len(qa)}, b={len(qb)})")
    print(f"sentinel a: {a.get('sentinel')}")
    print(f"sentinel b: {b.get('sentinel')}")
    sa = sum(qa[k] for k in common)
    sb = sum(qb[k] for k in common)
    print(f"common-keyset sum: {sa:.2f}s -> {sb:.2f}s  ({(sb/sa-1)*100:+.1f}%)")
    deltas = sorted(common, key=lambda k: qb[k] / max(qa[k], 1e-9))
    print("\nbiggest improvements:")
    for k in deltas[:8]:
        print(f"  {k:32s} {qa[k]:7.3f} -> {qb[k]:7.3f}  ({(qb[k]/max(qa[k],1e-9)-1)*100:+.0f}%)")
    print("biggest regressions:")
    for k in deltas[-8:]:
        print(f"  {k:32s} {qa[k]:7.3f} -> {qb[k]:7.3f}  ({(qb[k]/max(qa[k],1e-9)-1)*100:+.0f}%)")


if __name__ == "__main__":
    main()
