#!/usr/bin/env python3
"""Generate the SURVEY §6b scaling table from two bench artifacts
(sf0.1 and sf1) — mechanically, so the round-close gate refreshes it
without hand-editing. Dev-side tooling, not part of the shipped library.

Usage: scaling_report.py bench_sf01.json bench_sf1.json > scaling_sf1.md

Ratio = sf1 / sf0.1 per shared key (10x rows). Keys are flagged:
  OK    ratio <= 3   (sub-linear to linear-with-overheads)
  LIN   ratio <= 10  (at most linear in rows)
  SUPER ratio  > 10  (super-linear -- investigate; the r12 round found
                      four real scale bugs in exactly this band)
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    rows = []
    for k in shared:
        va, vb = qa[k], qb[k]
        if va is None or vb is None or va < 0 or vb < 0:
            continue
        ratio = vb / va if va > 0 else float("inf")
        flag = "OK" if ratio <= 3 else ("LIN" if ratio <= 10 else "SUPER")
        rows.append((k, va, vb, ratio, flag))
    print("# sf0.1 -> sf1 scaling (10x rows)\n")
    # start_load = the box load when the capture BEGAN (the context that
    # matters — load_avg is the bench's own local[32] saturation at end)
    def loads(d):
        s = d.get('start_load')
        return (f"start_load {s}, end load_avg {d.get('load_avg')}"
                if s is not None else f"load {d.get('load_avg')}")
    print(f"- sf0.1 total {a.get('value')} s ({loads(a)}), "
          f"sf1 total {b.get('value')} s ({loads(b)})")
    n_ok = sum(1 for r in rows if r[4] == "OK")
    n_lin = sum(1 for r in rows if r[4] == "LIN")
    sup = [r for r in rows if r[4] == "SUPER"]
    print(f"- {len(rows)} shared measures: {n_ok} OK (<=3x), "
          f"{n_lin} LIN (<=10x), {len(sup)} SUPER (>10x)\n")
    if sup:
        print("## SUPER (>10x on 10x rows -- investigate)\n")
        print("| key | sf0.1 s | sf1 s | ratio |")
        print("|---|---|---|---|")
        for k, va, vb, r, _ in sorted(sup, key=lambda x: -x[3]):
            print(f"| {k} | {va:.3f} | {vb:.3f} | {r:.1f}x |")
        print()
    print("## All shared keys\n")
    print("| key | sf0.1 s | sf1 s | ratio | flag |")
    print("|---|---|---|---|---|")
    for k, va, vb, r, flag in sorted(rows, key=lambda x: -x[3]):
        print(f"| {k} | {va:.3f} | {vb:.3f} | {r:.1f}x | {flag} |")


if __name__ == "__main__":
    main()
