#!/usr/bin/env python3
"""Interleaved fresh-JVM KeyBench adjudication (VERDICT r18 items 1-2).

The box's load-invisible multi-core throughput phase (SURVEY §6b r18
bisect: ~1.7x swings over tens of minutes at loadavg < 0.5) means a
single capture cannot adjudicate a per-key flag. This script mechanizes
the repo's strongest instrument: round-robin fresh-JVM KeyBench runs of
the SUSPECT key interleaved with a known-stable CONTROL key, each run
phase-stamped by KeyBench's pre/post PhaseCanary lines — so a suspect
swing that the control and canary do NOT share is real, and one they DO
share is the phase.

Usage: interleave_probe.py [--sf DIR] [--n N] [--rounds R] [--heap H]
                           [--label TEXT] key1 key2 ...
  defaults: --sf testdata_sf3, --n 2, --rounds 4, --heap 24g.
Appends a dated section to bench_out/scaling_sf3_probe.md and prints
each row as it lands. Dev-side tooling — NOT part of the shipped
library.
"""
import argparse, datetime, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_keybench(key, n, sf, heap, conf=None):
    env = dict(os.environ, SPARK_DRIVER_MEM=heap, SPARK_GRAFT_CPUS="32")
    if conf:
        env["SPARK_GRAFT_CONF"] = conf
    else:
        env.pop("SPARK_GRAFT_CONF", None)
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.KeyBench {key} {n} {sf}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=REPO).stdout
    # re.escape (ADVICE r19): key names are interpolated into the
    # pattern — a key with regex metacharacters must not mis-parse
    runs = [float(m) for m in
            re.findall(rf"{re.escape(key)} run \d+: ([0-9.]+) s", out)]
    canaries = re.findall(r"\[canary\] (?:pre|post): ([0-9.]+) s", out)
    if len(runs) < n:
        print(out[-2000:])
        raise RuntimeError(f"KeyBench produced {len(runs)}/{n} timings for {key}")
    return runs, canaries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.path.join(REPO, "testdata_sf3"))
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--heap", default="24g")
    ap.add_argument("--label", default="interleaved adjudication")
    ap.add_argument("--ab", default=None, metavar="CONF",
                    help="conf A/B mode (r19 q163 instrument, mechanized "
                    "r20): each key runs TWICE per round — fresh JVM with "
                    "the default conf, then fresh JVM with "
                    "SPARK_GRAFT_CONF=CONF — so a conf effect separates "
                    "from the box phase in the same minutes")
    a = ap.parse_args()

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    load = open("/proc/loadavg").read().split()[0]
    ab = f" ab={a.ab}" if a.ab else ""
    hdr = [f"\n## {a.label} {stamp} sf={os.path.basename(a.sf)} "
           f"heap={a.heap} n={a.n} rounds={a.rounds} start_load={load}{ab}",
           "",
           "| round | key | runs s | canary pre/post s |",
           "|---|---|---|---|"]
    # ADVICE r19: write the header up front and flush each row as it
    # lands — a run_keybench failure in a late round must not discard
    # every completed row from the artifact
    out = os.path.join(REPO, "bench_out/scaling_sf3_probe.md")
    with open(out, "a") as f:
        f.write("\n".join(hdr) + "\n")
        f.flush()
        variants = [("", None)] + ([(" [AB]", a.ab)] if a.ab else [])
        for r in range(1, a.rounds + 1):
            for key in a.keys:
                for tag, conf in variants:
                    runs, canaries = run_keybench(key, a.n, a.sf, a.heap,
                                                  conf)
                    row = (f"| {r} | {key}{tag} | "
                           f"{' / '.join(f'{t:.2f}' for t in runs)} | "
                           f"{' / '.join(canaries) or '?'} |")
                    f.write(row + "\n")
                    f.flush()
                    print(row, flush=True)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
