#!/usr/bin/env python3
"""sf3 probe for the LIN-tail keys (VERDICT r15 item 5).

The sf0.1->sf1 scaling table flags keys in the 4-10x band as LIN —
at or below linear, but exactly where a super-linear bend would first
show past sf1. This probe derives an sf3 point (30 replicas of sf0.1
via gen_sf1.py — 3x sf1's data) and times ONLY those keys, then reports
each key's sf0.1 -> sf1 -> sf3 curve with a per-key verdict:
  sf3/sf1 <= 3.0x  -> LINEAR-OK (at/below linear on 3x data)
  sf3/sf1 <= 4.5x  -> WATCH (above linear, below the 1.5x flag margin)
  otherwise        -> SUPER (bends super-linear — investigate)

Each key runs in its own fresh JVM via graft.tools.KeyBench with n=2;
the FIRST run includes any persisted-index build (q134/q163's lifecycle
cost, priced separately in the main bench) and the SECOND run is the
warm measurement, matching Bench's warm-key semantics. sf0.1/sf1
reference times come from the committed bench artifacts of record.

Dev-side tooling like selfcheck.py — NOT part of the shipped library.
Usage: python3 scripts/scaling_sf3.py [key ...]   (defaults below)
"""
import datetime, json, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF3 = os.path.join(REPO, "testdata_sf3")
DEFAULT_KEYS = ["q54_simhash", "q55_ngram_jaccard", "q134_ann_grow_reprobe",
                "q147_audio_dedup", "q150_stream_interval_join",
                "q163_knn_graph", "q214_simhash_survivors",
                "q215_minhash_survivors"]


def ensure_sf3():
    if os.path.exists(os.path.join(SF3, "lineitem.parquet")):
        return
    print("generating sf3 fixtures (30 replicas of sf0.1)...", flush=True)
    subprocess.run([sys.executable, os.path.join(REPO, "scripts/gen_sf1.py"),
                    "30", SF3], check=True)


# Heavy probe keys have a MEASURED heap floor for back-to-back
# same-JVM KeyBench runs (scaling_sf3.md memory notes): q214 needs
# >= 16 GB at the 500k-doc one-side point (completes once at 8 GB,
# OOMs on the second same-JVM run), and the q55 broadcast-verify
# branch was only ever proven at >= 16 GB past 200k docs. The probe
# pins 24g below; this preflight makes the floor LOUD so a future
# edit to the probe heap (or an ad-hoc `KeyBench q214 2 <big-fixture>`
# under build.sbt's 8g default) can't trip it silently.
HEAP_FLOOR_GB = {"q214_simhash_survivors": 16, "q55_ngram_jaccard": 16}
PROBE_HEAP = "24g"


def heap_gb(spec):
    """Parse a JVM -Xmx-style size into GB, unit-explicit (ADVICE r18:
    stripping non-digits parsed '24576m' as 24576 GB and silently
    passed the preflight). Only 'g' and 'm' suffixes are meaningful
    here; anything else fails fast."""
    m = re.fullmatch(r"(\d+)([gGmM])", spec.strip())
    if not m:
        raise SystemExit(f"FATAL: PROBE_HEAP {spec!r} is not <N>g or <N>m "
                         f"— the heap preflight needs an explicit unit")
    n, unit = int(m.group(1)), m.group(2).lower()
    return n if unit == "g" else n / 1024


def check_heap(keys):
    gb = heap_gb(PROBE_HEAP)
    for key in keys:
        floor = HEAP_FLOOR_GB.get(key)
        if floor:
            print(f"[heap-preflight] {key}: needs >= {floor} GB for "
                  f"back-to-back same-JVM runs at one-side scale; probe "
                  f"heap = {PROBE_HEAP}", flush=True)
            if gb < floor:
                raise SystemExit(
                    f"FATAL: probe heap {PROBE_HEAP} < {key}'s measured "
                    f"{floor} GB floor (scaling_sf3.md memory note) — "
                    f"raise PROBE_HEAP or drop the key explicitly")


def time_key(key):
    env = dict(os.environ, SPARK_DRIVER_MEM=PROBE_HEAP, SPARK_GRAFT_CPUS="32")
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.KeyBench {key} 2 {SF3}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,  # sbt errors land in the tail
        text=True, env=env, cwd=REPO).stdout
    # re.escape (ADVICE r19): don't let a key name with regex
    # metacharacters mis-parse the timing lines
    runs = [float(m) for m in
            re.findall(rf"{re.escape(key)} run \d+: ([0-9.]+) s", out)]
    if len(runs) < 2:
        print(out[-2000:])
        raise RuntimeError(f"KeyBench produced no timings for {key}")
    # KeyBench's pre/post multi-core phase stamps (VERDICT r18 item 3)
    canaries = re.findall(r"\[canary\] (?:pre|post): ([0-9.]+) s", out)
    return runs, "/".join(canaries) or "?"


def ref_times(path):
    try:
        return json.load(open(path)).get("queries", {})
    except FileNotFoundError:
        return {}


def main():
    keys = sys.argv[1:] or DEFAULT_KEYS
    check_heap(keys)
    ensure_sf3()
    sf01 = ref_times(os.path.join(REPO, "bench_out/bench_sf01.json"))
    sf1 = ref_times(os.path.join(REPO, "bench_out/bench_sf1.json"))
    lines = [
        "# sf3 scaling probe — LIN-tail keys",
        "",
        "3x sf1's data (30 replicas of sf0.1). `cold` includes any",
        "persisted-index build; `sf3` is the warm second run (Bench's",
        "warm-key semantics). Linear on 3x data = 3.0x.",
        "",
        "| key | sf0.1 s | sf1 s | sf3 cold s | sf3 s | sf1/sf0.1 | sf3/sf1 | verdict | canary pre/post |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for key in keys:
        runs, canary = time_key(key)
        cold, warm = runs[:2]
        t01, t1 = sf01.get(key), sf1.get(key)
        # <= 0 values are failure sentinels (minima_of's guard class) — treat as missing
        if t01 is not None and t01 <= 0:
            t01 = None
        if t1 is not None and t1 <= 0:
            t1 = None
        r10 = f"{t1/t01:.1f}x" if t01 and t1 else "?"
        r31 = warm / t1 if t1 else None
        r31s = f"{r31:.1f}x" if r31 else "?"
        verdict = ("?" if r31 is None else
                   "LINEAR-OK" if r31 <= 3.0 else
                   "WATCH" if r31 <= 4.5 else "SUPER")
        lines.append(f"| {key} | {t01} | {t1} | {cold:.2f} | {warm:.2f} "
                     f"| {r10} | {r31s} | {verdict} | {canary} |")
        print(lines[-1], flush=True)
    out = os.path.join(REPO, "bench_out/scaling_sf3_probe.md")
    load = open("/proc/loadavg").read().split()[0]
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    with open(out, "a") as f:  # append: each capture is a dated section
        f.write(f"\n## capture {stamp} start_load={load} keys={len(keys)}\n\n"
                + "\n".join(lines[6:]) + "\n")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
