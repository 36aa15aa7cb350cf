#!/usr/bin/env bash
# Round-close gate runner (VERDICT r12 #3: sf1 is a STANDING gate, not
# an ad-hoc study). Dev-side tooling like selfcheck.py — NOT part of
# the shipped library.
#
# Runs, in order (never two sbt instances at once):
#   1. full-inventory Verify + DuckDB selfcheck at sf0.001 / sf0.01 / sf0.1
#      (single session per scale — the sweep claim format in SURVEY §8)
#   2. the sf0.1 bench of record           -> bench_out/last_run.json
#   3. the sf1 fixture build if absent     (scripts/gen_sf1.py)
#   4. full-inventory Verify at sf1        (24g heap — the r12 lesson:
#      8g GC-thrashes the shuffle-heavy document keys 3-7x)
#   5. the sf1 bench                       -> bench_out/bench_sf1.json
#   6. the sf0.1-vs-sf1 scaling table      -> bench_out/scaling_sf1.md
#      (the SURVEY §6b column, generated mechanically)
#
# Check `uptime` BEFORE running: the committed artifacts of record must
# start at load < 2 (bench totals on this box swing 2-3x with load; the
# r11 q84 episode and the r12 load-5.9 artifact are the documented
# cost). The script records start/end load in bench_out/round_close.log.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1_DIR="$PWD/testdata_sf1"
LOG=bench_out/round_close.log
mkdir -p bench_out
echo "=== round_close $(date -u +%FT%TZ) start_load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"

for SF in 0.001 0.01 0.1; do
  OUT=/tmp/round_close_sf$SF
  rm -rf "$OUT"
  echo "--- Verify sf$SF" | tee -a "$LOG"
  sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT" 2>&1 \
    | grep -E '\[verify\].*failed' | tee -a "$LOG" || true
  echo "--- selfcheck sf$SF" | tee -a "$LOG"
  python3 scripts/selfcheck.py "/root/testdata/sf$SF" "$OUT" 2>&1 \
    | tail -1 | tee -a "$LOG"
done

# stamp the capture's start load into the bench JSON (judges compare
# per-key minima, but the artifact of record should carry its own
# load context — the r14 lesson: record captured at 4.5, working at
# 9.1). Rewrites in Bench.scala's one-query-per-row pretty format —
# a bare json.dump would collapse the reviewable diff to one line.
stamp_load() { # $1 = json path, $2 = load at capture start
  python3 - "$1" "$2" <<'PY'
import json, sys
p = sys.argv[1]
d = json.load(open(p))
d["start_load"] = float(sys.argv[2])
# serialize every top-level scalar from the loaded dict (ADVICE r15:
# a hardcoded key list silently dropped any field Bench.scala adds),
# keeping the one-query-per-row pretty format for reviewable diffs
head = ",\n".join(json.dumps(k) + ":" + json.dumps(v)
                  for k, v in d.items() if k != "queries")
rows = ',\n'.join(f'  "{k}": {json.dumps(v)}'
                  for k, v in sorted(d["queries"].items()))
open(p, 'w').write('{\n' + head + ',\n"queries":{\n' + rows + '\n}\n}')
PY
}

# Box-phase gate for the record capture (VERDICT r19 item 5): the box
# swings ~1.7x on multi-core throughput over tens of minutes at idle
# load (SURVEY §6b r18), and r19's record landed entirely in the slow
# phase by accident. Run the canary first; if it reads slow (> 2.5 s),
# wait boundedly for the fast phase — up to CANARY_WAITS x 300 s,
# NEVER blocking the close: after the budget we bench anyway, and the
# phase stamps in the capture JSON tell the story. PhaseCanary is pure
# JVM (no Spark session), so invoking the compiled class directly
# avoids a 20 s sbt launch per poll; classes exist because the Verify
# sweeps above already compiled.
canary() {
  # `|| true`: under set -e a failed java invocation (stale/absent
  # classes dir, moved spark jars) must degrade to an EMPTY reading —
  # the gate below logs and skips — not silently abort the whole close
  # (ADVICE r20; the comment above promises the gate NEVER blocks).
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.PhaseCanary 1 2>/dev/null \
    | sed -n 's/.*run 1: \([0-9.]*\) s/\1/p' || true
}
CANARY=$(canary)
echo "phase canary pre-bench: $CANARY s" | tee -a "$LOG"
if [ -z "$CANARY" ]; then
  echo "canary unavailable (PhaseCanary invocation failed) — skipping" \
       "the phase gate, benching now" | tee -a "$LOG"
fi
for i in $(seq 1 "${CANARY_WAITS:-3}"); do
  [ -n "$CANARY" ] || break
  awk "BEGIN{exit !($CANARY > 2.5)}" || break
  echo "canary $CANARY > 2.5 (slow phase) — waiting 300 s for the fast" \
       "phase ($i/${CANARY_WAITS:-3})" | tee -a "$LOG"
  sleep 300
  CANARY=$(canary)
  echo "phase canary retry $i: $CANARY s" | tee -a "$LOG"
done

echo "--- bench sf0.1 (artifact of record)" | tee -a "$LOG"
BLOAD=$(cut -d' ' -f1 /proc/loadavg)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 | tee -a "$LOG"
# auto-retry ONCE if the capture started loaded: bench totals on this
# box swing 2-3x with load, and a quiet record capture is cheap. The
# 1-min loadavg needs real time to decay after a 150 s local[32] run —
# 30 s would re-measure the bench's own wake. Keep whichever capture
# totals LOWER (a retry under fresh background load must not overwrite
# a better first capture).
if awk "BEGIN{exit !($BLOAD > 2)}"; then
  echo "start load $BLOAD > 2 — re-capturing the sf0.1 record once" | tee -a "$LOG"
  stamp_load bench_out/last_run.json "$BLOAD"
  cp bench_out/last_run.json bench_out/bench_sf01_try1.json
  sleep 180
  BLOAD=$(cut -d' ' -f1 /proc/loadavg)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 | tee -a "$LOG"
  stamp_load bench_out/last_run.json "$BLOAD"
  python3 - <<'PY'
import json, shutil
t1 = json.load(open('bench_out/bench_sf01_try1.json'))
t2 = json.load(open('bench_out/last_run.json'))
# a capture with failures can total LOWER than a clean one (failed
# queries contribute no time — ADVICE r15), so prefer failed == 0
# first, then the lower total
k1 = (t1.get('failed', 0) > 0, t1['value'])
k2 = (t2.get('failed', 0) > 0, t2['value'])
if k1 <= k2:
    shutil.copy('bench_out/bench_sf01_try1.json', 'bench_out/last_run.json')
    print(f"keeping first capture (failed={t1['failed']}, {t1['value']} s)"
          f" over retry (failed={t2['failed']}, {t2['value']} s)")
else:
    print(f"keeping retry (failed={t2['failed']}, {t2['value']} s)"
          f" over first (failed={t1['failed']}, {t1['value']} s)")
PY
  rm -f bench_out/bench_sf01_try1.json
else
  stamp_load bench_out/last_run.json "$BLOAD"
fi
cp bench_out/last_run.json bench_out/bench_sf01.json
# cross-round per-key history + minima regression check (VERDICT r15
# item 4: the judge rule is per-key minima, make applying it mechanical)
python3 scripts/bench_history.py append bench_out/bench_sf01.json | tee -a "$LOG"
python3 scripts/bench_history.py report bench_out/bench_sf01.json | tee -a "$LOG"

if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
  echo "--- gen_sf1 (fixture absent)" | tee -a "$LOG"
  python3 scripts/gen_sf1.py 2>&1 | tail -2 | tee -a "$LOG"
fi

OUT=/tmp/round_close_sf1
rm -rf "$OUT"
echo "--- Verify sf1 (24g heap)" | tee -a "$LOG"
SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF1_DIR $OUT" 2>&1 \
  | grep -E '\[verify\].*failed' | tee -a "$LOG" || true
echo "sf1 verify dumped: $(ls "$OUT" | wc -l) entries" | tee -a "$LOG"

# sf1 oracle replay of the near-dup SLICE keys (the only sf1 evidence
# q55/q164 have — SURVEY §6b item 7; ~10 min in DuckDB), both slices:
# the biased-by-construction id-ranges AND the disjoint mid-range one
# (VERDICT r15 item 1). Then pin the pair COUNTS: the cross-engine
# replay can't catch a predicate bug shared by engine and oracle, so
# the frozen constants are the independent tripwire.
echo "--- sf1 slice-key oracle replay + count pins" | tee -a "$LOG"
python3 scripts/selfcheck.py "$SF1_DIR" "$OUT" \
  q208_jaccard_slice q209_containment_slice \
  q210_jaccard_slice_mid q211_containment_slice_mid \
  q215_minhash_survivors 2>&1 \
  | tail -6 | tee -a "$LOG"
python3 - "$OUT" <<'PY' 2>&1 | tee -a "$LOG"
import glob, sys, duckdb
out = sys.argv[1]
PINNED_SF1 = {"q208_jaccard_slice": 3, "q209_containment_slice": 6,
              "q210_jaccard_slice_mid": 2, "q211_containment_slice_mid": 4,
              # r17: q147's 32-bit envelope — fixture content starts at
              # sf0.1 (spec-pinned 0/0/14), sf1 carries the replica mass
              "q147_audio_dedup": 672,
              # r18: q215's survivor contract is content-bounded — the
              # cluster count is the independent tripwire (233 at sf1;
              # 233/235/240 measured at 50k/500k/1M docs)
              "q215_minhash_survivors": 233}
bad = 0
for key, want in sorted(PINNED_SF1.items()):
    files = sorted(glob.glob(f"{out}/{key}/*.parquet"))
    got = duckdb.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
    tag = "OK" if got == want else "PIN-FAIL"
    if got != want: bad += 1
    print(f"[slice-pin] {key}: {got} pairs (pinned {want}) {tag}")
sys.exit(1 if bad else 0)
PY

# q215 convergence tripwire (ADVICE r18): the oracle unrolls the same
# fixed label-step count as the engine, so cross-engine comparison
# cannot see non-convergence — Probe215 independently asserts one
# extra minLabel step is a fixpoint and cluster_id == member-min
# doc_id at sf1. Exits nonzero (failing the close) on violation.
echo "--- q215 convergence tripwire (sf1)" | tee -a "$LOG"
SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.Probe215 $SF1_DIR" 2>&1 \
  | grep '\[probe215\]' | tee -a "$LOG"

echo "--- bench sf1" | tee -a "$LOG"
# record (not gate) the phase before the sf1 bench — the sf0.1 gate
# above already spent the bounded wait budget for this close
echo "phase canary pre-sf1-bench: $(canary) s" | tee -a "$LOG"
BLOAD=$(cut -d' ' -f1 /proc/loadavg)
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 | tee -a "$LOG"
stamp_load bench_out/last_run.json "$BLOAD"
cp bench_out/last_run.json bench_out/bench_sf1.json
python3 scripts/bench_history.py append bench_out/bench_sf1.json | tee -a "$LOG"
python3 scripts/bench_history.py report bench_out/bench_sf1.json | tee -a "$LOG"
# last_run.json (the cross-round artifact of record) stays the sf0.1 run
cp bench_out/bench_sf01.json bench_out/last_run.json
echo "--- scaling table" | tee -a "$LOG"
python3 scripts/scaling_report.py bench_out/bench_sf01.json bench_out/bench_sf1.json \
  > bench_out/scaling_sf1.md || true

# sf3 probe of the LIN-tail keys (r16: it caught the IVF small-file
# defect) — STANDING: scaling_sf3.py self-builds the gitignored sf3
# fixtures when absent (VERDICT r16 item 4 — a fresh checkout must not
# silently skip the probe), so the only gates are an explicit
# ROUND_CLOSE_SF3=0 and a loud disk preflight (~0.5 GiB fixtures +
# derived indexes). Raw capture -> scaling_sf3_probe.md; adjudicated
# verdicts stay in scaling_sf3.md.
if [ "${ROUND_CLOSE_SF3:-1}" = 1 ]; then
  FREE_GB=$(df -BG --output=avail "$PWD" | tail -1 | tr -dc 0-9)
  if [ ! -d "$PWD/testdata_sf3" ] && [ "$FREE_GB" -lt 4 ]; then
    echo "FATAL: sf3 fixtures absent and only ${FREE_GB}G free (<4G) —" \
         "free disk or set ROUND_CLOSE_SF3=0 explicitly" | tee -a "$LOG"
    exit 1
  fi
  echo "--- sf3 probe (LIN-tail keys; self-builds fixtures if absent)" | tee -a "$LOG"
  python3 scripts/scaling_sf3.py 2>&1 | tail -8 | tee -a "$LOG"
fi
echo "=== round_close done end_load=$(cut -d' ' -f1 /proc/loadavg)" | tee -a "$LOG"
