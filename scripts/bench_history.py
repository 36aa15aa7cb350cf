#!/usr/bin/env python3
"""Cross-round per-key bench history (VERDICT r15 item 4).

The judging rule for bench regressions is per-key MINIMA across round
records (box load swings totals 2-3x; see SURVEY §6 and the r14/r15
q84/q55 episodes). Until now applying that rule meant hand-reading
bench JSONs out of git history. This tool makes it mechanical:

  seed                    walk git history of bench_out/last_run.json +
                          bench_out/bench_sf1.json and (re)build
                          bench_out/history.jsonl from every committed
                          capture (idempotent: dedups on (source, sf)).
  append <json> [label]   append one live capture to history.jsonl.
  report <json>           compare a capture against per-key minima at
                          the same scale; FLAG only vs the minima of
                          the most recent 8 prior captures (>1.5x AND
                          >0.2 s absolute — older captures predate
                          protocol changes like the local[4]->local[32]
                          switch and per-key semantic changes like
                          q44/q164 going probe-only, so all-time minima
                          over-flag); write BOTH windows' minima to
                          bench_out/minima_sf<scale>.json. Per-key
                          values < 0 are failure sentinels, never
                          minima (the ADVICE r15 failed-capture class).

Dev-side tooling like selfcheck.py — NOT part of the shipped library.
"""
import json, os, subprocess, sys, datetime

HIST = "bench_out/history.jsonl"


def norm_sf(d):
    """Normalize the bench record's 'sf' field to a scale label.

    sf0.1 records carry 0.1 / "0.1" / a /root/testdata/sf0.1 path;
    sf1 records carry the testdata_sf1 path (incl. the r12 episode
    where an sf1 run clobbered last_run.json — normalizing by field,
    not by filename, classifies those correctly). sf3 probes carry a
    testdata_sf3 path.
    """
    s = str(d.get("sf", ""))
    if "testdata_sf3" in s:
        return "3"
    if "testdata_sf1" in s:
        return "1"
    for tag in ("0.001", "0.01", "0.1"):
        if s.endswith(tag) or s == tag:
            return tag
    return s or "unknown"


def row_from(d, source):
    return {
        "source": source,
        "sf": norm_sf(d),
        "start_load": d.get("start_load"),
        "load_avg": d.get("load_avg"),
        # multi-core box-phase stamps (VERDICT r18 item 3): the
        # load-invisible ~1.7x throughput phase is only adjudicable if
        # every capture records which phase it ran in
        "phase_canary": d.get("phase_canary"),
        "phase_canary_end": d.get("phase_canary_end"),
        "failed": d.get("failed"),
        "value": d.get("value"),
        "queries": d.get("queries", {}),
    }


def load_hist():
    if not os.path.exists(HIST):
        return []
    return [json.loads(l) for l in open(HIST) if l.strip()]


def save_hist(rows):
    os.makedirs("bench_out", exist_ok=True)
    with open(HIST, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")


def seed():
    rows = load_hist()
    seen = {(r["source"], r["sf"]) for r in rows}
    for path in ("bench_out/last_run.json", "bench_out/bench_sf1.json"):
        commits = subprocess.run(
            ["git", "log", "--format=%H %cI", "--", path],
            capture_output=True, text=True, check=True
        ).stdout.split("\n")
        for line in filter(None, commits):
            commit, date = line.split(" ", 1)
            blob = subprocess.run(
                ["git", "show", f"{commit}:{path}"],
                capture_output=True, text=True)
            if blob.returncode != 0:
                continue
            try:
                d = json.loads(blob.stdout)
            except json.JSONDecodeError:
                continue
            src = f"git:{commit[:10]}:{os.path.basename(path)}"
            r = row_from(d, src)
            r["committed"] = date
            if (src, r["sf"]) in seen:
                continue
            seen.add((src, r["sf"]))
            rows.append(r)
    save_hist(rows)
    print(f"history.jsonl: {len(rows)} captures "
          f"({sum(1 for r in rows if r['sf'] == '0.1')} at sf0.1, "
          f"{sum(1 for r in rows if r['sf'] == '1')} at sf1)")


def append(path, label=None):
    d = json.load(open(path))
    rows = load_hist()
    r = row_from(d, label or f"live:{os.path.basename(path)}")
    r["captured"] = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    # Re-running a close re-appends the same capture; dedup on content so
    # duplicate live rows don't consume recent-window slots.
    dup = [i for i, p in enumerate(rows)
           if p["source"] == r["source"] and p["sf"] == r["sf"]
           and p["queries"] == r["queries"]]
    for i in reversed(dup):
        del rows[i]
    rows.append(r)
    save_hist(rows)
    verb = "refreshed" if dup else "appended"
    print(f"history.jsonl: {verb} {r['source']} sf{r['sf']} "
          f"({len(r['queries'])} keys, start_load={r['start_load']})")


RECENT_WINDOW = 8


def minima_of(rows):
    m = {}
    for r in rows:
        for k, v in r["queries"].items():
            if v is None or v < 0:  # failure sentinel, never a minimum
                continue
            if k not in m or v < m[k][0]:
                m[k] = (v, r["source"])
    return m


def utc_key(r):
    """Chronological sort key: committed (%cI, committer-local offset) and
    captured (UTC) strings must be compared as instants, not lexically."""
    s = r.get("committed") or r.get("captured")
    if not s:
        return datetime.datetime.min.replace(tzinfo=datetime.timezone.utc)
    try:
        return datetime.datetime.fromisoformat(s).astimezone(
            datetime.timezone.utc)
    except ValueError:
        return datetime.datetime.min.replace(tzinfo=datetime.timezone.utc)


def report(path):
    d = json.load(open(path))
    sf = norm_sf(d)
    cur = d.get("queries", {})
    prior = sorted(
        (r for r in load_hist()
         if r["sf"] == sf and r.get("queries") != cur),
        key=utc_key)
    recent = prior[-RECENT_WINDOW:]
    m_all, m_recent = minima_of(prior), minima_of(recent)
    mpath = f"bench_out/minima_sf{sf}.json"
    json.dump({k: {"min_recent": m_recent.get(k, (None,))[0],
                   "min_all": m_all[k][0], "src_all": m_all[k][1]}
               for k in sorted(m_all)}, open(mpath, "w"), indent=1)
    flagged = []
    for k, v in sorted(cur.items()):
        if k not in m_recent:
            continue
        m, src = m_recent[k]
        if v > 1.5 * m and v - m > 0.2:
            flagged.append((k, m, v, src))
    # phase context (VERDICT r18 item 3): the capture's own canary plus
    # each flag's minimum-source canary — a flag whose capture ran in a
    # slower phase than its minimum's capture is phase, not code
    def canary_str(row):
        c, ce = row.get("phase_canary"), row.get("phase_canary_end")
        if c is None:
            return "canary=?"
        return f"canary={c}" + (f"/{ce}" if ce is not None else "")
    src_canary = {r["source"]: canary_str(r) for r in prior}
    print(f"[bench-history] sf{sf}: {len(cur)} keys vs per-key minima "
          f"of the {len(recent)} most recent prior captures "
          f"(of {len(prior)} total) -> {mpath} [{canary_str(d)}]")
    if flagged:
        print(f"[bench-history] {len(flagged)} keys >1.5x their "
              f"recent-window minimum (minima rule — re-capture idle "
              f"before calling any of these a regression):")
        for k, m, v, src in flagged:
            print(f"  {k}: {v} s vs min {m} s ({v/m:.2f}x, min from "
                  f"{src} [{src_canary.get(src, 'canary=?')}])")
    else:
        print("[bench-history] zero keys above 1.5x their "
              "recent-window cross-round minimum")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "seed":
        seed()
    elif cmd == "append":
        append(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
    elif cmd == "report":
        report(sys.argv[2])
    else:
        sys.exit(__doc__)
