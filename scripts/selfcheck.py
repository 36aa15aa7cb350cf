#!/usr/bin/env python3
"""Local dev mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same fixture
parquet tables, sorts columns by name, and compares row-by-row values.
Dev-only tooling — not part of the shipped library.
"""
import os, sys, json, glob, math, datetime, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]

def norm(v):
    # STRICT: no Decimal.normalize() — the driver's hasher sees the raw
    # per-engine decimal representation, and normalize() erased exactly the
    # differences that hash-failed 17 round-1 queries. A Decimal anywhere in
    # a final output schema is now itself a defect (Verify enforces this on
    # the Spark side; str(v) keeps it visible here on the oracle side too).
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, list):
        return ("list", tuple(norm(x) for x in v))
    return (type(v).__name__, v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # Let blocking operators spill (r20): the q215 replay at the 500k-doc
    # exact fixture runs a 832M-row minhash aggregate (26M shingles x 32
    # perms) that OOM'd DuckDB's in-memory default; with a temp_directory
    # and a bounded memory_limit it goes out-of-core and completes.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # ~75% of physical RAM, not a hard-coded 48GB (ADVICE r20): DuckDB
    # accepts limits above physical memory, so on a smaller box the
    # out-of-core guard would stop guarding and the big replays (the
    # 832M-row q215 500k fixture) could OOM/swap-thrash. Env override
    # for deliberate experiments; this box derives to ~96GB of 128GiB.
    def _mem_limit():
        env = os.environ.get("SELFCHECK_MEM_LIMIT")
        if env:
            return env
        try:
            kb = int(next(l for l in open("/proc/meminfo")
                          if l.startswith("MemTotal")).split()[1])
            return f"{max(1, kb * 3 // 4 // (1024 * 1024))}GB"
        except Exception:
            return "48GB"
    con.execute(f"SET memory_limit='{_mem_limit()}'")
    # NB: events is exposed RAW (ts = TIMESTAMP_NS), like the driver does;
    # oracle SQL must CAST(ts AS TIMESTAMP) itself to match Spark's loader.
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output");  n_bad += 1; continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = list(got_rel.columns)
            got = got_rel.fetchall()
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[COLS] {name}: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_bad += 1; continue
        # Declared result types: a DECIMAL anywhere (either side, matching
        # or not) is a hard failure — the driver's hasher canonicalizes
        # decimals differently per engine, and value equality alone can't
        # see a decimal column whose values are all NULL. Other type diffs
        # (e.g. TIMESTAMP vs TIMESTAMPTZ from parquet UTC adjustment) are
        # canonicalized by the driver's hasher, so warn only.
        gtypes = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
        etypes = {c: str(t) for c, t in zip(exp_cols, exp_rel.types)}
        decs = {c: (gtypes[c], etypes[c]) for c in gtypes
                if "DECIMAL" in gtypes[c] or "DECIMAL" in etypes[c]}
        if decs:
            print(f"[TYPE] {name}: DECIMAL in result surface {decs}")
            n_bad += 1; continue
        tdiff = {c: (gtypes[c], etypes[c]) for c in gtypes if gtypes[c] != etypes[c]}
        if tdiff:
            print(f"[warn] {name}: type diff (driver canonicalizes): {tdiff}")
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        grows = [tuple(norm(r[i]) for i in gperm) for r in got]
        erows = [tuple(norm(r[i]) for i in eperm) for r in exp]
        if len(grows) != len(erows):
            print(f"[ROWS] {name}: spark={len(grows)} oracle={len(erows)}")
            n_bad += 1; continue
        diff = next((i for i, (g, e) in enumerate(zip(grows, erows)) if g != e), None)
        if diff is not None:
            print(f"[DIFF] {name}: first diff at row {diff}")
            print(f"   cols : {sorted(got_cols)}")
            print(f"   spark: {grows[diff]}")
            print(f"   duck : {erows[diff]}")
            n_bad += 1; continue
        print(f"[ OK ] {name}: {len(grows)} rows")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
