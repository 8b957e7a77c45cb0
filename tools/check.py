#!/usr/bin/env python3
"""Local driver-mimic correctness check (dev tool, driver-side only).

Replays what the round driver does: for each SparkEntry.queries result
dumped by graft.Verify into OUTDIR/<name>/*.parquet, run the matching
oracle SQL (OUTDIR/oracle_sql.json) in DuckDB over the sf parquet tables,
then compare column-name-sorted, row-sorted values exactly.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — bit-level compare
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def baseline_caps(con):
    # Self-cap: keep the oracle's buffer pool small so a loaded host can't
    # drive this process into bad_alloc (r7: 10 rows lost to oracle OOM).
    # DuckDB spills to disk past the limit instead of aborting.
    # Re-applied before EVERY oracle: the self-capped queries' own
    # "SET memory_limit='2GB'; SET threads=2;" prologues persist on this
    # shared connection and would otherwise silently throttle all
    # subsequent (uncapped) oracles.
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=4")


def main(outdir, sfdir):
    con = duckdb.connect()
    baseline_caps(con)
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    seen_dirs = {d.rstrip("/").split("/")[-1]
                 for d in glob.glob(f"{outdir}/*/")}
    try:
        expected = set(json.load(open(f"{outdir}/query_names.json")))
    except FileNotFoundError:
        expected = seen_dirs | set(oracle)
    for name in sorted(expected - seen_dirs):
        results[name] = "MISSING_OUTPUT (query failed before writing)"
    # Type-lint EVERY registered oracle (not just dumped dirs) so an
    # uncast HUGEINT column is caught even on a subset re-dump.
    for name in sorted(oracle):
        try:
            baseline_caps(con)
            types = [str(t).upper()
                     for t in con.sql(oracle[name]).types]
        except Exception:
            continue  # execution errors surface per-dir below
        if any("HUGEINT" in t for t in types):
            results.setdefault(
                name, f"ORACLE_HUGEINT {types} — CAST to BIGINT")
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        # re-cap BEFORE the Spark-output read too: it runs outside the
        # oracle try/except, and a previous query's leaked 2GB/2-thread
        # prologue must not govern (or abort) this read
        baseline_caps(con)
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet({files!r})")
        s_cols = list(spark_rel.columns)
        s_rows = spark_rel.fetchall()
        if name not in oracle:
            results[name] = f"ROWS_ONLY ({len(s_rows)} rows)"
            continue
        try:
            baseline_caps(con)
            o_rel = con.sql(oracle[name])
            o_cols = list(o_rel.columns)
            o_types = [str(t).upper() for t in o_rel.types]
            o_rows = o_rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        # The driver's hash compare is type-aware: DuckDB HUGEINT (int128,
        # the default widening of sum()/count_if()) can never equal a Spark
        # BIGINT even when repr()-identical. Flag it here so the skew can't
        # hide behind repr canonicalization again (r4/r5 recurring red).
        huge = [f"{c}:{t}" for c, t in zip(o_cols, o_types)
                if "HUGEINT" in t]
        if huge:
            results[name] = (
                f"ORACLE_HUGEINT {huge} — CAST these to BIGINT in oracleSql")
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, or_ = canon(o_rows, o_cols)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(or_):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(or_)}"
        elif sr != or_:
            diffs = [(a, b) for a, b in zip(sr, or_) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK ({len(sr)} rows)"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_ro = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK','ROWS_ONLY')) else 'FAIL':5s} {k}: {results[k]}")
    print(f"\n{n_ok} oracle-OK, {n_ro} rows-only, "
          f"{len(results) - n_ok - n_ro} failing, {len(results)} total")
    return 0 if n_ok + n_ro == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
