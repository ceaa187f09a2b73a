#!/usr/bin/env python
"""Interleaved Spark/DuckDB re-base with dispersion (VERDICT r12 ask #3).

The single-shot re-base ritual's cross-round movement (0.98x -> 1.18x) sat
entirely inside this VM's measurement noise, but the ritual could not SAY so
with numbers. This runs N alternating pass PAIRS — one fresh-JVM Spark
Bench pass, then one DuckDB pass, repeated — so host drift lands on both
systems symmetrically, and reports per-query median +/- IQR plus the
total-ratio median +/- IQR over the per-pair ratios.

  python tools/interleave.py <sfDir> <verifyOutDir> [nPairs=5] [outMd]

verifyOutDir must hold oracle_sql.json (a graft.Verify dump). Emits a
markdown table on stdout (and to outMd if given) ready for PERF.md.
"""
import json
import os
import statistics
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_pass(sf_dir, repo):
    # 3 in-JVM passes, Bench reports the per-query MEDIAN — the same
    # steady-state methodology as the round ritual (and as the DuckDB leg,
    # whose timed run follows a warm run). PASSES=1 was tried first and
    # systematically inflated Spark ~35%: the first timed pass after the
    # warm pass still pays JIT/page-cache ramp (r12 raw passes show
    # pass1 ~1.3-2x pass3), so single-pass interleaving measures the ramp,
    # not the engine.
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_PASSES="3")
    out = subprocess.run([f"{repo}/tools/run.sh", "graft.Bench"], env=env,
                         capture_output=True, text=True, cwd=repo)
    line = [l for l in out.stdout.splitlines()
            if l.startswith('{"metric":"total"')][-1]
    return json.loads(line)["queries"]


def duck_pass(sf_dir, oracles, names):
    con = duckdb.connect()
    con.sql("PRAGMA threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    times = {}
    for name in names:
        sql = oracles[name]
        try:
            con.sql(sql).fetchall()  # warm: plan + buffer cache
            t0 = time.time()
            con.sql(sql).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = -1.0
            print(f"  ERROR {name}: {str(e)[:120]}", file=sys.stderr)
    con.close()
    return times


def med_iqr(xs):
    xs = sorted(xs)
    med = statistics.median(xs)
    if len(xs) < 4:
        return med, max(xs) - min(xs)
    q = statistics.quantiles(xs, n=4)
    return med, q[2] - q[0]


def main(sf_dir, out_dir, n_pairs=5, out_md=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_runs, duck_runs = [], []
    names = None
    for i in range(n_pairs):
        print(f"[interleave] pair {i + 1}/{n_pairs}: spark ...", file=sys.stderr)
        s = spark_pass(sf_dir, repo)
        if names is None:
            names = sorted(set(s) & set(oracles))
        print(f"[interleave] pair {i + 1}/{n_pairs}: duckdb ...", file=sys.stderr)
        d = duck_pass(sf_dir, oracles, names)
        spark_runs.append(s)
        duck_runs.append(d)
        # .get(-1.0): a pass that omits a query (timed-out/failed drop
        # from the medians map) degrades to 'not comparable' instead of
        # a KeyError losing the whole run at reporting (ADVICE r13)
        st = sum(s[n] for n in names if s.get(n, -1.0) >= 0 and d.get(n, -1.0) >= 0)
        dt = sum(d[n] for n in names if s.get(n, -1.0) >= 0 and d.get(n, -1.0) >= 0)
        print(f"[interleave] pair {i + 1}: spark={st:.2f}s duckdb={dt:.2f}s "
              f"ratio={st / dt:.3f}", file=sys.stderr)

    ok = [n for n in names
          if all(r.get(n, -1.0) >= 0 for r in spark_runs)
          and all(r.get(n, -1.0) >= 0 for r in duck_runs)]
    lines = ["| query | spark med ± IQR (s) | duckdb med ± IQR (s) | ratio |",
             "|---|---|---|---|"]
    s_tot_med = d_tot_med = 0.0
    for n in ok:
        sm, siq = med_iqr([r[n] for r in spark_runs])
        dm, diq = med_iqr([r[n] for r in duck_runs])
        s_tot_med += sm
        d_tot_med += dm
        lines.append(f"| {n} | {sm:.3f} ± {siq:.3f} | {dm:.3f} ± {diq:.3f} "
                     f"| {sm / dm if dm > 0 else float('nan'):.2f}× |")
    pair_ratios = []
    for s, d in zip(spark_runs, duck_runs):
        st = sum(s[n] for n in ok)
        dt = sum(d[n] for n in ok)
        pair_ratios.append(st / dt)
    rm, riq = med_iqr(pair_ratios)
    lines.append(f"| **total ({len(ok)} comparable)** | **{s_tot_med:.2f}** "
                 f"| **{d_tot_med:.2f}** | **{rm:.2f}× ± {riq:.2f}** |")
    lines.append("")
    lines.append(f"per-pair interleaved ratios: "
                 f"{', '.join(f'{r:.3f}' for r in pair_ratios)} — "
                 f"median {rm:.3f}, IQR {riq:.3f}")
    md = "\n".join(lines)
    print(md)
    if out_md:
        with open(out_md, "w") as f:
            f.write(md + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 5,
         sys.argv[4] if len(sys.argv) > 4 else None)
