#!/usr/bin/env python
"""DuckDB-side timing for the single-node comparison re-base.

Times every oracle SQL from a Verify dump (warm pass untimed, second run
timed — mirroring graft.Bench's steady-state methodology) against the
parquet tables of a given sf dir, then, if given a Bench JSON line, prints
the per-query and total comparison.

  python tools/rebase.py <sfDir> <verifyOutDir> [benchJson]
"""
import sys, os, json, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir, bench_json=None):
    con = duckdb.connect()
    con.sql("PRAGMA threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.sql(sql).fetchall()          # warm: plan + cache
            t0 = time.time()
            con.sql(sql).fetchall()
            times[name] = round(time.time() - t0, 4)
        except Exception as e:
            times[name] = -1.0
            print(f"  ERROR {name}: {str(e)[:120]}", file=sys.stderr)
    print(json.dumps({"sf": sf_dir, "queries": times,
                      "total": round(sum(v for v in times.values() if v >= 0), 3)}))
    if bench_json:
        spark = json.load(open(bench_json))["queries"]
        both = sorted(set(times) & set(spark))
        comparable = [n for n in both if times[n] >= 0 and spark[n] >= 0]
        ts = sum(spark[n] for n in comparable)
        td = sum(times[n] for n in comparable)
        print(f"== comparable={len(comparable)} spark={ts:.2f}s duckdb={td:.2f}s "
              f"ratio={ts/td:.2f}x", file=sys.stderr)
        worst = sorted(comparable, key=lambda n: spark[n] - times[n], reverse=True)
        for n in worst[:12]:
            print(f"   {n:28s} spark={spark[n]:6.2f} duckdb={times[n]:6.2f}",
                  file=sys.stderr)
        ahead = [n for n in comparable if spark[n] < times[n]]
        print(f"   spark ahead outright on {len(ahead)}: "
              f"{', '.join(sorted(ahead))}", file=sys.stderr)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
