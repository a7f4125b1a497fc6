#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the fixture tables — the
same-window comparison SURVEY.md cites next to the Spark bench.

Usage: python3 tools/oracle_bench.py <sfdir> <verify_outdir_with_oracle_json>
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).df()
            dt = time.time() - t0
        except Exception as e:
            print(f"ERR  {name}: {e}")
            continue
        times[name] = round(dt, 3)
        total += dt
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:28s} {dt:8.3f}")
    print(json.dumps({"metric": "oracle_total", "value": round(total, 3),
                      "unit": "sec", "n": len(times), "sf": sfdir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
