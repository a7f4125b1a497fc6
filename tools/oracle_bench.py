#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the fixture tables — the
same-window comparison SURVEY.md cites next to the Spark bench.

Usage: python3 tools/oracle_bench.py <sfdir> <dir_with_oracle_sql.json>
                                     [--budget SECONDS] [--offset N]

With --budget, queries run in NUMERIC name order (the bench's own
sequence order) until the budget is exhausted; the summary then carries
the covered-query list AND per-query times so a caller can sum the SAME
subset on the Spark side — a bounded same-window engine pair instead of
an unbounded run.

With --offset N, the numeric order is ROTATED to start at index
N mod len (wrapping) — the bench advances the offset each round so the
budgeted window accumulates coverage over the whole suite across rounds
(the heavy q7x+ tail included) instead of re-measuring q01-q5x forever.
"""
import sys, json, time, threading, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def qnum(name):
    d = ""
    for ch in name[1:]:
        if ch.isdigit():
            d += ch
        else:
            break
    return int(d) if d else 0


def main(sfdir, outdir, budget=None, offset=0):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; locally generated scale fixtures
        # (graft.DataGen) are multi-file directories -- glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ordered = sorted(oracle.items(), key=lambda kv: (qnum(kv[0]), kv[0]))
    if ordered and offset:
        k = offset % len(ordered)
        ordered = ordered[k:] + ordered[:k]
    total = 0.0
    times = {}
    start = time.time()
    # Hard deadline: the budget stops LAUNCHING queries, but a query
    # already running can take arbitrarily long (single heavy oracles
    # have measured 260+s on slow boxes) — without a bound the caller's
    # process watchdog kills us before the summary prints and the whole
    # window's measurements are lost. con.interrupt() cancels the
    # in-flight query at 2x budget; everything measured so far still
    # lands in the summary.
    timer = None
    if budget is not None:
        timer = threading.Timer(budget * 2 + 30, con.interrupt)
        timer.daemon = True
        timer.start()
    for name, sql in ordered:
        if budget is not None and time.time() - start > budget:
            break
        t0 = time.time()
        try:
            con.sql(sql).df()
            dt = time.time() - t0
        except Exception as e:
            if budget is not None and time.time() - start > budget:
                print(f"DEADLINE  {name} (interrupted, not counted)")
                break
            print(f"ERR  {name}: {e}")
            continue
        times[name] = round(dt, 3)
        total += dt
    if timer is not None:
        timer.cancel()
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{name:28s} {dt:8.3f}")
    rec = {"metric": "oracle_total", "value": round(total, 3),
           "unit": "sec", "n": len(times), "offset": offset, "sf": sfdir}
    if budget is not None:
        rec["covered"] = sorted(times)
        rec["times"] = times
    print(json.dumps(rec))


if __name__ == "__main__":
    budget = None
    offset = 0
    args = sys.argv[1:]
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--offset" in args:
        i = args.index("--offset")
        offset = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    main(args[0], args[1], budget, offset)
