#!/usr/bin/env python3
"""Per-oracle DuckDB timing at a given SF — the like-for-like baseline for
BENCH comparisons (the judge flags any engine query > 2x its DuckDB twin).

Usage: python3 tools/time_oracles.py <outDir-with-oracle_sql.json> [sfDir] [bench.json] [subset] [timeout_s]

subset: comma-separated name substrings (time only matching oracles).
timeout_s: per-attempt cap (connection.interrupt from a timer); a timed-out
oracle records NaN — at sf1 a few oracle-REPLAY twins (q29's 54s at sf0.1
class) are pathological in SQL while the engine form is not.

Prints per-query DuckDB seconds; with a bench JSON (Bench's one-line output)
also prints the engine/duck ratio sorted worst-first.
"""
import json, os, sys, time, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    bench = json.load(open(sys.argv[3]))["queries"] if len(sys.argv) > 3 and sys.argv[3] != "-" else {}
    subset = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    timeout_s = float(sys.argv[5]) if len(sys.argv) > 5 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    rows = []
    for name in sorted(oracles):
        if subset and not any(sub in name for sub in subset):
            continue
        best = None
        for _ in range(2):  # min of two, mirroring Bench
            t0 = time.time()
            timer = None
            if timeout_s:
                timer = threading.Timer(timeout_s, con.interrupt)
                timer.start()
            try:
                con.execute(oracles[name]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                dt = float("nan")
                best = dt if best is None else best
                print(f"ERR {name}: {str(e)[:120]}", flush=True)
                break
            finally:
                if timer:
                    timer.cancel()
            best = dt if best is None else min(best, dt)
            if dt > 60:
                break  # long queries: one attempt, noise is proportionally small
        if best is None:
            best = float("nan")
        print(f"  {name}: {best:.3f}s", flush=True)
        rows.append((name, best))
        json.dump(dict(rows), open(os.path.join(out, "duck_times.json"), "w"))
    total = sum(r[1] for r in rows if r[1] == r[1])
    print(f"duckdb total {total:.1f}s over {len(rows)} queries  sf={sf}")
    print(f"per-query times -> {os.path.join(out, 'duck_times.json')}")
    if bench:
        ratio = [(n, bench.get(n), d, (bench.get(n, 0) / d if d and d > 0.0 else None))
                 for n, d in rows]
        ratio.sort(key=lambda r: -(r[3] or 0))
        print(f"engine total {sum(v for v in bench.values()):.1f}s")
        print("worst engine/duck ratios:")
        for n, e, d, r in ratio[:20]:
            print(f"  {n}: engine={e}s duck={d:.3f}s ratio={r:.2f}" if r else f"  {n}: duck={d}")
    else:
        for n, d in sorted(rows, key=lambda r: -(r[1] or 0))[:20]:
            print(f"  {n}: {d:.3f}s")


if __name__ == "__main__":
    main()
