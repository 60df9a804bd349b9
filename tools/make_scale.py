#!/usr/bin/env python3
"""Scale up the driver's synthetic tables by integer replication with
key-shifting — the TPC-H-style scale-out used for the sf1 bench.

Usage: python3 tools/make_scale.py <srcSfDir> <outDir> [factor=10]

Replica i shifts every entity key by i x base (base = a round decade above
the source max), so cardinalities scale with the factor and referential
integrity holds within each replica: joins, group counts, and per-entity
series keep the source's per-key distributions. Fixed dims (region,
nation) copy as-is. Text/embedding payloads replicate verbatim — dedup
and ANN queries see factor-sized duplicate groups, which is fine for a
like-for-like engine-vs-DuckDB timing (both sides read the same files).

Schema is preserved exactly (key + shift stays BIGINT; int32/timestamps
untouched) so both Spark's and DuckDB's readers see the driver's types.
"""
import os, sys
import duckdb

SHIFTS = {  # table -> {column: base}
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 10_000},
}
COPY_AS_IS = ["region", "nation"]


def main():
    src, out = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r.i * {shifts[c]} AS {c}" if c in shifts else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({factor}) r(i)) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows (x{factor})")


if __name__ == "__main__":
    main()
