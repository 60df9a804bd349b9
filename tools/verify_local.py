#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> [sfDir]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run already
(or run it yourself). Loads each <outDir>/<name> parquet result, runs the
matching oracle SQL from oracle_sql.json in DuckDB with views over the
sfDir parquet tables, sorts columns by name + rows by all columns, and
compares values.
"""
import json, sys, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def type_class(t):
    """Coarse Arrow type class. The driver's hash is type-sensitive, so an
    oracle emitting decimal128 where Spark dumps int64 hash-mismatches even
    when every value is equal (round-6 q70/q85/q89/q90/q93/q96/q101). Flag
    any cross-class divergence among the numeric classes; timestamps/strings
    are normalized by the driver so only their class identity matters."""
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_timestamp(t) or pa.types.is_date(t): return "time"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    return str(t)

def dtype_audit(name, files, oracle_arrow_schema):
    """Compare the Spark parquet dump's Arrow schema against the oracle's
    fetch_arrow_table() schema, per column name. Returns [] if clean."""
    spark_schema = pq.read_schema(files[0])
    spark_types = {f.name: f.type for f in spark_schema}
    bad = []
    for f in oracle_arrow_schema:
        if f.name not in spark_types:
            continue  # column-set mismatch reported separately
        sc, oc = type_class(spark_types[f.name]), type_class(f.type)
        if sc != oc:
            bad.append(f"col {f.name}: spark {spark_types[f.name]} ({sc}) "
                       f"vs oracle {f.type} ({oc})")
    return bad

def null_nan_audit(name, files, exp_arrow):
    """Per float column shared by both sides, compare the (null count,
    NaN count) pair between the Spark parquet dump and the oracle's Arrow
    table — order-independent, so it runs before any row sort. A NULL one
    engine computes where the other computes NaN shifts a count and is
    caught here even though pandas would canonicalize both to NaN."""
    import pyarrow.compute as pc
    spark_tbl = pq.read_table(files)
    bad = []
    for f in exp_arrow.schema:
        if not pa.types.is_floating(f.type) or f.name not in spark_tbl.schema.names:
            continue
        def counts(col):
            nulls = col.null_count
            nans = pc.sum(pc.is_nan(col.combine_chunks())).as_py() or 0
            return nulls, nans
        s, e = counts(spark_tbl.column(f.name)), counts(exp_arrow.column(f.name))
        if s != e:
            bad.append(f"col {f.name}: spark nulls/nans {s} vs oracle {e}")
    return bad

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            status = "WEAK " if len(got) > 0 else "FAIL "
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_weak += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp_arrow = con.execute(oracles[name]).fetch_arrow_table()
            exp = exp_arrow.to_pandas()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        dtype_bad = dtype_audit(name, files, exp_arrow.schema)
        if dtype_bad:
            print(f"FAIL  {name}: dtype divergence (driver hash is type-sensitive): "
                  + "; ".join(dtype_bad))
            n_fail += 1; continue
        # NULL vs computed-NaN divergence is invisible after .df()/.to_pandas()
        # (both map to NaN) but byte-visible to the driver: compare per-column
        # null/NaN counts on the ARROW tables before any pandas conversion.
        null_bad = null_nan_audit(name, files, exp_arrow)
        if null_bad:
            print(f"FAIL  {name}: NULL-vs-NaN divergence (driver hash sees it): "
                  + "; ".join(null_bad))
            n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        # compare cell-by-cell with dtype coercion via string round-trip for
        # timestamps, exact for the rest
        import pandas as pd
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                    a = pd.to_datetime(a).astype("datetime64[us]")
                    b = pd.to_datetime(b).astype("datetime64[us]")
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    bad = (~eq).idxmax()
                    print(f"FAIL  {name}: col {c} row {bad}: {a[bad]!r} != {b[bad]!r}")
                    ok = False; break
                # The driver's hash is BYTE-sensitive: pandas == treats
                # -0.0 == 0.0 and never compares NaN payloads, which let the
                # round-8 signed-zero regression (q186/q187) ship green
                # locally and red on the driver. Audit float columns at the
                # bit level.
                import numpy as np
                if getattr(a.dtype, "kind", "") == "f" and getattr(b.dtype, "kind", "") == "f":
                    # na_value keeps nullable Float64 extension columns from
                    # raising inside the audit (pd.NA has no float64 view)
                    av = a.to_numpy(dtype=np.float64, na_value=np.nan)
                    bv = b.to_numpy(dtype=np.float64, na_value=np.nan)
                    sz = (av == 0) & (bv == 0) & (np.signbit(av) != np.signbit(bv))
                    if sz.any():
                        i = int(np.argmax(sz))
                        print(f"FAIL  {name}: col {c} row {i}: signed-zero mismatch "
                              f"({av[i]!r} vs {bv[i]!r} — driver hash is byte-sensitive)")
                        ok = False; break
                    both_nan = np.isnan(av) & np.isnan(bv)
                    if both_nan.any():
                        ab = av.view(np.uint64); bb = bv.view(np.uint64)
                        nb = both_nan & (ab != bb)
                        if nb.any():
                            i = int(np.argmax(nb))
                            print(f"FAIL  {name}: col {c} row {i}: NaN bit-pattern mismatch "
                                  f"(0x{ab[i]:016x} vs 0x{bb[i]:016x})")
                            ok = False; break
            except Exception as ex:
                print(f"FAIL  {name}: col {c} compare error {ex} (dtypes {a.dtype} vs {b.dtype})")
                ok = False; break
        if ok:
            print(f"PASS  {name}: rows={len(g)}"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
