#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Verify output.
Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

import pyarrow as pa

def arrow_family(t):
    """Collapse an arrow dtype to the equivalence class the driver's
    dtype-sensitive hash actually distinguishes: Python values erase integer
    width and float precision, but int64 vs decimal128 (the m_phash HUGEINT
    bug) and string vs binary DO hash differently."""
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "binary"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_family(t.value_type)}>"
    return str(t)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            # Type-tag scalars: the driver's hash is dtype-sensitive, so
            # int64 123 vs float64 123.0 must NOT compare equal here.
            if isinstance(v, bool):
                v = ('b', v)
            elif isinstance(v, float):
                v = round(v, 9)
                if v == -0.0: v = 0.0
                v = ('f', v)
            elif isinstance(v, int):
                v = ('i', v)
            if isinstance(v, list):
                v = tuple(round(x,9) if isinstance(x,float) else x for x in v)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    # one execution per side: rows AND the arrow schema both come from a
    # single .arrow() materialization (re-running expensive oracles for the
    # schema alone would double the check's DuckDB work)
    def rows_cols_arrow(rel):
        tbl = rel.arrow()
        fam = {f.name: arrow_family(f.type) for f in tbl.schema}
        data = [c.to_pylist() for c in tbl.columns]
        return list(zip(*data)) if data else [], list(tbl.schema.names), fam
    try:
        s_rows, s_cols, s_arrow = rows_cols_arrow(
            con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
        d_rows, d_cols, d_arrow = rows_cols_arrow(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1; continue
    sc, scol = canon(s_rows, s_cols)
    dc, dcol = canon(d_rows, d_cols)
    if scol != dcol:
        print(f"FAIL {name}: columns spark={scol} duck={dcol}"); fails += 1; continue
    # The driver's hash is arrow-dtype-sensitive (int64 vs decimal128 of equal
    # values hash differently); python values erase that, so compare the arrow
    # schemas too — this is the blind spot that hid the m_phash HUGEINT bug.
    dtype_bad = {c: (s_arrow.get(c), d_arrow.get(c)) for c in scol
                 if s_arrow.get(c) != d_arrow.get(c)}
    if dtype_bad:
        print(f"FAIL {name}: arrow dtypes differ (spark, duck): {dtype_bad}")
        fails += 1; continue
    if len(sc) != len(dc):
        print(f"FAIL {name}: rows spark={len(sc)} duck={len(dc)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(sc, dc) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(sc)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
        fails += 1; continue
    print(f"OK   {name}: {len(sc)} rows")

# rows-only queries
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n} rows{'  (!! EMPTY)' if n==0 else ''}")
        except Exception as e:
            print(f"ROWS {d}: unreadable: {e}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
