#!/usr/bin/env python3
"""Local replica of the driver's t2 gate (SURVEY §5.2).

Usage:  python3 scripts/selfcheck.py [sfDir] [outDir] [query_name ...]

Reads outDir/oracle_sql.json (written by `sbt "runMain graft.Verify sfDir outDir"`),
registers the 10 fixture tables as DuckDB views over sfDir, and for every query
compares the Spark-written parquet against the oracle result: schema (column
names sorted), row count, and BIT-EXACT serialized values. Mirrors the driver:
columns sorted by name, rows sorted, then the SERIALIZED frame is compared —
NOT python float equality. The distinction matters: -0.0 == 0.0 under `==` but
they serialize (and so driver-hash) differently; r7's e12 shipped hash-red
through exactly that gap. Floats are compared via float.hex() (IEEE bit
pattern), so any representational divergence the driver would catch, this
catches too.
"""
import duckdb, json, sys, glob, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    """Serialize one value to a string whose equality == driver hash equality.
    float.hex() is bit-exact (distinguishes -0.0/0.0, 249.8912/249.8913);
    NaN canonicalized; everything else via str() like a serialized frame."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:%s" % v
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else "f:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return "v:%s" % (v,)

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(sqls):
        if only and name not in only:
            continue
        q = sqls[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: FAIL no spark output"); n_bad += 1; continue
        try:
            mine_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            mcols = mine_rel.columns
            theirs_rel = con.sql(q)
            tcols = theirs_rel.columns
            if sorted(mcols) != sorted(tcols):
                print(f"{name}: FAIL columns {sorted(mcols)} vs {sorted(tcols)}")
                n_bad += 1; continue
            # driver loads both sides into pandas and row-sorts before hashing:
            # nested output columns are unsortable there -> hard FAIL here too
            mtypes = dict(zip(mcols, [str(t) for t in mine_rel.types]))
            ttypes = dict(zip(tcols, [str(t) for t in theirs_rel.types]))
            nested = [c for c in mcols
                      if any(k in mtypes[c] or k in ttypes.get(c, "")
                             for k in ("[]", "STRUCT", "MAP", "LIST"))]
            if nested:
                print(f"{name}: FAIL nested output column(s) {nested} "
                      "(driver row-sort cannot order these)")
                n_bad += 1; continue
            # dtype drift (e.g. DuckDB SUM(int)->HUGEINT vs Spark LONG) hashes
            # differently driver-side even when values are equal. The int
            # family int8..int64 is pandas-normalized by the driver (e01/e02/
            # e08 hash-matched r1 with INTEGER-vs-BIGINT), so same-family
            # widths are fine; HUGEINT is NOT (d12 failed r1 on it).
            INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
            def kind(t):
                return "INT" if t in INTS else t
            drift = {c: (mtypes[c], ttypes[c]) for c in mcols
                     if kind(mtypes[c]) != kind(ttypes[c])}
            if drift:
                print(f"{name}: FAIL dtype drift {drift}")
                n_bad += 1; continue
            # driver sorts columns by name before hashing values
            mine = con.sql("SELECT " + ", ".join(f'"{c}"' for c in sorted(mcols))
                           + f" FROM '{out}/{name}/*.parquet'").fetchall()
            theirs = con.sql("SELECT " + ", ".join(f'"{c}"' for c in sorted(tcols))
                             + " FROM (" + q + ")").fetchall()
        except Exception as e:
            print(f"{name}: FAIL exception {e}"); n_bad += 1; continue
        if len(mine) != len(theirs):
            print(f"{name}: FAIL rowcount {len(mine)} vs {len(theirs)}")
            n_bad += 1; continue
        if len(mine) == 0:
            print(f"{name}: WARN empty result (counts match)")
        # driver row-sorts both frames before hashing — do the same, sorting
        # on the normalized serialization (orderable strings, null-safe)
        mine_n = sorted(tuple(map(norm, r)) for r in mine)
        theirs_n = sorted(tuple(map(norm, r)) for r in theirs)
        bad = None
        for i, (a, b) in enumerate(zip(mine_n, theirs_n)):
            if a != b:
                bad = (i, a, b); break
        if bad:
            i, a, b = bad
            print(f"{name}: FAIL row {i} (row-sorted):\n  spark : {a}\n  oracle: {b}")
            n_bad += 1
        else:
            print(f"{name}: OK ({len(mine)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
