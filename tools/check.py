#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Reads outdir/<name>/ parquet (written by graft.Verify) and
outdir/oracle_sql.json, runs each oracle SQL in DuckDB with views
registered for every testdata table, and compares: schema (column
names sorted), row count, and value hash (rows sorted, floats kept
as-is since both sides round explicitly).
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    h = hashlib.md5()
    for r in out:
        h.update("|".join(r).encode())
    return h.hexdigest()


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    produced = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*")
                if not p.endswith(".json")}
    for name in sorted(produced):
        if name not in oracle:
            print(f"  ~ {name}: rows-only (no oracle)")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(oracle[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"  ✗ {name}: ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        # The driver's fetch path renders DuckDB HUGEINT (int128, the
        # default sum() result for integer inputs) as float64 → hash
        # mismatch even when values agree. Flag it locally via
        # DESCRIBE (cursor description only says NUMBER).
        desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        huge = [c for c, t in [(d[0], d[1]) for d in desc]
                if "HUGEINT" in t.upper() or "INT128" in t.upper()]
        if huge:
            print(f"  ✗ {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"CAST(... AS BIGINT) in the oracle SQL")
            n_fail += 1
            continue
        # Array/map/struct output cells break the driver's pandas
        # sort (`unhashable type: numpy.ndarray` — r7's
        # q_glossary_refs) even when values agree. Reject them on
        # BOTH sides, same spirit as the HUGEINT guard.
        def complex_cols(d):
            return [c for c, t in [(x[0], x[1].upper()) for x in d]
                    if "[]" in t or t.startswith("STRUCT")
                    or t.startswith("MAP")]
        sdesc = con.execute(
            f"DESCRIBE (SELECT * FROM '{outdir}/{name}/*.parquet')"
        ).fetchall()
        bad = [(side, cols) for side, cols in
               [("oracle", complex_cols(desc)),
                ("spark", complex_cols(sdesc))] if cols]
        if bad:
            for side, cols in bad:
                print(f"  ✗ {name}: {side} emits non-scalar column(s) "
                      f"{cols} — the driver comparator cannot sort "
                      f"them; array_join/array_to_string instead")
            n_fail += 1
            continue
        ok_schema = sorted(gcols) == sorted(wcols)
        ok_rows = len(grows) == len(wrows)
        ok_hash = ok_schema and ok_rows and \
            canon(grows, gcols) == canon(wrows, wcols)
        if ok_hash:
            print(f"  ✓ {name}: {len(grows)} rows")
            n_pass += 1
        else:
            print(f"  ✗ {name}: schema={ok_schema} ({sorted(gcols)} vs "
                  f"{sorted(wcols)}) rows={len(grows)}/{len(wrows)} "
                  f"hash={ok_hash}")
            if ok_schema and grows and wrows:
                gs = sorted(tuple(map(repr, r)) for r in grows)[:3]
                ws = sorted(tuple(map(repr, r)) for r in wrows)[:3]
                for a, b in zip(gs, ws):
                    if a != b:
                        print(f"      got  {a}\n      want {b}")
            n_fail += 1
    missing = set(oracle) - produced
    for m in sorted(missing):
        print(f"  ✗ {m}: oracle present but no spark output")
        n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
