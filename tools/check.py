#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Reads outdir/<name>/ parquet (written by graft.Verify) and runs
outdir/oracle_sql.json in DuckDB over the same sf dir, then compares
rowcount / column names / dtypes / cell values (exact; NaN==NaN).

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import sys, json, math, datetime, os

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(cell_eq(a[k], b[k]) for k in a)
    # numpy arrays from fetch
    if hasattr(a, "tolist"):
        a = a.tolist()
    if hasattr(b, "tolist"):
        b = b.tolist()
        return cell_eq(a, b)
    return a == b


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # large-SF runs (ScaleUp sf1): bound DuckDB's memory so heavy oracle
    # joins spill to disk instead of tripping the container OOM killer
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp output (sf1
        # scale passes) is a Spark directory of part files — glob it
        p = f"{SFDIR}/{t}.parquet"
        if os.path.isdir(p):
            p += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))
    try:
        verr = json.load(open(f"{OUTDIR}/errors.json"))
    except Exception:
        verr = {}
    n_pass = n_fail = 0
    # name -> record for the optional CHECK_JSON_OUT artifact (the sf1
    # CORRECTNESS-style run): pass = cell-exact rows+columns match.
    results = {}

    def record(name, ok, spark_rows=None, oracle_rows=None, err=None):
        results[name] = {"pass": ok, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}
    # Errors for queries with no oracle entry (rows-only checks) would
    # otherwise be invisible to this loop — report them first.
    for name in sorted(set(verr) - set(oracle)):
        if ONLY and name not in ONLY:
            continue
        print(f"FAIL {name}: query errored (no oracle): {verr[name][:200]}")
        record(name, False, err=verr[name][:500])
        n_fail += 1
    for name in sorted(oracle):
        if ONLY and name not in ONLY:
            continue
        if name in verr:
            print(f"FAIL {name}: query errored: {verr[name][:200]}")
            record(name, False, err=verr[name][:500])
            n_fail += 1
            continue
        sql = oracle[name]
        try:
            srel = con.execute(
                f"SELECT * FROM read_parquet('{OUTDIR}/{name}/*.parquet')")
            scols, stypes = [d[0] for d in srel.description], [d[1] for d in srel.description]
            srows = srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            record(name, False, err=str(e)[:500])
            n_fail += 1
            continue
        try:
            orel = con.execute(sql)
            ocols, otypes = [d[0] for d in orel.description], [d[1] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, err=str(e)[:500])
            n_fail += 1
            continue

        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        if [scols[i] for i in sidx] != [ocols[i] for i in oidx]:
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            record(name, False, len(srows), len(orows), "column mismatch")
            n_fail += 1
            continue
        ok = True
        st = [stypes[i] for i in sidx]
        ot = [otypes[i] for i in oidx]
        if st != ot:
            print(f"WARN {name}: dtypes {st} vs {ot}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            record(name, False, len(srows), len(orows), "rowcount mismatch")
            n_fail += 1
            continue
        for r, (sr, orow) in enumerate(zip(srows, orows)):
            srt = [sr[i] for i in sidx]
            ort = [orow[i] for i in oidx]
            if not cell_eq(srt, ort):
                bad = [(scols[sidx[i]], srt[i], ort[i]) for i in range(len(srt))
                       if not cell_eq(srt[i], ort[i])]
                print(f"FAIL {name}: row {r} differs: {bad[:3]}")
                ok = False
                break
        record(name, ok, len(srows), len(orows),
               None if ok else "cell mismatch")
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    out = os.environ.get("CHECK_JSON_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"sfdir": SFDIR, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
