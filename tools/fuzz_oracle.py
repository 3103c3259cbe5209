#!/usr/bin/env python3
"""DuckDB side of DifferentialFuzzSpec.

Reads a JSON file {name: sql}, runs each query in DuckDB over the
parquet fixture tables, and writes {name: {"rows": [canonical-row...]}}
(or {"error": msg}). Row canonicalization MUST match the Scala side:
cells joined by \\u0001, rows sorted lexicographically.

Usage: fuzz_oracle.py <sfdir> <queries.json> <out.json>
"""
import json
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return f"{v:f}"
    return str(v)


def main():
    sfdir, qfile, ofile = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    queries = json.load(open(qfile))
    out = {}
    for name, sql in queries.items():
        try:
            rows = con.execute(sql).fetchall()
            canon = sorted("\u0001".join(cell(c) for c in r) for r in rows)
            out[name] = {"rows": canon}
        except Exception as e:  # noqa: BLE001 - report, don't crash the run
            out[name] = {"error": str(e).split("\n")[0]}
    json.dump(out, open(ofile, "w"))


if __name__ == "__main__":
    main()
