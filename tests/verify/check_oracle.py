"""Local replica of the driver's DuckDB oracle gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares row
count, sorted column names, and an order-insensitive value hash against the
matching ``oracle_sql()`` run in DuckDB. Usage:

    python tests/verify/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(selected):
    import __spark_entry__ as entrymod
    from inform_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if selected and name not in selected:
            continue
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_wall = time.monotonic() - t0
        release = getattr(entrymod, "release_caches", None)
        if release:
            release()
        if name not in oracles:
            print(f"{name:24s} rows={len(rows):6d} ({spark_wall:5.1f}s) [rows-only, no oracle]")
            if len(rows) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            continue
        ocur = con.execute(oracles[name])
        ocols = [d[0] for d in ocur.description]
        orows = ocur.fetchall()
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(cols)} oracle={sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount: spark={len(rows)} oracle={len(orows)}")
        if not problems:
            hs = value_hash(rows, cols)
            ho = value_hash(orows, ocols)
            if hs != ho:
                problems.append(f"valuehash: spark={hs} oracle={ho}")
                # show a diff sample
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(norm_cell(r[i]) for i in order_s) for r in rows)
                lo = sorted("\x1f".join(norm_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"  spark : {a[:160]}")
                        print(f"  oracle: {b[:160]}")
                        break
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:24s} rows={len(rows):6d} ({spark_wall:5.1f}s) {status}")
        if problems:
            failures.append((name, problems))
    print()
    if failures:
        print(f"FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main(set(sys.argv[1:]))
