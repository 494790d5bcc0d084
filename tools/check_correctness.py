"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB (same parquet tables as pre-registered views), comparing:
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name_filter ...]
                                         [--json out.json]

``--json`` additionally writes a per-query artifact (status, rows,
value hash, wall seconds) — the durable record of a full-registry run.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    """Render a cell deterministically across engines."""
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print(__doc__.strip().splitlines()[0])
            print("usage: check_correctness.py [sf_dir] [filter ...] --json OUT")
            sys.exit(2)
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]

    import duckdb

    import __spark_entry__ as entrymod
    from utxo_to_parquet_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if name_filter:
        qs = {k: v for k, v in qs.items() if any(f in k for f in name_filter)}

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    records = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "err", "err": traceback.format_exc()[-300:]}
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            records[name] = {
                "status": "rows_only",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            records[name] = {"status": "err", "err": traceback.format_exc()[-300:]}
            continue
        sn, sh = table_hash(scols, srows)
        dn, dh = table_hash(dcols, drows)
        schema_ok = sorted(scols) == sorted(dcols)
        records[name] = {
            "status": "pass" if (sn == dn and sh == dh and schema_ok) else "fail",
            "rows": sn,
            "hash": sh,
            "sec": round(time.time() - t0, 1),
        }
        if sn == dn and sh == dh and schema_ok:
            print(f"PASS  {name}: {sn} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: spark({sn} rows, {sh}, cols={sorted(scols)})"
                f" vs duckdb({dn} rows, {dh}, cols={sorted(dcols)})"
            )
            # show a few differing lines to debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(normalize(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(normalize(r[i]) for i in order_d) for r in drows)
            only_s = [x for x in ls if x not in set(ld)][:3]
            only_d = [x for x in ld if x not in set(ls)][:3]
            for x in only_s:
                print(f"      spark-only: {x[:200]}")
            for x in only_d:
                print(f"      duck-only:  {x[:200]}")
            n_fail += 1
            failures.append(name)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
