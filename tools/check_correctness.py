"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB against the
same parquet tables, then compares row count + column names + an
order-insensitive multiset of normalized values.  Usage:

    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import decimal
import datetime
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(normalize(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v)
    return ("s", str(v))


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(normalize(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def diff_summary(a, b, limit=3):
    only_a = [k for k in a if a.get(k, 0) != b.get(k, 0)]
    lines = []
    for k in only_a[:limit]:
        lines.append(f"    spark={a.get(k, 0)} oracle={b.get(k, 0)} row={k}")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from kafka_connect_sse_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    from kafka_connect_sse_spark.io import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    n_pass = n_fail = n_weak = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            scols = df.columns
            srows = df.collect()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} ({dt:.1f}s, no oracle)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ms, mo = to_multiset(scols, [tuple(r) for r in srows]), to_multiset(
                ocols, orows
            )
            if ms != mo:
                problems.append(
                    "value mismatch:\n" + diff_summary(ms, mo)
                )
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_weak} weak, {n_fail} fail")
    if failures:
        print("failing:", " ".join(failures))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
