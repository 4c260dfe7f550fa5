#!/usr/bin/env python
"""Driver-style correctness check: run every queries() entry vs its
oracle_sql() twin side-by-side (Spark vs DuckDB) at an arbitrary SF dir.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    # EXACT comparison — floats are compared bit-for-bit via repr (the
    # driver hashes full-precision values; rounding here would let the
    # repo claim green on queries the driver records as hash-fails).
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    if isinstance(v, bool):
        return bool(v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def _spark_kind(dt) -> str:
    # Collapse a Spark SQL type to a numeric-family kind comparable with a
    # pandas dtype.kind: 'i' integral, 'f' floating, '?' anything else.
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if name in ("float", "double"):
        return "f"
    return "?"


def _duck_kinds(con, sql) -> dict:
    # Fetch the oracle THROUGH pandas, the same materialization path the
    # driver uses — this is where DuckDB HUGEINT (un-cast integer sums)
    # silently becomes float64 and diverges from Spark's BIGINT even when
    # every value is numerically identical. fetchall() hides this class of
    # bug (HUGEINT -> Python int), which is how the repo claimed green on
    # corpus_mix while the driver recorded hash_match=false two rounds
    # straight (VERDICT r3 "What's wrong" #1-3).
    df = con.execute(sql).fetchdf()
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = "i" if k in ("i", "u") else ("f" if k == "f" else "?")
    return out


def _dtype_status(sdf, duck_kinds) -> str:
    mism = []
    for f in sdf.schema.fields:
        sk = _spark_kind(f.dataType)
        dk = duck_kinds.get(f.name, "?")
        if {sk, dk} == {"i", "f"}:
            mism.append(f"{f.name}: spark={sk} duck={dk}")
    return "; ".join(mism)


def main():
    argv = [a for a in sys.argv[1:] if a != "--dtypes-only"]
    dtypes_only = "--dtypes-only" in sys.argv[1:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry_mod
    from crawler_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = queries[name](spark, sf)
        if dtypes_only:
            # Schema-only sweep: no Spark job runs (schema is resolved at
            # plan time); the oracle still executes through pandas so the
            # driver-visible dtype is what we compare.
            if name not in oracles:
                continue
            dty = _dtype_status(sdf, _duck_kinds(con, oracles[name]))
            if dty:
                failures.append(name)
            print(f"  {name:24s} {'DTYPE ' + dty if dty else 'OK'}")
            continue
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows-only  n={len(srows)}  ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        duck_kinds = _duck_kinds(con, oracles[name])
        t_duck = time.time() - t0
        sset, sc = _rowset(scols, srows)
        dset, dc = _rowset(dcols, drows)
        status = "OK"
        if sc != dc:
            status = f"COLS spark={sc} duck={dc}"
        elif len(sset) != len(dset):
            status = f"ROWCOUNT {len(sset)} vs {len(dset)}"
        else:
            mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b]
            if mism:
                status = (
                    f"VALUES {len(mism)} mismatches; first #{mism[0]}: "
                    f"spark={sset[mism[0]]} duck={dset[mism[0]]}"
                )
            else:
                dty = _dtype_status(sdf, duck_kinds)
                if dty:
                    status = f"DTYPE {dty}"
        if status != "OK":
            failures.append(name)
        print(
            f"  {name:24s} {status}  n={len(sset)}  "
            f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
        )
    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL OK'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
