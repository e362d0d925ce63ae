"""Simulates the driver's correctness gate: runs entry() as a smoke
check, then each queries()[name] vs oracle_sql()[name] on DuckDB at the
given sf dir — row count + sorted-column value hash, order-insensitive.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if pdf.empty:
        return hashlib.sha256(b"<empty>").hexdigest()
    rows = pdf.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as mod
    from ner_funtool_spark.session import get_spark

    spark = get_spark("driver_sim", cores=8, shuffle_partitions=8)

    print("== smoke: entry(spark) ==")
    edf = mod.entry(spark)
    n = edf.count()
    print(f"entry rows={n} schema={[f.name for f in edf.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = mod.queries(), mod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in os_:
            print(f"{name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        odf = con.execute(os_[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_schema and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        print(f"{name}: spark_rows={len(sdf)} oracle_rows={len(odf)} "
              f"schema={'ok' if ok_schema else sorted(sdf.columns) + ['|'] + sorted(odf.columns)} "
              f"hash={'ok' if ok_hash else 'DIFF'} -> {status}")
        if status != "OK":
            fails.append(name)
            if ok_schema:
                cols = sorted(sdf.columns)
                a = sdf[cols].astype(str).apply(lambda r: "\x1f".join(r), axis=1)
                b = odf[cols].astype(str).apply(lambda r: "\x1f".join(r), axis=1)
                sa, sb = set(a), set(b)
                print("  spark-only:", list(sa - sb)[:3])
                print("  oracle-only:", list(sb - sa)[:3])
    spark.stop()
    print("FAILED:" if fails else "ALL OK", fails if fails else "")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
