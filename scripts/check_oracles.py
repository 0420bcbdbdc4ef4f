"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB over the same sf dir; compare row count,
column names/types, and an order-insensitive value hash.

Run: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.001"
ONLY = set(a for a in sys.argv[1:] if "/" not in a)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.4f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import __spark_entry__ as entrymod
    from llacie_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"{name:18} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:18} rows-only: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
        except Exception as e:
            failures.append(name)
            print(f"{name:18} ORACLE ERROR: {str(e)[:200]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                sset = set("\x1f".join(norm_cell(c) for c in r) for r in
                           [tuple(r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows])
                oset = set("\x1f".join(norm_cell(c) for c in r) for r in
                           [tuple(r[i] for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows])
                diff1 = list(sset - oset)[:3]
                diff2 = list(oset - sset)[:3]
                for d in diff1:
                    print(f"    spark-only: {d[:160]}")
                for d in diff2:
                    print(f"    duck-only : {d[:160]}")
        if problems:
            failures.append(name)
            print(f"{name:18} MISMATCH: {'; '.join(problems)}")
        else:
            print(f"{name:18} OK ({len(srows)} rows)")
    print()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
