"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB at sf0.01, compare
row-count + sorted values. Usage: python tools/check_gate.py [sf_dir] [name...]
"""

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry
from chronon_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app_name="gate", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            cols = sorted(df.columns)
            rows = df.collect()
            got = sorted((tuple(norm(r[c]) for c in cols) for r in rows), key=repr)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(got)} rows)")
            if len(got) == 0 and name != "skip":
                failures.append((name, "0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            exp = sorted((tuple(norm(r[i]) for i in order) for r in orows), key=repr)
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append((name, f"schema mismatch {sorted(cols)} vs {sorted(ocols)}"))
            print(f"FAIL  {name}: schema {sorted(cols)} vs {sorted(ocols)}")
            continue
        if len(got) != len(exp):
            failures.append((name, f"rowcount {len(got)} vs {len(exp)}"))
            print(f"FAIL  {name}: rowcount {len(got)} vs {len(exp)}")
            continue
        bad = [(g, e) for g, e in zip(got, exp) if g != e]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches; first: {bad[0]}"))
            print(f"FAIL  {name}: {len(bad)}/{len(got)} mismatches; first:\n  got {bad[0][0]}\n  exp {bad[0][1]}")
        else:
            print(f"PASS  {name}: {len(got)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
