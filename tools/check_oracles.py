"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, sorts columns by name and rows by value, and compares cell
values EXACTLY (the driver uses an order-insensitive value-hash, so any
difference fails there too).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


DUCK2CANON = {
    "BIGINT": "long", "INTEGER": "int", "SMALLINT": "short",
    "TINYINT": "byte", "DOUBLE": "double", "FLOAT": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "DATE": "date",
    "TIMESTAMP": "timestamp", "HUGEINT": "decimal(38,0)",
}


def canon_duck(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return DUCK2CANON.get(t, t.lower())


def canon_spark(t: str) -> str:
    return {"bigint": "long", "integer": "int"}.get(t, t)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from spider_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {ex}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {ex}")
            continue
        sc, sn = normalize(srows, scols)
        oc, on = normalize(orows, ocols)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duck={oc}")
            continue
        # dtype comparison (the driver checks schema, not just names)
        stypes = {f.name: canon_spark(f.dataType.simpleString()) for f in sdf.schema.fields}
        cur2 = con.execute(f"DESCRIBE SELECT * FROM ({sql})")
        otypes = {r[0]: canon_duck(r[1]) for r in cur2.fetchall()}
        mism = {
            c: (stypes.get(c), otypes.get(c))
            for c in stypes
            if stypes.get(c) != otypes.get(c)
        }
        if mism:
            failures.append(name)
            print(f"FAIL {name}: dtype mismatches {mism}")
            continue
        if len(sn) != len(on):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(on)}")
            continue
        bad = [
            (a, b) for a, b in zip(sn, on) if a != b
        ]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(sn)} rows differ; first:")
            print("  spark:", bad[0][0])
            print("  duck :", bad[0][1])
            continue
        print(f"ok   {name}: {len(sn)} rows exact-match")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
