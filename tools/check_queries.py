"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` through
DuckDB on the same parquet, compare row count, schema width, and an
order-insensitive value hash. Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols, rows) -> str:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from ethereum_raw_data_crawler_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="check_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in sqls:
            print(f"{name:24s} rows-only: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only)"))
            continue
        try:
            cur = con.execute(sqls[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"{name:24s} DUCKDB ERROR: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = _hash_rows(scols, [tuple(r) for r in srows])
            oh = _hash_rows(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"{name:24s} FAIL: {'; '.join(problems)}")
            if "value-hash mismatch" in "; ".join(problems):
                svals = sorted(map(str, [tuple(r) for r in srows]))[:3]
                ovals = sorted(map(str, orows))[:3]
                print("  spark :", svals)
                print("  duckdb:", ovals)
        else:
            print(f"{name:24s} OK ({len(srows)} rows)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
