#!/usr/bin/env python
"""Mimic the driver's correctness gate: run every __spark_entry__.queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values. Exit nonzero on any mismatch.

Usage: python scripts/selfcheck.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import datetime
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as E
from aether_elasticsearch_consumer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def arrow_types(cols: list[str], tbl) -> dict[str, str]:
    """Canonical arrow type per column — the driver hashes TYPED values, so
    a DuckDB decimal128 vs Spark int64 is a real mismatch even when the
    stringified cells agree. String/large_string and timestamp units are
    representation details, not value types."""
    import pyarrow as pa

    def canon(t: "pa.DataType") -> str:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            # the child FIELD NAME ('element' vs 'l' vs 'item') is a
            # writer detail, not a value type
            return f"list<{canon(t.value_type)}>"
        return str(t)

    return {c: canon(tbl.schema.field(c).type) for c in cols}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        # Spark's arrow export is tz-aware (session tz = UTC), DuckDB's is
        # naive; both are the same instant — compare as naive UTC
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return str(v)


def rows_key(cols, rows):
    # sort columns by name (driver contract), then order-insensitive rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    spark = get_spark("selfcheck", cores=8, shuffle_partitions=8)
    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        stbl = sdf.toArrow()
        srows = [tuple(row[c] for c in scols) for row in stbl.to_pylist()]
        if name not in oracles:
            print(f"  {name}: rows-only check — {len(srows)} rows")
            continue
        otbl = con.execute(oracles[name]).fetch_arrow_table()
        ocols = otbl.schema.names
        orows = [tuple(row[c] for c in ocols) for row in otbl.to_pylist()]
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            st, ot = arrow_types(scols, stbl), arrow_types(ocols, otbl)
            bad = {c: (st[c], ot[c]) for c in scols if st[c] != ot[c]}
            if bad:
                problems.append(f"arrow types: {bad}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems and rows_key(scols, srows) != rows_key(ocols, orows):
            sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
            diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            problems.append(f"values: first diffs {diff}")
        if problems:
            failed.append(name)
            print(f"✗ {name}: " + "; ".join(problems))
        else:
            print(f"✓ {name}: {len(srows)} rows match")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
