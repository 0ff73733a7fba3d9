"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. Usage:

    python tools/compare.py [sf_dir] [query ...]

Exit code 0 iff all selected queries match.
"""

from __future__ import annotations

import math
import sys
import time
import traceback
from datetime import date, datetime
from decimal import Decimal

import os

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from andb_spark.catalog import TABLES, table_path  # noqa: E402
from andb_spark.session import build_session  # noqa: E402


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and keep full precision
        return v + 0.0
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def compare(sf_dir: str, names: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(qs)

    spark = build_session("andb_compare")
    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        if not os.path.exists(path):
            continue  # partial fixture dirs stay usable (catalog.register_tables skips the same way)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{path}')"
        )

    from andb_spark.operators.dedup import release_caches

    failures = []
    for name in names:
        t0 = time.time()
        release_caches()  # previous query's opt-in caches, if any
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: no oracle (rows-only) rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue

        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            failures.append(name)
            continue
        s_set = _rowset(scols, srows)
        d_set = _rowset(dcols, drows)
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures.append(name)
            continue
        print(f"PASS {name} rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = args[1:] if args and "/" in args[0] else args
    sys.exit(compare(sf, names or None))
