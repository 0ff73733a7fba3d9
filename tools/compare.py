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


def _pandas_kind(series):
    """Collapse a pandas dtype to the equivalence class the driver's
    canonicalization distinguishes. int64 90 and float64 90.0 hash
    DIFFERENTLY there (the r5 ``m_resize`` red: DuckDB HUGEINT →
    float64 through ``.df()``), so int and float are separate kinds;
    Decimal-object columns coerce to float on the driver path, so they
    class with float."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    # object dtype: classify by the first non-null cell
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, Decimal):
            return "float"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, (datetime, date)):
            return "datetime"
        return type(v).__name__
    return "empty"


def _driver_canon_lint(name, spark_pdf, duck_pdf):
    """Structural mirror of the DRIVER's pandas canonicalization
    (VERDICT r5 gap #1): the driver sorts/factorizes/hashes both result
    sets as pandas frames, so (a) any unhashable cell (ndarray / list /
    dict — array-typed output) crashes it, and (b) any dtype-kind drift
    between the Spark and oracle sides (int vs float: DuckDB HUGEINT,
    uncast aggregate arithmetic) hash-mismatches even when values are
    equal. Both r5 reds pass the fetchall-based value check and fail
    only here — this lint makes them fail LOCALLY. Returns a list of
    problem strings (empty = clean)."""
    problems = []
    for col in spark_pdf.columns:
        for side, pdf in (("spark", spark_pdf), ("oracle", duck_pdf)):
            s = pdf[col]
            if s.dtype.kind == "O":
                for v in s:
                    try:
                        hash(v)
                    except TypeError:
                        problems.append(
                            f"column {col!r} ({side}) holds unhashable "
                            f"{type(v).__name__} cells — driver canon "
                            f"crashes on complex-typed output"
                        )
                        break
        ks, kd = _pandas_kind(spark_pdf[col]), _pandas_kind(duck_pdf[col])
        if "empty" in (ks, kd):
            continue
        if ks != kd:
            problems.append(
                f"column {col!r} dtype-kind drift: spark={ks} vs "
                f"oracle={kd} — driver canon hashes these differently "
                f"(CAST the oracle expression / align the Spark type)"
            )
    return problems


_COMPLEX_KINDS = ("array", "map", "struct")


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
            if name in oracles:
                sdf = sdf.persist()  # one compute for collect + toPandas
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: no oracle (rows-only) rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        # Registry lint: the driver's pandas canonicalizer crashes on
        # array/map/struct cells (r5 m_image_embed red) — no oracle-
        # graded query may emit a complex-typed column.
        complex_cols = [
            f.name for f in sdf.schema.fields
            if any(k in f.dataType.simpleString() for k in _COMPLEX_KINDS)
        ]
        if complex_cols:
            print(f"FAIL {name}: complex-typed output columns "
                  f"{complex_cols} in an oracle-graded query (driver "
                  f"canon cannot hash array/map/struct cells)")
            failures.append(name)
            sdf.unpersist()
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            sdf.unpersist()
            continue

        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures.append(name)
            sdf.unpersist()
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            failures.append(name)
            sdf.unpersist()
            continue
        s_set = _rowset(scols, srows)
        d_set = _rowset(dcols, drows)
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures.append(name)
            sdf.unpersist()
            continue
        # Driver-faithful structural pass: same results through the
        # pandas dtypes the driver actually hashes.
        try:
            spark_pdf = sdf.toPandas()
            duck_pdf = con.execute(oracles[name]).df()
        finally:
            sdf.unpersist()
        problems = _driver_canon_lint(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: driver-canon lint: " + "; ".join(problems))
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
