"""Differential test of the ENGINE's ASOF JOIN SQL surface against
DuckDB's NATIVE ASOF JOIN on seeded random data.

The operator already has a pandas merge_asof property test
(test_operators.py) and the driver row u_asof_sql grades one corpus
query; this arm runs the IDENTICAL SQL text through both engines
across the whole shape grid — backward/forward × inner/left ×
with/without equality key × flipped operand order — on data dense
enough to hit matched, unmatched, boundary-equal, and multi-candidate
cases. Right-side (key, time) pairs are unique, as both engines
require for a deterministic ASOF result.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from andb_spark.api import AnalyticsEngine

_SEED = 6


def _data():
    rng = random.Random(_SEED)
    left = [
        (i, rng.randint(1, 5), rng.randint(0, 100)) for i in range(120)
    ]
    seen = set()
    right = []
    rid = 0
    while len(right) < 80:
        k, t = rng.randint(1, 6), rng.randint(0, 100)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right.append((rid, k, t, round(rng.uniform(0, 10), 2)))
        rid += 1
    return left, right


@pytest.fixture(scope="module")
def asof_engines(spark, tmp_path_factory):
    left, right = _data()
    eng = AnalyticsEngine(
        str(tmp_path_factory.mktemp("whasofdiff")), spark=spark
    )
    e = eng.execute
    e("create table probes (pid int, k int, t int)")
    e(
        "insert into probes values "
        + ", ".join(f"({p}, {k}, {t})" for p, k, t in left)
    )
    e("create table refs (rid int, rk int, rt int, val double)")
    e(
        "insert into refs values "
        + ", ".join(f"({r}, {k}, {t}, {v})" for r, k, t, v in right)
    )
    con = duckdb.connect()
    con.execute("create table probes (pid int, k int, t int)")
    con.executemany("insert into probes values (?, ?, ?)", left)
    con.execute("create table refs (rid int, rk int, rt int, val double)")
    con.executemany("insert into refs values (?, ?, ?, ?)", right)
    yield eng, con
    eng.close()


_SHAPES = [
    # (label, identical SQL run through BOTH engines)
    (
        "backward_inner_keyed",
        "select pid, rid from probes p asof join refs r"
        " on p.k = r.rk and p.t >= r.rt order by pid",
    ),
    (
        "backward_left_keyed",
        "select pid, rid from probes p asof left join refs r"
        " on p.k = r.rk and p.t >= r.rt order by pid",
    ),
    (
        "forward_inner_keyed",
        "select pid, rid from probes p asof join refs r"
        " on p.k = r.rk and p.t <= r.rt order by pid",
    ),
    (
        "forward_left_keyed",
        "select pid, rid from probes p asof left join refs r"
        " on p.k = r.rk and p.t <= r.rt order by pid",
    ),
    (
        "backward_left_flipped_operands",
        "select pid, rid from probes p asof left join refs r"
        " on r.rk = p.k and r.rt <= p.t order by pid",
    ),
    (
        "backward_left_keyless",
        "select pid, rid from probes p asof left join refs r"
        " on p.t >= r.rt order by pid",
    ),
    (
        "payload_projection",
        "select pid, rid, val from probes p asof left join refs r"
        " on p.k = r.rk and p.t >= r.rt order by pid",
    ),
]


@pytest.mark.parametrize("label,sql", _SHAPES, ids=[s[0] for s in _SHAPES])
def test_asof_sql_matches_duckdb_native(asof_engines, label, sql):
    eng, con = asof_engines
    ours = eng.execute(sql).rows
    duck = con.execute(sql).fetchall()
    assert ours == duck, (label, sql)
