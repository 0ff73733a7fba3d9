"""Differential grid for the r14-verdict string/datetime seams
(verdict #2/#3): strptime/try_strptime %f reads the digit run as a
MICROSECOND COUNT (not a fraction), parse without a year directive
defaults to 1900 (not 1970), left/right with a negative length drop
|n| chars from the other end, and substr follows DuckDB's virtual
window rule (start 0 consumes length before the string; a negative
length reads backward from the start coordinate).

Every case runs the IDENTICAL SQL through the engine and DuckDB. The
VALUES-table variants force the non-literal lowering path (literal
shapes where Spark natively agrees pass through untouched)."""

from __future__ import annotations

import duckdb
import pytest

from andb_spark.api import AnalyticsEngine, EngineError

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def seam_eng(spark, tmp_path_factory):
    eng = AnalyticsEngine(
        str(tmp_path_factory.mktemp("whseam")), spark=spark
    )
    yield eng


def _both(eng, sql):
    duck = duckdb.connect().execute(sql).fetchall()
    mine = eng.execute(sql).rows
    canon = lambda rows: sorted(  # noqa: E731
        tuple(str(v) for v in r) for r in rows
    )
    assert canon(mine) == canon(duck), sql


# substr: every (start, len) divergence class plus the agreeing
# neighborhood — start 0, negative starts incl. virtual-window
# underflow, negative lengths (backward reads), NULLs.
SUBSTR_LITERALS = [
    (st, ln)
    for st in (-12, -11, -6, -2, -1, 0, 1, 2, 6)
    for ln in (-6, -2, -1, 0, 1, 3, 7)
]


@pytest.mark.parametrize("st,ln", SUBSTR_LITERALS)
def test_substr_literal_grid(seam_eng, st, ln):
    _both(seam_eng, f"select substr('hello', {st}, {ln}) as v")


def test_substr_runtime_grid(seam_eng):
    rows = ", ".join(
        f"('hello', {st}, {ln})" for st, ln in SUBSTR_LITERALS
    )
    _both(
        seam_eng,
        "select st, ln, substr(s, st, ln) as v from (values "
        + rows
        + ") t(s, st, ln)",
    )


@pytest.mark.parametrize(
    "sql",
    [
        "select substr('hello', 2, cast(null as int)) as v",
        "select substr('hello', cast(null as int), 2) as v",
        "select substr(s, 0, ln) as v from (values ('hello', 3), ('ab', 1)) t(s, ln)",
        "select substr('hello', -3) as v",
        "select substring('hello', 0, 3) as v",
    ],
)
def test_substr_edges(seam_eng, sql):
    _both(seam_eng, sql)


@pytest.mark.parametrize("fn", ["left", "right"])
def test_left_right_literal_grid(seam_eng, fn):
    for n in range(-7, 8):
        _both(seam_eng, f"select {fn}('hello', {n}) as v")
    _both(seam_eng, f"select {fn}('hello', NULL) as v")
    _both(seam_eng, f"select {fn}(NULL, 2) as v")


@pytest.mark.parametrize("fn", ["left", "right"])
def test_left_right_runtime(seam_eng, fn):
    _both(
        seam_eng,
        f"select {fn}(s, n) as v from (values ('hello', -2),"
        " ('world', 3), ('ab', -5), ('xy', NULL), ('q', 0))"
        " t(s, n)",
    )


@pytest.mark.parametrize(
    "sql",
    [
        # %f microsecond-count semantics, 1..6 digits
        "select strptime('10:00:00.1', '%H:%M:%S.%f') as t",
        "select strptime('10:00:00.123', '%H:%M:%S.%f') as t",
        "select strptime('10:00:00.12345', '%H:%M:%S.%f') as t",
        "select strptime('10:00:00.123456', '%H:%M:%S.%f') as t",
        "select strptime('2024-03-05 10:00:00.42',"
        " '%Y-%m-%d %H:%M:%S.%f') as t",
        "select try_strptime('10:00:00.99', '%H:%M:%S.%f') as t",
        "select try_strptime('nope', '%H:%M:%S.%f') as t",
        # missing-year default is 1900 on DuckDB, 1970 on raw Java
        "select strptime('10:00', '%H:%M') as t",
        "select strptime('03-05 10:00', '%m-%d %H:%M') as t",
        # control: explicit year unaffected
        "select strptime('2024-03-05', '%Y-%m-%d') as t",
    ],
)
def test_strptime_parse_seams(seam_eng, sql):
    _both(seam_eng, sql)


def test_strptime_fraction_mid_string_refuses(seam_eng):
    # only the trailing-%f shape is expressible as a left-pad; other
    # positions refuse by name instead of parsing silently wrong
    with pytest.raises(EngineError, match="%f"):
        seam_eng.execute(
            "select strptime('10.123 05', '%H.%f %S') as t"
        )
