"""Engine-side pins for the constraint family (DEFAULT / CHECK /
UNIQUE / PRIMARY KEY) beyond the DuckDB differential
(test_parser_surfaces_differential.py::
test_default_check_unique_matches_duckdb): the SCALE contracts — an
ALTER ADD COLUMN ... DEFAULT must stay metadata-only (zero data I/O
at any table size, the Iceberg v3 initial-default economics), CHECK
enforcement must stay one bounded staged scan, and the backfill
record must interact correctly with CoW rewrites, OPTIMIZE and
CLONE."""

from __future__ import annotations

import os

import pytest

from andb_spark.api import AnalyticsEngine, EngineError


def _data_file_set(eng: AnalyticsEngine, name: str) -> set[str]:
    return set(eng._data_files(name))


@pytest.fixture()
def eng(spark, tmp_path):
    e = AnalyticsEngine(str(tmp_path / "whcon"), spark=spark)
    yield e
    e.close()


def test_alter_add_default_is_metadata_only(eng):
    """The whole point of the backfill record: adding a defaulted
    column to a (conceptually 100 TB) table touches NO data file —
    the read path substitutes the folded constant for pre-alter
    segments instead."""
    eng.execute("create table big (a int)")
    eng.execute("insert into big values (1), (2), (3)")
    before = _data_file_set(eng, "big")
    mtimes = {f: os.path.getmtime(f) for f in before}
    eng.execute("alter table big add column b int default 7")
    after = _data_file_set(eng, "big")
    assert after == before  # no rewrite, no new segment
    assert all(os.path.getmtime(f) == mtimes[f] for f in before)
    assert eng.execute("select * from big order by a").rows == [
        (1, 7), (2, 7), (3, 7),
    ]
    # the record is on the column, listing the pre-alter segments
    col = next(
        c for c in eng._meta("big")["columns"] if c["name"] == "b"
    )
    assert col["backfill"]["value_sql"] == "7"
    assert col["backfill"]["segments"]


def test_backfill_survives_cow_and_optimize(eng):
    """A CoW rewrite materializes the backfill into its new files
    (they drop out of the fill set by construction); OPTIMIZE
    compaction reads through the fill too, so a compacted table keeps
    the defaults physically."""
    eng.execute("create table t (a int)")
    eng.execute("insert into t values (1), (2)")
    eng.execute("alter table t add column b int default 9")
    eng.execute("insert into t values (3, 30)")
    # CoW UPDATE touches only the file containing a=1's segment; its
    # rewrite must carry b=9 forward for the untouched row in the
    # same file
    eng.execute("update t set a = 10 where a = 1")
    assert eng.execute("select * from t order by a").rows == [
        (2, 9), (3, 30), (10, 9),
    ]
    eng.execute("optimize t")
    assert eng.execute("select * from t order by a").rows == [
        (2, 9), (3, 30), (10, 9),
    ]
    # post-compaction files physically carry the column: a fresh
    # engine (same catalog) still reads the same values
    eng.execute("checkpoint")
    assert eng.execute(
        "select count(*) as n from t where b = 9"
    ).rows == [(2,)]


def test_backfill_clone_materializes(eng):
    """CREATE TABLE ... CLONE renames files into one new segment, so
    a backfilled source cannot carry its segment-keyed record across
    — the clone must still read the right values."""
    eng.execute("create table src (a int)")
    eng.execute("insert into src values (1), (2)")
    eng.execute("alter table src add column b int default 5")
    eng.execute("create table dst clone src")
    assert eng.execute("select * from dst order by a").rows == [
        (1, 5), (2, 5),
    ]


def test_check_constraint_single_probe_and_state_intact(eng):
    """All checks fold into ONE staged probe; a violation removes the
    staged segment and leaves the table exactly as before."""
    eng.execute(
        "create table c (a int check (a > 0), b int,"
        " check (b < 100), check (a <> 13))"
    )
    eng.execute("insert into c values (1, 1)")
    files = _data_file_set(eng, "c")
    for bad in ("(0, 1)", "(1, 200)", "(13, 1)"):
        with pytest.raises(EngineError, match="CHECK constraint"):
            eng.execute(f"insert into c values {bad}")
        assert _data_file_set(eng, "c") == files  # no residue
    assert eng.execute("select * from c").rows == [(1, 1)]


def test_default_values_fast_path_bails_to_spark(eng):
    """A defaulted table defers the pyarrow literal fast path to the
    Spark path (expressions need evaluation), and DEFAULT VALUES /
    bare DEFAULT items land the declared expressions."""
    eng.execute(
        "create table d (a int default 1 + 1, b text default lower('Q'))"
    )
    eng.execute("insert into d default values")
    eng.execute("insert into d values (default, default)")
    eng.execute("insert into d (b) values (default)")
    assert eng.execute("select * from d").rows == [
        (2, "q"), (2, "q"), (2, "q"),
    ]


def test_unique_backed_upsert_partial_collist_default(eng):
    """INSERT OR REPLACE with a partial column list: a NEW key's
    unlisted columns take their DEFAULT (the MERGE insert branch
    fills defaults, not NULL)."""
    eng.execute(
        "create table u (k int primary key, v int, w int default 77)"
    )
    eng.execute("insert into u values (1, 10, 100)")
    eng.execute("insert or replace into u (k, v) values (1, 11), (2, 22)")
    assert eng.execute("select * from u order by k").rows == [
        (1, 11, 100),  # conflict: unlisted w keeps its old value
        (2, 22, 77),   # new key: unlisted w takes the default
    ]


def test_alter_add_default_after_dropped_column_scrubs(eng):
    """Re-ADD of a previously dropped name takes the scrub-rewrite
    path — the default must materialize there too (no backfill
    record, the files physically carry it)."""
    eng.execute("create table r (a int, junk int)")
    eng.execute("insert into r values (1, 111)")
    eng.execute("alter table r drop column junk")
    eng.execute("alter table r add column junk int default 4")
    assert eng.execute("select * from r").rows == [(1, 4)]
    col = next(
        c for c in eng._meta("r")["columns"] if c["name"] == "junk"
    )
    assert "backfill" not in col  # rewrite materialized it


def test_export_import_database_roundtrip(spark, tmp_path):
    """EXPORT DATABASE / IMPORT DATABASE (DuckDB statement shapes;
    api.py::_export_database): schema.sql + load.sql + one data file
    per table, replayed through execute() into a FRESH warehouse.
    The round trip must restore data, the full constraint family
    (still enforcing), sequence POSITIONS (no key reissue), logical
    views, macros and comments — and the backfilled default must
    arrive physical (the export reads through the fill)."""
    from andb_spark.api import AnalyticsEngine, EngineError

    src = AnalyticsEngine(str(tmp_path / "whsrc"), spark=spark)
    e = src.execute
    e("create sequence ids start 100 increment 3")
    e(
        "create table t (k int default nextval('ids') primary key,"
        " v double check (v >= 0), tag text default 'n/a')"
    )
    e("insert into t (v) values (1.5), (2.5)")
    e("alter table t add column extra int default 7")  # backfill
    e("insert into t (v, extra) values (3.5, 8)")
    e("comment on table t is 'the; table'")  # ';' inside a literal
    e("comment on column t.v is 'value'")
    e("create macro bump(x) as round(x * 1.1, 2)")
    e("create view v2 as select k, bump(v * 2) as dbl from t")
    e("create view v3 as select max(dbl) as m from v2")  # view chain
    e("create materialized view mv as select count(*) as n from t")
    e("create view vmv as select n + 1 as n1 from mv")  # over matview
    exp = str(tmp_path / "dump")
    e(f"export database '{exp}'")
    src_rows = e("select * from t order by k").rows
    src.close()

    dst = AnalyticsEngine(str(tmp_path / "whdst"), spark=spark)
    d = dst.execute
    d(f"import database '{exp}'")
    assert d("select * from t order by k").rows == src_rows
    # constraints still enforce
    with pytest.raises(EngineError):
        d("insert into t (k, v) values (100, 1.0)")  # pk dup
    with pytest.raises(EngineError):
        d("insert into t (v) values (-1)")  # check
    # sequence position carried: next key continues, never reissues
    d("insert into t (v) values (9.0)")
    ks = [r[0] for r in d("select k from t").rows]
    assert len(set(ks)) == len(ks)
    assert max(ks) > max(r[0] for r in src_rows)
    # defaults + backfill arrived physical
    row = d("select tag, extra from t where v = 1.5").rows[0]
    assert row == ("n/a", 7)
    # views + macros + comments (late-bound: v3 sees the row the
    # sequence check just inserted, exactly like a live view should)
    cur_max = max(r[0] for r in d("select max(v) as m from t").rows)
    assert d("select m from v3").rows[0][0] == pytest.approx(
        round(cur_max * 2 * 1.1, 2)
    )
    # matview + the view deferred past its creation both live (the
    # matview holds its import-time snapshot until REFRESH — correct
    # matview semantics)
    d("refresh materialized view mv")
    assert d("select n1 from vmv").rows[0][0] == d(
        "select count(*) as n from t"
    ).rows[0][0] + 1
    assert d("select bump(10.0) as b").rows == [(11.0,)]
    assert d(
        "select comment from andb_tables where table_name = 't'"
    ).rows == [("the; table",)]
    dst.close()


def test_array_column_types(eng):
    """DuckDB list-type spellings (`int[]`, nested `int[][]`) in
    CREATE TABLE — parquet stores lists natively, so arrays ride the
    managed-table path end to end (insert via SELECT, CTAS reverse
    type mapping, filters over array functions)."""
    eng.execute("create table a (id int, xs int[], tags text[])")
    eng.execute(
        "insert into a select 1, array(1, 2, 3), array('p', 'q')"
    )
    eng.execute("insert into a select 2, array(9), array('r')")
    # DuckDB indexing dialect (r11 verdict #1): 1-based, NULL OOB
    assert eng.execute(
        "select id, len(xs) as n, xs[1] as first from a order by id"
    ).rows == [(1, 3, 1), (2, 1, 9)]
    assert eng.execute(
        "select xs[0] as z, xs[9] as oob, xs[-1] as last_el,"
        " xs[2:3] as sl, tags[1] as t from a where id = 1"
    ).rows == [(None, None, 3, [2, 3], "p")]
    # list literals (DuckDB spellings) parse in any expression spot
    eng.execute("insert into a select 3, [7, 8], ['s']")
    assert eng.execute(
        "select xs from a where id = 3"
    ).rows == [([7, 8],)]
    # CTAS reverse-maps array types into declared columns
    eng.execute("create table b as select id, xs from a")
    cols = {c["name"]: c["type"] for c in eng._meta("b")["columns"]}
    assert cols["xs"] == "int[]"
    eng.execute("create table c (m double[][])")
    eng.execute("insert into c select array(array(1.5), array(2.5))")
    assert eng.execute(
        "select m[2][1] as v from c"
    ).rows == [(2.5,)]


def test_export_import_csv_format(spark, tmp_path):
    """EXPORT DATABASE (FORMAT CSV): the text round trip must survive
    embedded commas/quotes/escaped quotes, NULLs in every type, and
    timestamps — the COPY FROM path casts back to the declared
    schema."""
    from andb_spark.api import AnalyticsEngine

    src = AnalyticsEngine(str(tmp_path / "whc1"), spark=spark)
    e = src.execute
    e("create table t (k int, s text, d double, ts timestamp)")
    e(
        "insert into t values"
        " (1, 'a,b\"c', 1.5, '2020-01-02 03:04:05'),"
        " (2, null, null, null),"
        " (3, 'line''q', -2.25, '1999-12-31 23:59:59')"
    )
    exp = str(tmp_path / "dump")
    e(f"export database '{exp}' (format csv)")
    before = e("select * from t order by k").rows
    src.close()
    dst = AnalyticsEngine(str(tmp_path / "whc2"), spark=spark)
    dst.execute(f"import database '{exp}'")
    assert dst.execute("select * from t order by k").rows == before
    # RESET returns a session var to its default
    dst.execute("set andb.zone_prune = off")
    dst.execute("reset andb.zone_prune")
    assert "andb.zone_prune" not in dst.session_vars
    dst.close()


def test_create_temp_table_session_scoped(spark, tmp_path):
    """CREATE TEMP[ORARY] TABLE (DuckDB/Postgres): session-scoped —
    full DML while the engine lives, excluded from every catalog
    save, data dirs removed at close(), gone after restart while
    permanent tables persist. Declared divergence: DuckDB lets a
    temp table shadow a permanent one; the engine's single strict
    namespace refuses the collision loudly."""
    import json
    import os

    from andb_spark.api import AnalyticsEngine, EngineError

    wh = str(tmp_path / "whtemp")
    eng = AnalyticsEngine(wh, spark=spark)
    e = eng.execute
    e("create temp table tt (a int, b varchar default 'x')")
    e("insert into tt (a) values (1), (2)")
    e("create temporary table tt2 as select a * 10 as a from tt")
    e("update tt set a = a + 10 where a = 1")
    assert e("select * from tt order by a").rows == [
        (2, "x"), (11, "x"),
    ]
    assert e("select * from tt2 order by a").rows == [(10,), (20,)]
    e("create table perm (p int)")
    e("insert into perm values (7)")
    with pytest.raises(EngineError):
        e("create temp table perm (q int)")
    # the OR REPLACE spelling must not bypass the refusal (ADVICE
    # r11: in DuckDB this is non-destructive shadowing; silently
    # replacing would let close() delete the permanent table's data)
    with pytest.raises(EngineError, match="permanent"):
        e("create or replace temp table perm as select 1 as q")
    assert e("select * from perm").rows == [(7,)]
    # the persisted catalog root never mentions the temp tables
    e("checkpoint")
    root = json.load(open(os.path.join(wh, "_catalog.json")))
    assert "tt" not in root["tables"] and "tt2" not in root["tables"]
    eng.close()
    assert not os.path.isdir(os.path.join(wh, "tt"))
    eng2 = AnalyticsEngine(wh, spark=spark)
    with pytest.raises(EngineError):
        eng2.execute("select * from tt")
    assert eng2.execute("select * from perm").rows == [(7,)]
    eng2.close()


def test_struct_column_types(eng):
    """DuckDB struct-type spellings in CREATE TABLE — parquet stores
    groups natively, so structs (and structs nested under lists)
    ride the managed-table path end to end, including dotted field
    access, filters, and the CTAS reverse type mapping."""
    eng.execute(
        "create table s (id int,"
        " loc struct(lat double, lon double),"
        " path struct(tag text, pts int[])[])"
    )
    eng.execute(
        "insert into s select 1,"
        " {'lat': 1.5, 'lon': -2.5},"
        " [{'tag': 'a', 'pts': [1, 2]}]"
    )
    assert eng.execute(
        "select id, loc.lat as lat, path[1].tag as t,"
        " path[1].pts[2] as p from s"
    ).rows == [(1, 1.5, "a", 2)]
    assert eng.execute(
        "select id from s where loc.lon < 0"
    ).rows == [(1,)]
    eng.execute("create table s2 as select id, loc from s")
    cols = {c["name"]: c["type"] for c in eng._meta("s2")["columns"]}
    assert cols["loc"] == "struct(lat double, lon double)"
    # round-trips through restart (declared schema re-parses)
    eng.execute("insert into s2 select 2, named_struct('lat', 0.0, 'lon', 9.9)")
    assert eng.execute(
        "select count(*) as n from s2 where loc.lon > 5"
    ).rows == [(1,)]


def test_pk_probe_zone_prefilter(spark, tmp_path):
    """The PK/UNIQUE staged probes prefilter base files through the
    manifest zone maps (r11 verdict #3): a key-disjoint append —
    the sorted/Z-ordered load pattern — proves key absence from
    METADATA and reads zero base files; an overlapping append reads
    only the overlapping segment and still raises on a real
    collision. Constraint semantics unchanged (the fuzz arm and
    test_primary_key_* pin those)."""
    from andb_spark.api import AnalyticsEngine, EngineError

    eng = AnalyticsEngine(str(tmp_path / "whzpk"), spark=spark)
    e = eng.execute
    e("create table t (k int primary key, v int)")
    # sparse even keys in two zone bands: [0, 998] and [1000, 1998]
    e("insert into t select id * 2, id from range(0, 500) r(id)")
    e("insert into t select id * 2, id from range(500, 1000) r(id)")
    # disjoint key band: the probe must touch ZERO base files
    e("insert into t select id, 0 from range(5000, 5100) r(id)")
    assert eng.session_vars["andb.last_pk_probe_files"] == 0
    # odd keys inside the FIRST band only: no collision, and the
    # probe reads fewer segments than the manifest holds
    total = len(eng._segments_of(eng._meta("t")))
    e("insert into t select id * 2 + 1, 0 from range(0, 50) r(id)")
    assert 0 < eng.session_vars["andb.last_pk_probe_files"] < total
    # a genuine collision still raises through the prefiltered probe
    with pytest.raises(EngineError, match="primary key"):
        e("insert into t values (1500, 9)")
    # and the table state is exactly the non-colliding inserts
    assert e("select count(*) as n, max(k) as m from t").rows == [
        (1150, 5099)
    ]
    eng.close()


def test_export_import_list_struct_tables(spark, tmp_path):
    """EXPORT/IMPORT DATABASE round-trips list/struct-typed tables
    (the r12 types: the reconstructed DDL carries `int[]` /
    `struct(...)` spellings, parquet carries the data natively) and
    views whose PRISTINE stored bodies hold bracket expressions —
    the replay normalizes them exactly once."""
    from andb_spark.api import AnalyticsEngine

    src = AnalyticsEngine(str(tmp_path / "whx1"), spark=spark)
    e = src.execute
    e("create table lt (k int, xs int[], st struct(a int, b text))")
    e("insert into lt values (1, [1,2], {'a': 5, 'b': 'x'}),"
      " (2, [], NULL)")
    e("create view lv as select k, xs[1] f, len(xs) n from lt")
    exp = str(tmp_path / "dump")
    e(f"export database '{exp}'")
    before = e("select k, xs[2] x2, st.a a from lt order by k").rows
    vbefore = e("select * from lv order by k").rows
    src.close()
    dst = AnalyticsEngine(str(tmp_path / "whx2"), spark=spark)
    dst.execute(f"import database '{exp}'")
    assert dst.execute(
        "select k, xs[2] x2, st.a a from lt order by k"
    ).rows == before
    assert dst.execute("select * from lv order by k").rows == vbefore
    dst.close()
