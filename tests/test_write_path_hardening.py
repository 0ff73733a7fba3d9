"""Write-path hardening: regression tests for review findings on
api.py — transactional DROP/reCREATE, crash-mid-transaction recovery,
matview DML guards, INSERT/MERGE column validation, simultaneous
UPDATE assignment, time-travel schema consistency, zone-prune
self-reference safety, MERGE clause ambiguity.
"""

from __future__ import annotations

import os

import pytest

from andb_spark.api import AnalyticsEngine, EngineError


@pytest.fixture()
def engine(spark, tmp_path):
    return AnalyticsEngine(str(tmp_path / "wh"), spark=spark)


def test_txn_drop_then_recreate_survives_commit(engine):
    e = engine.execute
    e("create table t (a int)")
    e("insert into t values (1)")
    e("begin")
    e("drop table t")
    e("create table t (a int, b text)")
    e("insert into t values (7, 'new')")
    e("commit")
    # the recreated table's data must survive the commit's cleanup
    assert e("select a, b from t").rows == [(7, "new")]
    assert os.path.isdir(engine._table_dir("t"))


def test_crash_mid_transaction_rolls_back_on_restart(spark, tmp_path):
    wh = str(tmp_path / "wh")
    eng1 = AnalyticsEngine(wh, spark=spark)
    e1 = eng1.execute
    e1("create table t (a int)")
    e1("insert into t values (1)")
    e1("begin")
    e1("update t set a = 99")
    e1("insert into t values (2)")
    # While the owning process is ALIVE, a second engine must refuse to
    # open rather than roll back the live transaction's durable state
    # (ADVICE r3: recovery must distinguish crash from concurrency).
    with pytest.raises(EngineError, match="live process"):
        AnalyticsEngine(wh, spark=spark)
    # simulate a real crash: repoint the undo marker at a pid that no
    # longer exists (as if the owner died mid-transaction), then open a
    # fresh engine over the same warehouse
    import json
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()  # reaped: this pid is dead
    marker = json.load(open(eng1._txn_snap_path))
    marker["__txn_pid"] = proc.pid
    json.dump(marker, open(eng1._txn_snap_path, "w"))
    eng1._txn = None  # eng1 is "dead"; stop it from committing later
    eng2 = AnalyticsEngine(wh, spark=spark)
    assert eng2.execute("select a from t").rows == [(1,)]
    # and the undo marker is consumed — normal operation resumes
    assert not os.path.exists(eng2._txn_snap_path)
    eng2.execute("insert into t values (3)")
    assert sorted(eng2.execute("select a from t").rows) == [(1,), (3,)]


def test_matviews_reject_all_dml_entry_points(engine, tmp_path):
    e = engine.execute
    e("create table base (a int)")
    e("insert into base values (1)")
    e("create materialized view mv as select count(*) as n from base")
    with pytest.raises(EngineError, match="materialized view"):
        e("insert into mv values (5)")
    with pytest.raises(EngineError, match="materialized view"):
        e(f"copy mv from '{tmp_path}/x.csv'")
    e("create table src (n bigint)")
    e("insert into src values (9)")
    with pytest.raises(EngineError, match="materialized view"):
        e(
            "merge into mv using src on mv.n = src.n"
            " when not matched then insert values (src.n)"
        )


def test_insert_rejects_unknown_column(engine):
    e = engine.execute
    e("create table t (a int, b int)")
    with pytest.raises(EngineError, match="aa"):
        e("insert into t (aa) values (1)")
    # valid partial column list still works, missing -> NULL
    e("insert into t (b) values (4)")
    assert e("select a, b from t").rows == [(None, 4)]


def test_update_assignments_are_simultaneous(engine):
    e = engine.execute
    e("create table t (a int, b int)")
    e("insert into t values (1, 2), (10, 20)")
    e("update t set a = b, b = a where a = 1")  # the classic swap
    assert sorted(e("select a, b from t").rows) == [(2, 1), (10, 20)]


def test_version_as_of_honors_declared_schema_after_drop_column(engine):
    e = engine.execute
    e("create table t (a int, b int)")
    e("insert into t values (1, 100)")
    vnum = engine._meta("t").get("vnum", 1)
    e("alter table t drop column b")  # metadata-only
    r = e(f"select * from t version as of {vnum}")
    # same version number, same answer as the current read: no
    # resurrection of the dropped column through time travel
    assert r.columns == ["a"]
    assert r.rows == [(1,)]


def test_zone_prune_skips_statements_with_self_reference(engine):
    e = engine.execute
    e("create table t (a int)")
    e("insert into t select id from range(1, 11)")        # a in [1,10]
    e("insert into t select id from range(100, 201)")     # a in [100,200]
    # sanity: single-reference query does prune
    e("set andb.zone_prune = on")
    assert e("select count(1) as n from t where a > 150").rows == [(50,)]
    pruned = engine.session_vars.get("andb.last_zone_prune", "")
    skipped = int(pruned.split("skipped ")[1].split("/")[0])
    assert skipped >= 1  # the [1,10] segment was skipped
    # scalar subquery re-references t: the total must count ALL rows
    r = e(
        "select a, (select count(*) from t) as total from t"
        " where a > 150 order by a"
    )
    assert all(row[1] == 111 for row in r.rows)
    assert len(r.rows) == 50


def test_merge_rejects_update_plus_delete_and_bad_columns(engine, spark):
    e = engine.execute
    e("create table t (k int, v int)")
    e("insert into t values (1, 10)")
    e("create table s (k int, v int)")
    e("insert into s values (1, 11)")
    with pytest.raises(EngineError, match="cannot combine"):
        e(
            "merge into t using s on t.k = s.k"
            " when matched then update set v = s.v"
            " when matched then delete"
        )
    with pytest.raises(EngineError, match="not in"):
        e(
            "merge into t using s on t.k = s.k"
            " when matched then update set zz = s.v"
        )
    with pytest.raises(EngineError, match="not in"):
        e(
            "merge into t using s on t.k = s.k"
            " when not matched then insert (zz) values (s.v)"
        )


def test_alter_scrub_commits_schema_and_files_atomically(engine):
    """ADD COLUMN after DROP COLUMN of the same name scrubs residue;
    the schema change and the scrubbed files must land in one commit
    (no window where the catalog declares the column over unscrubbed
    files)."""
    e = engine.execute
    e("create table t (a int, b int)")
    e("insert into t values (1, 777)")
    e("alter table t drop column b")
    e("alter table t add column b int")
    assert e("select a, b from t").rows == [(1, None)]  # scrubbed


def test_version_read_falls_back_to_historical_schema_after_rename(engine):
    """RENAME rewrites current files under the new name; forcing that
    name onto pre-rename history would NULL the column. Time travel
    (and CLONE VERSION AS OF) must serve such versions under their own
    historical schema."""
    e = engine.execute
    e("create table rn (a int)")
    e("insert into rn values (1), (2)")
    v_old = engine._meta("rn")["vnum"]
    e("alter table rn rename column a to b")
    r = e(f"select * from rn version as of {v_old}")
    assert r.columns == ["a"]  # historical name, historical values
    assert sorted(r.rows) == [(1,), (2,)]
    e(f"create table rn_clone clone rn version as of {v_old}")
    assert sorted(e("select a from rn_clone").rows) == [(1,), (2,)]


def test_zone_prune_guard_is_case_insensitive(engine):
    e = engine.execute
    e("create table czp (a int)")
    e("insert into czp select id from range(1, 11)")
    e("insert into czp select id from range(100, 201)")
    r = e(
        "select a, (select count(*) from CZP) as total from czp"
        " where a > 150 order by a"
    )
    assert all(row[1] == 111 for row in r.rows)


def test_insert_and_merge_columns_case_insensitive(engine):
    e = engine.execute
    e("create table ci (id int, price int)")
    e("insert into ci (ID, Price) values (1, 10)")
    assert e("select id, price from ci").rows == [(1, 10)]
    e("create table ci_src (id int, price int)")
    e("insert into ci_src values (1, 99)")
    e(
        "merge into ci using ci_src on ci.id = ci_src.id"
        " when matched then update set Price = ci_src.price"
    )
    assert e("select price from ci").rows == [(99,)]


def test_merge_duplicate_source_keys_raise_without_mutation(engine):
    """ANSI multiple-match detection, exact semantics: a TARGET row
    matching two source rows raises BEFORE any staging — the target is
    byte-identical after the failed MERGE. Duplicate source keys that
    match NO target row are legal (ordinary not-matched inserts), as
    are insert-only MERGEs."""
    e = engine.execute
    e("create table mm (k int, v int)")
    e("insert into mm values (1, 10), (2, 20)")
    e("create table mmsrc (k int, v int)")
    e("insert into mmsrc values (1, 11), (1, 12), (3, 30)")

    files_before = engine._data_files("mm")
    with pytest.raises(EngineError, match="more than one source row"):
        e(
            "merge into mm using mmsrc on mm.k = mmsrc.k"
            " when matched then update set v = mmsrc.v"
        )
    assert engine._data_files("mm") == files_before  # nothing mutated
    assert e("select * from mm order by k").rows == [(1, 10), (2, 20)]

    with pytest.raises(EngineError, match="more than one source row"):
        e(
            "merge into mm using mmsrc on mm.k = mmsrc.k"
            " when matched then delete"
        )

    # no matched clause: duplicate source keys are legal (each
    # unmatched source row inserts), per ANSI
    r = e(
        "merge into mm using mmsrc on mm.k = mmsrc.k"
        " when not matched then insert values (mmsrc.k, mmsrc.v)"
    )
    assert r.effect_rows == 1  # only k=3 was unmatched
    assert e("select * from mm order by k, v").rows == [
        (1, 10), (2, 20), (3, 30),
    ]

    # duplicate source keys matching NO target row, WITH a matched
    # clause: ANSI-legal — both rows are not-matched inserts (a
    # source-side duplicate probe would wrongly reject this)
    e("create table mmok (k int, v int)")
    e("insert into mmok values (50, 0)")
    e("create table mmoksrc (k int, v int)")
    e("insert into mmoksrc values (7, 1), (7, 2), (50, 5)")
    e(
        "merge into mmok using mmoksrc on mmok.k = mmoksrc.k"
        " when matched then update set v = mmoksrc.v"
        " when not matched then insert values (mmoksrc.k, mmoksrc.v)"
    )
    assert e("select * from mmok order by k, v").rows == [
        (7, 1), (7, 2), (50, 5),
    ]

    # non-equi ON, one target row matching SEVERAL source rows: the
    # cheap probe can't parse it, but the exact backstop must fire —
    # round-3's code silently emitted one updated row PER match here
    e("create table mm2 (k int, v int)")
    e("insert into mm2 values (5, 0)")
    with pytest.raises(EngineError, match="more than one source row"):
        e(
            "merge into mm2 using mmsrc on mm2.k > mmsrc.k"
            " when matched then update set v = 1"
        )
    assert e("select * from mm2").rows == [(5, 0)]  # untouched

    # ON clause the cheap probe can't parse (arithmetic), but at most
    # one source row matches each target row: legal, backstop passes —
    # no false-positive rejection
    e("create table mm3 (k int, v int)")
    e("insert into mm3 values (2, 0), (10, 0)")
    e(
        "merge into mm3 using mmsrc on mm3.k = mmsrc.k + 7"
        " when matched then update set v = 1"
    )  # k=10 matches only source k=3; the duplicate k=1 rows miss
    assert e("select * from mm3 order by k").rows == [(2, 0), (10, 1)]


def test_merge_dup_check_escape_hatch(engine):
    """`SET andb.merge_dup_check = off` skips the multiple-match guard
    aggregate for known-deduped sources (VERDICT r4 #4). With the guard
    off a multi-matched target row follows the raw left-join rewrite —
    one output row PER source match — which is exactly why the default
    stays on; re-enabling restores the ANSI error."""
    e = engine.execute
    e("create table gd (k int, v int)")
    e("insert into gd values (1, 10), (2, 20)")
    e("create table gdsrc (k int, v int)")
    e("insert into gdsrc values (1, 11), (1, 12)")

    e("set andb.merge_dup_check = off")
    r = e(
        "merge into gd using gdsrc on gd.k = gdsrc.k"
        " when matched then update set v = gdsrc.v"
    )
    assert r.effect_rows >= 1
    # documented anomaly: k=1 duplicated, once per source match
    assert e("select v from gd where k = 1 order by v").rows == [
        (11,), (12,),
    ]
    assert e("select v from gd where k = 2").rows == [(20,)]

    e("set andb.merge_dup_check = on")
    with pytest.raises(EngineError, match="more than one source row"):
        e(
            "merge into gd using gdsrc on gd.k = gdsrc.k"
            " when matched then update set v = gdsrc.v"
        )


def test_alter_case_insensitive_resurrection_guard(engine):
    """`ADD COLUMN secret` after `DROP COLUMN Secret` must take the
    scrub path (Spark resolves parquet fields case-insensitively — a
    metadata-only re-ADD would resurrect the dropped values), and
    case-variant duplicates are rejected."""
    e = engine.execute
    e("create table cs (id int, Secret int)")
    e("insert into cs values (1, 777)")
    e("alter table cs drop column secret")  # case-variant drop works
    with pytest.raises(EngineError, match="already exists"):
        e("alter table cs add column ID int")
    e("alter table cs add column secret int")
    # scrubbed: the old 777 must NOT resurface under the new column
    assert e("select id, secret from cs").rows == [(1, None)]


def test_update_set_resolves_columns_case_insensitively(engine):
    e = engine.execute
    e("create table uc (price int)")
    e("insert into uc values (1)")
    e("update uc set Price = 5")
    assert e("select price from uc").rows == [(5,)]


def test_desc_shorthand_and_duplicate_insert_columns(engine):
    e = engine.execute
    e("create table dd (a int, b text)")
    e("insert into dd values (1, 'x')")
    assert e("desc dd").rows  # bare shorthand
    assert e("desc extended dd").rows  # multi-word falls through
    # duplicated column list: error (Spark's ambiguity), never two rows
    with pytest.raises(EngineError):
        e("insert into dd (a, a) values (1, 2)")
    assert e("select count(1) as n from dd").rows == [(1,)]
