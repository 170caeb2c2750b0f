"""Snapshot-versioned table (plans/versioned.py): commit/pointer
atomicity, time travel, rollback, expiry, and compaction — the Iceberg
table semantics the materialized KG tables rely on."""

import os

import pytest

from waka_spark.plans.versioned import VersionedTable


@pytest.fixture()
def table(tmp_path):
    return VersionedTable(str(tmp_path / "edges"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_commit_read_time_travel(spark, table):
    assert table.current_version() is None
    assert table.versions() == []
    v0 = table.commit(_df(spark, 0, 10))
    v1 = table.commit(_df(spark, 0, 25))
    assert (v0, v1) == (0, 1)
    assert table.current_version() == 1
    assert table.read(spark).count() == 25          # live
    assert table.read(spark, 0).count() == 10       # VERSION AS OF
    assert table.manifest(1) == {
        "version": 1, "parent": 0, "rows": 25,
        "n_files": table.manifest(1)["n_files"],
    }


def test_rollback_is_pointer_only(spark, table):
    table.commit(_df(spark, 0, 10))
    table.commit(_df(spark, 0, 99))
    table.rollback(0)
    assert table.current_version() == 0
    assert table.read(spark).count() == 10
    # the abandoned snapshot stays readable for forensics
    assert table.read(spark, 1).count() == 99
    # next commit branches from the pointer, overwriting the abandoned v1
    assert table.commit(_df(spark, 0, 3)) == 1
    assert table.read(spark).count() == 3
    with pytest.raises(FileNotFoundError):
        table.rollback(77)


def test_expire_keeps_current_and_recent(spark, table):
    for hi in (5, 6, 7, 8):
        table.commit(_df(spark, 0, hi))
    table.rollback(1)  # current is NOT among the newest — must survive
    expired = table.expire(keep_last=2)
    assert expired == [0]
    assert sorted(table.versions()) == [1, 2, 3]
    assert table.read(spark).count() == 6
    with pytest.raises(FileNotFoundError):
        table.read(spark, 0)


def test_compact_binpacks_without_changing_rows(spark, table):
    df = _df(spark, 0, 1000).repartition(16)
    table.commit(df)
    assert table.manifest(0)["n_files"] >= 8
    new_v = table.compact(spark, target_rows_per_file=500)
    assert new_v == 1
    m = table.manifest(1)
    assert m["rows"] == 1000 and m["n_files"] == 2
    a = {r.k for r in table.read(spark, 0).collect()}
    b = {r.k for r in table.read(spark, 1).collect()}
    assert a == b


def test_crash_before_repoint_leaves_old_snapshot(spark, table, monkeypatch):
    """If the data write succeeds but the process dies before the pointer
    moves, readers still resolve the previous snapshot."""
    table.commit(_df(spark, 0, 10))

    boom = RuntimeError("crash before repoint")
    monkeypatch.setattr(
        table, "_repoint",
        lambda v: (_ for _ in ()).throw(boom))
    with pytest.raises(RuntimeError):
        table.commit(_df(spark, 0, 50))
    monkeypatch.undo()
    assert table.current_version() == 0
    assert table.read(spark).count() == 10
    # recovery: the next commit overwrites the orphaned v1 dir
    table.commit(_df(spark, 0, 30))
    assert table.current_version() == 1
    assert table.read(spark).count() == 30
