"""Versioned sink: snapshot isolation by immutability + retention."""

from __future__ import annotations

import pytest

from graph_database_spark.sinks.versioned import (
    list_versions,
    read_version,
    vacuum,
    write_version,
)


def test_versions_pin_and_replay(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_version(spark.range(10), path, note="first")
    v2 = write_version(spark.range(25), path, note="second")
    assert (v1, v2) == (1, 2)

    assert read_version(spark, path).count() == 25          # latest
    assert read_version(spark, path, version=1).count() == 10  # pinned replay
    assert [e["rows"] for e in list_versions(path)] == [10, 25]

    with pytest.raises(ValueError):
        read_version(spark, path, version=9)


def test_vacuum_retention(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for n in (5, 6, 7):
        write_version(spark.range(n), path)
    removed = vacuum(path, keep=2)
    assert removed == [1]
    assert read_version(spark, path, version=3).count() == 7
    with pytest.raises(ValueError):
        read_version(spark, path, version=1)


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    from graph_database_spark.sinks.versioned import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    v1 = write_version(base, path, note="base")
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id long, val string, is_delete boolean",
    )
    v2 = merge_upsert(spark, path, updates, ["id"], delete_col="is_delete")
    assert (v1, v2) == (1, 2)
    latest = {r["id"]: r["val"] for r in read_version(spark, path).collect()}
    assert latest == {1: "a", 2: "B", 4: "d"}  # updated, inserted, 3 deleted
    # time travel: the pre-merge snapshot is untouched
    old = {r["id"]: r["val"] for r in read_version(spark, path, 1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_upsert_into_empty_table(spark, tmp_path):
    from graph_database_spark.sinks.versioned import merge_upsert

    path = str(tmp_path / "tbl")
    ups = spark.createDataFrame([(1, "x")], "id long, val string")
    assert merge_upsert(spark, path, ups, ["id"]) == 1
    assert read_version(spark, path).count() == 1
