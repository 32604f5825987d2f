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
