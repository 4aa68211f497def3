"""Contract test for TableIO's Iceberg-catalog branch (operators B1–B3's
catalog path, io/tables.py). No Iceberg runtime jar ships in this sandbox, so
the test pins the CONTRACT — which DataFrameWriterV2 / catalog calls fire
with which identifiers — against fakes; the parquet fallback branch is
integration-tested in test_tables_weighted.py."""

from unittest import mock

import pytest

from sparkgraph.io.tables import TableIO


class _FakeWriterV2:
    def __init__(self, log):
        self.log = log

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        self.log.append(("writeTo", ident))
        return _FakeWriterV2(self.log)


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def option(self, k, v):
        self.log.append(("read.option", k, v))
        return self

    def table(self, ident):
        self.log.append(("read.table", ident))
        return mock.sentinel.table_df


class _FakeRow:
    def __init__(self, version):
        self.version = version


class _FakeSqlDF:
    """Stand-in for spark.sql results: SELECT statements (the normalized
    snapshots query) collect to a fixed snapshot log; CALL/DDL return
    nothing collectable."""

    def __init__(self, stmt, versions):
        self.stmt = stmt
        self.versions = versions

    def collect(self):
        return [_FakeRow(v) for v in self.versions]


class _FakeSpark:
    def __init__(self, log, snapshot_versions=(41, 42)):
        self.log = log
        self.read = _FakeReader(log)
        self.snapshot_versions = snapshot_versions

    def sql(self, stmt):
        self.log.append(("sql", stmt))
        return _FakeSqlDF(stmt, self.snapshot_versions)


@pytest.fixture()
def io_and_log(tmp_path):
    log = []
    io = TableIO(_FakeSpark(log), str(tmp_path), catalog="ice.db")
    return io, log


def test_catalog_save_uses_writer_v2(io_and_log):
    io, log = io_and_log
    version = io.save(_FakeDF(log), "edges")
    assert version == -1  # catalog manages snapshots, not the v= layout
    assert log == [("writeTo", "ice.db.edges"), ("createOrReplace",)]


def test_catalog_load_reads_table(io_and_log):
    io, log = io_and_log
    df = io.load("edges")
    assert df is mock.sentinel.table_df
    assert log == [("read.table", "ice.db.edges")]


def test_catalog_load_time_travel_uses_version_as_of(io_and_log):
    """load(version=...) must reach the catalog as the DSv2 time-travel
    option (VERSION AS OF) — both TableIO branches answer the same
    time-travel contract (the parquet branch's v=<k> read is integration-
    tested in test_tables_weighted.py)."""
    io, log = io_and_log
    df = io.load("edges", version=7)
    assert df is mock.sentinel.table_df
    assert log == [("read.option", "versionAsOf", 7), ("read.table", "ice.db.edges")]


def test_catalog_drop_issues_drop_table(io_and_log):
    io, log = io_and_log
    io.drop("edges")
    assert log == [("sql", "DROP TABLE IF EXISTS ice.db.edges")]


def test_catalog_branch_never_touches_local_layout(io_and_log, tmp_path):
    import os

    io, log = io_and_log
    io.save(_FakeDF(log), "edges")
    io.drop("edges")
    assert os.listdir(tmp_path) == []  # no v=/_latest fallback artifacts


def test_catalog_snapshots_normalized_to_contract(io_and_log):
    """The catalog branch must answer the SAME (version, is_current) schema
    as the fallback: snapshot_id aliased to version, is_current derived from
    the main branch ref — not Iceberg's raw snapshots schema."""
    io, log = io_and_log
    df = io.snapshots("edges")
    assert isinstance(df, _FakeSqlDF)
    stmt = log[-1][1]
    assert "s.snapshot_id AS version" in stmt
    assert "FROM ice.db.edges.snapshots s" in stmt
    assert "ice.db.edges.refs" in stmt and "is_current" in stmt


def test_catalog_rollback_validates_then_calls_procedure(io_and_log):
    io, log = io_and_log
    io.rollback("edges", 42)
    # first statement: the snapshots() existence check; last: the procedure
    assert log[0][0] == "sql" and "snapshots" in log[0][1]
    assert log[-1] == (
        "sql", "CALL ice.system.rollback_to_snapshot('db.edges', 42)"
    )


def test_catalog_rollback_unknown_snapshot_raises(io_and_log):
    io, log = io_and_log
    with pytest.raises(ValueError, match="no snapshot"):
        io.rollback("edges", 999)
    assert not any(
        e[0] == "sql" and "rollback_to_snapshot" in e[1] for e in log
    )


def test_parquet_branch_snapshots_and_rollback(spark, tmp_path):
    """Same contract, REAL fallback branch: snapshot listing shows every
    retained version with the current one flagged; rollback is a metadata-
    only pointer move; a PUT after rollback does not clobber the retained
    newer snapshot."""
    io = TableIO(spark, str(tmp_path))
    for k in (1, 2, 3):
        v = io.save(spark.createDataFrame([(k,)], "x long"), "t")
        assert v == k
    snaps = {r.version: r.is_current for r in io.snapshots("t").collect()}
    assert snaps == {1: False, 2: False, 3: True}

    io.rollback("t", 2)
    assert io.latest_version("t") == 2
    assert io.load("t").collect()[0].x == 2          # GET follows the pointer
    assert io.load("t", version=3).collect()[0].x == 3  # v3 still retained
    snaps = {r.version: r.is_current for r in io.snapshots("t").collect()}
    assert snaps == {1: False, 2: True, 3: False}

    v = io.save(spark.createDataFrame([(4,)], "x long"), "t")
    assert v == 4  # next PUT allocates past the retained max, not pointer+1
    assert sorted(snaps := io.versions("t")) == [1, 2, 3, 4]
    assert io.load("t", version=3).collect()[0].x == 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot"):
        io.rollback("t", 99)
