"""Multi-statement transactions (SURVEY.md D6,
docs/08-acid-transactions.md:143-165): BEGIN..COMMIT staging on hidden
WAP branches, atomic publish via fast-forward, ROLLBACK, read-your-
writes, serialization failure on concurrent main writers, and the
autocommit-only rules for DDL and externally-cataloged tables.
"""

from __future__ import annotations

import pytest

from icepack.sql import IceSQL
from icepack.table import CommitConflict


@pytest.fixture()
def engine(spark, tmp_path):
    return IceSQL(spark, str(tmp_path / "wh"))


def _mk(engine, rows=3):
    engine.sql("CREATE ICEBERG TABLE acc (id BIGINT, bal DOUBLE)")
    vals = ", ".join(f"({i}, {i * 100}.0)" for i in range(rows))
    engine.sql(f"INSERT INTO acc VALUES {vals}")


def test_reader_sees_none_until_commit_then_all(engine, spark, tmp_path):
    """The docs' BEGIN; INSERT; INSERT; COMMIT block, with an outside
    reader (separate catalog handle — another session) probing between
    statements: it must see NONE of the staged rows mid-transaction and
    ALL of them after COMMIT."""
    _mk(engine)
    outside = IceSQL(spark, str(tmp_path / "wh"))

    engine.sql("BEGIN")
    engine.sql("INSERT INTO acc VALUES (10, 1000.0)")
    assert outside.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n == 3
    engine.sql("INSERT INTO acc VALUES (11, 1100.0)")
    engine.sql("UPDATE acc SET bal = bal + 1 WHERE id = 0")
    assert outside.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n == 3
    assert (
        outside.sql("SELECT bal FROM acc WHERE id = 0").collect()[0].bal == 0.0
    )
    engine.sql("COMMIT")
    got = {r.id: r.bal for r in outside.sql("SELECT id, bal FROM acc").collect()}
    assert got == {0: 1.0, 1: 100.0, 2: 200.0, 10: 1000.0, 11: 1100.0}
    # staging branch is gone; history on main is intact
    t = engine.catalog.load_table("acc")
    assert not any(n.startswith("__txn_") for n in t.meta.refs)


def test_read_your_writes_inside_txn(engine):
    _mk(engine)
    engine.sql("BEGIN")
    engine.sql("INSERT INTO acc VALUES (7, 700.0)")
    n = engine.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n
    assert n == 4  # the transaction sees its own insert
    engine.sql("DELETE FROM acc WHERE id = 7")
    assert engine.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n == 3
    engine.sql("COMMIT")
    assert engine.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n == 3


def test_rollback_discards_everything(engine, spark, tmp_path):
    _mk(engine)
    engine.sql("BEGIN")
    engine.sql("INSERT INTO acc VALUES (8, 800.0)")
    engine.sql("DELETE FROM acc WHERE id = 1")
    engine.sql("ROLLBACK")
    got = sorted(r.id for r in engine.sql("SELECT id FROM acc").collect())
    assert got == [0, 1, 2]
    t = engine.catalog.load_table("acc")
    assert not any(n.startswith("__txn_") for n in t.meta.refs)


def test_txn_on_empty_table_commits_atomically(engine, spark, tmp_path):
    """An empty table has no snapshot to branch from; the staged write
    commits an EMPTY genesis (content unchanged) and branches — the
    outside reader sees 0 rows until COMMIT."""
    engine.sql("CREATE ICEBERG TABLE fresh (id BIGINT, v DOUBLE)")
    outside = IceSQL(spark, str(tmp_path / "wh"))
    engine.sql("BEGIN")
    engine.sql("INSERT INTO fresh VALUES (1, 1.0)")
    engine.sql("INSERT INTO fresh VALUES (2, 2.0)")
    assert outside.sql("SELECT COUNT(*) AS n FROM fresh").collect()[0].n == 0
    engine.sql("COMMIT")
    assert outside.sql("SELECT COUNT(*) AS n FROM fresh").collect()[0].n == 2


def test_multi_table_txn(engine, spark, tmp_path):
    """Transfer across two tables: both INSERTs publish at COMMIT."""
    _mk(engine)
    engine.sql("CREATE ICEBERG TABLE audit (id BIGINT, note STRING)")
    outside = IceSQL(spark, str(tmp_path / "wh"))
    engine.sql("BEGIN")
    engine.sql("UPDATE acc SET bal = bal - 50 WHERE id = 2")
    engine.sql("INSERT INTO audit VALUES (2, 'debit 50')")
    assert outside.sql("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 0
    assert outside.sql("SELECT bal FROM acc WHERE id = 2").collect()[0].bal == 200.0
    engine.sql("COMMIT")
    assert outside.sql("SELECT COUNT(*) AS n FROM audit").collect()[0].n == 1
    assert outside.sql("SELECT bal FROM acc WHERE id = 2").collect()[0].bal == 150.0


def test_concurrent_main_writer_aborts_commit(engine, spark, tmp_path):
    """Serialization failure, not lost updates: if another session
    commits to main after the transaction staged its branch, COMMIT
    must fail (main is no longer an ancestor of the branch head)."""
    _mk(engine)
    outside = IceSQL(spark, str(tmp_path / "wh"))
    engine.sql("BEGIN")
    engine.sql("INSERT INTO acc VALUES (20, 2000.0)")
    outside.sql("INSERT INTO acc VALUES (99, 9900.0)")  # concurrent autocommit
    with pytest.raises((CommitConflict, ValueError)):
        engine.sql("COMMIT")
    # the outside write survives; the staged one is discarded/unpublished
    ids = sorted(r.id for r in outside.sql("SELECT id FROM acc").collect())
    assert 99 in ids and 20 not in ids


def test_ddl_inside_txn_rejected(engine):
    _mk(engine)
    engine.sql("BEGIN")
    with pytest.raises(ValueError, match="autocommit"):
        engine.sql("CREATE ICEBERG TABLE nope (id BIGINT)")
    engine.sql("ROLLBACK")


def test_txn_statement_errors(engine):
    _mk(engine)
    with pytest.raises(ValueError, match="outside"):
        engine.sql("COMMIT")
    with pytest.raises(ValueError, match="outside"):
        engine.sql("ROLLBACK")
    engine.sql("BEGIN")
    with pytest.raises(ValueError, match="nesting"):
        engine.sql("BEGIN")
    engine.sql("ROLLBACK")


def test_merge_inside_txn(engine, spark, tmp_path):
    """MERGE participates like any DML: staged on the branch, atomic at
    COMMIT."""
    _mk(engine)
    outside = IceSQL(spark, str(tmp_path / "wh"))
    engine.sql("BEGIN")
    engine.sql(
        "MERGE INTO acc t USING (SELECT 1 AS id, 123.0 AS bal) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET bal = s.bal "
        "WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.id, s.bal)"
    )
    engine.sql(
        "MERGE INTO acc t USING (SELECT 5 AS id, 555.0 AS bal) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET bal = s.bal "
        "WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.id, s.bal)"
    )
    assert outside.sql("SELECT COUNT(*) AS n FROM acc").collect()[0].n == 3
    engine.sql("COMMIT")
    got = {r.id: r.bal for r in outside.sql("SELECT id, bal FROM acc").collect()}
    assert got[1] == 123.0 and got[5] == 555.0 and len(got) == 4
