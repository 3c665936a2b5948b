"""Every oracle's DuckDB result type must be driver-hash-safe.

The per-round driver value-hashes Spark and DuckDB results; DuckDB
types with no exact Spark counterpart (HUGEINT from SUM(BIGINT),
UHUGEINT, TIMESTAMP_NS, TIME) hash differently even when every cell
value is identical — this is exactly what made x28/x29/a15 driver-red
in rounds 1-2 while the local value comparison passed.  This scan
binds (does not execute) every registered oracle via DESCRIBE and
fails the build if any such type leaks, so the class can never ship
again.  No Spark session needed — pure DuckDB, runs in seconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from icepack.io import TABLES
from icepack.queries import all_oracles

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Types whose DuckDB Arrow representation drifts from the Spark value
# under the driver's type-sensitive hash.  DECIMAL is allowed only when
# the Spark side is the same decimal — today no oracle emits DECIMAL at
# top level, so a bare ban keeps the gate simple and strict.
BANNED = ("HUGEINT", "UHUGEINT", "TIMESTAMP_NS", "TIME", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_driver_hostile_oracle_types(con):
    bad = []
    for name, sql in sorted(all_oracles().items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # pragma: no cover - binding must succeed
            bad.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, dty, *_ in desc:
            base = dty.split("(")[0].strip().rstrip("[]").strip()
            if base in BANNED:
                bad.append(f"{name}.{col}: {dty}")
    assert not bad, (
        "oracle columns with driver-hash-hostile DuckDB types "
        "(CAST them in the oracle SQL): " + "; ".join(bad)
    )


def test_priority_names_resolve():
    """Every PRIORITY entry must name a registered query (a typo would
    silently drop it from the driver's bounded sample) and carry no
    duplicates (double entries waste sample budget)."""
    from icepack.queries import PRIORITY, all_queries

    qs = all_queries()
    missing = [n for n in PRIORITY if n not in qs]
    assert not missing, f"PRIORITY names not in registry: {missing}"
    dupes = [n for n in set(PRIORITY) if PRIORITY.count(n) > 1]
    assert not dupes, f"duplicate PRIORITY entries: {dupes}"
