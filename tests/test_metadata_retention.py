"""Metadata-version retention (write.metadata.delete-after-commit.enabled
+ write.metadata.previous-versions-max): old v*.metadata.json files are
pruned after each commit, the spec metadata-log never references pruned
files, and a table whose early versions are gone still loads — even when
the version hint is lost.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from icepack.io import load
from icepack.table import IceTable
from tests.conftest import SF_DIR


@pytest.fixture()
def nation(spark):
    return load(spark, SF_DIR, "nation")


def _versions(loc):
    mdir = os.path.join(loc, "metadata")
    return sorted(
        int(f[1:].split(".")[0])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".metadata.json")
    )


def test_prune_keeps_window(spark, tmp_path, nation):
    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark,
        loc,
        nation.schema,
        properties={
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "2",
        },
    )
    for i in range(5):
        t.append(nation.filter(F.col("n_nationkey") == i))
    # v1..v6 written; keep current + 2 previous
    assert _versions(loc) == [4, 5, 6]
    assert t.count() == 5


def test_disabled_by_default(spark, tmp_path, nation):
    loc = str(tmp_path / "t")
    t = IceTable.create(spark, loc, nation.schema)
    for i in range(3):
        t.append(nation.filter(F.col("n_nationkey") == i))
    assert _versions(loc) == [1, 2, 3, 4]


def test_load_after_prune_with_lost_hint(spark, tmp_path, nation):
    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark,
        loc,
        nation.schema,
        properties={
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "1",
        },
    )
    for i in range(4):
        t.append(nation.filter(F.col("n_nationkey") == i))
    os.remove(os.path.join(loc, "metadata", "version-hint.json"))
    t2 = IceTable.load(spark, loc)
    assert t2.count() == 4
    assert t2.meta.current_snapshot_id == t.meta.current_snapshot_id


def test_spec_primary_log_trimmed_and_readable(spark, tmp_path, nation):
    from icepack.iceberg_import import read_iceberg

    loc = str(tmp_path / "t")
    t = IceTable.create(
        spark,
        loc,
        nation.schema,
        properties={
            "format.spec-primary": "true",
            "write.metadata.delete-after-commit.enabled": "true",
            "write.metadata.previous-versions-max": "2",
        },
    )
    for i in range(5):
        t.append(nation.filter(F.col("n_nationkey") == i))
    vs = _versions(loc)
    assert vs[-1] - vs[0] == 2 and len(vs) == 3
    cur = json.load(
        open(os.path.join(loc, "metadata", f"v{vs[-1]}.metadata.json"))
    )
    logged = [e["metadata-file"] for e in cur.get("metadata-log", [])]
    # every logged predecessor must still exist on disk
    assert logged and all(os.path.exists(p) for p in logged)
    assert read_iceberg(spark, loc).count() == 5
    # reload with BOTH hints lost: native load and the spec reader each
    # recover the latest surviving version from a directory listing
    os.remove(os.path.join(loc, "metadata", "version-hint.json"))
    os.remove(os.path.join(loc, "metadata", "version-hint.text"))
    assert IceTable.load(spark, loc).count() == 5
    assert read_iceberg(spark, loc).count() == 5
