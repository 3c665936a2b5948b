"""Metadata sort orders (WRITE ORDERED BY; SURVEY.md §2.6 O5,
docs/03-metadata-management.md:53-75 lists sort orders among the
metadata-file fields, docs/09-query-performance.md:156-168 ties
clustered layout to pruning effectiveness).

Invariants:
- replace_sort_order is a metadata-only commit that survives a reload;
- sorted appends produce internally-ordered files with tight per-file
  bounds, and with range distribution the files are pairwise disjoint
  on the sort key → min/max file pruning works on plain appends;
- compaction auto-applies the metadata sort order;
- the order is tracked by column ID, so a rename doesn't break it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR, rows_sorted  # noqa: E402

from icepack.catalog import Catalog  # noqa: E402
from icepack.expr import col  # noqa: E402
from icepack.io import load  # noqa: E402


def test_sort_order_roundtrip_and_describe(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.so1", orders.schema)
    assert t.meta.sort_order.fields == []
    t.replace_sort_order("o_orderdate", "o_totalprice DESC")
    t2 = cat.load_table("db.so1")
    flds = t2.meta.sort_order.fields
    names = [t2.meta.schema.field_by_id(f.source_id).name for f in flds]
    assert names == ["o_orderdate", "o_totalprice"]
    assert [f.direction for f in flds] == ["asc", "desc"]
    assert t2.describe()["sort-order"] == [f.to_json() for f in flds]
    # no-args resets to the reserved unsorted order (id 0)
    t2.replace_sort_order()
    assert t2.meta.default_sort_order_id == 0
    assert t2.meta.sort_order.fields == []


def test_sorted_append_prunes_like_clustering(spark, warehouse):
    """Range-distributed sorted appends give disjoint per-file bounds —
    a narrow predicate scans a strict subset of files WITHOUT any
    compaction pass; an unsorted control table scans everything."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    shuffled = orders.repartition(8)  # every task sees the full key range

    plain = cat.create_table("db.unsorted", orders.schema)
    plain.append(shuffled)

    t = cat.create_table("db.sorted", orders.schema)
    t.replace_sort_order("o_orderkey")
    t.set_properties(**{"write.distribution-mode": "range"})
    t.append(shuffled)

    pred = col("o_orderkey") < 100
    _, unsorted_plan = plain.plan_files(pred)
    _, sorted_plan = t.plan_files(pred)
    assert sorted_plan["files_total"] > 1
    assert sorted_plan["files_scanned"] < sorted_plan["files_total"]
    assert unsorted_plan["files_scanned"] == unsorted_plan["files_total"]
    # bounds are pairwise disjoint on the sort column (range shuffle)
    spans = sorted(
        (f.stats["o_orderkey"]["min"], f.stats["o_orderkey"]["max"])
        for f in t.live_files()
    )
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # and the table still returns exactly what went in
    assert rows_sorted(t.toDF()) == rows_sorted(orders)


def test_compact_auto_applies_metadata_sort_order(spark, warehouse):
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.so2", orders.schema)
    t.append(orders.repartition(8))
    t.replace_sort_order("o_orderkey")
    pred = col("o_orderkey") < 100
    _, before = t.plan_files(pred)
    assert before["files_scanned"] == before["files_total"]
    t.compact(target_file_size=8 * 1024)  # no cluster_by: metadata order applies
    _, after = t.plan_files(pred)
    assert after["files_total"] > 1
    assert after["files_scanned"] < after["files_total"]


def test_sort_order_survives_rename(spark, warehouse):
    """Orders reference column IDs, not names (docs/06:55-73)."""
    cat = Catalog(spark, warehouse)
    orders = load(spark, SF_DIR, "orders")
    t = cat.create_table("db.so3", orders.schema)
    t.replace_sort_order("o_totalprice DESC")
    t.rename_column("o_totalprice", "price")
    t.append(orders.withColumnRenamed("o_totalprice", "price").limit(100))
    files = t.live_files()
    assert files, "append produced no files"
    # the sorted write ran against the renamed column without error and
    # harvested stats for it
    assert all("price" in f.stats for f in files)
