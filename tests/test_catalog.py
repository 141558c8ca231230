"""Multi-table catalog: atomic cross-table snapshot visibility. Pins: a
cut only advances at publish (readers joining two tables never see a
torn batch), crash-before-publish leaves a stale-but-consistent cut,
publish is monotonic + optimistic-concurrent, and vacuum on a member
table can never delete a pinned version (the _catalog tag protocol)."""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.lakehouse.catalog import Catalog, CatalogConflictError
from helpers import make_table


def _agg_table(root):
    return LakeTable.create(
        root,
        TableSchema.create(
            [("source", "string"), ("n_docs", "bigint")], key="source"
        ),
        n_buckets=2,
    )


def _docs(spark, ids, src="crawl", lsn0=0):
    return spark.createDataFrame(
        [(f"doc-{i:06d}", [1, 2], 2, src, "2026-01-01 00:00:00", lsn0 + j, False)
         for j, i in enumerate(ids)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def _aggrows(spark, n):
    return spark.createDataFrame(
        [("crawl", n, "2026-01-01 00:00:00", n, False)],
        "source string, n_docs long, _event_ts string, _lsn long, _deleted boolean",
    ).withColumn("_event_ts", F.col("_event_ts").cast("timestamp"))


def test_cut_advances_only_at_publish(spark, scratch):
    holding = make_table(scratch, n_buckets=4)
    agg = _agg_table(os.path.join(scratch, "agg"))
    holding.commit(add_files=holding.write_data_files(_docs(spark, range(10))),
                   batch_id=0)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 10)), batch_id=0)

    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding", holding)
    cat.register("agg", agg)
    cut0 = cat.pin()

    # batch 1 lands on BOTH tables, but no publish yet: catalog readers
    # still see the old, mutually-consistent cut
    holding.commit(add_files=holding.write_data_files(
        _docs(spark, range(10, 15), lsn0=100)), batch_id=1)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 15), delta=True),
               batch_id=1)
    assert cat.pin() == cut0
    n_h = cat.read(spark, "holding").count()
    n_a = cat.read(spark, "agg").collect()[0]["n_docs"]
    assert (n_h, n_a) == (10, 10)  # consistent: both pre-batch-1

    cat.publish({"holding": holding.current_version(),
                 "agg": agg.current_version()})
    n_h = cat.read(spark, "holding").count()
    n_a = cat.read(spark, "agg").collect()[0]["n_docs"]
    assert (n_h, n_a) == (15, 15)  # the whole cut moved at once


def test_torn_write_is_never_visible(spark, scratch):
    """Coordinator crash between table commits: holding has batch 1, agg
    does not. Catalog readers keep the previous cut — stale, consistent."""
    holding = make_table(scratch, n_buckets=4)
    agg = _agg_table(os.path.join(scratch, "agg"))
    holding.commit(add_files=holding.write_data_files(_docs(spark, range(8))),
                   batch_id=0)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 8)), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding", holding)
    cat.register("agg", agg)

    holding.commit(add_files=holding.write_data_files(
        _docs(spark, range(8, 13), lsn0=50)), batch_id=1)
    # "crash" before agg's commit and before publish
    assert cat.read(spark, "holding").count() == 8
    assert cat.read(spark, "agg").collect()[0]["n_docs"] == 8
    # re-driven coordinator: holding's batch 1 is a ledger skip, agg
    # applies, then the cut publishes — convergence, not duplication
    assert holding.is_committed(1)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 13), delta=True),
               batch_id=1)
    cat.publish({"holding": holding.current_version(),
                 "agg": agg.current_version()})
    assert cat.read(spark, "holding").count() == 13
    assert cat.read(spark, "agg").collect()[0]["n_docs"] == 13


def test_publish_guards(spark, scratch):
    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_docs(spark, range(3))), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("t", t)
    v = cat.pin()["t"]
    with pytest.raises(KeyError):
        cat.publish({"nope": 1})
    with pytest.raises(CatalogConflictError, match="advance"):
        cat.publish({"t": v - 1})
    with pytest.raises(CatalogConflictError, match="expected catalog"):
        cat.publish({"t": v}, expect_version=cat.current_version() + 5)


def test_vacuum_cannot_delete_a_pinned_cut(spark, scratch):
    """Member-table GC vs the catalog: churn a table far past retain_last
    without publishing; the pinned version must stay readable (the
    _catalog tag pins the table's retention floor)."""
    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_docs(spark, range(5))), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("t", t)
    pinned = cat.pin()["t"]
    before = {r["doc_id"] for r in cat.read(spark, "t").collect()}

    for b in range(1, 10):
        t.commit(add_files=t.write_data_files(
            _docs(spark, range(5 + b * 3, 8 + b * 3), lsn0=b * 10)), batch_id=b)
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    assert t.oldest_retained_version() <= pinned
    assert {r["doc_id"] for r in cat.read(spark, "t").collect()} == before

    # advancing the cut releases the old history on the next vacuum
    cat.publish({"t": t.current_version()})
    t.vacuum(retain_last=2, orphan_grace_sec=0)
    assert t.oldest_retained_version() > pinned
    assert cat.read(spark, "t").count() == 5 + 9 * 3


def test_catalog_rolls_forward_past_crashed_publish(spark, scratch):
    """A publisher that wrote c{v+1}.json but died before the pointer swap
    must not wedge the catalog: the next publish adopts the orphan (its
    content is whole by link-atomicity) and continues on top."""
    import json as _json

    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_docs(spark, range(4))), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("t", t)
    v = cat.current_version()

    # simulate the crash: next version file exists, pointer not swapped
    snap = cat._snapshot()
    orphan = {"version": v + 1, "tables": snap["tables"]}
    with open(os.path.join(cat.meta_dir, f"c{v + 1}.json"), "w") as f:
        _json.dump(orphan, f)
    assert cat.current_version() == v  # pointer still old

    t.commit(add_files=t.write_data_files(_docs(spark, range(4, 7), lsn0=40)),
             batch_id=1)
    cat.publish({"t": t.current_version()})  # adopts orphan, then publishes
    assert cat.current_version() == v + 2
    assert cat.read(spark, "t").count() == 7


def test_reregister_keeps_old_cut_pinned_until_swap(spark, scratch):
    """Re-registering a table at a newer version must not un-pin the
    version the still-current cut references (pending-tag dance)."""
    t = make_table(scratch, n_buckets=2)
    t.commit(add_files=t.write_data_files(_docs(spark, range(5))), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("t", t)
    old_pin = cat.pin()["t"]
    for b in range(1, 10):
        t.commit(add_files=t.write_data_files(
            _docs(spark, range(5 + b * 2, 7 + b * 2), lsn0=b * 10)), batch_id=b)
    cat.register("t", t)  # re-pin at current
    # after re-register the OLD pin may be released, the new one must hold
    t.vacuum(retain_last=1, orphan_grace_sec=0)
    assert cat.read(spark, "t").count() == 5 + 9 * 2
    assert old_pin < cat.pin()["t"]


def test_catalog_sql_reads_one_cut(spark, scratch):
    """Catalog.sql joins every table at ONE snapshot read: a publish
    racing the query cannot tear it; show_tables reports pin lag."""
    holding = make_table(scratch, n_buckets=4)
    agg = _agg_table(os.path.join(scratch, "agg"))
    holding.commit(add_files=holding.write_data_files(_docs(spark, range(10))),
                   batch_id=0)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 10)), batch_id=0)
    cat = Catalog.create(os.path.join(scratch, "cat"))
    cat.register("holding", holding)
    cat.register("agg", agg)

    # both tables advance, no publish: SQL still sees the consistent cut
    holding.commit(add_files=holding.write_data_files(
        _docs(spark, range(10, 15), lsn0=100)), batch_id=1)
    agg.commit(add_files=agg.write_data_files(_aggrows(spark, 15), delta=True),
               batch_id=1)
    row = cat.sql(spark, """
        SELECT a.n_docs, count(*) AS n_live
        FROM agg a JOIN holding h ON a.source = h.source
        GROUP BY a.n_docs""").collect()
    assert [(r["n_docs"], r["n_live"]) for r in row] == [(10, 10)]

    st = {r["table_name"]: r for r in cat.show_tables(spark).collect()}
    assert st["holding"]["pinned_version"] == 1
    assert st["holding"]["head_version"] == 2  # pin lag visible

    cat.publish({"holding": holding.current_version(),
                 "agg": agg.current_version()})
    row = cat.sql(spark, "SELECT count(*) AS n FROM holding").collect()
    assert row[0]["n"] == 15
