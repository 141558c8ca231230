"""Z-order (Morton) clustered compaction: multi-column stats pruning.

A lexicographic sort on (x, y) gives every file the FULL y range once x is
high-cardinality, so col_ranges on y never prunes; the bit-interleaved
z-value clusters rows into hyper-rectangles so a 2-D box query prunes on
both columns. Results must be exact either way — pruning is metadata-only."""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable
from concept_catalog_etl_spark.lakehouse.schema import TableSchema


def _mk(scratch, name):
    schema = TableSchema.create(
        [("doc_id", "string"), ("x", "int"), ("y", "int")], key="doc_id"
    )
    return LakeTable.create(os.path.join(scratch, name), schema, n_buckets=1)


def _grid(spark, n_side=64):
    # n_side^2 rows over a uniform 2-D grid, row order uncorrelated with
    # either axis (hashed shuffle) so pre-compaction files have full-range
    # stats on both columns
    n = n_side * n_side
    return spark.range(n).select(
        F.format_string("d-%06d", F.col("id")).alias("doc_id"),
        (F.col("id") % n_side).cast("int").alias("x"),
        (F.col("id") / n_side).cast("int").alias("y"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
    ).orderBy(F.xxhash64("id"))


def _box_count(spark, table, lo, hi):
    return table.read(
        spark, col_ranges={"x": (lo, hi), "y": (lo, hi)}
    ).count()


def test_zorder_prunes_both_axes_and_stays_exact(spark, scratch):
    n_side, files_target = 64, 16
    zt, lt = _mk(scratch, "z"), _mk(scratch, "l")
    for t in (zt, lt):
        t.commit(add_files=t.write_data_files(_grid(spark, n_side)), batch_id=0)
    target = (n_side * n_side) // files_target
    zt.compact(spark, cluster_by=["x", "y"], cluster_mode="zorder",
               target_rows_per_file=target)
    lt.compact(spark, cluster_by=["x", "y"], target_rows_per_file=target)

    # quarter-plane box: exact answer is (n_side/4)^2 rows
    lo, hi = 0, n_side // 4 - 1
    want = (hi - lo + 1) ** 2
    assert _box_count(spark, zt, lo, hi) == want
    assert _box_count(spark, lt, lo, hi) == want

    ranges = {"x": (lo, hi), "y": (lo, hi)}
    zrep = zt.scan_report(spark, col_ranges=ranges)
    lrep = lt.scan_report(spark, col_ranges=ranges)
    assert zrep["files_in_selected_buckets"] >= files_target
    # z-order: the box intersects only the files covering its corner of
    # the plane; lexicographic x-sort means ~every file spans the full y
    # range AND a narrow x slice, so only x prunes
    assert zrep["files_scanned"] < lrep["files_scanned"], (zrep, lrep)
    assert zrep["files_scanned"] <= zrep["files_in_selected_buckets"] // 2


def test_zorder_validations_and_null_safety(spark, scratch):
    t = _mk(scratch, "v")
    rows = _grid(spark, 8).withColumn(
        "y", F.when(F.col("y") % 3 == 0, None).otherwise(F.col("y"))
    )
    t.commit(add_files=t.write_data_files(rows), batch_id=0)
    with pytest.raises(ValueError, match="zorder needs numeric"):
        t.compact(spark, cluster_by=["doc_id"], cluster_mode="zorder")
    with pytest.raises(ValueError, match="cluster_mode"):
        t.compact(spark, cluster_by=["x"], cluster_mode="hilbert")
    # nulls in a z column are cell-0, results stay exact
    before = t.read(spark).count()
    t.compact(spark, cluster_by=["x", "y"], cluster_mode="zorder",
              target_rows_per_file=16)
    assert t.read(spark).count() == before
    got = t.read(spark, col_ranges={"y": (1, 3)}).count()
    want = sum(1 for r in rows.collect() if r["y"] is not None and 1 <= r["y"] <= 3)
    assert got == want
