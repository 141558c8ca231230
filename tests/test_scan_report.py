"""scan_report: metadata-level pruning observability — which files each
stage (bucket, key-range, bloom, col-stats) kept for a given read. Pins that
the counts are monotone, agree with the actual file layout, and that the
report reflects pruning actually biting (blooms on point lookups, col_stats
on ranges, bucket pruning on key lookups)."""

import os

from pyspark.sql import functions as F

from tests.helpers import make_table


def _rows(spark, n=100, prefix="doc", lsn0=0, val0=0):
    return spark.range(n).select(
        F.format_string(f"{prefix}-%06d", F.col("id")).alias("doc_id"),
        F.array((F.col("id") + val0).cast("int"), F.lit(7)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn0).alias("_lsn"),
    )


def test_scan_report_stages_and_point_lookup(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    for c in range(4):  # 4 commits, disjoint key prefixes, blooms on
        table.commit(
            add_files=table.write_data_files(
                _rows(spark, 100, prefix=f"c{c}", lsn0=c * 1000),
                with_bloom=True,
            ),
            batch_id=c,
        )
    full = table.scan_report(spark)
    assert full["buckets_selected"] == full["buckets_total"] == 4
    assert full["files_scanned"] == full["files_in_selected_buckets"]
    assert full["rows_in_scanned_files"] == 400
    assert full["delta_files"] == 0

    key = "c2-000042"
    vals, kbkts, lo, hi = table.typed_key_buckets(spark, [key])
    rep = table.scan_report(spark, buckets=kbkts, key_min=lo, key_max=hi,
                            keys=vals)
    # bucket pruning: only the key's bucket opened
    assert rep["buckets_selected"] == 1
    # stages are monotone and the blooms actually bit (disjoint prefixes:
    # at most the one commit's file in that bucket survives)
    assert (rep["files_in_selected_buckets"] >= rep["files_after_key_range"]
            >= rep["files_after_bloom"] >= rep["files_scanned"])
    assert rep["files_after_bloom"] < rep["files_in_selected_buckets"]
    assert rep["files_scanned"] >= 1
    # and the equivalent read really returns the row
    assert table.read_keys(spark, [key]).count() == 1


def test_scan_report_col_stats_and_deltas(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    # two commits with DISJOINT _lsn ranges -> col_stats prune on _lsn? use
    # a logical column instead: n_tok is constant; use col_ranges on the
    # key? col stats cover primitive fields — use _event_ts instead. Here:
    # disjoint token values per commit are arrays (no stats), so range on
    # _lsn system col is unsupported; use two commits with different
    # n_tok values for a clean stats prune.
    a = _rows(spark, 100).withColumn("n_tok", F.lit(2))
    b = _rows(spark, 100, prefix="x").withColumn("n_tok", F.lit(9))
    table.commit(add_files=table.write_data_files(a), batch_id=0)
    table.commit(add_files=table.write_data_files(b), batch_id=1)
    rep = table.scan_report(spark, col_ranges={"n_tok": (8, None)})
    assert rep["files_after_col_stats"] < rep["files_after_bloom"]
    assert rep["files_scanned"] == rep["files_after_col_stats"]
    got = table.read(spark, col_ranges={"n_tok": (8, None)}).count()
    assert got == 100

    # MoR: a delta commit makes its buckets' files exempt from col-stats
    # pruning (resurrection hazard) and the report shows the resolve cost
    d = _rows(spark, 10, prefix="x", lsn0=99999)
    table.commit(
        add_files=table.write_data_files(d, delta=True), batch_id=2
    )
    rep2 = table.scan_report(spark, col_ranges={"n_tok": (8, None)})
    assert rep2["delta_files"] == rep2["delta_buckets"] > 0
    assert rep2["files_scanned"] > rep["files_scanned"]
