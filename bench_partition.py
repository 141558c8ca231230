"""Partition-dimension benchmark (round-4 verdict task 3 evidence): a
time-window read over a day-partitioned CDC table vs the identical table
without a partition spec — hash buckets + col_stats only.

The workload is the shape that motivates the axis: a table carrying many
days of history with a fresh MoR delta tail (every bucket has deltas, so
col_stats pruning is inapplicable to them by the read soundness rule),
queried for a recent 2-day window. Partition pruning eliminates other
days' BASE AND DELTA files exactly; the unpartitioned twin must scan and
LWW-resolve everything. Results are asserted equal.

The partitioned table uses fewer hash buckets (default 8 vs the flat
table's 32): with a partition axis the file count is days x buckets, so
bucket count must shrink to keep files at target size — the same sizing
rule a production Iceberg layout applies (partition granularity x bucket
count ~ total data / target file size). Benchmarking both tables at 32
buckets would compare a deliberately mis-sized layout.

Usage: python bench_partition.py [n_days] [rows_per_day] [part_buckets]
Output: one JSON line for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    part_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(os.environ.get("BENCH_REPEAT", "3"))

    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_part", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    work = os.path.join(REPO, ".bench", "part")
    shutil.rmtree(work, ignore_errors=True)

    schema = TableSchema.create(
        [("event_date", "timestamp"), ("doc_id", "string"),
         ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
        key=["event_date", "doc_id"],
    )

    def rows(day0: int, days: int):
        n = days * per_day
        return spark.range(n).select(
            F.timestamp_seconds(
                F.lit(1767225600)  # 2026-01-01
                + (F.col("id") % days + day0) * 86400
            ).alias("event_date"),
            F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
            F.array(F.lit(1), F.lit(2)).alias("tokens"),
            F.lit(2).alias("n_tok"),
            F.lit("crawl").alias("source"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
            F.col("id").alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )

    def build(path: str, spec):
        nb = part_buckets if spec else max(CPUS, 32)
        t = LakeTable.create(path, schema, n_buckets=nb,
                             partition_spec=spec)
        # base: the full history, compaction-shaped
        t.commit(add_files=t.write_data_files(rows(0, n_days),
                                              sort_within=True), batch_id=0)
        # delta tail: a fresh MoR batch touching EVERY day (late-data worst
        # case) so every bucket is a delta bucket
        tail = rows(0, n_days).sample(0.02, seed=7).withColumn(
            "_lsn", F.col("_lsn") + 10_000_000)
        t.commit(add_files=t.write_data_files(tail, delta=True), batch_id=1)
        return t

    part = build(os.path.join(work, "part"),
                 {"column": "event_date", "transform": "day"})
    flat = build(os.path.join(work, "flat"), None)

    win = ("2026-01-02 00:00:00", "2026-01-03 23:59:59")

    def timed(t):
        best = None
        for _ in range(reps):
            t0 = time.time()
            t.read(spark, col_ranges={"event_date": win}).write.format(
                "noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    n_part = part.read(spark, col_ranges={"event_date": win}).count()
    n_flat = flat.read(spark, col_ranges={"event_date": win}).count()
    assert n_part == n_flat, (n_part, n_flat)

    rep_p = part.scan_report(spark, col_ranges={"event_date": win})
    rep_f = flat.scan_report(spark, col_ranges={"event_date": win})
    out = {
        "metric": "partition_window_read",
        "n_days": n_days, "rows_per_day": per_day, "window_days": 2,
        "rows_in_window": n_part, "cpus": CPUS,
        "part_buckets": part_buckets, "flat_buckets": max(CPUS, 32),
        "partitioned_read_sec": round(timed(part), 3),
        "flat_read_sec": round(timed(flat), 3),
        "partitioned_files_scanned": rep_p["files_scanned"],
        "flat_files_scanned": rep_f["files_scanned"],
        "partitioned_rows_scanned": rep_p["rows_in_scanned_files"],
        "flat_rows_scanned": rep_f["rows_in_scanned_files"],
    }
    out["speedup"] = round(out["flat_read_sec"] / out["partitioned_read_sec"], 2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
