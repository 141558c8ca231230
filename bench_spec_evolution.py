"""Partition-spec evolution benchmark: the spec change is O(metadata),
never O(data) — evidence for the round-4 'no rewrite' claim.

Builds a flat (unpartitioned) CDC table carrying ``n_days`` days of
history, then measures:

- ``evolve_sec``: ``set_partition_spec(day(event_date))`` — one metadata
  commit, independent of table size;
- ``win_flat_sec``: 2-day window query BEFORE evolution (col_stats only;
  the MoR delta tail defeats stats pruning by the soundness rule);
- ``win_mixed_sec``: the same window AFTER evolution plus one day of
  partitioned ingest (new-era files prune immediately, old-era kept);
- ``migrate_sec``: ``compact()`` — the opt-in rewrite that migrates
  old-era files to the new spec (the cost evolution itself avoids);
- ``win_migrated_sec``: the window once everything prunes.

Row counts are asserted equal across all three reads at each stage's
expected value. Usage: python bench_spec_evolution.py [n_days]
[rows_per_day]; one JSON line for BENCH/BASELINE.md.
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

    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_spec_evo", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    work = os.path.join(REPO, ".bench", "spec_evo")
    shutil.rmtree(work, ignore_errors=True)

    schema = TableSchema.create(
        [("event_date", "timestamp"), ("doc_id", "string"),
         ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
        key=["event_date", "doc_id"],
    )

    def rows(day0: int, days: int, lsn0: int = 0):
        n = days * per_day
        return (
            spark.range(n)
            .withColumn("day", (F.col("id") / per_day).cast("int") + day0)
            .select(
                F.to_timestamp(
                    F.concat(F.lit("2026-01-"),
                             F.lpad(F.col("day").cast("string"), 2, "0"))
                ).alias("event_date"),
                F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"),
                F.array(F.col("id").cast("int")).alias("tokens"),
                F.lit(1).alias("n_tok"),
                F.lit("crawl").alias("source"),
                F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("_event_ts"),
                (F.col("id") + lsn0).alias("_lsn"),
                F.lit(False).alias("_deleted"),
            )
        )

    t = LakeTable.create(os.path.join(work, "t"), schema, n_buckets=8)
    t.commit(add_files=t.write_data_files(rows(1, n_days - 1)), batch_id=0)
    # fresh MoR delta tail touching every bucket: stats cannot prune these
    t.commit(add_files=t.write_data_files(
        rows(1, 1, lsn0=10**9).withColumn(
            "doc_id", F.concat(F.lit("tail-"), F.col("doc_id"))),
        delta=True), batch_id=1)
    n_files_before = len(t.files())

    win = ("2026-01-02 00:00:00", "2026-01-03 23:59:59")

    reps = int(os.environ.get("BENCH_REPEAT", "3"))

    def timed_win():
        best, n = None, None
        for _ in range(reps):  # min-of-reps: first touch pays JVM warm-up
            t0 = time.monotonic()
            n = t.read(spark, col_ranges={"event_date": win}).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    win_flat_sec, n0 = timed_win()

    t0 = time.monotonic()
    t.set_partition_spec({"column": "event_date", "transform": "day"})
    evolve_sec = time.monotonic() - t0

    t.commit(add_files=t.write_data_files(rows(n_days, 1, lsn0=2 * 10**9)),
             batch_id=2)
    win_mixed_sec, n1 = timed_win()
    assert n1 == n0, (n1, n0)
    rep_mixed = t.scan_report(spark, col_ranges={"event_date": win})

    t0 = time.monotonic()
    t.compact(spark, max_files_per_bucket=0,
              target_rows_per_file=2 * per_day)
    migrate_sec = time.monotonic() - t0
    win_migrated_sec, n2 = timed_win()
    assert n2 == n0, (n2, n0)
    rep_mig = t.scan_report(spark, col_ranges={"event_date": win})

    print(json.dumps({
        "metric": "spec_evolution",
        "n_days": n_days, "rows_per_day": per_day,
        "files_at_evolution": n_files_before,
        "evolve_sec": round(evolve_sec, 4),
        "migrate_sec": round(migrate_sec, 2),
        "evolve_vs_migrate": round(migrate_sec / max(evolve_sec, 1e-9), 1),
        "win_flat_sec": round(win_flat_sec, 2),
        "win_mixed_sec": round(win_mixed_sec, 2),
        "win_migrated_sec": round(win_migrated_sec, 2),
        "files_scanned_mixed": rep_mixed["files_scanned"],
        "files_scanned_migrated": rep_mig["files_scanned"],
        "window_rows": n0,
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
