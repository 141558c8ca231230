"""Delete-vector experiment (round-4 verdict task 6): measure the engine's
tombstone-row merge-on-read deletes against a positional-delete-sidecar
prototype (Iceberg v2 position deletes / Delta deletion vectors analog) on a
delete-heavy workload — a GDPR ``delete_where`` burst over a compacted
table — and record which one this engine should keep.

The two designs, cost-shaped:

* **Tombstone rows (current engine)**: the delete burst appends O(deleted
  keys) delta rows; EVERY subsequent read of a delta-containing bucket pays
  the per-key LWW ``max_by`` resolve (one shuffle of those buckets' rows)
  until ``compact_minor``/``compact`` folds them. Apply is cheap, reads pay.
* **Positional deletes (prototype)**: apply pays one base scan to map the
  deleted keys to (file, row_index) pairs — Spark's parquet ``_metadata``
  row-index, no engine change needed — written as a small sidecar; reads
  then stay on the ZERO-SHUFFLE base path with a broadcast anti-join on
  (file, pos). Apply pays, reads stay cheap, and the anti-join cost is
  O(deleted rows) broadcast, independent of table row count.

Both paths are measured end-to-end with identical results asserted, plus
the post-maintenance state (tombstones after compact_minor vs sidecar).
Output: one JSON line; the decision lives in BENCH/BASELINE.md.

Usage: python bench_delete_vectors.py [n_rows] [delete_frac]
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    reps = int(os.environ.get("BENCH_REPEAT", "3"))

    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.operators.dml import delete_where
    from concept_catalog_etl_spark.operators.merge import MergeConfig
    from concept_catalog_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_dv", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    work = os.path.join(REPO, ".bench", "dv")
    shutil.rmtree(work, ignore_errors=True)

    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")],
        key="doc_id",
    )

    def build_table(path: str) -> LakeTable:
        t = LakeTable.create(path, schema, n_buckets=max(CPUS, 32))
        seed = spark.range(n_rows).select(
            F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
            F.array(F.lit(1), F.lit(2)).alias("tokens"),
            F.lit(2).alias("n_tok"),
            F.lit("crawl").alias("source"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
            F.col("id").alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )
        t.commit(add_files=t.write_data_files(seed, sort_within=True),
                 batch_id=0)
        return t

    # deterministic delete set: every k-th key (spread across all buckets —
    # the worst case for tombstone reads: every bucket becomes a delta
    # bucket and the whole table pays the LWW resolve)
    step = max(2, int(1 / frac))
    # key-derived predicate (delete_where sees logical columns only)
    del_pred = (F.substring("doc_id", 5, 9).cast("long") % step == 0)
    n_deleted = len(range(0, n_rows, step))
    survivors = n_rows - n_deleted

    def timed(fn, n=reps):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    out = {"metric": "delete_vector_experiment", "n_rows": n_rows,
           "delete_frac": frac, "n_deleted": n_deleted, "cpus": CPUS}

    # ---------------- path A: tombstone rows (the engine as shipped) -------
    ta = build_table(os.path.join(work, "tomb"))
    t0 = time.time()
    delete_where(spark, ta, del_pred, batch_id=1,
                 cfg=MergeConfig.for_table(ta, write_mode="mor",
                                           writer_id="gdpr"),
                 event_ts="2026-01-02 00:00:00")
    out["tombstone_apply_sec"] = round(time.time() - t0, 3)
    assert ta.read(spark).count() == survivors
    out["tombstone_read_sec"] = round(
        timed(lambda: ta.read(spark).write.format("noop")
              .mode("overwrite").save()), 3)
    t0 = time.time()
    ta.compact_minor(spark, max_delta_files_per_bucket=0)
    out["tombstone_compact_minor_sec"] = round(time.time() - t0, 3)
    out["tombstone_read_after_minor_sec"] = round(
        timed(lambda: ta.read(spark).write.format("noop")
              .mode("overwrite").save()), 3)

    # ---------------- path B: positional-delete sidecar prototype ----------
    tb = build_table(os.path.join(work, "posdel"))
    snap = tb.snapshot()
    base_paths = [os.path.join(tb.root, f["path"]) for f in tb.files(snap=snap)]
    sidecar = os.path.join(work, "posdel_sidecar")

    t0 = time.time()
    # map deleted keys → (file, row_index) with ONE base scan; the sidecar
    # is O(deleted rows)
    (
        spark.read.parquet(*base_paths)
        .select(
            F.col("_metadata.file_path").alias("_del_file"),
            F.col("_metadata.row_index").alias("_del_pos"),
            "doc_id",
        )
        .filter(del_pred)
        .select("_del_file", "_del_pos")
        .coalesce(1)
        .write.mode("overwrite").parquet(sidecar)
    )
    out["posdel_apply_sec"] = round(time.time() - t0, 3)

    def read_with_posdel():
        dels = spark.read.parquet(sidecar)
        base = spark.read.parquet(*base_paths).select(
            F.col("_metadata.file_path").alias("_del_file"),
            F.col("_metadata.row_index").alias("_del_pos"),
            *[f.name for f in schema.fields],
        )
        return base.join(F.broadcast(dels), ["_del_file", "_del_pos"],
                         "left_anti").drop("_del_file", "_del_pos")

    assert read_with_posdel().count() == survivors
    out["posdel_read_sec"] = round(
        timed(lambda: read_with_posdel().write.format("noop")
              .mode("overwrite").save()), 3)

    # identical survivor sets (cheap checksum over doc_id)
    ck_a = ta.read(spark).agg(
        F.bit_xor(F.xxhash64("doc_id"))).collect()[0][0]
    ck_b = read_with_posdel().agg(
        F.bit_xor(F.xxhash64("doc_id"))).collect()[0][0]
    assert ck_a == ck_b, "paths diverged"

    out["read_ratio_tombstone_over_posdel"] = round(
        out["tombstone_read_sec"] / out["posdel_read_sec"], 2)
    out["apply_ratio_tombstone_over_posdel"] = round(
        out["tombstone_apply_sec"] / out["posdel_apply_sec"], 2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
