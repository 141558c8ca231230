"""Partial-update (sequence-groups) apply micro-bench.

Replays PATCH_EVENTS merge-patch change events (each setting a random
subset of the payload fields) over PATCH_DOCS keys in PATCH_BATCHES
batches through ``apply_patch_batch`` — the stored sequence-group path —
and reports events/sec plus the final live-row count. Deterministic input
(xxhash-derived field subsets), one JSON line; results recorded in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from concept_catalog_etl_spark.lakehouse import LakeTable  # noqa: E402
from concept_catalog_etl_spark.operators.patch import (  # noqa: E402
    apply_patch_batch,
    patch_table_schema,
)
from concept_catalog_etl_spark.session import get_spark  # noqa: E402

N_EVENTS = int(os.environ.get("PATCH_EVENTS", "2000000"))
N_DOCS = int(os.environ.get("PATCH_DOCS", "100000"))
N_BATCHES = int(os.environ.get("PATCH_BATCHES", "8"))
N_BUCKETS = int(os.environ.get("PATCH_BUCKETS", "16"))
MODE = os.environ.get("PATCH_MODE", "cow").strip().lower()  # cow | mor
if MODE not in ("cow", "mor"):
    raise SystemExit(f"PATCH_MODE must be cow or mor, got {MODE!r}")


def main() -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    work = tempfile.mkdtemp(prefix="bench_patch_")
    table = LakeTable.create(
        os.path.join(work, "t"),
        patch_table_schema([("val", "double"), ("label", "string"),
                            ("score", "int")]),
        n_buckets=N_BUCKETS,
    )
    per = N_EVENTS // N_BATCHES
    n_events = per * N_BATCHES  # actual replayed count (remainder dropped)
    t0 = time.time()
    for b in range(N_BATCHES):
        base = b * per
        ev = spark.range(per).select(
            F.format_string("doc-%06d", (F.col("id") + base) % N_DOCS).alias("doc_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") + base).alias("event_ts"),
            (F.col("id") + base).alias("lsn"),
            # ~2% deletes; field subset from the event hash (deterministic)
            F.when((F.xxhash64((F.col("id") + base)) % 50) == 0, "delete")
            .otherwise("update").alias("op"),
            F.when(F.xxhash64(F.col("id") + base, F.lit(1)) % 2 == 0,
                   (F.col("id") % 1000) / 10.0).alias("val"),
            F.when(F.xxhash64(F.col("id") + base, F.lit(2)) % 3 == 0,
                   F.format_string("l%d", F.col("id") % 7)).alias("label"),
            F.when(F.xxhash64(F.col("id") + base, F.lit(3)) % 4 == 0,
                   (F.col("id") % 100).cast("int")).alias("score"),
        )
        apply_patch_batch(spark, table, ev, batch_id=b, write_mode=MODE)
    wall = time.time() - t0
    extra = {}
    if MODE == "mor":
        from concept_catalog_etl_spark.operators.patch import (
            compact_patch,
            read_patch,
        )

        t1 = time.time()
        final_rows = read_patch(spark, table).count()
        extra["resolve_read_sec"] = round(time.time() - t1, 3)
        t2 = time.time()
        compact_patch(spark, table)
        extra["compact_sec"] = round(time.time() - t2, 3)
    else:
        final_rows = table.row_count(spark)
    print(json.dumps({
        "metric": "patch_apply_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "mode": MODE,
        "events": n_events,
        "events_per_sec": round(n_events / wall, 1),
        "batches": N_BATCHES,
        "docs": N_DOCS,
        "final_rows": final_rows,
        **extra,
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
