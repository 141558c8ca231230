"""Point-lookup micro-bench: bloom-sidecar file pruning vs min/max-only.

Builds one table with many files per bucket of HIGH-CARDINALITY keys
(uuid-like hex — every file's [min,max] spans the whole key space, so
min/max pruning keeps everything), then times read_keys with the bloom
sidecars honored vs ignored. Prints one JSON line; results recorded in
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

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema  # noqa: E402
from concept_catalog_etl_spark.session import get_spark  # noqa: E402

N_COMMITS = int(os.environ.get("LOOKUP_COMMITS", "24"))
ROWS_PER_COMMIT = int(os.environ.get("LOOKUP_ROWS", "50000"))
N_BUCKETS = int(os.environ.get("LOOKUP_BUCKETS", "8"))
N_LOOKUPS = int(os.environ.get("LOOKUP_QUERIES", "10"))


def main() -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    work = tempfile.mkdtemp(prefix="bench_lookup_")
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"),
         ("n_tok", "int"), ("source", "string")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(work, "t"), schema,
                             n_buckets=N_BUCKETS)
    for c in range(N_COMMITS):
        df = spark.range(ROWS_PER_COMMIT).select(
            # high-cardinality opaque keys: md5 hex — min/max useless
            F.md5(F.format_string(f"c{c}-%d", F.col("id"))).alias("doc_id"),
            F.array(F.col("id").cast("int")).alias("tokens"),
            F.lit(1).alias("n_tok"),
            F.lit("crawl").alias("source"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
            (F.col("id") + c * ROWS_PER_COMMIT).alias("_lsn"),
        )
        table.commit(add_files=table.write_data_files(df, with_bloom=True),
                     batch_id=c)

    import hashlib

    lookups = [
        hashlib.md5(f"c{i % N_COMMITS}-{i * 37}".encode()).hexdigest()
        for i in range(N_LOOKUPS)
    ]
    files = table.files()

    def run(use_bloom: bool) -> tuple[float, int]:
        if not use_bloom:  # strip the flag so _bloom_maybe keeps everything
            stripped = [dict(f, bloom=False) for f in files]
            orig = table.files

            # must still honor the buckets argument: the arm under test is
            # "bucket + min/max pruning, no bloom" — ignoring buckets would
            # also disable bucket pruning and overstate the bloom speedup
            def patched(version=None, buckets=None, snap=None):
                if buckets is None:
                    return stripped
                return [f for f in stripped if f["bucket"] in buckets]

            table.files = patched  # type: ignore[method-assign]
        t0 = time.perf_counter()
        total = 0
        for k in lookups:
            total += table.read_keys(spark, [k]).count()
        wall = time.perf_counter() - t0
        if not use_bloom:
            table.files = orig  # type: ignore[method-assign]
        return wall, total

    run(True)  # warm the JVM + sidecar cache path once
    wall_minmax, rows_minmax = run(False)
    wall_bloom, rows_bloom = run(True)
    assert rows_minmax == rows_bloom == N_LOOKUPS, (rows_minmax, rows_bloom)
    kept = sum(1 for f in files if table._bloom_maybe(f, [lookups[0]]))
    print(json.dumps({
        "metric": "point_lookup_wall_sec",
        "files_total": len(files),
        "files_after_bloom_one_key": kept,
        "lookups": N_LOOKUPS,
        "wall_minmax_only": round(wall_minmax, 3),
        "wall_bloom": round(wall_bloom, 3),
        "speedup": round(wall_minmax / wall_bloom, 2),
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
