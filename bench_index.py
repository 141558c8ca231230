"""Near-dup index maintenance micro-bench: initial build vs incremental.

Measures what the rowview sync buys at scale: (a) full index build over a
large table (the one-time cost), (b) an incremental sync after a small
fraction of docs change (the steady-state cost — must scale with the
change set, not the table), and (c) banded candidate lookup latency for a
probe batch. Prints one JSON line; results recorded in BENCH/BASELINE.md.
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
from concept_catalog_etl_spark.operators.neardup_index import (  # noqa: E402
    near_dup_candidates,
    sync_index,
)
from concept_catalog_etl_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("INDEX_DOCS", "200000"))
CHANGED = int(os.environ.get("INDEX_CHANGED", "2000"))  # 1% steady-state churn
N_PROBES = int(os.environ.get("INDEX_PROBES", "1000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def docs_df(spark, n, start=0, salt=0, lsn_base=0):
    """Synthetic token sequences with realistic overlap: doc i shares most
    shingles with doc i+1 (sliding windows over a token stream)."""
    return spark.range(start, start + n).select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        F.sequence(F.col("id") * 5 + salt, F.col("id") * 5 + salt + 60)
        .cast("array<int>")
        .alias("tokens"),
        F.lit(61).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn_base).alias("_lsn"),
    )


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="bench_index_")
    try:
        schema = TableSchema.create(
            [("doc_id", "string"), ("tokens", "array<int>"),
             ("n_tok", "int"), ("source", "string")], key="doc_id",
        )
        up = LakeTable.create(os.path.join(work, "up"), schema, n_buckets=32)
        up.commit(add_files=up.write_data_files(docs_df(spark, N_DOCS)), batch_id=0)
        idx = LakeTable.create(
            os.path.join(work, "idx"),
            TableSchema.create([("doc_id", "string"), ("mh", "array<bigint>")],
                               key="doc_id"),
            n_buckets=32,
        )

        t0 = time.time()
        r = sync_index(spark, up, idx)
        build_s = time.time() - t0
        assert r["rows_written"] == N_DOCS

        # steady state: compacted (key-sorted + bloom'd) bases, so the
        # incremental sync's endpoint reads are file-pruned the way a
        # long-running table's would be
        while up.compact(spark, max_files_per_bucket=1,
                         max_buckets_per_run=64)["buckets_compacted"]:
            pass
        while idx.compact(spark, max_files_per_bucket=1,
                          max_buckets_per_run=64)["buckets_compacted"]:
            pass

        # steady-state churn: CHANGED docs get new content
        upd = docs_df(spark, CHANGED, start=1000, salt=977, lsn_base=10_000_000)
        up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=1)
        t0 = time.time()
        r2 = sync_index(spark, up, idx)
        incr_s = time.time() - t0
        assert r2["rows_written"] == CHANGED

        # near-identical probes: same token windows as indexed docs, shifted
        # by one token — high shingle overlap, so bands collide as intended
        probes = docs_df(spark, N_PROBES, start=50_000, salt=1).select(
            F.concat(F.lit("probe-"), "doc_id").alias("doc_id"), "tokens"
        )
        t0 = time.time()
        n_cand = near_dup_candidates(spark, idx, probes).count()
        probe_s = time.time() - t0

        print(json.dumps({
            "metric": "neardup_index_build_sec",
            "value": round(build_s, 3),
            "unit": "sec",
            "docs": N_DOCS,
            "build_docs_per_sec": round(N_DOCS / build_s, 1),
            "incremental_changed": CHANGED,
            "incremental_sec": round(incr_s, 3),
            "full_over_incr_speedup": round(build_s / incr_s, 2),
            "probe_batch": N_PROBES,
            "probe_sec": round(probe_s, 3),
            "probe_candidates": n_cand,
            "cpus": CPUS,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
