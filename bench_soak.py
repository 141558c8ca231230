"""Soak: sustained micro-batched CDC replay with periodic compaction.

24M events (default) in 24 files -> 12 micro-batches, merge-on-read mode,
compaction every 4 batches, vacuum at the end — the maintenance cadence a
long-running ingest job needs. Reports per-batch wall, sustained events/sec,
file-count trajectory, and (optionally) exact final-state equality vs the
single-threaded oracle replay.

Usage: python bench_soak.py [cpus] [events]   (env SOAK_ORACLE=0 to skip
the oracle verify). Appends one JSON line to BENCH/soak.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    events = int(sys.argv[2]) if len(sys.argv) > 2 else 24_000_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.operators.merge import MergeConfig
    from concept_catalog_etl_spark.session import get_spark
    from concept_catalog_etl_spark.sources.binlog_spark import generate_binlog_files
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    spark = get_spark(app_name="soak", master=f"local[{cpus}]", shuffle_partitions=cpus)
    d = os.path.join(REPO, ".bench", f"soak_ev{events}")
    if not os.path.exists(os.path.join(d, "_DONE")):
        shutil.rmtree(d, ignore_errors=True)
        generate_binlog_files(spark, d, events, n_files=24, n_docs=events // 12,
                              seed=77, max_tokens=24)
        open(os.path.join(d, "_DONE"), "w").close()
    files = sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".txt"))

    work = os.path.join(REPO, ".bench", "soak_run")
    shutil.rmtree(work, ignore_errors=True)
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(work, "table"), schema, n_buckets=64)
    cfg = MergeConfig(write_mode="mor")

    batch_walls, file_counts, compact_walls = [], [], []
    t_total = time.time()
    for i in range(0, len(files), 2):
        t0 = time.time()
        replay_batch(spark, files[i : i + 2], table, files_per_batch=2,
                     cfg=cfg, start_batch_id=i // 2)
        batch_walls.append(round(time.time() - t0, 2))
        file_counts.append(len(table.files()))
        if (i // 2) % 4 == 3:  # maintenance cadence: every 4th batch
            t0 = time.time()
            # same tick replay_stream runs: compaction + lineage-derived
            # tombstone expiry (horizon = min source high-water − slack) +
            # retention-windowed vacuum
            offsets = table.properties().get("lineage_offsets", {})
            expire = (min(offsets.values()) - 2_000_000) if offsets else None
            table.compact(
                spark, max_files_per_bucket=1,
                expire_tombstones_below_lsn=expire if expire and expire > 0 else None,
            )
            table.vacuum(retain_last=4, orphan_grace_sec=0)
            compact_walls.append(round(time.time() - t0, 2))
    wall = time.time() - t_total
    final_rows = table.read(spark).count()

    result = {
        "events": events,
        "cpus": cpus,
        "wall_sec": round(wall, 2),
        "sustained_events_per_sec": round(events / wall, 1),
        "batch_walls": batch_walls,
        "compact_walls": compact_walls,
        "files_trajectory": file_counts,
        "files_final": len(table.files()),
        "final_rows": final_rows,
        "table_version": table.current_version(),
    }

    if os.environ.get("SOAK_ORACLE", "1") != "0":
        from concept_catalog_etl_spark.oracle import replay_dir

        t0 = time.time()
        oracle_state, _s, _stats = replay_dir(d)
        rows = {
            r["doc_id"]: (tuple(r["tokens"] or []), r["n_tok"], r["source"])
            for r in table.read(spark).collect()
        }
        o = {k: (tuple(v["tokens"]), v["n_tok"], v["source"]) for k, v in oracle_state.items()}
        result["oracle_sec"] = round(time.time() - t0, 1)
        result["oracle_match"] = rows == o
        assert result["oracle_match"], "soak final state diverged from oracle"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "soak.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
