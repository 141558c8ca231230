"""Full-replay worker for the concurrent backfill-plus-tail test: its OWN
Spark JVM replaying a file slice into a shared table under its own writer
ledger. Unlike proc_commit_worker (pre-staged file entries, commit layer
only), this exercises the ENTIRE ingest path — parse, dedup, MoR delta
write, optimistic commit — from two real OS processes at once.

Spec JSON: {"repo": path, "root": table_root, "files": [paths...],
            "writer_id": str|null, "start_batch_id": int,
            "files_per_batch": int, "go": sentinel, "out": result_path}
"""

import json
import os
import sys
import time


def main() -> None:
    with open(sys.argv[1]) as f:
        spec = json.load(f)
    sys.path.insert(0, spec["repo"])
    from concept_catalog_etl_spark.lakehouse import LakeTable
    from concept_catalog_etl_spark.operators.merge import MergeConfig
    from concept_catalog_etl_spark.session import get_spark
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    spark = get_spark(app_name=f"backfill_{spec.get('writer_id')}",
                      master="local[4]", shuffle_partitions=8)
    table = LakeTable(spec["root"])
    cfg = MergeConfig(write_mode="mor", writer_id=spec.get("writer_id"))
    # spin on the sentinel so both writers replay together (JVM startup
    # skew would otherwise serialize them)
    deadline = time.time() + 120
    while not os.path.exists(spec["go"]):
        if time.time() > deadline:
            raise SystemExit("go-file never appeared")
        time.sleep(0.01)
    metrics = replay_batch(
        spark, spec["files"], table, cfg=cfg,
        files_per_batch=spec.get("files_per_batch", 1),
        start_batch_id=spec.get("start_batch_id", 0),
    )
    out = [{"batch_id": m["batch_id"], "skipped": bool(m.get("skipped"))}
           for m in metrics]
    tmp = spec["out"] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, spec["out"])
    spark.stop()


if __name__ == "__main__":
    main()
