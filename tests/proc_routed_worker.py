"""Routed-replay worker for the routed crash-monkey: its OWN Spark JVM
replaying a routed binlog into N catalog tables with the atomic
catalog-cut commit. The parent SIGKILLs this process group at random
offsets; exactly-once and 2PC recovery are asserted by the parent.

Spec JSON: {"repo": path, "cat_root": catalog_root, "routes": [names...],
            "files": [paths...], "files_per_batch": int, "out": path}
"""

import json
import os
import sys


def main() -> None:
    with open(sys.argv[1]) as f:
        spec = json.load(f)
    sys.path.insert(0, spec["repo"])
    from concept_catalog_etl_spark.lakehouse.catalog import Catalog
    from concept_catalog_etl_spark.session import get_spark
    from concept_catalog_etl_spark.streaming.replay import replay_batch_routed

    spark = get_spark(app_name="routed_monkey", master="local[4]",
                      shuffle_partitions=8)
    cat = Catalog(spec["cat_root"])
    metrics = replay_batch_routed(
        spark, spec["files"], cat, spec["routes"],
        files_per_batch=spec.get("files_per_batch", 1),
    )
    out = [{"batch_id": m["batch_id"],
            "skipped": all(t.get("skipped") for t in m["routes"].values())
            if m["routes"] else None}
           for m in metrics]
    tmp = spec["out"] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, spec["out"])
    spark.stop()


if __name__ == "__main__":
    main()
