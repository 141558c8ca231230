"""Two-OS-process commit race worker (launched via subprocess, NO Spark
session): replays a pre-staged list of (batch_id, add_files) commits against
one shared table root through ``commit_with_retry``, using the same
exactly-once pre-check ``apply_batch`` performs. The in-process concurrency
tests simulate the race with monkeypatches; this worker puts the
write-temp-then-rename pointer swap (lakehouse/table.py) in front of two
REAL processes whose interleaving the OS scheduler decides.

Spec JSON: {"repo": path, "root": table_root, "go": sentinel_path,
            "out": result_path, "commits": [[batch_id, [file_entry, ...]], ...]}
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

    table = LakeTable(spec["root"])
    # spin on the sentinel so both workers enter the commit loop together
    # (process startup skew would otherwise serialize them)
    deadline = time.time() + 60
    while not os.path.exists(spec["go"]):
        if time.time() > deadline:
            raise SystemExit("go-file never appeared")
        time.sleep(0.002)
    results = []
    wid = spec.get("writer_id")
    for bid, files in spec["commits"]:
        if table.is_committed(bid, wid):
            results.append({"bid": bid, "skipped": True})
            continue
        # max_retries is high because this loop intentionally manufactures
        # far more contention than a streaming writer ever sees
        table.commit_with_retry(
            add_files=files, batch_id=bid, writer_id=wid, max_retries=200
        )
        results.append({"bid": bid, "skipped": False})
    tmp = spec["out"] + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f)
    os.replace(tmp, spec["out"])


if __name__ == "__main__":
    main()
