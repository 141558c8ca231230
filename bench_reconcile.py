"""Reconcile micro-bench: converge-to-snapshot cost, diff vs full, at
low drift — the case that matters (a mirror recovering from a short lag
gap over a big table). Prints one JSON line.

Method: build a table from a synthetic binlog (N events), take its final
state as the upstream snapshot, mutate `drift` of the keys (half
updated, half deleted), then reconcile a copy of the table in each mode
and compare wall + events emitted. The final states are asserted
identical across modes (checksum over sorted rows).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from concept_catalog_etl_spark.session import get_spark
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.streaming.replay import replay_batch
from concept_catalog_etl_spark.operators.reconcile import reconcile_snapshot

N_EVENTS = int(os.environ.get("RECON_EVENTS", "400000"))
N_DOCS = int(os.environ.get("RECON_DOCS", "60000"))
DRIFT = float(os.environ.get("RECON_DRIFT", "0.05"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_table(root):
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")], key="doc_id")
    return LakeTable.create(root, schema, n_buckets=16)


def main():
    import pyspark.sql.functions as F

    root = "/tmp/bench_reconcile"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    spark = get_spark(master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS, app_name="bench_reconcile")
    blog = os.path.join(root, "binlog")
    paths = generate_binlog(blog, n_events=N_EVENTS, n_docs=N_DOCS,
                            n_files=8, seed=7, p_malformed=0.0)
    base = make_table(os.path.join(root, "base"))
    replay_batch(spark, paths, base, files_per_batch=4)

    # drifted snapshot: mutate/delete `DRIFT` of the keys deterministically
    live = base.read(spark)
    h = F.abs(F.xxhash64("doc_id")) % 1_000_000
    cut = int(DRIFT * 1_000_000)
    snap = (
        live.filter(h >= cut // 2)  # first half of drift: deleted upstream
        .withColumn(
            "tokens",
            F.when(h < cut, F.slice("tokens", 1, 3)).otherwise(F.col("tokens")),
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    snap.cache().count()
    n_total = live.count()

    out = {"events_total_rows": n_total, "drift": DRIFT}
    checks = []
    for mode in ("diff", "full"):
        t = make_table(os.path.join(root, f"t_{mode}"))
        # clone the base state cheaply: replay the same binlog
        replay_batch(spark, paths, t, files_per_batch=4)
        t0 = time.time()
        m = reconcile_snapshot(spark, t, snap, batch_id=10 ** 6,
                               event_ts="2027-01-01T00:00:00", mode=mode)
        wall = time.time() - t0
        out[f"{mode}_wall_sec"] = round(wall, 2)
        out[f"{mode}_events"] = m["events_total"]
        chk = (t.read(spark)
               .agg(F.expr("bit_xor(xxhash64(doc_id, n_tok, source))"))
               .collect()[0][0])
        checks.append(chk)
    assert checks[0] == checks[1], "diff and full disagree on final state"
    out["final_state_checksum_equal"] = True
    out["diff_event_reduction"] = round(
        1 - out["diff_events"] / max(out["full_events"], 1), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
