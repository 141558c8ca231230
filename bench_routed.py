"""Routed multi-table replay bench: the cost of the atomic catalog-cut
fan-out vs (a) non-atomic routed fan-out and (b) two independent
single-table replays of the same events.

One tagged binlog (events carry `"table": "ta"|"tb"`) replayed through
`replay_batch_routed` with and without the per-batch catalog transaction;
the independent-pipelines baseline replays the two untagged halves through
`replay_batch` back-to-back. Final state equality across arms is asserted
per table (xxhash64 checksum over the full rows).

Prints ONE JSON line:
  {"metric": "routed_replay", "events": N, "arms": {arm: {"wall_sec",
   "events_per_sec"}}, "atomic_overhead_pct": X, "routing_overhead_pct": Y}
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
N_PER_TABLE = int(os.environ.get("BENCH_ROUTED_EVENTS", "2000000"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))
N_FILES = int(os.environ.get("BENCH_FILES", "8"))
FILES_PER_BATCH = int(os.environ.get("BENCH_FILES_PER_BATCH", "4"))
MAX_TOKENS = int(os.environ.get("BENCH_MAX_TOKENS", "24"))


def _schema():
    from concept_catalog_etl_spark.lakehouse import TableSchema

    return TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")], key="doc_id")


def _mk_table(root):
    from concept_catalog_etl_spark.lakehouse import LakeTable

    shutil.rmtree(root, ignore_errors=True)
    return LakeTable.create(root, _schema(), n_buckets=32)


def _gen_logs(spark):
    """Two untagged halves (cached) + one tagged-and-merged routed log."""
    from concept_catalog_etl_spark.sources.binlog_spark import (
        generate_binlog_files,
    )
    from pyspark.sql import functions as F

    dirs = {}
    for name, seed in (("ta", 101), ("tb", 102)):
        key = f"sgr_{name}_ev{N_PER_TABLE}_d{N_DOCS}_f{N_FILES}_t{MAX_TOKENS}"
        d = os.path.join(REPO, ".bench", key)
        if not os.path.exists(os.path.join(d, "_DONE")):
            shutil.rmtree(d, ignore_errors=True)
            generate_binlog_files(spark, d, N_PER_TABLE, n_files=N_FILES,
                                  n_docs=N_DOCS, seed=seed,
                                  max_tokens=MAX_TOKENS)
            open(os.path.join(d, "_DONE"), "w").close()
        dirs[name] = d
    rkey = f"sgr_routed_ev{N_PER_TABLE}_d{N_DOCS}_f{N_FILES}_t{MAX_TOKENS}"
    rd = os.path.join(REPO, ".bench", rkey)
    if not os.path.exists(os.path.join(rd, "_DONE")):
        shutil.rmtree(rd, ignore_errors=True)
        for i in range(N_FILES):
            # tag JVM-side and write one interleaved file per source pair so
            # batch grouping matches the single-table arms
            parts = []
            for name, d in dirs.items():
                fs = sorted(f for f in os.listdir(d) if f.endswith(".txt"))
                df = spark.read.text(os.path.join(d, fs[i]))
                parts.append(df.select(F.concat(
                    F.lit('{"table": "%s", ' % name),
                    F.expr("substring(value, 2)")).alias("value")))
            out = parts[0].unionAll(parts[1])
            out.coalesce(1).write.mode("overwrite").text(
                os.path.join(rd, f"grp-{i:03d}"))
        open(os.path.join(rd, "_DONE"), "w").close()
    rfiles = sorted(
        os.path.join(rd, g, f)
        for g in os.listdir(rd) if g.startswith("grp-")
        for f in os.listdir(os.path.join(rd, g)) if f.startswith("part-")
    )
    return dirs, rfiles


def _checksum(spark, table):
    from pyspark.sql import functions as F

    df = table.read(spark)
    return df.select(
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)"))
        .alias("h")).first()["h"]


def main() -> None:
    from concept_catalog_etl_spark.lakehouse.catalog import Catalog
    from concept_catalog_etl_spark.session import get_spark
    from concept_catalog_etl_spark.streaming.replay import (
        replay_batch, replay_batch_routed,
    )

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_routed",
                      shuffle_partitions=CPUS)
    dirs, rfiles = _gen_logs(spark)
    total = 2 * N_PER_TABLE
    arms: dict[str, dict] = {}
    sums: dict[str, dict] = {}

    # arm 1: two independent single-table replays (the no-routing baseline)
    t_ind = {n: _mk_table(os.path.join(REPO, ".bench", f"rt_ind_{n}"))
             for n in dirs}
    t0 = time.time()
    for n, d in dirs.items():
        fs = sorted(os.path.join(d, f) for f in os.listdir(d)
                    if f.endswith(".txt"))
        replay_batch(spark, fs, t_ind[n], files_per_batch=FILES_PER_BATCH)
    w = time.time() - t0
    arms["independent"] = {"wall_sec": round(w, 2),
                           "events_per_sec": int(total / w)}
    sums["independent"] = {n: _checksum(spark, t) for n, t in t_ind.items()}

    # arm 2 / 3: routed fan-out over the tagged log, non-atomic then atomic
    for arm, atomic in (("routed_nonatomic", False), ("routed_atomic", True)):
        tabs = {n: _mk_table(os.path.join(REPO, ".bench", f"rt_{arm}_{n}"))
                for n in dirs}
        cat_root = os.path.join(REPO, ".bench", f"rt_cat_{arm}")
        shutil.rmtree(cat_root, ignore_errors=True)
        cat = Catalog.create(cat_root)
        for n, t in tabs.items():
            cat.register(n, t)
        t0 = time.time()
        # malformed lines (no parseable route) go to the side-channel here;
        # the independent arm DLQs the same lines inside apply_batch —
        # either way they never reach state, so checksums stay comparable
        # files_per_batch=FILES_PER_BATCH keeps the per-table batch count
        # (and so the per-batch fixed-cost share) identical across arms:
        # each routed grp file carries BOTH tables' slice of one source file
        replay_batch_routed(spark, rfiles, cat, list(tabs),
                            files_per_batch=FILES_PER_BATCH,
                            atomic=atomic,
                            unknown_dir=os.path.join(REPO, ".bench",
                                                     f"rt_unknown_{arm}"))
        w = time.time() - t0
        arms[arm] = {"wall_sec": round(w, 2),
                     "events_per_sec": int(total / w)}
        sums[arm] = {n: _checksum(spark, t) for n, t in tabs.items()}

    for arm in ("routed_nonatomic", "routed_atomic"):
        assert sums[arm] == sums["independent"], (
            f"state diverged: {arm} {sums[arm]} vs {sums['independent']}")

    base = arms["independent"]["wall_sec"]
    out = {
        "metric": "routed_replay",
        "events": total,
        "n_tables": 2,
        "arms": arms,
        "routing_overhead_pct": round(
            100 * (arms["routed_nonatomic"]["wall_sec"] - base) / base, 1),
        "atomic_overhead_pct": round(
            100 * (arms["routed_atomic"]["wall_sec"]
                   - arms["routed_nonatomic"]["wall_sec"])
            / arms["routed_nonatomic"]["wall_sec"], 1),
        "state_checksums_equal": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
