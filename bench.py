"""Benchmark harness (driver contract): prints ONE JSON line.

Headline: CDC replay throughput — a deterministic synthetic binlog
(cached across runs) replayed through the full engine into a fresh
LakeTable, measured as events/sec. Plus wall-clock for the headline
operator queries at $SPARK_GRAFT_SF_DIR.

    {"metric": "cdc_replay_wall_sec", "value": <sec>, "unit": "sec",
     "events": N, "events_per_sec": X, "queries": {...}, "sf": 0.1}

Scaling evidence (N vs 4N cores) is produced by bench_scaling.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "6000000"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "200000"))
N_FILES = int(os.environ.get("BENCH_FILES", "8"))
FILES_PER_BATCH = int(os.environ.get("BENCH_FILES_PER_BATCH", "4"))
MAX_TOKENS = int(os.environ.get("BENCH_MAX_TOKENS", "24"))


def _calib_work(iters: int = 800) -> bytes:
    import hashlib

    buf = bytes(range(256)) * 4096  # 1 MiB, process-local
    h = b""
    for _ in range(iters):
        h = hashlib.sha256(buf + h).digest()
    return h


def cpu_calibration(k: int) -> dict:
    """Fixed pure-CPU reference work (chained sha256 over process-local
    buffers): a HOST-SPEED normalizer stamped into every bench line, so
    cross-round comparisons survive host/VM swaps — round-3 measured the
    same code 25-40% slower after a mid-round VM replacement, which is
    indistinguishable from a code regression without this. calib_1p is
    single-core speed; calib_kp is the wall for k processes doing the same
    work concurrently (aggregate throughput under full load, the shape the
    replay actually runs at)."""
    import time as _t
    from concurrent.futures import ProcessPoolExecutor

    t0 = _t.time()
    _calib_work()
    one = _t.time() - t0
    with ProcessPoolExecutor(max_workers=k) as ex:
        t0 = _t.time()
        list(ex.map(_calib_work, [800] * k))
        kp = _t.time() - t0
    return {"calib_1p_sec": round(one, 3), "calib_kp_sec": round(kp, 3),
            "calib_k": k}

BENCH_QUERIES = [
    "q_scan_filter",
    "q_counts",
    "q_lww_dedup_maxby",
    "q_lww_dedup",
    "q_merge_final_state",
    "q_dedup_exact",
    "q_token_count",
    "q_ann_topk",
    "q_ann_topk_gemm",
    "q_multimodal_meta",
    "q_fingerprint",
    "q_jaccard_ngram_gemm",
    "q_corpus_stats",
    "q_asof_join",
    "q_pivot",
    "q_pack_sequences",
    "q_decontaminate",
    "q_vocab_topk",
    "q_sample_fixed_k",
    "q_dedup_normalized",
    "q_token_drift",
    "q_ngram_dup_rate",
    "q_tfidf_topk",
    "q_scd2_history",
    "q_span_dedup",
    "q_refinery",
    "q_merge_patch",
    "q_semdedup_gemm",
    "q_quality_classifier",
]


def _binlog_files(spark) -> list[str]:
    """Generate (or reuse) the deterministic bench binlog — Spark-native
    generator (JVM expressions; 10^7 events in seconds)."""
    key = f"sg_ev{N_EVENTS}_d{N_DOCS}_f{N_FILES}_t{MAX_TOKENS}_s42"
    d = os.path.join(REPO, ".bench", key)
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        from concept_catalog_etl_spark.sources.binlog_spark import generate_binlog_files

        shutil.rmtree(d, ignore_errors=True)
        generate_binlog_files(
            spark, d, N_EVENTS, n_files=N_FILES, n_docs=N_DOCS,
            seed=42, max_tokens=MAX_TOKENS,
        )
        open(marker, "w").close()
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".txt")
    )


def _columnar_groups(spark, text_files) -> list[str]:
    """Columnar twin of the bench binlog (cached): one-time text→parquet
    conversion; the replay measurement then starts from typed change rows —
    the shape a real CDC feed arrives in."""
    key = f"sgcol_ev{N_EVENTS}_d{N_DOCS}_f{N_FILES}_t{MAX_TOKENS}_s42"
    d = os.path.join(REPO, ".bench", key)
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        from concept_catalog_etl_spark.lakehouse import TableSchema
        from concept_catalog_etl_spark.sources.columnar import (
            convert_binlog_to_columnar,
        )

        shutil.rmtree(d, ignore_errors=True)
        schema = TableSchema.create(
            [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
             ("source", "string")],
            key="doc_id",
        )
        convert_binlog_to_columnar(spark, text_files, schema, d,
                                   files_per_group=1)
        open(marker, "w").close()
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("chg-")
    )


def main() -> None:
    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
    from concept_catalog_etl_spark.plans.queries import QUERIES
    from concept_catalog_etl_spark.session import get_spark
    from concept_catalog_etl_spark.streaming.replay import replay_batch

    extra = {}
    if os.environ.get("BENCH_MPB"):
        # finer input splits: several task waves per core at bench scale
        extra["spark.sql.files.maxPartitionBytes"] = os.environ["BENCH_MPB"]
    if os.environ.get("BENCH_GC_PIN"):
        # fair cluster proxy: a k-core executor JVM gets k GC threads, not
        # the host's 32 — otherwise small-k runs borrow the whole machine's
        # GC bandwidth and understate scaling efficiency
        extra["spark.driver.extraJavaOptions"] = (
            f"-XX:ParallelGCThreads={CPUS} -XX:ConcGCThreads={max(1, CPUS // 4)}"
        )
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
        extra_conf=extra,
    )
    files = _binlog_files(spark)

    work = os.path.join(REPO, ".bench", "run")
    shutil.rmtree(work, ignore_errors=True)
    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(work, "table"), schema, n_buckets=max(CPUS, 32))

    repeat = int(os.environ.get("BENCH_REPEAT", "4"))
    runs = []
    for r in range(repeat):
        if r > 0:  # fresh table per run; JVM/JIT stays warm (steady-state)
            shutil.rmtree(work, ignore_errors=True)
            table = LakeTable.create(
                os.path.join(work, "table"), schema, n_buckets=max(CPUS, 32)
            )
        t0 = time.time()
        replay_batch(spark, files, table, files_per_batch=FILES_PER_BATCH)
        runs.append(time.time() - t0)
    replay_sec = min(runs)
    final_rows = table.read(spark).count()

    # BENCH_COW_ONLY: A/B + scaling harnesses measure just the CoW headline
    mor_sec = col_sec = None
    col_runs: list[float] = []
    if not os.environ.get("BENCH_COW_ONLY"):
        # merge-on-read comparison point (the CDC fast path: O(batch)
        # appends, read-side resolve) — one warm run alongside the headline
        from concept_catalog_etl_spark.operators.merge import MergeConfig

        shutil.rmtree(work, ignore_errors=True)
        t_mor = LakeTable.create(
            os.path.join(work, "table"), schema, n_buckets=max(CPUS, 32)
        )
        t0 = time.time()
        replay_batch(spark, files, t_mor, files_per_batch=FILES_PER_BATCH,
                     cfg=MergeConfig(write_mode="mor"))
        mor_sec = time.time() - t0
        assert t_mor.read(spark).count() == final_rows

        # columnar change-feed comparison point: same events, pre-typed
        # parquet (no from_json — the text path's dominant per-batch cost);
        # final state must be checksum-identical to the text replay
        col_groups = _columnar_groups(spark, files)
        from pyspark.sql import functions as F

        def _state_checksum(t):
            df = t.read(spark)
            return df.agg(
                F.bit_xor(F.xxhash64(*[F.col(c) for c in sorted(df.columns)]))
            ).collect()[0][0]

        text_sum = _state_checksum(t_mor)
        for r in range(max(2, repeat // 2)):
            shutil.rmtree(work, ignore_errors=True)
            t_col = LakeTable.create(
                os.path.join(work, "table"), schema, n_buckets=max(CPUS, 32)
            )
            t0 = time.time()
            replay_batch(spark, col_groups, t_col,
                         files_per_batch=FILES_PER_BATCH,
                         source_format="parquet")
            col_runs.append(time.time() - t0)
        col_sec = min(col_runs)
        assert t_col.read(spark).count() == final_rows
        assert _state_checksum(t_col) == text_sum, "columnar final state diverged"

    qtimes: dict[str, float] = {}
    names = [] if os.environ.get("BENCH_QUERIES_SKIP") else BENCH_QUERIES
    for name in names:
        fn = QUERIES[name]
        # steady-state latency, same protocol as the replay metric (min of
        # warm repeats): the first exec of an Arrow-UDF query pays one-time
        # Python-worker spawn (~2 s for 32 workers) that a long-running
        # service amortizes away
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        qtimes[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    calib = cpu_calibration(CPUS)
    # Host-speed-normalized headline (round-4 verdict task 5): scale by
    # calib_1p against the round-2 reference host (0.52 s single-core for
    # the same sha256 chain), so cross-round numbers compare engine code,
    # not VM lottery — round 3 misread a 27% host slowdown as a regression.
    CALIB_1P_REF = 0.52
    norm = calib["calib_1p_sec"] / CALIB_1P_REF
    out = {
        "metric": "cdc_replay_wall_sec",
        "value": round(replay_sec, 3),
        "unit": "sec",
        "events": N_EVENTS,
        "events_per_sec": round(N_EVENTS / replay_sec, 1),
        "events_per_sec_normalized": round(N_EVENTS / replay_sec * norm, 1),
        "calib_1p_ref_sec": CALIB_1P_REF,
        "replay_runs_sec": [round(x, 3) for x in runs],
        "final_rows": final_rows,
        "cpus": CPUS,
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **calib,
    }
    if mor_sec is not None:
        out["replay_mor_sec"] = round(mor_sec, 3)
        out["mor_events_per_sec"] = round(N_EVENTS / mor_sec, 1)
        out["mor_events_per_sec_normalized"] = round(
            N_EVENTS / mor_sec * norm, 1)
        out["replay_columnar_sec"] = round(col_sec, 3)
        out["columnar_events_per_sec"] = round(N_EVENTS / col_sec, 1)
        out["columnar_events_per_sec_normalized"] = round(
            N_EVENTS / col_sec * norm, 1)
        out["columnar_runs_sec"] = [round(x, 3) for x in col_runs]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
