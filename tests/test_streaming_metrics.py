"""Streaming-only operators (SURVEY.md §2.1): watermarked tumbling-window
throughput and the applyInPandasWithState per-source lag tracker."""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import TableSchema
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.metrics import (
    parse_light_stream,
    source_lag_tracker,
    windowed_throughput,
)

SCHEMA = TableSchema.create(
    [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"), ("source", "string")],
    key="doc_id",
)


def _stream(spark, d):
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 2)
        .load(os.path.join(d, "*.jsonl"))
    )
    return parse_light_stream(raw, SCHEMA)


def _drain(q):
    q.awaitTermination()


def test_windowed_throughput_stream(spark, scratch):
    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=2000, n_docs=200, n_files=4, seed=21)
    agg = windowed_throughput(_stream(spark, d), window="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("thr")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM thr").collect()
    assert rows, "no windows emitted"
    # total across windows+sources equals parseable events with a timestamp
    total = sum(r["n_events"] for r in rows)
    n_lines = 0
    for f in os.listdir(d):
        if f.endswith(".jsonl"):
            for ln in open(os.path.join(d, f)):
                if ln.strip():
                    try:
                        e = json.loads(ln)
                        n_lines += 1 if e.get("event_ts") else 0
                    except json.JSONDecodeError:
                        pass
    assert total == n_lines
    # window bounds are 1-minute aligned
    for r in rows:
        assert r["window_start"].second == 0 and r["window_start"].microsecond == 0


def test_source_lag_tracker_state(spark, scratch):
    """Two waves through the same checkpoint: state carries the lsn
    high-water mark across restarts, so a cross-wave gap is detected."""
    d = os.path.join(scratch, "binlog")
    ckpt = os.path.join(scratch, "ckpt")
    generate_binlog(d, n_events=500, n_docs=50, n_files=2, seed=22)

    def run_wave():
        out = source_lag_tracker(_stream(spark, d))
        latest: dict = {}

        def _sink(df, _bid):
            for r in df.collect():  # ≤ #sources rows per micro-batch
                latest[r["source"]] = r

        q = (
            out.writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return latest

    s1 = run_wave()
    assert s1 and all(r["max_lsn"] >= 0 for r in s1.values())

    # wave 2 starts at lsn 100000 → per-source gap must exceed the jump
    generate_binlog(d, n_events=500, n_docs=50, n_files=2, seed=23,
                    start_lsn=100_000, prefix="binlog-w2")
    s2 = run_wave()
    for src, r in s2.items():
        if src in s1:
            assert r["n_events"] > s1[src]["n_events"]
            assert r["max_lsn"] >= 100_000
            assert r["max_gap"] >= 100_000 - 500 - 1, (src, r["max_gap"])
