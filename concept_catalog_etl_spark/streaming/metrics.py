"""Streaming ingest metrics: watermarked tumbling-window throughput and a
custom stateful per-source lag tracker.

Two Structured-Streaming-native operators that complement the (deliberately
stateless) LWW merge path — the merge needs no watermark because late events
lose against the live row's ``(event_ts, lsn)``; the *metrics* pipelines,
by contrast, are where bounded streaming state earns its keep:

* ``windowed_throughput`` — events per ``(tumbling window, source)`` with a
  watermark bounding the window state (SURVEY.md §2.1 "streaming-only":
  tumbling-window ingest metrics). Classic
  ``withWatermark → groupBy(window(...))``; state size =
  O(windows-in-watermark × sources).
* ``source_lag_tracker`` — ``applyInPandasWithState`` per-source running
  state: max lsn, max event time, event count, and the largest observed
  inter-event lsn gap (a replication-hole detector a plain windowed agg
  cannot express — it needs the previous batch's high-water mark). State is
  one tiny tuple per source; timeouts are unnecessary because sources are a
  small closed set.

Both read the light envelope projection (never token arrays) — metrics must
not pay payload-decode cost.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..lakehouse.schema import TableSchema
from ..operators.envelope import envelope_struct_light


def parse_light_stream(raw: DataFrame, schema: TableSchema,
                       source_name: str = "source") -> DataFrame:
    """Streaming text lines → (event_ts, lsn, op, source) — the envelope
    head only; the JSON parser never materializes token arrays."""
    env = envelope_struct_light(schema, source_name)
    e = raw.select(F.from_json("value", env).alias("e"))
    return e.select(
        F.col("e.event_ts").alias("event_ts"),
        F.col("e.lsn").alias("lsn"),
        F.col("e.op").alias("op"),
        F.coalesce(F.col(f"e.payload.{source_name}"), F.lit("_default")).alias("source"),
    ).filter(F.col("event_ts").isNotNull())


def windowed_throughput(events: DataFrame, window: str = "1 minute",
                        watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window ingest throughput per source, state bounded by the
    watermark. Columns: window_start, window_end, source, n_events, max_lsn."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n_events",
            "max_lsn",
        )
    )


_LAG_STATE_T = T.StructType(
    [
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_gap", T.LongType()),
    ]
)

_LAG_OUT_T = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_gap", T.LongType()),
    ]
)


def _track_lag(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (source,) = key
    if state.exists:
        max_lsn, max_ts_us, n_events, max_gap = state.get
    else:
        max_lsn, max_ts_us, n_events, max_gap = -1, 0, 0, 0
    for pdf in pdfs:  # vectorized per Arrow batch — no per-row Python
        if len(pdf) == 0:
            continue
        lsns = pdf["lsn"].dropna().astype("int64").sort_values()
        if len(lsns):
            gaps = lsns.diff().dropna()
            batch_gap = int(gaps.max()) if len(gaps) else 0
            if max_lsn >= 0:
                batch_gap = max(batch_gap, int(lsns.iloc[0]) - max_lsn)
            max_gap = max(max_gap, batch_gap)
            max_lsn = max(max_lsn, int(lsns.iloc[-1]))
        ts = pd.to_datetime(pdf["event_ts"]).dropna()
        if len(ts):
            max_ts_us = max(max_ts_us, int(ts.max().value // 1000))
        n_events += len(pdf)
    state.update((max_lsn, max_ts_us, n_events, max_gap))
    yield pd.DataFrame(
        [{"source": source, "max_lsn": max_lsn, "max_ts_us": max_ts_us,
          "n_events": n_events, "max_gap": max_gap}]
    )


def source_lag_tracker(events: DataFrame) -> DataFrame:
    """Per-source running ingest state via ``applyInPandasWithState``:
    lineage high-water mark, newest event time, total events, and the
    largest lsn gap ever observed (replication-hole detector)."""
    return events.groupBy("source").applyInPandasWithState(
        _track_lag,
        outputStructType=_LAG_OUT_T,
        stateStructType=_LAG_STATE_T,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
