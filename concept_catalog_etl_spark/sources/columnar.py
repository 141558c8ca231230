"""Columnar (parquet) change-event source.

A real 10^10-event CDC feed does not arrive as JSON text — Debezium/Kafka
pipelines land typed change rows in parquet/Avro (schema-registry governed).
The engine's text path pays one ``from_json`` per batch, which is its
dominant per-batch cost by measurement (operators/envelope.py:103-113); the
columnar path has NO parse step at all: ``apply_batch`` detects typed
envelope columns and aligns them to the registry schema with pure column
expressions (operators/envelope.py:parse_envelope), and the pre-merge
summary probe becomes a pushed predicate over the dictionary-encoded ``op``
column instead of a substring scan over raw text.

File contract (one directory per commit group, lexicographic order = stream
order, same as the text binlog):

    op: string, doc_id: string, event_ts: timestamp, lsn: long,
    schema_version: int,
    payload: struct<...current payload names (+ any old names still in
                    flight around a rename), tokens_raw: string>,
    schema_change: struct<kind,column,new_name,new_type>,
    _raw: string  -- original text line, kept ONLY for rows that could not
                     be typed (op null → 'unparseable'); null otherwise

Schema evolution: a file group's payload struct reflects the upstream
schema AT THAT POINT in the stream — ``convert_binlog_to_columnar`` tracks
add/rename/widen group-by-group exactly like replay does, and
``schema_change`` rows are preserved so replay still evolves the TABLE
schema at the same stream positions. Readers union differently-shaped
groups with ``mergeSchema`` (additive by construction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def convert_binlog_to_columnar(
    spark: SparkSession,
    text_files: list[str],
    schema,
    out_dir: str,
    files_per_group: int = 1,
) -> list[str]:
    """One-time text→columnar conversion (the simulator for 'the feed
    arrives columnar'): parse each file group ONCE with the schema current
    at that stream position, write typed parquet, evolve, continue.
    Returns the parquet group dirs in stream order.

    ``schema`` is the TABLE schema at the start of the stream (the same
    one replay would start from)."""
    from ..operators.envelope import parse_raw
    from ..operators.merge import _apply_schema_changes

    files = sorted(text_files)
    os.makedirs(out_dir, exist_ok=True)
    outs: list[str] = []
    cur = schema
    for gi in range(0, len(files), files_per_group):
        group = files[gi : gi + files_per_group]
        raw = spark.read.text(group)
        # stream-order schema changes in this group decide this group's
        # payload shape (old names kept as lsn-gated extras, like replay)
        parsed0 = parse_raw(raw, cur, light=True)
        scs = (
            parsed0.filter(
                (F.col("op") == "schema_change") & F.col("_dlq_reason").isNull()
            )
            .select("event_ts", "lsn", "schema_change")
            .collect()
        )
        extra = None
        if scs:
            sc_rows = sorted(
                (
                    {"event_ts": r["event_ts"], "lsn": r["lsn"],
                     **r["schema_change"].asDict()}
                    for r in scs
                ),
                key=lambda s: s["lsn"],
            )
            cur, ren = _apply_schema_changes(cur, sc_rows)
            extra = ren["types"]
        parsed = parse_raw(raw, cur, extra_names=extra)
        out = parsed.select(
            "op", "doc_id", "event_ts", "lsn", "schema_version",
            "payload", "schema_change",
            F.when(F.col("_dlq_reason") == "unparseable", F.col("_raw")).alias("_raw"),
        )
        path = os.path.join(out_dir, f"chg-{gi // files_per_group:06d}.parquet")
        out.write.mode("overwrite").parquet(path)
        outs.append(path)
    return outs


def read_columnar(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read columnar change groups; mergeSchema unions payload shapes from
    different stream positions (additive evolution)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
