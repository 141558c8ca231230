"""Dead-letter repair & replay — the recovery half of the DLQ loop.

``apply_batch`` captures rejected change events (unparseable lines,
unknown ops, null keys/ordering, null-token payloads) under
``_dlq/writer_id=W/batch_id=N`` with their raw text. The reference keeps its failed
payloads too (``files/load.py:31-32``) but never re-drives them;
``replay_dlq`` closes that loop: each dead-letter batch goes back through
the SAME merge kernel after an optional vectorized repair, under a
DLQ-namespaced writer ledger (``MergeConfig.writer_id``) so recovery is
exactly-once and independent of the live tail's ledger — the tail already
used these batch ids.

Ordering safety is free: a repaired event carries its ORIGINAL
``(event_ts, lsn)``, so LWW resolves it against state that has moved on —
a late repair loses to a newer version instead of clobbering it.

Crash-safe by ordering (no markers needed):

* crash before the merge commit → the DLQ partition is untouched; the
  rerun re-merges.
* crash after the commit, before the residue rewrite → the rerun
  ledger-skips the merge, recomputes the residue from the still-intact
  partition, and rewrites it.

The residue (rows that STILL fail after repair) is recomputed through the
same parse → in-batch schema fold → normalize pipeline the kernel runs,
so a row is retained iff the kernel would have dead-lettered it. It is
materialized BEFORE the merge (the merge's ``write_dlq`` is disabled —
letting the kernel overwrite the partition pre-commit could lose captured
rows on a crash between that write and the commit). One documented corner:
if the rerun of a crashed run follows a dead-letter batch that itself
evolved the schema, the recomputed residue sees the post-batch schema;
reasons are schema-stable for every structural class, so at worst a row
is over-retained (lingers in the DLQ as noise), never lost from the table.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import replace
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse.table import LakeTable
from .envelope import parse_raw
from .merge import MergeConfig, _apply_schema_changes, _normalize, apply_batch


def _residue(raw: DataFrame, table: LakeTable, cfg: MergeConfig) -> DataFrame:
    """Rows of ``raw`` the merge kernel would dead-letter, in the DLQ
    parquet shape — same parse, same in-batch schema fold, same
    normalization, same reasons (mirrors ``merge.apply_batch``; the
    ``bad_tokens`` predicate mirrors merge.py's post-normalize check)."""
    schema = table.schema()
    parsed = parse_raw(raw, schema)
    sc_rows = sorted(
        (
            {"event_ts": r["event_ts"], "lsn": r["lsn"],
             **r["schema_change"].asDict()}
            for r in parsed.filter(
                (F.col("op") == "schema_change")
                & F.col("_dlq_reason").isNull()
            ).select("event_ts", "lsn", "schema_change").collect()
        ),
        key=lambda s: s["lsn"],
    )
    evolution: dict = {}
    if sc_rows:
        schema, evolution = _apply_schema_changes(schema, sc_rows)
        parsed = parse_raw(raw, schema, extra_names=evolution["types"])
    key = schema.key_name
    data = parsed.filter(
        F.col("_dlq_reason").isNotNull() | (F.col("op") != "schema_change")
    )
    norm = _normalize(data, schema, cfg, evolution)
    tokens_name = next(
        (f.name for f in schema.fields if f.id == cfg.tokens_fid), None
    )
    is_bad_tokens = (
        F.col("_dlq_reason").isNull()
        & F.col("op").isin("insert", "update")
        & F.col(tokens_name).isNull()
        if tokens_name is not None
        else F.lit(False)
    )
    norm = norm.withColumn(
        "_dlq_reason",
        F.coalesce(F.col("_dlq_reason"), F.when(is_bad_tokens, F.lit("bad_tokens"))),
    )
    return norm.filter(F.col("_dlq_reason").isNotNull()).select(
        "_raw", "_dlq_reason", "op",
        F.col(key).alias("doc_id"), "event_ts", "lsn",
    )


def replay_dlq(
    spark: SparkSession,
    table: LakeTable,
    repair: Callable[[DataFrame], DataFrame] | None = None,
    cfg: MergeConfig | None = None,
    writer_prefix: str = "dlq",
) -> list[dict]:
    """Re-drive every dead-letter batch through the merge path.

    ``repair`` is a vectorized DataFrame→DataFrame transform over the raw
    text (one ``value`` string column) — e.g. a ``regexp_replace`` that
    strips the corruption an upstream producer has since fixed. No repair
    means "retry as-is" (for rows dead-lettered by a since-fixed parser
    bug). DLQ partitions are keyed (source writer, batch id) — concurrent
    writers reuse batch ids — so recovery runs under one ledger namespace
    PER SOURCE WRITER (``dlq:<writer>``). Returns per-batch metrics:
    ``recovered`` (events the merge applied), ``residual`` (rows still
    failing — they stay dead-lettered), ``skipped`` (ledger said this
    batch was already recovered).
    """
    dlq = table.read_dlq(spark)
    results: list[dict] = []
    if dlq is None:
        return results
    partitions = sorted(
        (r["writer_id"], r["batch_id"])
        for r in dlq.select("writer_id", "batch_id").distinct().collect()
    )
    for src_writer, bid in partitions:
        src = None if src_writer == "_main" else src_writer
        base = replace(
            cfg or MergeConfig(),
            writer_id=f"{writer_prefix}:{src_writer}",
            write_dlq=False,
        )
        part = table.dlq_partition(bid, src)
        raw = spark.read.parquet(part).select(F.col("_raw").alias("value"))
        if repair is not None:
            raw = repair(raw)
        # sever lineage from the partition files we will overwrite below,
        # and drop rows the repair nulled out entirely
        raw = raw.filter(F.col("value").isNotNull()).localCheckpoint(eager=True)
        # residue BEFORE the merge: pre-batch schema (what the kernel sees),
        # and materialized so nothing reads the partition after the rewrite
        residue = _residue(raw, table, base).localCheckpoint(eager=True)
        n_res = residue.count()
        m = apply_batch(spark, table, raw, bid, base)
        # post-commit (or ledger-skip): now the partition may be rewritten
        if n_res:
            table.write_dlq(residue, bid, src)
        else:
            shutil.rmtree(part, ignore_errors=True)
        results.append(
            {
                "writer_id": src_writer,
                "batch_id": bid,
                "skipped": bool(m.get("skipped")),
                "recovered": int(m.get("events_data", 0) or 0),
                "residual": int(n_res),
            }
        )
    return results
