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
    reason_chain = [F.col("_dlq_reason"),
                    F.when(is_bad_tokens, F.lit("bad_tokens"))]
    # mirror the kernel's CHECK-constraint routing (merge.apply_batch)
    for nm in sorted(table.properties().get("check_constraints") or {}):
        ex = table.properties()["check_constraints"][nm]
        viol = (
            F.col("_dlq_reason").isNull()
            & F.col("op").isin("insert", "update")
            & ~F.coalesce(F.expr(ex).cast("boolean"), F.lit(True))
        )
        reason_chain.append(F.when(viol, F.lit(f"check:{nm}")))
    norm = norm.withColumn("_dlq_reason", F.coalesce(*reason_chain))
    return norm.filter(F.col("_dlq_reason").isNotNull()).select(
        "_raw", "_dlq_reason", "op",
        F.col(key).alias("doc_id"), "event_ts", "lsn",
    )


GEN_MARKER = "_generation"


def _partition_generations(part: str) -> set[str]:
    """Every repair generation whose rewrite has COMPLETED on this
    partition (newline-separated history in the marker). Membership — not
    equality with the latest — is the rewrite guard: after v0 and v1 both
    ran, a stale rerun of v0 must still short-circuit (an equality check
    against the newest stamp would let it rewrite off a ledger-skipped
    merge and drop rows the current repair could fix but never applied)."""
    p = os.path.join(part, GEN_MARKER)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return {ln.strip() for ln in f if ln.strip()}


def _recover_partition_swaps(table: LakeTable) -> None:
    """Finish any partition swap a crashed replay left half-done. The swap
    protocol renames the old partition to ``<part>.prev`` before moving the
    residue in, so exactly two crash states need repair: ``.prev`` present
    with the main dir missing (restore the original — nothing was lost) and
    ``.prev`` present alongside a completed main dir (drop the leftover).
    Orphaned ``.tmp-*`` trees from a crash before the first rename are
    swept too. Single-owner like the streaming ingest loop itself: run one
    replay_dlq at a time per table (a second process's recovery could race
    an in-flight swap)."""
    import glob as _glob

    base = os.path.join(table.root, "_dlq", "writer_id=*")
    for prev in _glob.glob(os.path.join(base, "batch_id=*.prev")):
        main = prev[: -len(".prev")]
        if os.path.exists(main):
            shutil.rmtree(prev, ignore_errors=True)
        else:
            os.rename(prev, main)
    for tmp in _glob.glob(os.path.join(base, "batch_id=*.tmp-*")):
        shutil.rmtree(tmp, ignore_errors=True)


def _swap_partition(spark: SparkSession, part: str,
                    residue: DataFrame | None, generation: str) -> None:
    """Replace a DLQ partition with its residue WITHOUT a delete-then-write
    window (``mode('overwrite')`` clears the target before writing, so a
    crash mid-write would lose still-failing rows). Residue is written to a
    sibling temp dir first; the old partition survives as ``.prev`` until
    the new one is in place; ``_recover_partition_swaps`` repairs the two
    possible crash points on the next run. The surviving partition is
    stamped with the repair ``generation`` that produced it — the guard
    that makes a rewrite legal at most once per generation."""
    prev = part + ".prev"
    if residue is None:
        os.rename(part, prev)
        shutil.rmtree(prev, ignore_errors=True)
        return
    tmp = part + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    residue.write.parquet(tmp)
    history = _partition_generations(part) | {generation}
    with open(os.path.join(tmp, GEN_MARKER), "w") as f:
        f.write("\n".join(sorted(history)))
    os.rename(part, prev)
    os.rename(tmp, part)
    shutil.rmtree(prev, ignore_errors=True)


def replay_dlq(
    spark: SparkSession,
    table: LakeTable,
    repair: Callable[[DataFrame], DataFrame] | None = None,
    cfg: MergeConfig | None = None,
    writer_prefix: str = "dlq",
    repair_id: str = "v0",
) -> list[dict]:
    """Re-drive every dead-letter batch through the merge path.

    ``repair`` is a vectorized DataFrame→DataFrame transform over the raw
    text (one ``value`` string column) — e.g. a ``regexp_replace`` that
    strips the corruption an upstream producer has since fixed. No repair
    means "retry as-is" (for rows dead-lettered by a since-fixed parser
    bug).

    ``repair_id`` names the repair GENERATION and is part of the ledger
    namespace (``dlq.<repair_id>:<writer>``): re-running the same attempt
    (crash recovery) is ledger-skipped, but a NEW repair must ship under a
    new id so its newly-repairable rows actually merge — under a consumed
    id the merge would skip and the residue rewrite would drop them
    unapplied. Re-merging rows an earlier generation already applied is
    state-idempotent (LWW on the original ``(event_ts, lsn)``).

    Rows captured WITHOUT raw text (the columnar source nulls ``_raw``
    except for unparseable lines) cannot be re-driven textually; they are
    retained as residue verbatim, never dropped.

    DLQ partitions are keyed (source writer, batch id) — concurrent
    writers reuse batch ids — so recovery runs per source writer. Returns
    per-batch metrics: ``recovered`` (events the merge actually applied —
    still-failing ``bad_tokens`` rows excluded), ``residual`` (rows still
    dead-lettered), ``skipped`` (ledger: this generation already ran).
    """
    _recover_partition_swaps(table)
    table.migrate_legacy_dlq()  # pre-writer-namespace dirs -> writer_id=_legacy
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
            writer_id=f"{writer_prefix}.{repair_id}:{src_writer}",
            write_dlq=False,
        )
        part = table.dlq_partition(bid, src)
        # a partition whose generation HISTORY contains this repair_id is
        # FINAL for it: its merge committed and its rewrite completed.
        # Re-deriving the residue would be with TODAY's parser/repair —
        # under a consumed ledger id a shrunken residue means dropping rows
        # that were never merged. Membership (not newest-stamp equality)
        # also covers re-running an OLD generation after newer ones ran.
        if repair_id in _partition_generations(part):
            rows_now = spark.read.parquet(part)
            results.append({
                "writer_id": src_writer, "batch_id": bid,
                "skipped": True, "recovered": 0,
                "residual": int(rows_now.count()),
            })
            continue
        rows = spark.read.parquet(part)
        # no raw text (columnar-source capture) -> not replayable, keep
        untouchable = rows.filter(F.col("_raw").isNull()).localCheckpoint(
            eager=True
        )
        n_keep = untouchable.count()
        raw = rows.filter(F.col("_raw").isNotNull()).select(
            F.col("_raw").alias("value")
        )
        if repair is not None:
            raw = repair(raw)
        # sever lineage from the partition files we will swap out below,
        # and drop rows the repair nulled out entirely
        raw = raw.filter(F.col("value").isNotNull()).localCheckpoint(eager=True)
        # residue BEFORE the merge: pre-batch schema (what the kernel sees),
        # and materialized so nothing reads the partition after the swap
        residue = _residue(raw, table, base).localCheckpoint(eager=True)
        n_res = residue.count() + n_keep
        m = apply_batch(spark, table, raw, bid, base)
        # post-commit (or crash-recovery ledger-skip completing THIS
        # generation's interrupted rewrite): swap the partition and stamp it
        _swap_partition(
            spark, part,
            residue.unionByName(untouchable.select(*residue.columns))
            if n_res else None,
            generation=repair_id,
        )
        recovered = max(
            0, int(m.get("events_data", 0) or 0) - int(m.get("bad_tokens", 0) or 0)
        )
        results.append(
            {
                "writer_id": src_writer,
                "batch_id": bid,
                "skipped": bool(m.get("skipped")),
                "recovered": recovered,
                "residual": int(n_res),
            }
        )
    return results
