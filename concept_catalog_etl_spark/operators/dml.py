"""Predicate DML over the CDC lake table: ``delete_where`` (GDPR-style
eraser / SQL DELETE) and ``update_where`` (SQL UPDATE).

Both are thin planners over the SAME merge kernel (``operators.merge.
apply_batch``): they read the live rows matching a predicate, synthesize
PRE-PARSED change events (the columnar envelope shape — no JSON anywhere),
and drive them through the ordinary batch path — so exactly-once ledgering,
DLQ capture, CoW/MoR write modes, WAP staging, metrics and schema evolution
all apply unchanged, and a concurrent WAL tail composes with DML under the
one LWW total order (event_ts DESC, lsn DESC).

Coordinate semantics: the emitted events carry ``event_ts`` (default: the
planning wall clock, overridable for deterministic tests/replays) and
``lsn`` (default 0). A WAL event with a LATER timestamp than the DML beats
it — which is correct: that event is genuinely newer than the operator's
decision. Late events older than the DML coordinate lose to it like any
late event loses to a newer one (the delete tombstone defends until
tombstone expiry, exactly like a feed delete).

Reference parity note: the reference ETL has no DML surface (its only write
path is the idempotent per-record ``$set``, files/load.py:20-22); this is
the operational complement a lake this engine maintains needs — bulk
erasure and backfill-style column fixes without fabricating WAL files.

At scale: one bucket-prunable read (the predicate reaches the parquet scan
for base buckets), one ordinary merge batch whose cost is O(matching rows)
under MoR. The planner never collects matching rows to the driver.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse.table import LakeTable
from .envelope import payload_struct, SCHEMA_CHANGE_T
from .merge import MergeConfig, apply_batch

# DML batches default to their own writer ledger: their batch ids are the
# caller's (cron tick, request id), not the ingest stream's foreachBatch
# sequence — sharing the stream's ledger would let a DML id shadow a
# stream batch (or vice versa) and silently skip it.
DML_WRITER = "dml"


def _coordinate(event_ts) -> "dt.datetime":
    if event_ts is None:
        return dt.datetime.now()
    if isinstance(event_ts, str):
        return dt.datetime.fromisoformat(event_ts)
    return event_ts


def _envelope(table: LakeTable, matched: DataFrame, op: str,
              payload: Column, event_ts, lsn: int) -> DataFrame:
    schema = table.schema()
    return matched.select(
        F.lit(op).alias("op"),
        *[F.col(k) for k in schema.key_names],
        F.lit(_coordinate(event_ts)).cast("timestamp").alias("event_ts"),
        F.lit(int(lsn)).cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        payload.alias("payload"),
        F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
    )


def delete_where(
    spark: SparkSession,
    table: LakeTable,
    predicate,
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
) -> dict:
    """Emit a delete change event for every live row matching ``predicate``
    (a SQL string or Column over the table's logical columns) and apply
    them as one exactly-once merge batch; returns its metrics dict (the
    ``applied`` counter is the number of keys deleted).

    The tombstones participate in the normal LWW order and expire through
    the normal tombstone-horizon maintenance — byte-level erasure of the
    old row versions completes when compaction rewrites their buckets and
    ``vacuum`` drops the superseded files (the GDPR two-step every
    snapshot-retaining lakehouse has)."""
    cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                       writer_id=DML_WRITER)
    schema = table.schema()
    matched = table.read(spark).filter(predicate).select(*schema.key_names)
    payload = F.lit(None).cast(payload_struct(schema))
    env = _envelope(table, matched, "delete", payload, event_ts, lsn)
    m = apply_batch(spark, table, env, batch_id, cfg)
    return m


def update_where(
    spark: SparkSession,
    table: LakeTable,
    predicate,
    set_exprs: dict[str, "Column | str"],
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
) -> dict:
    """SQL-UPDATE analog: for every live row matching ``predicate``, emit
    an update event whose payload carries the current row with
    ``set_exprs`` applied ({column: Column or SQL-string expression,
    evaluated against the matched row}). Unset payload columns keep their
    current values (the event carries them explicitly — the merge's LWW is
    row-granular, matching the reference's full-document ``$set``). The
    merge kernel re-runs its normal transforms on the new payload exactly
    as if it arrived from the feed — n_tok recompute, token normalization,
    DLQ rules, and the reference's source-vocabulary tagging (a source set
    outside {crawl, curated, synthetic} normalizes to 'crawl')."""
    cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                       writer_id=DML_WRITER)
    schema = table.schema()
    bad = [c for c in set_exprs if c in schema.key_names]
    if bad:
        raise ValueError(f"cannot update key column(s) {bad} — delete + "
                         "re-insert under the new key instead")
    known = {f.name for f in schema.fields}
    unknown = [c for c in set_exprs if c not in known]
    if unknown:
        raise ValueError(f"unknown column(s) in set_exprs: {unknown}")
    matched = table.read(spark).filter(predicate)
    pstruct = payload_struct(schema)
    parts = []
    for f in pstruct.fields:
        if f.name in set_exprs:
            e = set_exprs[f.name]
            col = F.expr(e) if isinstance(e, str) else e
        elif f.name in matched.columns:
            col = F.col(f.name)
        else:  # tokens_raw / renamed extras: not stored, nothing to carry
            col = F.lit(None)
        parts.append(col.cast(f.dataType).alias(f.name))
    env = _envelope(table, matched, "update", F.struct(*parts), event_ts, lsn)
    return apply_batch(spark, table, env, batch_id, cfg)
