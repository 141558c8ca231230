"""Snapshot reconciliation: make a lake table converge to an upstream
full snapshot WITHOUT truncate-and-reload — the ``WHEN NOT MATCHED BY
SOURCE`` half of SQL MERGE, and the engine-level primitive behind it.

The CDC scenario (Debezium "snapshot mode", relay lag recovery): a
consumer has been tailing deltas, falls behind past the retention
horizon, and receives a full snapshot of upstream at some position. The
naive consumer truncates and reloads — O(table) write amplification and
a window where readers see an empty table. Reconcile instead emits the
MINIMAL change-event batch that converges the table:

* **upserts** for snapshot rows (``mode="diff"``: only rows whose stored
  payload differs or that are absent — O(drift) events, not O(table));
* **deletes** for live keys ABSENT from the snapshot (the rows deleted
  upstream inside the lag gap — the part a pure-LWW delta consumer can
  never recover on its own, cf. the relay window contract in
  ``sources/debezium.py``).

Both sets drive through the ordinary merge kernel
(``operators.merge.apply_batch``) as ONE batch — so the convergence is
atomic (one snapshot commit), exactly-once (the batch-id ledger), and
composes with a concurrent WAL tail under the one LWW total order, the
same guarantees the reference's idempotent per-record ``$set`` gives a
single Mongo document (``/root/reference/files/load.py:20-22``) lifted
to whole-table convergence.

Coordinates: snapshot rows carry their own ``(event_ts, lsn)`` columns
when present (the relay snapshot shape), else the single coordinate
passed by the caller. Synthesized delete tombstones use a per-row bump
``(stored_event_ts, stored_lsn + 1)``: they beat exactly the row version
they erase and lose to any genuinely newer delta that arrives later —
the minimal-privilege tombstone.

At scale (100 TB lens): ``mode="diff"`` is one key-partitioned join of
snapshot vs live target (both sides hash-partitioned on the key; AQE
handles skew) plus one left-anti for deletes — the emitted batch is
O(drift + gap deletes), and the downstream merge cost is O(batch) under
MoR. ``mode="full"`` skips the diff join (every snapshot row becomes an
event) for when drift approaches 100% and the join would cost more than
it saves. No driver-side materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse.table import LakeTable
from .dml import DML_WRITER, _coordinate
from .envelope import SCHEMA_CHANGE_T, payload_struct
from .merge import MergeConfig, apply_batch

RECONCILE_WRITER = "reconcile"


def snapshot_envelope(
    spark: SparkSession,
    table: LakeTable,
    snapshot: DataFrame,
    *,
    event_ts=None,
    lsn: int = 0,
    delete_condition: "Column | str | None" = None,
    mode: str = "diff",
) -> DataFrame:
    """Build the columnar change-event batch that converges ``table`` to
    ``snapshot`` (logical columns: all key components + any payload
    columns; missing payload columns ride as null, exactly like the DML
    planner). Returns the envelope DataFrame — feed it to ``apply_batch``
    or let :func:`reconcile_snapshot` do it.

    ``delete_condition`` (SQL string or Column over the stored row)
    restricts which target-only rows are deleted — the ``WHEN NOT MATCHED
    BY SOURCE AND <cond> THEN DELETE`` form; target-only rows failing the
    condition are left untouched.
    """
    if mode not in ("diff", "full"):
        raise ValueError(f"mode must be 'diff' or 'full', got {mode!r}")
    schema = table.schema()
    keys = schema.key_names
    missing = [k for k in keys if k not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot is missing key column(s) {missing}")

    pstruct = payload_struct(schema)
    per_row_coords = "event_ts" in snapshot.columns
    ts_col = (
        F.col("event_ts").cast("timestamp")
        if per_row_coords
        else F.lit(_coordinate(event_ts)).cast("timestamp")
    )
    lsn_col = (
        F.col("lsn").cast("long")
        if per_row_coords and "lsn" in snapshot.columns
        else F.lit(int(lsn)).cast("long")
    )

    def _payload(prefix: str | None = None):
        cols = []
        for f in pstruct.fields:
            name = f"{prefix}.{f.name}" if prefix else f.name
            src = F.col(name) if f.name in snapshot.columns else F.lit(None)
            cols.append(src.cast(f.dataType).alias(f.name))
        return F.struct(*cols)

    def _env(rows: DataFrame, op: str, payload: Column,
             ts: Column, seq: Column) -> DataFrame:
        return rows.select(
            F.lit(op).alias("op"),
            *[F.col(k) for k in keys],
            ts.alias("event_ts"),
            seq.alias("lsn"),
            F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
            payload.alias("payload"),
            F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
        )

    live = table.read(spark, with_system_cols=True)

    if mode == "full":
        # every snapshot row upserts (no diff join); ONE left-anti against
        # the snapshot keys derives the deletes
        upserts = _env(snapshot, "update", _payload(), ts_col, lsn_col)
        gone = live.join(
            snapshot.select(*keys).dropDuplicates(keys), on=keys, how="left_anti"
        )
        if delete_condition is not None:
            gone = gone.filter(delete_condition)
        deletes = _env(
            gone,
            "delete",
            F.lit(None).cast(pstruct),
            F.col("_event_ts"),
            F.col("_lsn") + F.lit(1).cast("long"),
        )
        return upserts.unionByName(deletes)

    # diff: ONE full-outer join serves both sides — snapshot rows whose
    # stored payload differs (or that are absent) become upserts, live
    # rows absent from the snapshot become deletes. The target is scanned
    # once; both sides hash-partition on the key. Null-safe struct
    # equality on the snapshot's payload shape — byte-semantic, no
    # serialization. NOTE: the diff compares the snapshot's RAW payload
    # against the STORED (post-normalize) payload, so a not-yet-normalized
    # snapshot marks normalization deltas as drift — never incorrect (the
    # kernel re-normalizes), just extra events; feed normalized snapshots
    # for a tight diff. Presence markers, not key nullability, decide the
    # sides (a null key component must not masquerade as absence).
    # duplicate-key snapshot rows flow through: each diffs independently
    # and the kernel's total LWW tie-break (ts, lsn, op, payload) picks the
    # winner deterministically — a dropDuplicates here would pick an
    # ARBITRARY representative and break partitioning-invariance
    s = snapshot.withColumn("_s_present", F.lit(True)).alias("s")
    tdf = live.withColumn("_t_present", F.lit(True))
    if delete_condition is not None:
        # evaluated on the live side BEFORE the join, so the expression
        # resolves against target columns only (both sides share payload
        # column names after the join)
        cond = (F.expr(delete_condition) if isinstance(delete_condition, str)
                else delete_condition)
        tdf = tdf.withColumn("_del_ok", F.coalesce(cond.cast("boolean"),
                                                   F.lit(False)))
    t = tdf.alias("t")
    s_present = F.col("s._s_present").isNotNull()
    t_present = F.col("t._t_present").isNotNull()
    stored_payload = F.struct(*[
        (F.col(f"t.{f.name}") if f.name in live.columns else F.lit(None))
        .cast(f.dataType).alias(f.name)
        for f in pstruct.fields
    ])
    snap_payload = F.struct(*[
        (F.col(f"s.{f.name}") if f.name in snapshot.columns else F.lit(None))
        .cast(f.dataType).alias(f.name)
        for f in pstruct.fields
    ])
    joined = s.join(
        t, on=[F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys], how="full"
    )
    ups_ts = (
        F.col("s.event_ts").cast("timestamp")
        if per_row_coords
        else F.lit(_coordinate(event_ts)).cast("timestamp")
    )
    ups_lsn = (
        F.col("s.lsn").cast("long")
        if per_row_coords and "lsn" in snapshot.columns
        else F.lit(int(lsn)).cast("long")
    )
    fire_upsert = s_present & (~t_present | ~snap_payload.eqNullSafe(stored_payload))
    fire_delete = t_present & ~s_present
    if delete_condition is not None:
        fire_delete = fire_delete & F.col("t._del_ok")
    op_col = (
        F.when(fire_upsert, F.lit("update"))
        .when(fire_delete, F.lit("delete"))
    )
    return (
        joined.select(
            op_col.alias("op"),
            *[F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k)
              for k in keys],
            F.when(fire_upsert, ups_ts)
            .otherwise(F.col("t._event_ts")).alias("event_ts"),
            F.when(fire_upsert, ups_lsn)
            .otherwise(F.col("t._lsn") + F.lit(1).cast("long")).alias("lsn"),
            F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
            F.when(fire_upsert, snap_payload).alias("payload"),
            F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
        )
        .filter(F.col("op").isNotNull())
    )


def reconcile_snapshot(
    spark: SparkSession,
    table: LakeTable,
    snapshot: DataFrame,
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
    delete_condition: "Column | str | None" = None,
    mode: str = "diff",
) -> dict:
    """Converge ``table`` to ``snapshot`` as ONE exactly-once merge batch;
    returns the merge metrics dict. See module docstring for semantics."""
    cfg = cfg or MergeConfig.for_table(
        table, write_mode="mor", writer_id=RECONCILE_WRITER
    )
    env = snapshot_envelope(
        spark, table, snapshot,
        event_ts=event_ts, lsn=lsn,
        delete_condition=delete_condition, mode=mode,
    )
    return apply_batch(spark, table, env, batch_id, cfg)


__all__ = [
    "snapshot_envelope",
    "reconcile_snapshot",
    "RECONCILE_WRITER",
    "DML_WRITER",
]
