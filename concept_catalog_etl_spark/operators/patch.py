"""Partial-update (merge-patch) state: per-FIELD last-writer-wins.

The reference's sink is literally a merge-patch — MongoDB
``update_one({'_id': k}, {'$set': payload})`` (``/root/reference/files/
load.py:20-22``) overwrites only the fields present in ``payload`` and
leaves every other field of the document untouched. The engine's main MERGE
(``operators/merge.py``) models the common CDC case where every change event
carries the full row, so row-level LWW suffices; this module supplies the
faithful ``$set`` semantics for feeds whose update events carry only the
changed columns (Debezium partial images, Paimon's ``partial-update`` merge
engine).

Semantics (one well-defined total order per key: ``(ts, seq)`` ascending,
coordinates unique per key — the engine-wide event contract):

* A field's final value is the value carried by the LATEST event that SET
  that field. ``NULL`` in an event's field means "not set" (as with ``$set``,
  absent and explicit-null are indistinguishable after JSON parsing; there is
  no unset operation).
* A ``delete`` event sets EVERY field to NULL at its coordinate. A later
  partial update therefore resurrects the row with only its own fields —
  older field values stay dead behind the delete's coordinate.
* The row is visible iff the globally latest event for the key is not a
  delete.

Physical plan: ONE hash aggregation — per field,
``max(struct(ts, seq, value)) FILTER (field set OR delete)`` picks the
latest setter lexicographically (coordinates decide; the value rides along),
exactly the struct-max trick the row-level MERGE uses. Partial (map-side)
aggregation combines hot keys on every input partition before the shuffle,
so the operator is skew-resistant by construction and needs no sort — the
same 100 TB posture as ``lww_dedup``. Contrast with the naive plan (one
``row_number`` window per field = F sort-shuffles).

Out-of-order note (why this is an operator, not a ``LakeTable`` write mode):
folding per-field winners into a stored row collapses F coordinates into
one, so a late event older than the row but newer than one field's true
setter could not be ordered correctly against stored state. Correct
incremental partial-update at rest needs per-field sequence metadata
(Paimon's sequence-groups); within one bounded event set — a batch, a
backfill, or a full replay — the aggregation below is exact. The stored-
state integration (F extra ``(_ts, _lsn)`` system column pairs riding the
data files) is sketched in ARCHITECTURE.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def partial_update_state(
    df: DataFrame,
    key: str = "doc_id",
    fields: list[str] | None = None,
    ts_col: str = "event_ts",
    seq_col: str = "lsn",
    op_col: str = "op",
    keep_deleted: bool = False,
) -> DataFrame:
    """Fold a bounded set of merge-patch events into final per-key state.

    ``df`` columns: ``key``, ``ts_col``, ``seq_col``, ``op_col`` plus one
    column per patchable field (NULL = not set by this event). Returns one
    row per live key with the per-field LWW values; pass
    ``keep_deleted=True`` to keep tombstoned keys (all fields NULL,
    ``_deleted`` flag) — the shape a MERGE write path would persist.
    """
    fields = fields or [
        c for c in df.columns if c not in (key, ts_col, seq_col, op_col)
    ]
    coord = [F.col(ts_col).alias("t"), F.col(seq_col).alias("s")]
    is_del = F.col(op_col) == "delete"

    dtypes = {fld.name: fld.dataType for fld in df.schema.fields}

    def field_winner(f: str) -> Column:
        # delete contributes (t, s, NULL) for every field; a data event
        # contributes only for the fields it sets. max() skips the NULL
        # structs of non-setting events entirely. An UNORDERABLE field
        # type (a map, or a struct holding one) cannot ride inside a
        # max(struct) — use max_by with the coordinate as the ordering
        # (same winner; a coordinate tie resolves arbitrarily instead of
        # by value, the documented same-event contract).
        from .dedup import _dt_orderable

        fire = is_del | F.col(f).isNotNull()
        if _dt_orderable(dtypes[f]):
            contrib = F.when(
                fire, F.struct(*coord, F.when(~is_del, F.col(f)).alias("v"))
            )
            return F.max(contrib).getField("v").alias(f)
        return F.max_by(
            F.when(fire, F.when(~is_del, F.col(f))),
            F.when(fire, F.struct(*coord)),
        ).alias(f)

    row_deleted = (
        F.max(F.struct(*coord, is_del.alias("d"))).getField("d").alias("_deleted")
    )
    out = df.groupBy(key).agg(*[field_winner(f) for f in fields], row_deleted)
    if keep_deleted:
        return out
    return out.filter(~F.col("_deleted")).drop("_deleted")


# Aggregation merge engine (Paimon's ``aggregation`` analog): each field
# folds with a declared aggregate function instead of LWW — the CDC shape of
# a metrics rollup table (counter increments, running max, latest label)
# fed by change events rather than absolute rows.
_AGG_FNS: dict[str, Callable[[Column, Column], Column]] = {
    "sum": lambda f, coord: F.sum(f),
    "min": lambda f, coord: F.min(f),
    "max": lambda f, coord: F.max(f),
    "count": lambda f, coord: F.count(f),
    "bool_or": lambda f, coord: F.max(f.cast("boolean")),
    "bool_and": lambda f, coord: F.min(f.cast("boolean")),
    # first/last setter by event coordinate — null fields never contribute.
    # min_by/max_by (ordering = the coordinate alone) rather than
    # min/max(struct(c, v)): identical winner for unique coordinates AND
    # legal for unorderable (map-bearing) field types
    "first_non_null": lambda f, coord: F.min_by(
        F.when(f.isNotNull(), f), F.when(f.isNotNull(), coord)
    ),
    "last_non_null": lambda f, coord: F.max_by(
        F.when(f.isNotNull(), f), F.when(f.isNotNull(), coord)
    ),
}


def aggregate_state(
    df: DataFrame,
    key: str = "doc_id",
    aggs: dict[str, str] | None = None,
    ts_col: str = "event_ts",
    seq_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Fold change events into per-key aggregate state.

    ``aggs`` maps field column → function name (``sum | min | max | count |
    bool_or | bool_and | first_non_null | last_non_null``). NULL fields are
    skipped (every listed function ignores nulls). A ``delete`` RESETS the
    key at its coordinate: only events strictly after the key's latest
    delete contribute, and the key is dropped entirely iff the delete is
    its globally latest event — the same visibility rule as
    ``partial_update_state``, so the two engines compose predictably.

    Physical plan: the per-key latest-delete coordinate is one map-side-
    combinable aggregation over just the delete rows (output ≈ |deleted
    keys|, tiny next to the event stream); it joins back on the key and the
    surviving events fold in ONE hash aggregation — every aggregate above
    is algebraic, so partial aggregation absorbs hot keys pre-shuffle.
    Keys with no delete skip the reset filter via the left join's NULL.
    (A single-pass reset-aware fold is not a monoid — a partial sum cannot
    retro-exclude events once a later delete coordinate is discovered — so
    the two-pass shape is the correct distributed plan, not a shortcut.)
    """
    if not aggs:
        raise ValueError("aggs is required: {field: aggregate-fn-name}")
    for f, fn in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"unknown aggregate {fn!r} for field {f!r}")
    is_del = F.col(op_col) == "delete"
    coord = F.struct(F.col(ts_col).alias("t"), F.col(seq_col).alias("s"))

    dels = (
        df.filter(is_del)
        .groupBy(key)
        .agg(F.max(coord).alias("_del_coord"))
    )
    live = df.join(dels, on=key, how="left").filter(
        ~is_del & (F.col("_del_coord").isNull() | (coord > F.col("_del_coord")))
    )
    out_aggs = [
        _AGG_FNS[fn](F.col(f), coord).alias(f) for f, fn in aggs.items()
    ]
    folded = live.groupBy(key).agg(*out_aggs)
    # drop keys whose latest event overall is the delete (no survivor rows
    # means the key never reaches `folded` — the filter above already did it)
    return folded


# ---------------------------------------------------------------------------
# stored partial-update: sequence-groups at rest
# ---------------------------------------------------------------------------

_EPOCH = "1970-01-01 00:00:00"


def patch_table_schema(fields: list[tuple[str, str]], key: str = "doc_id"):
    """Schema for a partial-update table: each patchable field gets
    companion sequence columns ``_seq_<f>_ts`` / ``_seq_<f>_lsn`` recording
    the coordinate of the event that last SET it (Paimon sequence-group
    analog). The companions are ORDINARY logical columns — reads, MoR
    resolve, compaction, schema evolution and export handle them with zero
    special cases; only the merge below interprets them."""
    from ..lakehouse.schema import TableSchema

    cols = [(key, "string")] + list(fields)
    for f, _t in fields:
        cols += [(f"_seq_{f}_ts", "timestamp"), (f"_seq_{f}_lsn", "bigint")]
    return TableSchema.create(cols, key=key)


def _patch_fields(schema) -> list[str]:
    return [
        f.name for f in schema.fields
        if f.id not in schema.key_field_ids and not f.name.startswith("_seq_")
    ]


def _g_layout_from_events(events, key, fields, ts_col, seq_col, op_col):
    """Events → the shared resolve layout: key, global (ts, lsn, del), and
    per field (value, companion ts, companion lsn). A delete stamps every
    companion with its own coordinate and nulls the value."""
    is_del = F.col(op_col) == "delete"
    cols = [
        F.col(key),
        F.col(ts_col).alias("_g_ts"),
        F.col(seq_col).alias("_g_lsn"),
        is_del.alias("_g_del"),
    ]
    for f in fields:
        sets_f = is_del | F.col(f).isNotNull()
        cols += [
            F.when(~is_del, F.col(f)).alias(f),
            F.when(sets_f, F.col(ts_col)).alias(f"_seq_{f}_ts"),
            F.when(sets_f, F.col(seq_col)).alias(f"_seq_{f}_lsn"),
        ]
    return events.select(cols)


def _g_layout_from_stored(df, key, fields):
    """Stored rows (base or raw delta versions, system cols on) → the
    shared resolve layout; missing coordinates floor to (EPOCH, -1)."""
    return df.select(
        F.col(key),
        F.coalesce(F.col("_event_ts"), F.lit(_EPOCH).cast("timestamp")).alias("_g_ts"),
        F.coalesce(F.col("_lsn"), F.lit(-1).cast("bigint")).alias("_g_lsn"),
        F.coalesce(F.col("_deleted"), F.lit(False)).alias("_g_del"),
        *[c for f in fields for c in (
            F.col(f), F.col(f"_seq_{f}_ts"), F.col(f"_seq_{f}_lsn"),
        )],
    )


def _patch_resolve(spark, union_df, key, fields, nb):
    """ONE hash aggregation: per field max(struct(companion ts, lsn,
    value)), row visibility from the global struct-max. Returns rows in the
    table layout (+ _bucket), ready for write_data_files."""
    from ..lakehouse.table import bucket_expr

    bucketed = union_df.withColumn("_bucket", bucket_expr(key, nb))
    npart = min(nb, int(spark.conf.get("spark.sql.shuffle.partitions")))
    bucketed = bucketed.repartition(npart, "_bucket")
    aggs = []
    for f in fields:
        contrib = F.when(
            F.col(f"_seq_{f}_ts").isNotNull(),
            F.struct(
                F.col(f"_seq_{f}_ts").alias("t"),
                F.col(f"_seq_{f}_lsn").alias("s"),
                F.col(f).alias("v"),
            ),
        )
        aggs.append(F.max(contrib).alias(f"_w_{f}"))
    aggs.append(
        F.max(F.struct(
            F.col("_g_ts"), F.col("_g_lsn"), F.col("_g_del").alias("d")
        )).alias("_g")
    )
    winners = bucketed.groupBy("_bucket", key).agg(*aggs)
    out_cols = [F.col(key)]
    for f in fields:
        w = F.col(f"_w_{f}")
        out_cols += [
            w.getField("v").alias(f),
            w.getField("t").alias(f"_seq_{f}_ts"),
            w.getField("s").alias(f"_seq_{f}_lsn"),
        ]
    return winners.select(
        *out_cols,
        F.col("_g").getField("_g_ts").alias("_event_ts"),
        F.col("_g").getField("_g_lsn").alias("_lsn"),
        F.col("_g").getField("d").alias("_deleted"),
        F.col("_bucket"),
    )


def apply_patch_batch(
    spark,
    table,
    events: DataFrame,
    batch_id: int,
    ts_col: str = "event_ts",
    seq_col: str = "lsn",
    op_col: str = "op",
    write_mode: str = "cow",
) -> dict:
    """Apply one micro-batch of MERGE-PATCH change events to a LakeTable
    created with ``patch_table_schema`` — incremental partial-update AT
    REST, exact under arbitrary cross-batch reordering.

    Why the companions exist: the bounded ``partial_update_state`` operator
    is exact within one event set, but folding winners into a stored row
    collapses per-field coordinates into one row coordinate — a late event
    older than the row but newer than one field's true setter could then
    not be ordered. Here each stored field keeps its own ``(ts, lsn)``, so
    the batch merge is ONE aggregation over (pruned target ∪ events): per
    field, ``max(struct(seq_ts, seq_lsn, value))`` — the target competes
    with the batch at FIELD granularity, statelessly. Row visibility stays
    the global struct-max (a delete tombstone defends its coordinate, and
    sets every field's companion to the delete coordinate so pre-delete
    stragglers lose per-field too).

    Same 100 TB shape as the main merge (operators/merge.py), mode for
    mode: ``write_mode='cow'`` reads + rewrites affected buckets (one
    union, one hash aggregation with map-side combine, bucket-partitioned
    write); ``write_mode='mor'`` appends the batch's per-field winners as
    DELTA files — no target read, O(batch) ingest — and readers resolve at
    field granularity via ``read_patch`` (``LakeTable.read`` REFUSES a
    row-LWW resolve over a sequence-group table's deltas rather than
    silently merging at the wrong granularity); ``compact_patch`` folds
    deltas back into base files. Ledgered exactly-once commit with
    optimistic retry in both modes.
    """
    from ..lakehouse.table import bucket_expr

    if write_mode not in ("cow", "mor"):
        raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
    if table.is_committed(batch_id):
        return {"batch_id": batch_id, "skipped": True}
    schema = table.schema()
    key = schema.key_name
    fields = _patch_fields(schema)
    expect_version = table.current_version()
    nb = table.n_buckets()
    batch = _g_layout_from_events(events, key, fields, ts_col, seq_col, op_col)

    if write_mode == "mor":
        # fold the batch to one winner-row per key (same aggregation, no
        # target side) and append as deltas: pure append, always retryable
        result = _patch_resolve(spark, batch, key, fields, nb)
        files = table.write_data_files(result, schema_override=schema, delta=True)
        table.commit_with_retry(add_files=files, batch_id=batch_id)
        return {
            "batch_id": batch_id,
            "skipped": False,
            "buckets_rewritten": 0,
            "rows_written": int(sum(f["rows"] for f in files)),
        }

    affected = sorted(
        r[0] for r in batch.select(bucket_expr(key, nb).alias("b")).distinct().collect()
    )
    parts = [batch]
    if affected:
        tgt = table.read(
            spark, buckets=set(affected), with_system_cols=True,
            include_deleted=True,
        )
        parts.append(_g_layout_from_stored(tgt, key, fields))
    unioned = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    result = _patch_resolve(spark, unioned, key, fields, nb)
    files = table.write_data_files(result, schema_override=schema)
    table.commit_with_retry(
        add_files=files,
        remove_buckets=set(affected),
        batch_id=batch_id,
        expect_version=expect_version,
    )
    return {
        "batch_id": batch_id,
        "skipped": False,
        "buckets_rewritten": len(affected),
        "rows_written": int(sum(f["rows"] for f in files)),
    }


def read_patch(spark, table, version: int | None = None,
               include_deleted: bool = False,
               with_seq: bool = False,
               keys: list | None = None) -> DataFrame:
    """Field-granular read of a partial-update table: base rows of delta-
    free buckets pass through untouched (zero shuffle, same as any read);
    delta-containing buckets run the per-field resolve over their RAW row
    versions. Exact for any interleaving because buckets partition the key
    space and every row version carries its own companions.

    ``keys`` makes this the patch-table point-lookup path (plain
    ``LakeTable.read_keys`` refuses delta-containing sequence-group
    buckets): only the keys' buckets are opened, bloom sidecars prune
    files inside them, and the per-field resolve runs over just those
    buckets' row versions. Pruning is exact — a bloom-dropped file
    contributes no row version of any looked-up key, so the fold over the
    remaining versions is unchanged."""
    schema = table.schema()
    key = schema.key_name
    fields = _patch_fields(schema)
    snap = table.snapshot(version)
    all_bkts = {m["bucket"] for m in snap["manifests"]}
    delta_bkts = {f["bucket"] for f in table.files(snap=snap) if f.get("delta")}
    kvals = None
    if keys is not None:
        kvals, kbkts, _, _ = table.typed_key_buckets(spark, keys)
        kvals = kvals or list(keys)
        all_bkts &= kbkts
        delta_bkts &= kbkts
    parts: list[DataFrame] = []
    base_bkts = all_bkts - delta_bkts
    if base_bkts or not delta_bkts:
        parts.append(table.read(
            spark, buckets=base_bkts, version=snap["version"],
            with_system_cols=True, include_deleted=True, keys=kvals,
        ))
    if delta_bkts:
        raw = table.read(
            spark, buckets=delta_bkts, version=snap["version"],
            with_system_cols=True, include_deleted=True, resolve_deltas=False,
            keys=kvals,
        )
        parts.append(_patch_resolve(
            spark, _g_layout_from_stored(raw, key, fields), key, fields,
            table.n_buckets(),
        ).drop("_bucket"))
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    if kvals is not None:
        out = out.filter(F.col(key).isin(kvals))
    if not include_deleted:
        out = out.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    drop = ["_event_ts", "_lsn", "_deleted"] if not include_deleted else []
    if not with_seq:
        drop += [c for f in fields for c in (f"_seq_{f}_ts", f"_seq_{f}_lsn")]
    return out.drop(*drop) if drop else out


def compact_patch(spark, table, minor: bool = False,
                  max_delta_files_per_bucket: int = 1) -> dict:
    """Fold a patch table's delta files back into base files (field-
    granular compaction): only delta-containing buckets are read (raw
    versions) and rewritten; after this, plain ``LakeTable.read`` works
    again (no deltas left to mis-resolve). Metadata-atomic like any commit,
    conflict-checked against the planning snapshot.

    ``minor=True`` folds only buckets with more than
    ``max_delta_files_per_bucket`` delta files, reading ONLY those delta
    files (base untouched) and writing the per-field winners back as ONE
    delta per bucket — O(delta bytes), the field-granular twin of
    ``LakeTable.compact_minor``. Sound because the per-field struct-max is
    associative: the fold over a subset of a key's row versions produces a
    row whose field companions compete identically in any later resolve
    (delete rows already stamp every companion at their own coordinate, so
    a folded delete keeps defending per-field)."""
    snap = table.snapshot()
    files = table.files(snap=snap)
    schema = table.schema()
    key = schema.key_name
    fields = _patch_fields(schema)
    if minor:
        dcount: dict[int, int] = {}
        for f in files:
            if f.get("delta"):
                dcount[f["bucket"]] = dcount.get(f["bucket"], 0) + 1
        todo = {b for b, n in dcount.items() if n > max_delta_files_per_bucket}
        if not todo:
            return {"buckets_compacted": 0,
                    "delta_files_before": sum(dcount.values())}
        raw = table.read(
            spark, buckets=todo, with_system_cols=True, include_deleted=True,
            resolve_deltas=False, version=snap["version"], _delta_only=True,
        )
        result = _patch_resolve(
            spark, _g_layout_from_stored(raw, key, fields), key, fields,
            table.n_buckets(),
        )
        out = table.write_data_files(result, schema_override=schema, delta=True)
        remove = {f["path"] for f in files
                  if f.get("delta") and f["bucket"] in todo}
        table.commit_with_retry(
            add_files=out, remove_paths=remove, expect_version=snap["version"],
        )
        return {
            "buckets_compacted": len(todo),
            "delta_files_before": sum(dcount.values()),
            "delta_files_after": sum(1 for f in table.files() if f.get("delta")),
        }
    todo = {f["bucket"] for f in files if f.get("delta")}
    if not todo:
        return {"buckets_compacted": 0}
    raw = table.read(
        spark, buckets=todo, with_system_cols=True, include_deleted=True,
        resolve_deltas=False, version=snap["version"],
    )
    result = _patch_resolve(
        spark, _g_layout_from_stored(raw, key, fields), key, fields,
        table.n_buckets(),
    )
    out = table.write_data_files(result, schema_override=schema)
    table.commit_with_retry(
        add_files=out, remove_buckets=todo, expect_version=snap["version"],
    )
    return {"buckets_compacted": len(todo)}
