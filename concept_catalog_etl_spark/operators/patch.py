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

    def field_winner(f: str) -> Column:
        # delete contributes (t, s, NULL) for every field; a data event
        # contributes only for the fields it sets. max() skips the NULL
        # structs of non-setting events entirely.
        contrib = F.when(
            is_del | F.col(f).isNotNull(),
            F.struct(*coord, F.when(~is_del, F.col(f)).alias("v")),
        )
        return F.max(contrib).getField("v").alias(f)

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
    # first/last setter by event coordinate — null fields never contribute
    "first_non_null": lambda f, coord: F.min(
        F.when(f.isNotNull(), F.struct(coord.alias("c"), f.alias("v")))
    ).getField("v"),
    "last_non_null": lambda f, coord: F.max(
        F.when(f.isNotNull(), F.struct(coord.alias("c"), f.alias("v")))
    ).getField("v"),
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
