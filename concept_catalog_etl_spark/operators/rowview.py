"""Row-keyed incremental materialized views over the change-data-feed.

``operators/incremental.py`` maintains AGGREGATE views (signed sum/count
deltas per group). This module maintains the other class every training-data
pipeline needs: a PER-ROW derived table — same key as the upstream, payload
= a deterministic transform of each upstream row (a signature, a
fingerprint, a normalized projection). The motivating instance is the
near-dup MinHash index (``operators/neardup_index.py``): at 10^10 documents
you cannot re-sign the corpus because 0.01% of it changed — you re-sign the
changed rows only and let the index table converge.

Mechanics, per sync window:

- ONE change-feed read (`read_changes` diffs snapshots, so it is already
  window-final: a key appears once no matter how many events hit it inside
  the window — no within-window LWW pass needed here).
- ``transform`` runs over insert/update post-images ONLY: O(changed rows)
  compute, never O(table).
- Deletes become tombstone rows (NULL payload, ``_deleted``).
- Everything lands as ONE merge-on-read delta commit: the sync path never
  reads the downstream table at all — O(batch) write amplification, zero
  read amplification. The existing compaction / tombstone-expiry machinery
  folds deltas into sorted+bloom'd bases on its own maintenance cadence.

Determinism & exactly-once: derived rows get LWW coordinates
``(timestamp_seconds(to_version), to_version)`` — monotone per key because
sync windows advance strictly, and wall-clock-free so replays are
byte-identical. The delta commit carries ``batch_id = to_version`` under the
view's writer ledger and the synced-through watermark
(``rowview_upstream_version``) in the SAME atomic commit, mirroring the
aggregate-IVM contract: a crash can only re-run a window, which the ledger
then skips.

Reference analog: the reference's load step derives per-record fields before
its keyed upsert (/root/reference/files/load.py:20-22, files/transform.py);
this is that derivation kept live against a changing table instead of run
once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lakehouse.schema import parse_type
from ..lakehouse.table import LakeTable


def sync_rowview(
    spark: SparkSession,
    upstream: LakeTable,
    downstream: LakeTable,
    transform: Callable[[DataFrame], DataFrame],
    writer_id: str = "rowview",
) -> dict:
    """Advance ``downstream`` (a per-row derived view keyed like the
    upstream) to reflect ``upstream``'s current version.

    ``transform`` maps a DataFrame of upstream payload rows (key + logical
    columns, changed rows only) to derived rows carrying the key plus every
    downstream payload column; it must be deterministic and row-local
    (one output row per input key) for the view semantics to hold.

    A view that lags past the upstream's vacuum retention cannot read its
    change window any more — the sync raises ``VersionVacuumedError``
    loudly (silently skipping would diverge forever); the recovery path is
    ``rebuild_rowview``, which re-derives the whole view from the live
    snapshot and resets the watermark.
    """
    to_v = upstream.current_version()
    from_v = int(downstream.properties().get("rowview_upstream_version", 0))
    if to_v == from_v or downstream.is_committed(to_v, writer_id):
        return {"applied": False, "from_version": from_v, "to_version": to_v}

    key = downstream.schema().key_name
    out_fields = [f for f in downstream.schema().fields if f.name != key]
    changes = upstream.read_changes(spark, from_version=from_v, to_version=to_v)

    post = changes.where(F.col("_change_type").isin("insert", "update")).drop(
        "_change_type", "_event_ts", "_lsn"
    )
    derived = transform(post)
    missing = {key, *[f.name for f in out_fields]} - set(derived.columns)
    if missing:
        raise ValueError(f"transform output lacks columns: {sorted(missing)}")
    ups = derived.select(
        F.col(key),
        *[F.col(f.name).cast(parse_type(f.type)).alias(f.name) for f in out_fields],
    ).withColumn("_deleted", F.lit(False))
    dels = changes.where(F.col("_change_type") == "delete").select(
        F.col(key),
        *[F.lit(None).cast(parse_type(f.type)).alias(f.name) for f in out_fields],
    ).withColumn("_deleted", F.lit(True))

    rows = (
        ups.unionByName(dels)
        .withColumn("_event_ts", F.timestamp_seconds(F.lit(to_v)))
        .withColumn("_lsn", F.lit(to_v).cast("long"))
    )
    expect = downstream.current_version()
    files = downstream.write_data_files(rows, delta=True)
    downstream.commit_with_retry(
        add_files=files,
        batch_id=to_v,
        writer_id=writer_id,
        expect_version=expect,
        extra_props={"rowview_upstream_version": to_v},
    )
    n_rows = sum(f["rows"] for f in files)
    return {
        "applied": True,
        "from_version": from_v,
        "to_version": to_v,
        "rows_written": n_rows,
    }


def rebuild_rowview(
    spark: SparkSession,
    upstream: LakeTable,
    downstream: LakeTable,
    transform: Callable[[DataFrame], DataFrame],
    writer_id: str = "rowview",
) -> dict:
    """Full re-derivation — the recovery path when the incremental window
    is gone (the view lagged past the upstream's vacuum retention) or the
    transform itself changed. One O(table) pass over the LIVE upstream
    snapshot: derived rows land as a fresh COPY-ON-WRITE of every bucket
    (``remove_buckets`` = all), which atomically supersedes whatever
    partial state the view held — stale rows, tombstones, all of it.
    The watermark resets to the rebuilt version in the same commit, so the
    next ``sync_rowview`` resumes incrementally from there."""
    to_v = upstream.current_version()
    key = downstream.schema().key_name
    out_fields = [f for f in downstream.schema().fields if f.name != key]
    live = upstream.read(spark)
    derived = transform(live)
    missing = {key, *[f.name for f in out_fields]} - set(derived.columns)
    if missing:
        raise ValueError(f"transform output lacks columns: {sorted(missing)}")
    rows = (
        derived.select(
            F.col(key),
            *[F.col(f.name).cast(parse_type(f.type)).alias(f.name) for f in out_fields],
        )
        .withColumn("_deleted", F.lit(False))
        .withColumn("_event_ts", F.timestamp_seconds(F.lit(to_v)))
        .withColumn("_lsn", F.lit(to_v).cast("long"))
    )
    expect = downstream.current_version()
    files = downstream.write_data_files(rows, sort_within=True)
    downstream.commit_with_retry(
        add_files=files,
        remove_buckets=set(range(downstream.n_buckets())),
        batch_id=to_v,
        writer_id=writer_id,
        expect_version=expect,
        extra_props={"rowview_upstream_version": to_v},
    )
    return {
        "applied": True,
        "rebuilt": True,
        "to_version": to_v,
        "rows_written": sum(f["rows"] for f in files),
    }
