"""Training-corpus handoff: consistent snapshot + incremental delta export.

The table's consumers (training jobs, feature pipelines) should not need
the engine to READ the data. ``export_snapshot`` hands off one consistent
version as plain parquet shards + a JSON manifest; ``export_delta`` ships
only what changed since the last export (rides ``read_changes`` — the
candidate-key-pruned change feed, so a small sync window against a huge
table costs O(window), not O(table)); ``read_export`` reconstructs the
latest state from the chain with one LWW fold — the same max-per-key
shape the engine's own MoR resolve uses.

Layout under ``dest/`` (a directory the engine never reads back for its
own operation):

* ``snapshot-v<N>/``  — parquet shards + ``_manifest.json``
* ``delta-v<A>-v<B>/`` — change rows (``_change_type`` ∈ insert/update/
  delete, new-state payload, NULL payload for deletes) + manifest
* ``LATEST``          — JSON pointer {version, chain} — swapped
  atomically (write-temp-then-``os.replace``), LAST, so a crashed export
  never publishes a half-written directory: re-running re-exports the
  same window into the same deterministic directory name and re-swaps.

Export directories are immutable once LATEST points past them — the same
write-once discipline as the table's own data files.

Scale shape: a snapshot export is ONE pruned table scan with
``maxRecordsPerFile`` bounding shard size (no extra shuffle beyond the
read's own resolve); a delta export is the change feed's key-pruned
point-scan join. Reconstruction is one union + one max-per-key hash
aggregation, map-side combinable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse.table import LakeTable

LATEST = "LATEST"


def _read_latest(dest: str) -> dict | None:
    p = os.path.join(dest, LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _atomic_json(path: str, payload: dict) -> None:
    """Publish a JSON file by write-temp-then-replace (no torn reads)."""
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _swap_latest(dest: str, payload: dict) -> None:
    _atomic_json(os.path.join(dest, LATEST), payload)


def _write_dir(df: DataFrame, final_dir: str, manifest: dict,
               shard_rows: int | None) -> dict:
    """Write shards + manifest into a temp dir, then publish by rename.
    An already-published final dir is complete by construction (the rename
    only ever moves a fully-written tree) — re-export skips the write."""
    if os.path.exists(final_dir):
        with open(os.path.join(final_dir, "_manifest.json")) as f:
            return json.load(f)
    tmp = final_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if shard_rows:
        w = w.option("maxRecordsPerFile", str(shard_rows))
    w.parquet(tmp)
    manifest = dict(manifest)
    # count from the written files (no second scan of the table)
    manifest["rows"] = df.sparkSession.read.parquet(tmp).count()
    with open(os.path.join(tmp, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, final_dir)
    return manifest


def export_snapshot(
    spark: SparkSession,
    table: LakeTable,
    dest: str,
    version: int | None = None,
    shard_rows: int | None = None,
) -> dict:
    """Hand off one consistent table version as plain parquet shards."""
    version = table.current_version() if version is None else version
    os.makedirs(dest, exist_ok=True)
    df = table.read(spark, version=version)
    # the exported version's OWN schema (current names can differ)
    from ..lakehouse.schema import TableSchema

    schema = TableSchema.from_json(table.snapshot(version)["schema"])
    cols = [(f.name, f.type, f.id) for f in schema.fields]
    man = _write_dir(
        df,
        os.path.join(dest, f"snapshot-v{version}"),
        {
            "kind": "snapshot",
            "version": version,
            "columns": cols,
            "key": schema.key_name,
            "created_unix": int(time.time()),
        },
        shard_rows,
    )
    _swap_latest(dest, {"version": version,
                        "chain": [f"snapshot-v{version}"]})
    return man


def export_delta(
    spark: SparkSession,
    table: LakeTable,
    dest: str,
    to_version: int | None = None,
    shard_rows: int | None = None,
) -> dict:
    """Ship the changes since the last export (snapshot or delta).

    Returns the new manifest, or ``{"skipped": True}`` when the table has
    not moved. The from-version comes from ``LATEST`` — consumers never
    tell the exporter where they are; the chain itself is the contract."""
    latest = _read_latest(dest)
    if latest is None:
        raise ValueError("export_delta needs an initial export_snapshot")
    from_v = int(latest["version"])
    to_v = table.current_version() if to_version is None else to_version
    if to_v <= from_v:
        return {"skipped": True, "version": from_v}
    name = f"delta-v{from_v}-v{to_v}"
    final_dir = os.path.join(dest, name)
    if os.path.exists(final_dir):
        # crash-recovery re-publish: the window was already written (the
        # rename only moves complete trees) — skip the change-feed scan and
        # just re-swap the pointer
        with open(os.path.join(final_dir, "_manifest.json")) as f:
            man = json.load(f)
        _swap_latest(dest, {"version": to_v, "chain": latest["chain"] + [name]})
        return man
    changes = table.read_changes(spark, from_v, to_v)
    from ..lakehouse.schema import TableSchema

    schema = TableSchema.from_json(table.snapshot(to_v)["schema"])
    cols = [(f.name, f.type, f.id) for f in schema.fields]
    man = _write_dir(
        changes,
        os.path.join(dest, name),
        {
            "kind": "delta",
            "version_from": from_v,
            "version": to_v,
            "columns": cols,
            "key": schema.key_name,
            "created_unix": int(time.time()),
        },
        shard_rows,
    )
    _swap_latest(dest, {"version": to_v,
                        "chain": latest["chain"] + [name]})
    return man


def read_export(spark: SparkSession, dest: str) -> DataFrame:
    """Reconstruct the latest exported state from the snapshot + delta
    chain: one union, one max-per-key LWW fold on the chain position,
    deletes dropped. Schema evolution across the chain is reconciled by
    FIELD ID (each directory's manifest records ``(name, type, id)``):
    an older shard's column renamed since export is still matched to the
    newest name, widened types cast up, and columns added later null-fill
    — the same id-based reconciliation the engine's own ``read`` does."""
    latest = _read_latest(dest)
    if latest is None:
        raise ValueError(f"no LATEST pointer under {dest}")
    chain = latest["chain"]

    def _manifest(name: str) -> dict:
        with open(os.path.join(dest, name, "_manifest.json")) as f:
            return json.load(f)

    newest = _manifest(chain[-1])
    cols = [tuple(c) for c in newest["columns"]]  # (name, type, id)
    key = newest["key"]
    parts = []
    for seq, name in enumerate(chain):
        m = _manifest(name)
        by_id = {int(c[2]): c[0] for c in m["columns"]}
        df = spark.read.parquet(os.path.join(dest, name))
        sel = []
        for cname, ctype, cid in cols:
            old = by_id.get(int(cid))
            if old is not None and old in df.columns:
                sel.append(F.col(old).cast(ctype).alias(cname))
            else:
                sel.append(F.lit(None).cast(ctype).alias(cname))
        ct = (F.col("_change_type") if "_change_type" in df.columns
              else F.lit("insert"))
        parts.append(df.select(*sel, ct.alias("_ct"),
                               F.lit(seq).alias("_seq")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    payload = [c for c, _t, _i in cols if c != key]
    winner = u.groupBy(key).agg(
        F.max_by(F.struct("_ct", *payload), F.col("_seq")).alias("_w")
    )
    return (
        winner.filter(F.col("_w._ct") != "delete")
        .select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def sync_export(
    spark: SparkSession,
    table: LakeTable,
    dest: str,
    shard_rows: int | None = None,
    max_chain: int | None = None,
    gc_grace_sec: float | None = 86_400.0,
) -> dict:
    """Self-healing sync: the one call a scheduler loops on.

    * no chain yet → initial ``export_snapshot``;
    * normally → ``export_delta`` (O(window));
    * the chain lagged past the table's vacuum retention (the delta
      window's from-version is gone) → recover with a FRESH snapshot —
      the same lag-recovery contract as ``rebuild_rowview``;
    * ``max_chain`` bounds reconstruction cost for consumers: once the
      chain holds that many directories, re-snapshot (which resets the
      chain to one entry) instead of appending another delta.
    """
    from ..lakehouse.table import VersionVacuumedError

    latest = _read_latest(dest)
    try:
        if latest is None:
            return export_snapshot(spark, table, dest, shard_rows=shard_rows)
        if max_chain is not None and len(latest["chain"]) >= max_chain:
            return export_snapshot(spark, table, dest, shard_rows=shard_rows)
        try:
            return export_delta(spark, table, dest, shard_rows=shard_rows)
        except VersionVacuumedError:
            return export_snapshot(spark, table, dest, shard_rows=shard_rows)
    finally:
        # superseded dirs (post-re-snapshot) and crashed .tmp trees decay
        # after the grace window; None disables GC entirely
        if gc_grace_sec is not None:
            gc_export(dest, grace_sec=gc_grace_sec)


def gc_export(dest: str, grace_sec: float = 86_400.0) -> list[str]:
    """Two-phase GC for the export destination: superseded snapshot/delta
    dirs (after a re-snapshot reset the chain) and crashed ``.tmp-*``
    trees. Export dirs are immutable, so mtime records CREATION, not when
    a dir fell out of the chain — the grace window therefore runs from a
    TOMBSTONE written the first time GC sees a dir unreferenced
    (``_gc_state.json``). A consumer that resolved the previous pointer
    just before the swap has a full ``grace_sec`` (default one day) to
    finish reading; an in-flight ``.tmp-`` write likewise cannot be
    reaped until a grace window passes with it still unpublished.
    Returns the removed directory names."""
    if not os.path.isdir(dest):
        return []
    latest = _read_latest(dest)
    live = set(latest["chain"]) if latest else set()
    state_path = os.path.join(dest, "_gc_state.json")
    tombs: dict[str, float] = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            tombs = json.load(f)
    now = time.time()
    removed = []
    seen = set()
    for name in sorted(os.listdir(dest)):
        p = os.path.join(dest, name)
        if name in live or not os.path.isdir(p):
            continue
        if not (name.startswith("snapshot-") or name.startswith("delta-")):
            continue
        seen.add(name)
        t = tombs.setdefault(name, now)  # phase 1: record unreference time
        if now - t >= grace_sec:         # phase 2: past grace -> reap
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    # sweep crashed atomic-publish temp files once they are stale (an
    # in-flight writer's temp lives for milliseconds; an hour is safe)
    for name in os.listdir(dest):
        if name.endswith(".tmp") and not os.path.isdir(os.path.join(dest, name)):
            p = os.path.join(dest, name)
            try:
                if now - os.path.getmtime(p) >= 3600:
                    os.remove(p)
            except OSError:
                pass
    # drop stale tombstones (dir reaped, or republished back into the chain)
    tombs = {n: t for n, t in tombs.items() if n in seen and n not in removed}
    _atomic_json(state_path, tombs)
    return removed
