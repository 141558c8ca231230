"""Relay mirror: the library-side CONSUMER of ``relay_debezium`` window
directories — maintain a downstream LakeTable replica of an upstream
table from its published Debezium JSON-lines windows.

Closes the loop the relay's consumer contract describes
(``sources/debezium.py``): windows are applied in name order (names lead
with the monotone to-version, so name order == publish order); delta
windows drive the ordinary merge kernel; snapshot windows — initial
load or lag recovery — are applied via SNAPSHOT RECONCILIATION
(``operators/reconcile.py``) instead of truncate-and-reload: upserts for
drifted rows, bump-tombstones for keys deleted upstream inside the lag
gap. The mirror therefore converges with O(drift) writes and never shows
readers an empty table mid-rebuild.

Exactly-once: every window commits under ``batch_id = to_version`` in a
dedicated writer ledger, so re-running the mirror (cron loop, crash
replay) skips applied windows; a crash mid-window re-applies just that
window idempotently (LWW).

Empty delta windows publish no directory (the relay advances its pointer
only), so a delta window whose from-version is AHEAD of the last applied
version is normal — the missing windows carried zero events. Windows are
deterministic in (from, to) and the to-version is strictly monotone, so
re-publication after a relay crash lands on the identical name.

At scale: each delta window costs O(window events) under MoR; a recovery
snapshot costs one diff join (snapshot vs mirror, key-partitioned) plus
O(drift) merge — the mirror never pays O(table) for being behind.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession, functions as F

from ..lakehouse.schema import TableSchema, can_widen, parse_type
from ..lakehouse.table import LakeTable
from ..operators.envelope import payload_struct
from ..operators.merge import MergeConfig, apply_batch
from ..operators.reconcile import reconcile_snapshot
from .debezium import parse_debezium

MIRROR_WRITER = "relay_mirror"
MIRROR_DDL_WRITER = "relay_mirror_ddl"

_WINDOW_RE = re.compile(
    r"^relay-(?P<to>\d{6})-(?:(?P<snap>snap)|delta-(?P<frm>\d{6}))$"
)


def list_windows(relay_dir: str) -> list[dict]:
    """Published windows under ``relay_dir`` in publish (= name) order."""
    out = []
    try:
        names = sorted(os.listdir(relay_dir))
    except FileNotFoundError:
        return []
    for n in names:
        m = _WINDOW_RE.match(n)
        if not m:
            continue  # state file, tmp dirs
        out.append({
            "name": n,
            "path": os.path.join(relay_dir, n),
            "to": int(m.group("to")),
            "kind": "snap" if m.group("snap") else "delta",
            "frm": int(m.group("frm")) if m.group("frm") else None,
        })
    return out


def _track_schema(spark: SparkSession, table: LakeTable,
                  w: dict) -> TableSchema:
    """Evolve the mirror to the window's upstream schema BEFORE parsing
    (Debezium schema-registry analog: the relay publishes a ``_schema.json``
    sidecar inside each window dir). Matching is BY NAME across tables
    (field ids are per-table): upstream columns the mirror lacks are added
    (carrying ``initial_default``), widened types widen. An upstream RENAME
    therefore appears as an add (the old column stays, stale — documented);
    upstream DROPs are NOT propagated (a mirror silently losing a column is
    worse than keeping a stale one; drop it mirror-side explicitly).
    Evolution applies as an ordinary schema_change envelope batch under a
    dedicated DDL writer ledger (``batch_id = to_version``) — exactly-once,
    and a window replay after a crash re-derives a no-op."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from ..operators.envelope import SCHEMA_CHANGE_T

    path = _os.path.join(w["path"], "_schema.json")
    try:
        with open(path) as f:
            up = TableSchema.from_json(_json.load(f))
    except FileNotFoundError:  # pre-sidecar relay windows
        return table.schema()
    schema = table.schema()
    have = {fld.name: fld for fld in schema.fields}
    changes = []
    for fld in up.fields:
        mine = have.get(fld.name)
        if mine is None:
            changes.append(("add", fld.name, fld.type,
                            _json.dumps(fld.initial_default)
                            if fld.initial_default is not None else None))
        elif mine.type != fld.type:
            if can_widen(mine.type, fld.type):
                changes.append(("widen", fld.name, fld.type, None))
            elif not can_widen(fld.type, mine.type):
                # neither direction widens: structurally divergent types.
                # Parsing upstream payloads under the mirror's type would
                # silently null every value — stop loudly instead.
                raise ValueError(
                    f"mirror column {fld.name!r} is {mine.type!r} but "
                    f"upstream is {fld.type!r} (window {w['name']}) — "
                    "divergent types cannot be tracked; fix the mirror "
                    "schema explicitly"
                )
            # else: mirror is already WIDER than upstream (e.g. the mirror
            # widened ahead) — upstream values parse fine under it
    if not changes:
        return schema
    if table.is_committed(w["to"], MIRROR_DDL_WRITER):
        return table.schema()
    rows = [
        (kind, col, typ, dflt, i) for i, (kind, col, typ, dflt) in
        enumerate(changes)
    ]
    env = spark.createDataFrame(
        rows, "kind string, column string, new_type string, "
              "new_default string, i int"
    ).select(
        F.lit("schema_change").alias("op"),
        *[F.lit(None).cast(parse_type(fld.type)).alias(fld.name)
          for fld in (schema.field_by_id(i) for i in schema.key_field_ids)],
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("event_ts"),
        F.col("i").cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        F.lit(None).cast(payload_struct(schema)).alias("payload"),
        F.struct(
            F.col("kind"), F.col("column"),
            F.lit(None).cast("string").alias("new_name"),
            F.col("new_type"), F.col("new_default"),
        ).cast(SCHEMA_CHANGE_T).alias("schema_change"),
    )
    apply_batch(spark, table, env, w["to"],
                MergeConfig.for_table(table, write_mode="mor",
                                      writer_id=MIRROR_DDL_WRITER))
    return table.schema()


def mirror_relay(
    spark: SparkSession,
    table: LakeTable,
    relay_dir: str,
    *,
    cfg: MergeConfig | None = None,
    writer_id: str = MIRROR_WRITER,
    track_schema: bool = True,
) -> dict:
    """Apply every not-yet-applied relay window to ``table``; returns
    ``{"windows_applied": n, "windows_skipped": k, "version": last_to}``.
    Loop it on a schedule to keep the mirror fresh. ``track_schema``
    follows the upstream schema via each window's ``_schema.json`` sidecar
    (see ``_track_schema``)."""
    applied = skipped = 0
    last_to = None
    for w in list_windows(relay_dir):
        if table.is_committed(w["to"], writer_id):
            skipped += 1
            last_to = w["to"]
            continue
        schema = (_track_schema(spark, table, w)
                  if track_schema else table.schema())
        raw = spark.read.text(w["path"])
        parsed = parse_debezium(raw, schema,
                                schema_version=schema.schema_version)
        wcfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                            writer_id=writer_id)
        if w["kind"] == "snap":
            pay = payload_struct(schema)
            snapshot = parsed.filter(
                (F.col("op") == "insert") & F.col("_raw").isNull()
            ).select(
                *schema.key_names,
                *[F.col(f"payload.{f.name}").alias(f.name) for f in pay.fields],
                "event_ts", "lsn",
            )
            reconcile_snapshot(spark, table, snapshot, batch_id=w["to"],
                               cfg=wcfg)
        else:
            apply_batch(spark, table, parsed, w["to"], wcfg)
        applied += 1
        last_to = w["to"]
    return {"windows_applied": applied, "windows_skipped": skipped,
            "version": last_to}


__all__ = ["mirror_relay", "list_windows", "MIRROR_WRITER"]
