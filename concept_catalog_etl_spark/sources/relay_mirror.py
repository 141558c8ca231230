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

# \d{6,}: the relay zero-pads to 6 digits, but versions don't stop at
# 999,999 — accept any longer run and ORDER NUMERICALLY below (lexical
# name order breaks exactly when the padding overflows)
_WINDOW_RE = re.compile(
    r"^relay-(?P<to>\d{6,})-(?:(?P<snap>snap)|delta-(?P<frm>\d{6,}))$"
)


def list_windows(relay_dir: str) -> list[dict]:
    """Published windows under ``relay_dir`` in publish order = ascending
    numeric to-version (a snapshot window sorts before a delta with the
    same to-version — the delta builds on it)."""
    out = []
    try:
        names = os.listdir(relay_dir)
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
    out.sort(key=lambda w: (w["to"], w["kind"] != "snap", w["frm"] or 0))
    return out


def _track_schema(spark: SparkSession, table: LakeTable,
                  w: dict) -> TableSchema:
    """Evolve the mirror to the window's upstream schema BEFORE parsing
    (Debezium schema-registry analog: the relay publishes a ``_schema.json``
    sidecar inside each window dir). Upstream columns the mirror lacks are
    added (carrying ``initial_default``); widened types widen. An upstream
    RENAME is applied AS a rename when it can be proven by the upstream
    FIELD ID: the mirror persists the last-seen upstream schema in its own
    properties (``mirror_upstream_schema``), so an id that kept its value
    but changed its name maps to the mirror column that tracked it — values
    survive under the new name. For id-less / first-contact feeds the old
    add-only fallback applies (the old column stays, stale — documented).
    Upstream DROPs are NOT propagated (a mirror silently losing a column is
    worse than keeping a stale one; drop it mirror-side explicitly).
    Evolution applies as an ordinary schema_change envelope batch under a
    dedicated DDL writer ledger (``batch_id = to_version``) — exactly-once,
    and a window replay after a crash re-derives a no-op (the rename
    branch requires old-name-present AND new-name-absent, so recovery
    converges even if the crash landed between the DDL batch and the
    last-seen property commit)."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from ..operators.envelope import SCHEMA_CHANGE_T

    path = _os.path.join(w["path"], "_schema.json")
    try:
        with open(path) as f:
            up_json = _json.load(f)
            up = TableSchema.from_json(up_json)
    except FileNotFoundError:  # pre-sidecar relay windows
        return table.schema()
    schema = table.schema()
    have = {fld.name: fld for fld in schema.fields}
    last = table.properties().get("mirror_upstream_schema")
    last_by_id = (
        {int(f["id"]): f for f in last.get("fields", [])} if last else {}
    )
    changes = []  # (kind, column, new_name, new_type, new_default)
    for fld in up.fields:
        mine = have.get(fld.name)
        if mine is None:
            prev = last_by_id.get(fld.id)
            if (prev is not None and prev["name"] != fld.name
                    and prev["name"] in have and fld.name not in have):
                # same upstream id, new name, and the mirror still tracks
                # the old name → a provable rename: keep the values
                changes.append(("rename", prev["name"], fld.name, None, None))
                mine = have[prev["name"]]
            else:
                changes.append(("add", fld.name, None, fld.type,
                                _json.dumps(fld.initial_default)
                                if fld.initial_default is not None else None))
                continue
        if mine.type != fld.type:
            if can_widen(mine.type, fld.type):
                # widen addresses the POST-rename name (changes apply in
                # lsn order, rename first)
                changes.append(("widen", fld.name, None, fld.type, None))
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

    def _remember_upstream() -> None:
        if last != up_json:
            table.commit(extra_props={"mirror_upstream_schema": up_json})

    if not changes:
        _remember_upstream()
        return schema
    if table.is_committed(w["to"], MIRROR_DDL_WRITER):
        _remember_upstream()
        return table.schema()
    rows = [
        (kind, col, new_name, typ, dflt, i)
        for i, (kind, col, new_name, typ, dflt) in enumerate(changes)
    ]
    env = spark.createDataFrame(
        rows, "kind string, column string, new_name string, "
              "new_type string, new_default string, i int"
    ).select(
        F.lit("schema_change").alias("op"),
        *[F.lit(None).cast(parse_type(fld.type)).alias(fld.name)
          for fld in (schema.field_by_id(i) for i in schema.key_field_ids)],
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("event_ts"),
        F.col("i").cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        F.lit(None).cast(payload_struct(schema)).alias("payload"),
        F.struct(
            F.col("kind"), F.col("column"), F.col("new_name"),
            F.col("new_type"), F.col("new_default"),
        ).cast(SCHEMA_CHANGE_T).alias("schema_change"),
    )
    apply_batch(spark, table, env, w["to"],
                MergeConfig.for_table(table, write_mode="mor",
                                      writer_id=MIRROR_DDL_WRITER))
    _remember_upstream()
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
            # A snapshot window is a FULL-state assertion: reconcile deletes
            # any live key absent from it, so a dropped (unparseable or
            # foreign-op) line would silently DELETE that key from the
            # mirror. Delta windows can DLQ bad lines; a snapshot must be
            # perfect or rejected — count the would-be-dropped lines and
            # abort the window loudly (one cheap aggregation over a rare
            # window kind).
            n_bad = parsed.filter(
                (F.col("op") != "insert") | F.col("_raw").isNotNull()
            ).count()
            if n_bad:
                raise ValueError(
                    f"snapshot window {w['name']} contains {n_bad} "
                    "unparseable or non-insert line(s); refusing the lossy "
                    "reconcile — repair or republish the window"
                )
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
