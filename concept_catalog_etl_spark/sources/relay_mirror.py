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

from ..lakehouse.table import LakeTable
from ..operators.envelope import payload_struct
from ..operators.merge import MergeConfig, apply_batch
from ..operators.reconcile import reconcile_snapshot
from .debezium import parse_debezium

MIRROR_WRITER = "relay_mirror"

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


def mirror_relay(
    spark: SparkSession,
    table: LakeTable,
    relay_dir: str,
    *,
    cfg: MergeConfig | None = None,
    writer_id: str = MIRROR_WRITER,
) -> dict:
    """Apply every not-yet-applied relay window to ``table``; returns
    ``{"windows_applied": n, "windows_skipped": k, "version": last_to}``.
    Loop it on a schedule to keep the mirror fresh."""
    schema = table.schema()
    applied = skipped = 0
    last_to = None
    for w in list_windows(relay_dir):
        if table.is_committed(w["to"], writer_id):
            skipped += 1
            last_to = w["to"]
            continue
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
