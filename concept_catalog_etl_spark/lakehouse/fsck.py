"""Table consistency checker (fsck): audit every structural invariant the
engine relies on, WITHOUT mutating anything — the operational trust tool a
lake format needs next to vacuum (which deletes) and scan_report (which
explains one read).

Levels:

- ``meta`` (default): O(metadata) — snapshot chain, manifests, file
  existence, ledger shape, stages, branches, tags, orphan census. No data
  file is opened.
- ``deep``: additionally open every CURRENT-snapshot parquet footer and
  cross-check row counts, physical column sets, and the manifest's key
  range against the footer statistics — catches silent data-file
  truncation/replacement that metadata-only checks cannot.

Returns a report dict::

    {"ok": bool,
     "findings": [{"level": "error"|"warn"|"info", "code": str,
                   "detail": str}, ...],
     "checked": {...counters...}}

``ok`` is False iff any ERROR-level finding exists. Orphan data files are
INFO (vacuum's job, not corruption); a tag pointing outside the retained
range is WARN (read_tag will fail but the table is sound).

Design notes: fsck is Spark-free (pure filesystem + pyarrow footers) so it
can run from any maintenance container; it never repairs — the repair
actions are the existing primitives (rollback to the last sound version,
vacuum for orphans, drop_tag/abort_stage/drop_branch for dangling refs).
Deliberately NOT checked: per-row bucket assignment (the write-time
xxhash64 bucketing lives JVM-side; re-deriving it here would duplicate the
hash implementation — the layout_nb commit gate already closes the
mis-bucket window at commit time).

The reference has no storage format of its own to check (state lives in
MongoDB, files/load.py); fsck covers the invariants our from-scratch format
introduced: pointer-swap commits, two-level manifests, ledger rings,
stages, branches, tags.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from .schema import TableSchema
from .table import LakeTable


def _f(findings, level, code, detail):
    findings.append({"level": level, "code": code, "detail": detail})


def check_table(table: LakeTable, deep: bool = False,
                orphan_grace_sec: float = 3600.0) -> dict:
    findings: list[dict] = []
    checked = {"snapshots": 0, "manifests": 0, "file_entries": 0,
               "data_files_deep": 0, "stages": 0, "branches": 0, "tags": 0,
               "orphans": 0}

    # ---- pointer + snapshot chain ------------------------------------------
    try:
        cur = table.current_version()
    except (OSError, ValueError) as e:
        _f(findings, "error", "pointer_unreadable", f"_current: {e}")
        return {"ok": False, "findings": findings, "checked": checked}
    oldest = table.oldest_retained_version()
    snaps: dict[int, dict] = {}
    for v in range(oldest, cur + 1):
        path = os.path.join(table.meta_dir, f"v{v}.json")
        try:
            with open(path) as fh:
                snap = json.load(fh)
        except FileNotFoundError:
            _f(findings, "error", "snapshot_missing",
               f"v{v}.json absent inside the retained range [{oldest}, {cur}]")
            continue
        except (OSError, ValueError) as e:
            _f(findings, "error", "snapshot_unparseable", f"v{v}.json: {e}")
            continue
        snaps[v] = snap
        checked["snapshots"] += 1
        if snap.get("version") != v:
            _f(findings, "error", "snapshot_version_mismatch",
               f"v{v}.json says version={snap.get('version')}")
        if v > oldest and snap.get("parent") != v - 1:
            _f(findings, "error", "snapshot_parent_broken",
               f"v{v}.json parent={snap.get('parent')}, expected {v - 1}")
        try:
            sch = TableSchema.from_json(snap["schema"])
            for kid in sch.key_field_ids:
                sch.field_by_id(kid)
        except Exception as e:  # noqa: BLE001 — any schema defect is the finding
            _f(findings, "error", "schema_invalid", f"v{v}: {e}")
        if int(snap.get("n_buckets", 0)) <= 0:
            _f(findings, "error", "n_buckets_invalid",
               f"v{v}: n_buckets={snap.get('n_buckets')}")
    if cur not in snaps:
        return {"ok": False, "findings": findings, "checked": checked}

    # ---- manifests + file entries (all retained snapshots) ----------------
    live_paths: set[str] = set()
    live_manifests: set[str] = set()
    entry_by_path: dict[str, dict] = {}
    for v, snap in sorted(snaps.items()):
        nb = int(snap.get("n_buckets", 0))
        seen_in_snap: set[str] = set()
        for m in snap.get("manifests", []):
            rel = m["path"]
            live_manifests.add(rel)
            mpath = os.path.join(table.root, rel)
            try:
                with open(mpath) as fh:
                    mdoc = json.load(fh)
            except FileNotFoundError:
                _f(findings, "error", "manifest_missing", f"v{v}: {rel}")
                continue
            except (OSError, ValueError) as e:
                _f(findings, "error", "manifest_unparseable", f"v{v}: {rel}: {e}")
                continue
            checked["manifests"] += 1
            if mdoc.get("bucket") != m.get("bucket"):
                _f(findings, "error", "manifest_bucket_mismatch",
                   f"v{v}: {rel} says bucket={mdoc.get('bucket')}, "
                   f"snapshot says {m.get('bucket')}")
            for entry in mdoc.get("files", []):
                checked["file_entries"] += 1
                p = entry["path"]
                if p in seen_in_snap:
                    _f(findings, "error", "duplicate_file_reference",
                       f"v{v}: {p} referenced twice in one snapshot")
                seen_in_snap.add(p)
                live_paths.add(p)
                entry_by_path.setdefault(p, entry)
                if not 0 <= int(entry.get("bucket", -1)) < nb:
                    _f(findings, "error", "entry_bucket_out_of_range",
                       f"v{v}: {p} bucket={entry.get('bucket')} nb={nb}")
                if snap.get("partition_spec") or snap.get("partition_specs"):
                    # partition pruning trusts entry["part"] — it must exist
                    # and agree with the file's _part= path segment
                    # (spec-agnostic: whatever spec wrote the file, the part
                    # value it pruned under is the one in its path)
                    want = next(
                        (unquote(seg.split("=", 1)[1])
                         for seg in p.split(os.sep) if seg.startswith("_part=")),
                        None,
                    )
                    if entry.get("part") != want:
                        _f(findings, "error", "entry_part_path_mismatch",
                           f"v{v}: {p} part={entry.get('part')!r}, "
                           f"path says {want!r}")
                    specs = snap.get("partition_specs")
                    if specs is not None:
                        known = {int(s["spec_id"]) for s in specs}
                        if int(entry.get("spec_id", 0)) not in known:
                            _f(findings, "error", "entry_spec_id_unknown",
                               f"v{v}: {p} spec_id={entry.get('spec_id')} "
                               f"not in {sorted(known)}")
                if not os.path.exists(os.path.join(table.root, p)):
                    _f(findings, "error", "data_file_missing", f"v{v}: {p}")
                if entry.get("bloom") and not os.path.exists(
                        os.path.join(table.root, p + ".bloom")):
                    _f(findings, "warn", "bloom_sidecar_missing", p)

    # ---- ledger shape -------------------------------------------------------
    props = snaps[cur].get("properties", {})

    def _check_ring(name: str, led: dict):
        ring = led.get("ring", led.get("committed_batch_ids", []))
        if ring != sorted(set(ring)):
            _f(findings, "error", "ledger_ring_unsorted", f"{name}: {ring[:8]}…")
        mx = led.get("max", led.get("max_batch_id"))
        if ring and mx is not None and mx < max(ring):
            _f(findings, "error", "ledger_max_below_ring",
               f"{name}: max={mx} < max(ring)={max(ring)}")

    _check_ring("_flat", {"committed_batch_ids": props.get("committed_batch_ids", []),
                          "max_batch_id": props.get("max_batch_id")})
    for wid, led in props.get("writer_ledgers", {}).items():
        _check_ring(wid, led)

    # ---- stages / branches / tags ------------------------------------------
    for st in table.stages():
        checked["stages"] += 1
        try:
            rec = table._load_stage(st["stage_id"])
        except KeyError:
            continue  # settled mid-walk
        for m in rec.get("audit_snapshot", {}).get("manifests", []):
            live_manifests.add(m["path"])
            mp = os.path.join(table.root, m["path"])
            if not os.path.exists(mp):
                _f(findings, "error", "stage_manifest_missing",
                   f"stage {st['stage_id']}: {m['path']}")
            else:
                try:
                    with open(mp) as fh:
                        for entry in json.load(fh).get("files", []):
                            live_paths.add(entry["path"])
                except (OSError, ValueError):
                    pass  # already reported if shared; else next finding
    for bname, brec in table.branches().items():
        checked["branches"] += 1
        bdir = os.path.join(table.meta_dir, f"branch-{bname}")
        head = brec["head_version"]
        fork = brec["fork_version"]
        if fork > head:
            _f(findings, "error", "branch_head_below_fork",
               f"{bname}: fork={fork} head={head}")
        for bv in range(fork, head + 1):
            bp = os.path.join(bdir, f"v{bv}.json")
            try:
                with open(bp) as fh:
                    bsnap = json.load(fh)
            except FileNotFoundError:
                _f(findings, "error", "branch_snapshot_missing",
                   f"{bname}: v{bv}.json")
                continue
            except (OSError, ValueError) as e:
                _f(findings, "error", "branch_snapshot_unparseable",
                   f"{bname}: v{bv}.json: {e}")
                continue
            for m in bsnap.get("manifests", []):
                live_manifests.add(m["path"])
                mp = os.path.join(table.root, m["path"])
                if not os.path.exists(mp):
                    _f(findings, "error", "branch_manifest_missing",
                       f"{bname} v{bv}: {m['path']}")
                    continue
                try:
                    with open(mp) as fh:
                        for entry in json.load(fh).get("files", []):
                            live_paths.add(entry["path"])
                            if not os.path.exists(os.path.join(table.root, entry["path"])):
                                _f(findings, "error", "branch_data_file_missing",
                                   f"{bname} v{bv}: {entry['path']}")
                except (OSError, ValueError):
                    pass
    for tname, tv in table.tags().items():
        checked["tags"] += 1
        if not oldest <= tv <= cur:
            _f(findings, "warn", "tag_outside_retention",
               f"tag {tname} -> v{tv}, retained range [{oldest}, {cur}]")

    # ---- orphan census (report-only; vacuum is the repair) ------------------
    import time as _t

    now = _t.time()
    data_root = os.path.join(table.root, "data")
    if os.path.isdir(data_root):
        for root, _dirs, fns in os.walk(data_root):
            for fn in fns:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, table.root)
                if fn.endswith(".parquet") and rel not in live_paths:
                    try:
                        young = now - os.path.getmtime(full) < orphan_grace_sec
                    except OSError:
                        young = True
                    if not young:
                        checked["orphans"] += 1
                        _f(findings, "info", "orphan_data_file", rel)
                elif (fn.endswith(".parquet.bloom")
                      and not os.path.exists(full[: -len(".bloom")])):
                    _f(findings, "info", "orphan_bloom_sidecar", rel)

    # ---- deep: parquet footers vs manifest entries (current snapshot) -------
    if deep:
        import pyarrow.parquet as pq

        key = TableSchema.from_json(snaps[cur]["schema"]).key_name
        for m in snaps[cur].get("manifests", []):
            try:
                entries = table._load_bucket_manifest(m["path"])
            except Exception:  # noqa: BLE001 — reported above
                continue
            for entry in entries:
                fpath = os.path.join(table.root, entry["path"])
                if not os.path.exists(fpath):
                    continue  # reported above
                try:
                    pf = pq.ParquetFile(fpath)
                    md = pf.metadata
                except Exception as e:  # noqa: BLE001 — unreadable footer
                    _f(findings, "error", "footer_unreadable",
                       f"{entry['path']}: {e}")
                    continue
                checked["data_files_deep"] += 1
                if md.num_rows != entry.get("rows"):
                    _f(findings, "error", "row_count_mismatch",
                       f"{entry['path']}: footer={md.num_rows} "
                       f"manifest={entry.get('rows')}")
                # the writer recorded schema_arrow.names verbatim — compare
                # against the same surface (md.schema.names are LEAF names:
                # an array column appears only as its 'element' leaf there)
                phys = entry.get("phys_cols")
                if phys is not None and set(phys) != set(pf.schema_arrow.names):
                    _f(findings, "error", "phys_cols_mismatch",
                       f"{entry['path']}: manifest {sorted(phys)} vs footer "
                       f"{sorted(pf.schema_arrow.names)}")
                if entry.get("min_key") is not None and key in md.schema.names:
                    kidx = md.schema.names.index(key)
                    fmin = fmax = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(kidx).statistics
                        if st is not None and st.has_min_max:
                            mn, mx = st.min, st.max
                            if isinstance(mn, bytes):
                                mn, mx = mn.decode(), mx.decode()
                            fmin = mn if fmin is None else min(fmin, mn)
                            fmax = mx if fmax is None else max(fmax, mx)
                    if fmin is not None and (
                            fmin < entry["min_key"] or fmax > entry["max_key"]):
                        _f(findings, "error", "key_range_mismatch",
                           f"{entry['path']}: footer [{fmin}, {fmax}] outside "
                           f"manifest [{entry['min_key']}, {entry['max_key']}]")

    ok = not any(f["level"] == "error" for f in findings)
    return {"ok": ok, "findings": findings, "checked": checked}


def check_catalog(catalog, deep: bool = False,
                  per_table: bool = True,
                  orphan_grace_sec: float = 3600.0) -> dict:
    """Catalog-level fsck: the invariants the cross-table layer adds on top
    of per-table soundness. Same report shape as ``check_table``; table
    findings are prefixed ``<name>:``.

    Checks, in dependency order:

    1. pointer + snapshot parseable; each registered root exists and looks
       like a table.
    2. ``check_table`` on every registered table (``per_table=False`` to
       skip when the tables are audited separately).
    3. **cut retention**: every pinned (table, version) of the CURRENT cut
       must still be readable — a pinned version older than the table's
       oldest retained snapshot means table-level vacuum ran ahead of the
       cut (catalog readers now fail), which is the failure mode the
       routed-replay docs warn ``vacuum_retain_last`` against. A pinned
       version AHEAD of the table's current pointer is structural
       corruption (a cut can only pin published versions).
    4. **transaction ledger**: every ``txn-*.json`` parses, carries a known
       state, and names only registered tables; any in-flight transaction
       is reported (info for 'staging' — recovery aborts it; warn for
       'committing' — recovery must re-drive it before the next cut).
    """
    findings: list[dict] = []
    checked = {"tables": 0, "pins": 0, "transactions": 0}

    try:
        cur = catalog.current_version()
        snap = catalog._snapshot()
    except (OSError, ValueError) as e:
        _f(findings, "error", "catalog_pointer_unreadable", str(e))
        return {"ok": False, "findings": findings, "checked": checked}
    if snap.get("version") != cur:
        _f(findings, "error", "catalog_version_mismatch",
           f"_current={cur} but c{cur}.json says {snap.get('version')}")

    tables = snap.get("tables", {})
    for name, rec in tables.items():
        root = rec.get("root")
        if not root or not os.path.exists(os.path.join(root, "meta", "_current")):
            _f(findings, "error", "table_root_missing",
               f"{name}: root {root!r} has no table pointer")
            continue
        t = LakeTable(root)
        checked["tables"] += 1
        if per_table:
            rep = check_table(t, deep=deep, orphan_grace_sec=orphan_grace_sec)
            for f in rep["findings"]:
                findings.append({**f, "detail": f"{name}: {f['detail']}"})
        # cut retention (the catalog-specific invariant)
        pinned = rec.get("version")
        checked["pins"] += 1
        try:
            t_cur = t.current_version()
            t_old = t.oldest_retained_version()
        except (OSError, ValueError) as e:
            _f(findings, "error", "pin_unverifiable", f"{name}: {e}")
            continue
        if pinned > t_cur:
            _f(findings, "error", "pin_ahead_of_table",
               f"{name}: cut pins v{pinned} but table pointer is v{t_cur}")
        elif pinned < t_old:
            _f(findings, "error", "pin_vacuumed",
               f"{name}: cut pins v{pinned} but the table retains only "
               f"[v{t_old}, v{t_cur}] — catalog reads of this table now "
               "fail; restore the '_catalog' tag protocol and advance the "
               "cut")
        else:
            # the protocol that KEEPS the pin retained: register/publish
            # stamp a '_catalog' tag at the pinned version, and table-level
            # vacuum's tag floor honors it. A missing/mismatched tag is a
            # latent hazard (the next vacuum may expire the cut), not yet
            # damage — warn.
            tag_v = t.tags().get("_catalog")
            if tag_v != pinned:
                _f(findings, "warn", "catalog_tag_mismatch",
                   f"{name}: cut pins v{pinned} but the '_catalog' tag is "
                   f"{'absent' if tag_v is None else f'at v{tag_v}'} — the "
                   "next table vacuum may expire the pinned version")

    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(catalog.meta_dir, "txn-*.json"))):
        checked["transactions"] += 1
        try:
            with open(p) as fh:
                rec = json.load(fh)
        except (OSError, ValueError) as e:
            _f(findings, "error", "txn_unparseable", f"{os.path.basename(p)}: {e}")
            continue
        state = rec.get("state")
        if state not in ("staging", "committing"):
            _f(findings, "error", "txn_bad_state",
               f"{rec.get('txn_id')}: state {state!r}")
            continue
        unknown = [n for n in rec.get("stages", {}) if n not in tables]
        if unknown:
            _f(findings, "error", "txn_unknown_table",
               f"{rec.get('txn_id')}: stages name unregistered {unknown}")
        level = "info" if state == "staging" else "warn"
        _f(findings, level, "txn_in_flight",
           f"{rec.get('txn_id')}: state={state} over "
           f"{sorted(rec.get('stages', {}))} — run recover_transactions()")

    ok = not any(f["level"] == "error" for f in findings)
    return {"ok": ok, "findings": findings, "checked": checked}
