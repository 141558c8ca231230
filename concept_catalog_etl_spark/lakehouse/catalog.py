"""Multi-table catalog: atomic cross-table snapshot visibility.

A CDC stream often fans out to several tables (the holding, its derived
aggregate, a search index). Each table commits independently and is
internally consistent, but a reader joining two of them can observe table A
after a batch and table B before it. The catalog closes that gap the same
way the table closes it for files: an immutable versioned mapping
``{table_name -> (root, version)}`` behind an atomically swapped pointer.

- Writers commit to tables as usual (ledgers, retries, WAP — unchanged).
- When a consistent cut exists (e.g. batch N applied to every fan-out
  table), the coordinator calls ``publish({name: version, ...})`` — ONE
  ``os.replace`` makes the whole cut visible.
- Readers resolve through ``read(spark, name)`` / ``pin()`` and see every
  table at the published cut; a crash between table commits and publish
  leaves readers on the previous cut — stale but CONSISTENT, and the
  ledger makes the re-drive of the coordinator idempotent.

Durability of pinned versions: ``publish`` stamps each updated table with
the ``_catalog`` tag at its pinned version, and tags pin the table's vacuum
retention floor — so table-level GC can never delete a version the catalog
still references, with no coupling beyond the tag file.

Concurrency: the catalog version file is created with ``open(..., "x")``
(same optimistic protocol as table commits); a losing publisher re-reads
and re-publishes. Versions are monotonic per table (a publish can only
advance or hold each pin).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable


class CatalogConflictError(RuntimeError):
    pass


class Catalog:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "catalog")

    # ------------------------------------------------------------- lifecycle
    @staticmethod
    def create(root: str) -> "Catalog":
        c = Catalog(root)
        os.makedirs(c.meta_dir, exist_ok=False)
        c._write({"version": 0, "tables": {}})
        return c

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "catalog", "_current"))

    # --------------------------------------------------------------- pointer
    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "_current")) as f:
            return int(f.read().strip())

    def _snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.meta_dir, f"c{v}.json")) as f:
            return json.load(f)

    def _write(self, snap: dict) -> None:
        path = os.path.join(self.meta_dir, f"c{snap['version']}.json")
        # write-complete-then-link: os.link gives the same exclusive-create
        # conflict check as open('x') but the visible file is ALWAYS whole —
        # a crash mid-write can never leave a truncated c{v}.json, which is
        # what makes _roll_forward's adoption of an orphan safe
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        try:
            os.link(tmp, path)  # FileExistsError == lost the version race
        finally:
            os.unlink(tmp)
        tmp = os.path.join(self.meta_dir, f"_current.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(tmp, os.path.join(self.meta_dir, "_current"))

    def _roll_forward(self) -> None:
        """Complete a crashed publisher's swap: a c{v+1}.json that exists
        while ``_current`` still reads v is a fully-written (link-atomic)
        next mapping whose writer died before the pointer swap. Without
        adoption every later publish would hit FileExistsError on that
        version forever — the catalog would be wedged."""
        while True:
            v = self.current_version()
            nxt = os.path.join(self.meta_dir, f"c{v + 1}.json")
            if not os.path.exists(nxt):
                return
            tmp = os.path.join(self.meta_dir, f"_current.tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(v + 1))
            os.replace(tmp, os.path.join(self.meta_dir, "_current"))

    # ----------------------------------------------------------------- reads
    def pin(self) -> dict[str, int]:
        """The current consistent cut: {table_name: pinned version}."""
        return {n: t["version"] for n, t in self._snapshot()["tables"].items()}

    def table(self, name: str) -> LakeTable:
        rec = self._snapshot()["tables"].get(name)
        if rec is None:
            raise KeyError(f"no such catalog table: {name}")
        return LakeTable(rec["root"])

    def read(self, spark: SparkSession, name: str, **read_kw) -> DataFrame:
        """Read ``name`` at its PINNED version — two catalog reads in the
        same cut always join consistently, whatever the tables' writers are
        doing concurrently."""
        rec = self._snapshot()["tables"].get(name)
        if rec is None:
            raise KeyError(f"no such catalog table: {name}")
        return LakeTable(rec["root"]).read(spark, version=rec["version"], **read_kw)

    def sql(self, spark: SparkSession, query: str) -> DataFrame:
        """Run a SELECT with EVERY catalog table registered as a temp view
        at ONE cut. The snapshot is read once, so a concurrent ``publish``
        cannot tear the query: all views resolve against the same catalog
        version even if the query touches every table. (``sql()`` in
        ``operators.sql`` offers the same for ad-hoc table handles, but at
        each table's CURRENT version — no cross-table consistency.)"""
        snap = self._snapshot()
        for name, rec in snap["tables"].items():
            (LakeTable(rec["root"])
             .read(spark, version=rec["version"])
             .createOrReplaceTempView(name))
        return spark.sql(query)

    def show_tables(self, spark: SparkSession) -> DataFrame:
        """One row per catalog table at the current cut: name, root, pinned
        version, the table's head version (pin lag = head - pinned)."""
        snap = self._snapshot()
        rows = [
            (name, rec["root"], int(rec["version"]),
             int(LakeTable(rec["root"]).current_version()))
            for name, rec in sorted(snap["tables"].items())
        ]
        return spark.createDataFrame(
            rows, "table_name string, root string, pinned_version int, "
                  "head_version int")

    # ---------------------------------------------------------------- writes
    def register(self, name: str, table: LakeTable,
                 version: int | None = None) -> dict:
        """Add (or re-root) a table under ``name``, pinned at ``version``
        (default: the table's current version)."""
        v = table.current_version() if version is None else int(version)
        # same pending-tag dance as publish(): moving "_catalog" directly
        # would un-pin a version a still-current cut references (this table
        # may already be registered at an older pin)
        table.tag("_catalog_pending", v)
        snap = self._publish_fn(
            lambda tables: {**tables, name: {"root": table.root, "version": v}}
        )
        table.tag("_catalog", v)
        try:
            table.drop_tag("_catalog_pending")
        except KeyError:
            pass
        return snap

    def publish(self, updates: dict[str, int],
                expect_version: int | None = None,
                max_retries: int = 5) -> dict:
        """Atomically advance the pins of ``updates`` tables to the given
        versions — THE consistent-cut swap. Monotonic per table; unknown
        names raise; each updated table is stamped with the ``_catalog``
        tag at its new pin so table-level vacuum retains the cut."""

        def apply(tables: dict) -> dict:
            out = dict(tables)
            for name, v in updates.items():
                if name not in out:
                    raise KeyError(f"no such catalog table: {name}")
                if v < out[name]["version"]:
                    raise CatalogConflictError(
                        f"{name}: pin may only advance "
                        f"({out[name]['version']} -> {v})"
                    )
                out[name] = {**out[name], "version": int(v)}
            return out

        # Tag protocol around the swap — at every instant the version each
        # cut references is covered by SOME tag:
        #   1. "_catalog_pending" at the new pin (old "_catalog" still
        #      covers the old cut),
        #   2. pointer swap,
        #   3. move "_catalog" to the new pin, drop the pending tag.
        # A crash leaves at worst a stale pending tag (bounded
        # over-retention, overwritten by the next publish) — never a cut
        # whose version a racing table vacuum may delete.
        cur = self._snapshot()["tables"]
        for name, v in updates.items():
            if name not in cur:
                raise KeyError(f"no such catalog table: {name}")
            LakeTable(cur[name]["root"]).tag("_catalog_pending", v)
        snap = self._publish_fn(apply, expect_version, max_retries)
        for name, v in updates.items():
            t = LakeTable(snap["tables"][name]["root"])
            t.tag("_catalog", v)
            try:
                t.drop_tag("_catalog_pending")
            except KeyError:
                pass
        return snap

    # ------------------------------------------------------- transactions
    def transaction(self, txn_id: str | None = None) -> "CatalogTransaction":
        """Open (or, with an existing id, re-attach to) a cross-table
        atomic transaction — see ``CatalogTransaction``."""
        return CatalogTransaction(self, txn_id)

    def transactions(self) -> list[dict]:
        """In-flight transaction ledgers (txn_id, state, staged tables)."""
        out = []
        for fn in sorted(os.listdir(self.meta_dir)):
            if fn.startswith("txn-") and fn.endswith(".json") and ".tmp." not in fn:
                try:
                    with open(os.path.join(self.meta_dir, fn)) as f:
                        rec = json.load(f)
                except (OSError, ValueError):
                    continue
                out.append({"txn_id": rec["txn_id"], "state": rec["state"],
                            "tables": sorted(rec["stages"])})
        return out

    def recover_transactions(self) -> dict[str, str]:
        """Settle every in-flight transaction after a coordinator crash:
        'staging' → abort (nothing was visible), 'committing' → re-drive
        to completion (per-table publishes are exactly-once, the cut
        publish is monotonic). Returns {txn_id: outcome}."""
        out: dict[str, str] = {}
        for rec in self.transactions():
            txn = CatalogTransaction(self, rec["txn_id"])
            if txn.state == "committing":
                txn.commit()
                out[rec["txn_id"]] = "committed"
            else:
                txn.abort()
                out[rec["txn_id"]] = "aborted"
        return out

    def _publish_fn(self, fn, expect_version: int | None = None,
                    max_retries: int = 5) -> dict:
        for _ in range(max_retries + 1):
            self._roll_forward()  # adopt a crashed publisher's orphan swap
            snap = self._snapshot()
            if expect_version is not None and snap["version"] != expect_version:
                raise CatalogConflictError(
                    f"expected catalog v{expect_version}, found v{snap['version']}"
                )
            new = {"version": snap["version"] + 1, "tables": fn(snap["tables"])}
            try:
                self._write(new)
                return new
            except FileExistsError:
                if expect_version is not None:
                    raise CatalogConflictError(
                        f"concurrent catalog publish at v{new['version']}"
                    ) from None
                continue  # reload and re-apply fn on the winner's mapping
        raise CatalogConflictError("catalog publish retries exhausted")


# --------------------------------------------------------- transactions
class TransactionStateError(RuntimeError):
    pass


class CatalogTransaction:
    """Cross-table atomic transaction: stage writes on several catalog
    tables (table-level WAP stages — invisible to every reader), then
    ``commit()`` publishes all stages and advances the catalog cut in ONE
    pointer swap. Catalog readers (``Catalog.read/sql/pin``) see every
    table move together or none — the multi-table analog of a table
    commit, and the piece Iceberg-style single-table lakehouses leave to
    an external coordinator.

    Visibility boundary (be precise about what is atomic): the CATALOG CUT
    is atomic; direct ``LakeTable`` readers that bypass the catalog can
    observe individual tables between the per-table publishes inside
    ``commit()`` — exactly like reading a table replica under 2PC. The
    coordination ledger (``txn-<id>.json`` in the catalog dir) makes a
    crashed ``commit()`` re-drivable: per-table publishes are
    exactly-once (batch-id ledger), the cut publish is monotonic, so
    ``Catalog.recover_transactions()`` completes or aborts every
    in-flight transaction deterministically — state 'staging' aborts
    (nothing was visible), state 'committing' re-drives to completion.

    A REWRITE stage can still lose its table-level race
    (``CommitConflictError``): commit() then stops with the transaction
    ledger intact and the cut UNMOVED — re-stage the conflicted table and
    commit again, or ``abort()`` (which drops the not-yet-published
    stages; already-published tables stay ahead of the cut, invisible to
    catalog readers until some later cut advances them).

    Durability note: staged files are vacuum-protected like any WAP stage,
    but a maintenance loop passing ``stage_ttl_sec`` to ``vacuum`` will
    abort stages older than the TTL — size that TTL above the longest
    transaction you intend to hold open.
    """

    def __init__(self, catalog: "Catalog", txn_id: str | None = None):
        self.catalog = catalog
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        self._path = os.path.join(catalog.meta_dir, f"txn-{self.txn_id}.json")
        if os.path.exists(self._path):
            with open(self._path) as f:
                self._rec = json.load(f)
        else:
            self._rec = {"txn_id": self.txn_id, "state": "staging",
                         "stages": {}}
            self._persist()

    # ------------------------------------------------------------ ledger
    def _persist(self) -> None:
        tmp = self._path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(self._rec, f)
        os.replace(tmp, self._path)

    @property
    def state(self) -> str:
        return self._rec["state"]

    # ----------------------------------------------------------- staging
    def add_stage(self, name: str, stage_id: str) -> None:
        """Adopt a table-level WAP stage (e.g. from
        ``apply_batch(..., cfg with stage_only=True)`` or
        ``LakeTable.stage_commit``) into this transaction. One stage per
        table: the cut pins one version per table, so a second stage on
        the same table must be folded into the first upstream."""
        if self._rec["state"] != "staging":
            raise TransactionStateError(
                f"transaction {self.txn_id} is {self._rec['state']}")
        if name in self._rec["stages"]:
            raise TransactionStateError(
                f"table {name!r} already has stage "
                f"{self._rec['stages'][name]} in this transaction")
        rec = self.catalog.table(name)._load_stage(stage_id)  # must exist
        # the stage's ledger coordinates ride in the txn ledger too: if the
        # stage marker vanishes before commit (e.g. a maintenance pass with
        # stage_ttl_sec aborted it), the ledger is the only way to tell
        # "already published" (fine, re-drive skips) from "aborted under
        # us" (must refuse — committing would silently drop the batch)
        self._rec["stages"][name] = {
            "stage_id": stage_id,
            "batch_id": rec["kwargs"].get("batch_id"),
            "writer_id": rec["kwargs"].get("writer_id"),
        }
        self._persist()

    def stage(self, name: str, add_files: list[dict],
              batch_id: int | None = None, **stage_kw) -> str:
        """Stage ``add_files`` (from ``LakeTable.write_data_files``) on a
        catalog table and enroll the stage. Thin sugar over
        ``stage_commit`` + ``add_stage``."""
        sid = self.catalog.table(name).stage_commit(
            add_files=add_files, batch_id=batch_id, **stage_kw)
        self.add_stage(name, sid)
        return sid

    def read_staged(self, spark: SparkSession, name: str, **read_kw) -> DataFrame:
        """Audit surface: the table AS IF this transaction were committed."""
        ent = self._rec["stages"].get(name)
        t = self.catalog.table(name)
        if ent is None:
            return t.read(spark, **read_kw)
        return t.read_stage(spark, ent["stage_id"], **read_kw)

    # ------------------------------------------------------------ decide
    def commit(self) -> dict:
        """Publish every staged table, then advance the catalog cut in one
        swap. Re-drivable after a crash at ANY point: per-table publishes
        are exactly-once, the cut publish is monotonic per table."""
        if self._rec["state"] == "aborted":
            raise TransactionStateError(f"transaction {self.txn_id} aborted")
        if not self._rec["stages"] and self._rec["state"] == "staging":
            raise TransactionStateError("nothing staged")
        self._rec["state"] = "committing"
        self._persist()  # intent marker BEFORE any table publish (2PC)
        for name, ent in self._rec["stages"].items():
            t = self.catalog.table(name)
            try:
                t._load_stage(ent["stage_id"])
            except KeyError:
                # marker gone: either a crashed earlier drive already
                # published it (ledger says committed — re-drive skips) or
                # something aborted the stage under us (stage_ttl_sec
                # maintenance, an operator abort_stage) — committing then
                # would silently drop the batch from the cut. The ledger
                # coordinates captured at add_stage distinguish the two.
                bid, wid = ent.get("batch_id"), ent.get("writer_id")
                if bid is not None and t.is_committed(bid, wid):
                    continue
                raise TransactionStateError(
                    f"stage {ent['stage_id']} on {name!r} vanished without "
                    f"committing (batch_id={bid}) — aborted under this "
                    "transaction; re-stage and retry"
                ) from None
            # missing_ok closes the load/publish race window (a concurrent
            # re-drive settling it between the check and here)
            t.publish_stage(ent["stage_id"], missing_ok=True)
        cut = {
            name: self.catalog.table(name).current_version()
            for name in self._rec["stages"]
        }
        snap = self.catalog.publish(cut)
        try:
            os.remove(self._path)
        except OSError:
            pass
        self._rec["state"] = "committed"
        return snap

    def abort(self) -> None:
        """Drop the transaction: aborts every not-yet-published stage (their
        data files become vacuum-collectable); the cut never moved. In
        state 'committing', tables already published stay ahead of the cut
        (catalog-invisible) — documented boundary, see class docstring."""
        for name, ent in self._rec["stages"].items():
            try:
                self.catalog.table(name).abort_stage(ent["stage_id"])
            except KeyError:
                pass  # already published (committing crash) or cleaned
        self._rec["state"] = "aborted"
        try:
            os.remove(self._path)
        except OSError:
            pass
