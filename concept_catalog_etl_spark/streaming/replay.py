"""Binlog replay drivers: Structured Streaming (foreachBatch) and batch mode.

Streaming mode is the engine proper (north_rule): a file-source text stream
over the binlog directory, checkpointed, with every micro-batch applied by
``operators.merge.apply_batch``. Exactly-once falls out of the snapshot
ledger: foreachBatch delivers at-least-once, the ledger makes re-delivery a
no-op, and the checkpoint makes the query resumable (kill/resume safe).
Per-source lineage offsets land in snapshot properties each commit.

The source reads **text** lines (not parsed JSON) on purpose: envelope
parsing happens inside foreachBatch under the *current* registry schema, so
schema-change events take effect without restarting the query (see
operators/envelope.py).

Batch mode replays the same files in lexicographic order in fixed-size file
groups with explicit batch ids — the same merge path without streaming
overhead; it exists for backfills and for benchmarking the merge kernel.

Replaces the reference's Makefile orchestration
(``/root/reference/files/Makefile:2``: ``all: extract transform load``) —
the three stages fuse into one DAG per micro-batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..lakehouse.table import LakeTable
from ..operators.merge import MergeConfig, apply_batch


def replay_stream(
    spark: SparkSession,
    binlog_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    cfg: MergeConfig | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger_interval: str | None = None,
    maintenance_every: int | None = None,
    maintenance_max_buckets: int | None = 16,
    maintenance_target_rows_per_file: int | None = None,
    minor_compact_every: int | None = None,
    minor_compact_max_delta: int | None = None,
    tombstone_horizon_lsns: int | None = None,
    vacuum_retain_last: int = 8,
    source_format: str = "text",
    socket_host: str = "127.0.0.1",
    socket_port: int | None = None,
    sync_derived=None,
    audit=None,
    fsck_every: int | None = None,
    fence: bool = False,
    persist_batches: bool = True,
):
    """Structured Streaming replay.

    Default trigger is ``availableNow``: drain everything currently in the
    directory, then stop (resumable later). Pass ``trigger_interval``
    (e.g. ``"30 seconds"``) to tail the directory continuously instead —
    the long-running service mode.

    ``source_format="socket"`` / ``"socket-debezium"`` swaps the directory
    for a live TCP feed (``socket_host``/``socket_port``; ``binlog_dir`` is
    ignored, pass ``None``): same newline-delimited envelopes, same sink,
    but the transport is not replayable, so the producer must re-send
    unacknowledged lines — see the inline note on how at-least-once
    delivery composes with the idempotent sink to exactly-once state.
    Socket mode always tails (default tick 500 ms); stop via the returned
    query handle. Give each socket SESSION its own ``cfg.writer_id``: a
    fresh query restarts foreachBatch ids at 0, so without a fresh ledger
    namespace a previous session's ledger would swallow the new batch 0.

    ``maintenance_every=N`` runs the background-maintenance tick (bounded
    incremental compaction + vacuum) after every N applied batches, inside
    the same single-writer loop — at merge-on-read cadence this is what
    holds file counts at O(buckets) indefinitely (see bench_soak.py).

    ``minor_compact_every=N`` runs delta-only folding
    (``LakeTable.compact_minor``) every N applied batches — O(delta bytes)
    per tick, so it can run at a much tighter cadence than the full tick to
    bound MoR read amplification between full compactions (skipped on
    batches where the full tick already runs: a bucket rewrite subsumes it).

    ``minor_compact_max_delta=K`` is the POLICY form of the same knob: an
    amplification bound instead of a cadence. After every applied batch the
    loop checks the snapshot manifest (O(metadata), no data read) and folds
    only buckets holding more than K delta files — so a reader never faces
    more than ~K+1 delta files per bucket regardless of batch arrival
    pattern, and quiet buckets are never touched. This is the knob a
    production tail wants: cadence couples amplification to batch COUNT,
    the bound couples it to what reads actually pay.

    ``tombstone_horizon_lsns`` is the out-of-orderness horizon (the
    watermark analog, in LSN units): each maintenance tick derives an expiry
    floor from the per-source lineage offsets — ``min(high-water LSN over
    sources) - horizon`` — and drops tombstones older than that floor while
    rewriting buckets (rotating through the bucket space so every tick stays
    bounded but coverage is eventual). A delete's tombstone is only needed
    to defeat late-arriving older updates; once no source can still deliver
    an event that old, the tombstone is dead weight, and expiring it keeps
    tombstone storage O(recent-deletes) instead of O(all-deletes-ever).

    ``vacuum_retain_last`` bounds snapshot/file GC so downstream CDC
    consumers can chain ``read_changes(from_version=...)`` across at least
    that many versions (older asks raise ``VersionVacuumedError``).

    ``audit`` turns the sink into write-audit-publish: each batch is STAGED
    (``MergeConfig.stage_only``), the callable
    ``audit(spark, table, stage_id, metrics) -> bool`` inspects the staged
    state (``table.read_stage``), and the batch is published on True /
    aborted on False. A REJECTED batch is skipped, not retried: the stream
    checkpoint advances and ``metrics`` records ``published: False``.
    Re-feed corrected data as a NEW batch (a re-fed file naturally gets a
    fresh foreachBatch id) — do NOT reuse the rejected batch_id: the
    ledger's ring floor assumes id density, so after LEDGER_KEEP later
    commits the old id would read as "committed long ago" and be silently
    skipped. Readers never observe an unaudited batch.

    ``sync_derived`` is a list of callables ``(spark) -> dict`` run at the
    same maintenance cadence, BEFORE compaction/vacuum (they read the change
    feed, so they must run while the versions they need are retained).
    This is how downstream incremental views ride the ingest loop: e.g.
    ``lambda s: neardup_index.sync_index(s, table, index)`` or an
    aggregate-IVM ``sync_increment`` — each is itself exactly-once, so a
    crash between tick and checkpoint only causes a skipped re-run.

    ``fsck_every=N`` runs the O(metadata) consistency audit
    (``lakehouse.fsck.check_table``) every N applied batches, AFTER the
    maintenance work of that batch, and raises ``RuntimeError`` on any
    error-level finding — the single-writer loop halts on the first sign
    of structural corruption instead of compounding it (a halted stream is
    resumable from checkpoint once the root cause is repaired; see fsck's
    module docs for the repair primitives). Findings land in the batch
    metrics either way.
    """
    if source_format == "parquet":
        # Columnar streaming source: the reader schema is fixed at query
        # start (current table schema + in-flight extras are NOT knowable),
        # so this mode is for schema-stable feeds; after a schema_change
        # lands, restart the query — the new reader picks up the evolved
        # registry schema. (Standard practice for typed CDC topics; the
        # text source stays the evolution-transparent default.)
        from pyspark.sql import types as T

        from ..operators.envelope import envelope_struct

        env = envelope_struct(table.schema())
        st = T.StructType(list(env.fields) + [T.StructField("_raw", T.StringType())])
        raw = (
            spark.readStream.schema(st)
            .option("maxFilesPerTrigger", max_files_per_trigger or 10)
            .option("recursiveFileLookup", "true")
            .format("parquet")
            .load(binlog_dir)
        )
    elif source_format in ("socket", "socket-debezium"):
        # Wire transport: Spark's built-in TCP socket source (the engine
        # connects OUT to host:port and reads newline-delimited JSON — the
        # same text envelope the file transport carries, so everything from
        # the parse down is byte-identical to the directory path). The
        # socket itself is NOT replayable, so the end-to-end contract
        # composes as: producer re-sends from its own log (at-least-once)
        # × idempotent sink (ledger for re-delivered BATCHES, LWW upsert
        # for re-delivered EVENTS — the reference's `$set` idempotence,
        # /root/reference/files/load.py:20-22) = exactly-once state. A
        # Kafka source drops into this same seam: swap the reader, keep
        # `_sink` (documented transport seam, SURVEY §2.4).
        if socket_port is None:
            raise ValueError("source_format='socket' requires socket_port")
        raw = (
            spark.readStream.format("socket")
            .option("host", socket_host)
            .option("port", int(socket_port))
            .load()
        )
        if not trigger_interval:
            # a socket can't be drained-then-stopped (availableNow needs a
            # replayable source); tail it at a tight tick, caller stops
            trigger_interval = "500 milliseconds"
    else:
        reader = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", max_files_per_trigger or 10)
        )
        raw = reader.load(os.path.join(binlog_dir, "*.jsonl"))

    batch_metrics: list[dict] = []
    sink_cfg = cfg
    if audit is not None:
        import dataclasses

        from ..operators.merge import MergeConfig as _MC

        sink_cfg = dataclasses.replace(cfg or _MC(), stage_only=True)
    if fence:
        # zombie-writer fence: this incarnation acquires a fresh epoch NOW,
        # retiring every prior holder of the same writer identity — a
        # superseded driver that wakes up later dies with WriterFencedError
        # on its first DATA commit (already-committed batch ids still skip
        # silently via the ledger; maintenance rewrites are state-preserving
        # and collide through the normal optimistic-commit guards).
        import dataclasses

        from ..operators.merge import MergeConfig as _MC

        base = sink_cfg or _MC()
        sink_cfg = dataclasses.replace(
            base, writer_epoch=table.acquire_writer_epoch(base.writer_id)
        )
    # the maintenance tick commits too — it must die with the same fence
    _fence_wid = sink_cfg.writer_id if sink_cfg else None
    _fence_ep = sink_cfg.writer_epoch if sink_cfg else None

    def _sink(df, batch_id: int):
        # one micro-batch cached for the duration of its apply: apply_batch
        # passes over the raw batch more than once (summary probe + parse).
        # Streaming defaults ON: a production tail reads remote/uncached
        # sources, where the per-pass re-read dominates (~40% in the
        # contended A/B; a warm local page cache instead makes this a ~7%
        # cost — flip it off for local warm backfills, or use batch mode,
        # which defaults off). MEMORY_AND_DISK: spills, no OOM.
        if persist_batches:
            df = df.persist()
        try:
            _sink_inner(df, batch_id)
        finally:
            if persist_batches:
                df.unpersist()

    def _sink_inner(df, batch_id: int):
        if source_format in ("debezium", "socket-debezium"):
            # Debezium lines are parsed HERE, per batch, under the registry
            # schema current at apply time (same evolution-transparency
            # rationale as the internal text path — the readStream itself
            # stays schema-free text)
            from ..sources.debezium import parse_debezium

            df = parse_debezium(df, table.schema())
        m = apply_batch(df.sparkSession, table, df, batch_id, sink_cfg)
        if audit is not None and not m.get("skipped"):
            sid = m["stage_id"]
            if audit(df.sparkSession, table, sid, m):
                table.publish_stage(sid)
                m["published"] = True
            else:
                table.abort_stage(sid)
                m["published"] = False
        batch_metrics.append(m)
        applied = sum(1 for x in batch_metrics if not x.get("skipped"))
        full_tick = bool(
            maintenance_every and applied and applied % maintenance_every == 0
        )
        minor_tick = bool(
            minor_compact_every and applied
            and applied % minor_compact_every == 0
        ) or (minor_compact_max_delta is not None and not m.get("skipped"))
        if minor_tick and not full_tick:
            table.compact_minor(
                spark,
                max_delta_files_per_bucket=(
                    minor_compact_max_delta
                    if minor_compact_max_delta is not None else 1
                ),
                max_buckets_per_run=maintenance_max_buckets,
                writer_id=_fence_wid, writer_epoch=_fence_ep,
            )
        if full_tick:
            for sync in sync_derived or []:
                sync(df.sparkSession)
            expire_below = None
            if tombstone_horizon_lsns is not None:
                offsets = table.properties().get("lineage_offsets", {})
                if offsets:
                    expire_below = min(offsets.values()) - tombstone_horizon_lsns
                    if expire_below <= 0:
                        expire_below = None
            table.compact(
                spark, max_files_per_bucket=1,
                max_buckets_per_run=maintenance_max_buckets,
                expire_tombstones_below_lsn=expire_below,
                target_rows_per_file=maintenance_target_rows_per_file,
                writer_id=_fence_wid, writer_epoch=_fence_ep,
            )
            # single-writer loop: no in-flight files between our own batches
            table.vacuum(retain_last=vacuum_retain_last, orphan_grace_sec=0,
                         writer_id=_fence_wid, writer_epoch=_fence_ep)
        if fsck_every and applied and applied % fsck_every == 0:
            from ..lakehouse.fsck import check_table

            rep = check_table(table)
            m["fsck"] = {"ok": rep["ok"],
                         "findings": rep["findings"][:16]}
            if not rep["ok"]:
                errs = [f for f in rep["findings"] if f["level"] == "error"]
                raise RuntimeError(
                    f"fsck found {len(errs)} structural error(s) after batch "
                    f"{batch_id}; first: {errs[0]['code']}: {errs[0]['detail']}"
                )

    writer = raw.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    else:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination and not trigger_interval:
        q.awaitTermination()
        return batch_metrics
    return q


def replay_batch(
    spark: SparkSession,
    binlog_files: list[str],
    table: LakeTable,
    files_per_batch: int = 10,
    cfg: MergeConfig | None = None,
    start_batch_id: int = 0,
    source_format: str = "text",
    persist_batches: bool = False,
) -> list[dict]:
    """Batch-mode replay: lexicographic file order, explicit batch ids,
    same exactly-once ledger semantics. ``source_format='parquet'`` replays
    a columnar change feed (sources/columnar.py) — no ``from_json``; payload
    shapes from different stream positions union via mergeSchema.
    ``source_format='debezium'`` replays standard Debezium JSON envelopes
    (sources/debezium.py) — parsed per batch under the CURRENT registry
    schema, like the internal text path.

    ``persist_batches`` caches each micro-batch (MEMORY_AND_DISK — spills,
    never OOMs) for the duration of its apply: ``apply_batch`` makes more
    than one pass over the raw batch (steady-state summary probe + the
    main parse). Default OFF here: batch mode is the warm local
    backfill/bench path, where the OS page cache already absorbs the
    re-read and the cache materialization costs ~7% (interleaved A/B,
    BENCH/BASELINE.md). Turn it ON when the source is remote object
    storage or the host is contended — the same A/B measured ~40% wins
    there — and note the STREAMING driver defaults ON for exactly that
    production posture."""
    files = sorted(binlog_files)
    out = []
    bid = start_batch_id
    for i in range(0, len(files), files_per_batch):
        group = files[i : i + files_per_batch]
        if source_format == "parquet":
            raw = spark.read.option("mergeSchema", "true").parquet(*group)
        elif source_format == "debezium":
            from ..sources.debezium import parse_debezium

            raw = parse_debezium(spark.read.text(group), table.schema())
        else:
            raw = spark.read.text(group)
        if persist_batches:
            raw = raw.persist()
        try:
            out.append(apply_batch(spark, table, raw, bid, cfg))
        finally:
            if persist_batches:
                raw.unpersist()
        bid += 1
    return out


# --------------------------------------------------------------- routing
# A real binlog covers a whole DATABASE: one WAL/Debezium stream carries
# events for many collections (the reference tails exactly one Mongo
# collection, /root/reference/files/extract.py:27 — the single-table replay
# above is its direct analog; routing is the engine-grade generalization).
# Events opt into routing with a top-level `"table": "<name>"` attribute in
# the envelope; the routing key is extracted JVM-side (get_json_object) —
# no Python touches the line, and full parsing still happens per TABLE
# under that table's current registry schema, so per-table schema
# evolution keeps working mid-stream.


def _route_col(route_path: str = "$.table"):
    from pyspark.sql import functions as F

    return F.get_json_object(F.col("value"), route_path)


def _apply_routed_batch(
    spark: SparkSession,
    catalog,
    tables: dict[str, LakeTable],
    raw,
    batch_id: int,
    cfg: MergeConfig | None,
    default_route: str | None,
    unknown_dir: str | None,
    atomic: bool,
    route_path: str = "$.table",
    source_format: str = "text",
) -> dict:
    """Apply one text micro-batch to N tables behind one (optionally atomic)
    commit. Returns {"batch_id", "routes": {name: merge-metrics},
    "unknown": n, "txn_id": id|None}.

    Atomicity: with ``atomic=True`` every routed table's merge is staged
    (table-level WAP, invisible) and published behind ONE catalog-cut swap
    (``Catalog.transaction``) — catalog readers see the whole batch land on
    every table together or not at all. Crash windows: before commit() the
    stages are aborted by ``recover_transactions`` / stage-TTL vacuum and
    the redelivered batch re-stages; mid-commit() the intent marker makes
    recovery re-drive to completion, after which the redelivered batch
    ledger-skips per table. Either way: exactly-once per (table, batch).

    Unknown routes (a ``table`` attribute naming no registered route, or a
    missing attribute with ``default_route=None``) go to ``unknown_dir`` as
    JSONL under a batch-deterministic subdir (idempotent under redelivery)
    — or raise if no ``unknown_dir`` is given: an unroutable event in a
    stream with no side-channel is structural corruption, and the loop
    halts rather than dropping data.
    """
    import dataclasses

    from pyspark.sql import functions as F

    cfg = cfg or MergeConfig()
    routed = raw.withColumn("_route", _route_col(route_path))
    if default_route is not None:
        routed = routed.withColumn(
            "_route", F.coalesce(F.col("_route"), F.lit(default_route))
        )
    routed = routed.persist()
    try:
        # O(#distinct routes) — bounded by the table count, not the batch
        present = [
            r["_route"] for r in routed.select("_route").distinct().collect()
        ]
        unknown = [r for r in present if r not in tables]
        n_unknown = 0
        if unknown:
            known = [r for r in present if r in tables]
            # explicit null arm: a missing `table` attribute (with no
            # default_route) yields a NULL route, and `~isin` alone would
            # silently drop it under three-valued logic
            bad = routed.filter(
                F.col("_route").isNull() | ~F.col("_route").isin(known)
                if known else F.lit(True)
            )
            n_unknown = bad.count()
            if unknown_dir is None:
                raise ValueError(
                    f"batch {batch_id}: {n_unknown} event(s) for unknown "
                    f"route(s) {sorted(str(u) for u in unknown)[:5]} and no "
                    "unknown_dir side-channel — refusing to drop them"
                )
            (
                bad.select(
                    F.to_json(F.struct(
                        F.lit(batch_id).alias("batch_id"),
                        F.col("_route").alias("route"),
                        F.col("value").alias("raw"),
                    )).alias("value")
                )
                .write.mode("overwrite")
                .text(os.path.join(unknown_dir, f"batch-{batch_id:09d}"))
            )
        hit = [n for n in present if n in tables]
        metrics: dict = {"batch_id": batch_id, "routes": {},
                         "unknown": n_unknown, "txn_id": None}
        if not hit:
            return metrics
        def _sub(name):
            sub = routed.filter(F.col("_route") == name).drop("_route")
            if source_format == "debezium":
                # parsed per TABLE under that table's CURRENT registry
                # schema — same evolution transparency as the single-table
                # stream path
                from ..sources.debezium import parse_debezium

                sub = parse_debezium(sub, tables[name].schema())
            return sub

        if atomic:
            sink_cfg = dataclasses.replace(cfg, stage_only=True)
            txn = None
            for name in sorted(hit):
                m = apply_batch(spark, tables[name], _sub(name), batch_id,
                                sink_cfg)
                metrics["routes"][name] = m
                if not m.get("skipped"):
                    if txn is None:
                        txn = catalog.transaction()
                    txn.add_stage(name, m["stage_id"])
            if txn is not None:
                txn.commit()
                metrics["txn_id"] = txn.txn_id
        else:
            for name in sorted(hit):
                metrics["routes"][name] = apply_batch(
                    spark, tables[name], _sub(name), batch_id, cfg)
        return metrics
    finally:
        routed.unpersist()


def replay_batch_routed(
    spark: SparkSession,
    binlog_files: list[str],
    catalog,
    routes: list[str],
    files_per_batch: int = 10,
    cfg: MergeConfig | None = None,
    start_batch_id: int = 0,
    default_route: str | None = None,
    unknown_dir: str | None = None,
    atomic: bool = True,
    route_path: str = "$.table",
    source_format: str = "text",
) -> list[dict]:
    """Batch-mode multi-table replay: one text binlog fanned out to the
    catalog tables named in ``routes`` by each event's ``"table"``
    attribute; per batch, all touched tables commit behind one catalog-cut
    swap (``atomic=True``, the default) or independently (``atomic=False``
    — each table still exactly-once via its own ledger, but a crash
    mid-batch leaves tables at different batch high-water marks until
    redelivery equalizes them). Settles crashed transactions up front."""
    if atomic:
        catalog.recover_transactions()
    tables = {n: catalog.table(n) for n in routes}
    files = sorted(binlog_files)
    out = []
    bid = start_batch_id
    for i in range(0, len(files), files_per_batch):
        raw = spark.read.text(files[i : i + files_per_batch])
        out.append(_apply_routed_batch(
            spark, catalog, tables, raw, bid, cfg,
            default_route, unknown_dir, atomic,
            route_path=route_path, source_format=source_format))
        bid += 1
    return out


def replay_stream_routed(
    spark: SparkSession,
    binlog_dir: str,
    catalog,
    routes: list[str],
    checkpoint_dir: str,
    cfg: MergeConfig | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    trigger_interval: str | None = None,
    default_route: str | None = None,
    unknown_dir: str | None = None,
    atomic: bool = True,
    route_path: str = "$.table",
    source_format: str = "text",
    socket_host: str = "127.0.0.1",
    socket_port: int | None = None,
    maintenance_every: int | None = None,
    maintenance_max_buckets: int | None = 16,
    minor_compact_max_delta: int | None = None,
    vacuum_retain_last: int = 8,
    fsck_every: int | None = None,
):
    """Structured Streaming multi-table replay (foreachBatch): the routed
    analog of ``replay_stream``. One checkpointed text stream over the
    binlog directory; every micro-batch fans out to the catalog tables in
    ``routes`` and (default) commits atomically behind one catalog-cut
    swap — see ``_apply_routed_batch`` for the exactly-once argument.

    Maintenance: ``minor_compact_max_delta=K`` applies the per-table
    read-amplification bound after every applied batch, only to tables the
    batch touched (a quiet table accrues no deltas); ``maintenance_every=N``
    runs the full compact+vacuum tick over ALL routed tables every N
    applied batches. Keep ``vacuum_retain_last`` above the depth of catalog
    cuts you want time-travel-readable: maintenance advances table versions
    ahead of the current cut, and the cut's pinned versions must survive
    vacuum until the next batch advances the cut (same retention contract
    as single-table time travel)."""
    if atomic:
        catalog.recover_transactions()
    tables = {n: catalog.table(n) for n in routes}
    if source_format in ("socket", "socket-debezium"):
        # one live TCP feed carrying EVERY table's events — the realistic
        # shape of a database-level CDC wire. Same at-least-once-producer ×
        # idempotent-sink composition as the single-table socket mode, per
        # (table, batch); give each socket SESSION its own cfg.writer_id
        # (fresh query restarts foreachBatch ids at 0).
        if socket_port is None:
            raise ValueError("source_format='socket' requires socket_port")
        raw = (
            spark.readStream.format("socket")
            .option("host", socket_host)
            .option("port", int(socket_port))
            .load()
        )
        if not trigger_interval:
            trigger_interval = "500 milliseconds"
    else:
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", max_files_per_trigger or 10)
            .load(os.path.join(binlog_dir, "*.jsonl"))
        )
    batch_fmt = ("debezium" if source_format in ("debezium", "socket-debezium")
                 else "text")
    batch_metrics: list[dict] = []

    def _sink(df, batch_id: int):
        m = _apply_routed_batch(
            df.sparkSession, catalog, tables, df, batch_id, cfg,
            default_route, unknown_dir, atomic,
            route_path=route_path, source_format=batch_fmt)
        batch_metrics.append(m)
        touched = [n for n, tm in m["routes"].items()
                   if not tm.get("skipped")]
        if minor_compact_max_delta is not None:
            for name in touched:
                tables[name].compact_minor(
                    df.sparkSession,
                    max_delta_files_per_bucket=minor_compact_max_delta,
                    max_buckets_per_run=maintenance_max_buckets,
                )
        applied = sum(1 for x in batch_metrics if x["routes"])
        if maintenance_every and applied and applied % maintenance_every == 0:
            for name in routes:
                t = tables[name]
                t.compact(df.sparkSession, max_files_per_bucket=1,
                          max_buckets_per_run=maintenance_max_buckets)
                # the '_catalog' tag pins each cut version, so this vacuum
                # can never expire what the current cut reads
                t.vacuum(retain_last=vacuum_retain_last, orphan_grace_sec=0)
        if fsck_every and applied and applied % fsck_every == 0:
            from ..lakehouse.fsck import check_catalog

            rep = check_catalog(catalog)
            m["fsck"] = {"ok": rep["ok"], "findings": rep["findings"][:16]}
            if not rep["ok"]:
                errs = [f for f in rep["findings"] if f["level"] == "error"]
                raise RuntimeError(
                    f"catalog fsck found {len(errs)} error(s) after batch "
                    f"{batch_id}; first: {errs[0]['code']}: {errs[0]['detail']}"
                )

    writer = raw.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    else:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination and not trigger_interval:
        q.awaitTermination()
        return batch_metrics
    return q
