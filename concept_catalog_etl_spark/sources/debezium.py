"""Debezium-envelope adapter: standard CDC JSON → internal change rows.

Debezium (the de-facto open-source CDC connector family) emits one JSON
envelope per change event::

    {"before": {...row...}|null, "after": {...row...}|null,
     "source": {"connector": "postgresql", "db": "...", "table": "...",
                "lsn": 4105148278, "ts_ms": 1690000000123,
                "ts_us": 1690000000123456, "snapshot": "false"},
     "op": "c"|"u"|"d"|"r", "ts_ms": 1690000000456}

``parse_debezium`` maps that shape onto the engine's internal change-row
contract (the same columns ``sources/columnar.py`` lands in parquet), with
ONE JVM-side ``from_json`` and zero Python on the data path:

    op:     c/r → insert (Debezium snapshot reads are plain upserts under
            the engine's idempotent LWW merge), u → update, d → delete;
            any other non-null op passes through verbatim so the standard
            DLQ rule flags it as ``unknown_op`` with the original line.
    doc_id: ``coalesce(after.<key>, before.<key>)`` — deletes carry only
            ``before``.
    event_ts: ``coalesce(timestamp_micros(source.ts_us),
            timestamp_millis(source.ts_ms))`` — the DB commit time, at the
            best precision the connector offers (``ts_us`` since Debezium
            2.5; millis otherwise). LWW total order is (event_ts, lsn), so
            a millis-only feed still orders correctly via the LSN.
    lsn:    ``source.lsn`` (Postgres WAL LSN / MySQL binlog pos — the
            connector's monotonic position, exactly what the internal
            envelope means by ``lsn``).
    payload: the CURRENT registry payload struct rebuilt field-by-field
            from ``after`` — a column the feed lacks is NULL, a feed column
            the registry lacks is dropped, exactly ``from_json``'s missing/
            unknown-key semantics (and parse_envelope re-aligns downstream,
            so renames-in-flight behave like the columnar source).
    schema_change: always NULL — Debezium routes DDL to a separate schema-
            history topic, not the data stream; evolve the table via
            ``LakeTable.evolve_schema`` (registry-governed), which is how
            schema-registry CDC deployments work.

The result plugs straight into ``apply_batch`` (no ``value`` column →
columnar path): the summary probe is a pushed predicate on the typed ``op``
column and there is no second parse. Reference analog: this is the
"extract" seam (/root/reference/files/extract.py:27-40) widened to a
standard wire format.

Scale posture: the mapping is pure column expressions inside whole-stage
codegen over one ``from_json``; per-batch cost is identical to the
internal text path, and a Debezium feed already landed as typed parquet by
a registry-governed sink can skip this module entirely and use
``sources/columnar.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..lakehouse.schema import TableSchema
from ..operators.envelope import SCHEMA_CHANGE_T, payload_struct

DEBEZIUM_SOURCE_T = T.StructType(
    [
        T.StructField("connector", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("snapshot", T.StringType()),
    ]
)


def debezium_struct(schema: TableSchema,
                    extra_names: dict[str, str] | None = None) -> T.StructType:
    """from_json target for a Debezium data-event line. ``before``/``after``
    are the source row: the registry payload columns (+ ``tokens_raw`` and
    any in-flight old names, via ``payload_struct``) plus the key column."""
    row = T.StructType(
        [T.StructField(schema.key_name, T.StringType())]
        + list(payload_struct(schema, extra_names).fields)
    )
    return T.StructType(
        [
            T.StructField("before", row),
            T.StructField("after", row),
            T.StructField("source", DEBEZIUM_SOURCE_T),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def parse_debezium(raw: DataFrame, schema: TableSchema,
                   extra_names: dict[str, str] | None = None,
                   value_col: str = "value",
                   schema_version: int = 1) -> DataFrame:
    """Debezium JSON text lines → internal change rows (columnar contract:
    ``op, doc_id, event_ts, lsn, schema_version, payload, schema_change,
    _raw``). Feed the result to ``apply_batch`` / ``replay_batch`` — all
    DLQ rules, LWW dedup, and merge semantics apply unchanged."""
    deb = debezium_struct(schema, extra_names)
    key = schema.key_name
    # explode-around-from_json: one JSON parse per row (same idiom as
    # parse_raw — bare repeated e[...] references would re-lex the line
    # once per output column under codegen without CSE)
    df = raw.select(
        F.col(value_col).alias("_line"),
        F.explode(F.array(F.from_json(value_col, deb))).alias("e"),
    )
    e = F.col("e")

    op = (
        F.when(e["op"].isin("c", "r"), F.lit("insert"))
        .when(e["op"] == "u", F.lit("update"))
        .when(e["op"] == "d", F.lit("delete"))
        # null → unparseable. Any OTHER op is prefixed so it can never
        # collide with an internal op name — a hostile/garbage feed line
        # with "op": "schema_change" must die in the DLQ as unknown_op,
        # not reach the evolution path as a poison pill (parse_debezium
        # always emits schema_change = NULL).
        .otherwise(F.concat(F.lit("dbz:"), e["op"]))
    )
    pay_t = payload_struct(schema, extra_names)

    def _payload(side: Column) -> Column:
        return F.when(
            side.isNotNull(),
            F.struct(*[side[f.name].alias(f.name) for f in pay_t.fields]),
        )

    out = df.select(
        op.alias("op"),
        F.coalesce(e["after"][key], e["before"][key]).alias(key),
        F.coalesce(
            F.timestamp_micros(e["source"]["ts_us"]),
            F.timestamp_millis(e["source"]["ts_ms"]),
        ).alias("event_ts"),
        e["source"]["lsn"].alias("lsn"),
        F.lit(schema_version).cast("int").alias("schema_version"),
        _payload(e["after"]).alias("payload"),
        # the metadata marker lets apply_batch skip its schema_change probe
        # entirely — probing would re-evaluate the from_json for the whole
        # batch (the parse is lazy), and by construction no schema_change
        # event can exist here (Debezium DDL rides a separate topic)
        F.lit(None).cast(SCHEMA_CHANGE_T).alias(
            "schema_change", metadata={"always_null": True}
        ),
        # original line only where typing failed or the op is foreign —
        # parse_envelope's gated to_json reconstruction covers later DLQ
        # reasons, so clean rows never drag the text through the pipeline
        F.when(
            op.isNull() | ~op.isin("insert", "update", "delete"),
            F.col("_line"),
        ).alias("_raw"),
    )
    return out


def changes_to_debezium(changes: DataFrame, schema: TableSchema,
                        db: str = "lake", table: str = "table") -> DataFrame:
    """The PRODUCER half of the adapter: change-feed rows
    (``LakeTable.read_changes``) → Debezium data-event JSON lines
    (``value: string``), so downstream consumers that already speak the
    standard CDC wire format can tail this engine's tables the same way
    this engine tails an upstream binlog. Inserts/updates carry ``after``
    (key + current payload), deletes carry a key-only ``before``; when the
    feed includes preimages (``include_preimage=True``), updates/deletes
    carry the full old row in ``before``. LWW coordinates round-trip
    exactly: ``source.ts_us = unix_micros(_event_ts)``,
    ``source.lsn = _lsn`` — so ``parse_debezium(changes_to_debezium(...))``
    replays to the identical final state (the relay test pins this).

    Pure column expressions + one ``to_json`` per row; at scale this is a
    map-only job over the (already key-pruned) change feed.

    Window contract: relay windows must stay inside the upstream table's
    tombstone retention. A delete whose tombstone was already expired
    within the window has NO LWW coordinate in the feed — serializing it
    with null lsn/ts would make the consumer DLQ it (``null_ordering``)
    and silently diverge, so such rows ``raise_error`` loudly instead:
    re-snapshot the mirror or widen ``tombstone_horizon_lsns``. (Debezium
    itself has the same constraint: it cannot emit a delete the source DB
    already purged from its log.)"""
    key = schema.key_name
    pay = [f.name for f in schema.fields if f.id not in schema.key_field_ids
           if f.name in changes.columns]
    is_del = F.col("_change_type") == "delete"
    after = F.when(
        ~is_del,
        F.struct(F.col(key).alias(key), *[F.col(c).alias(c) for c in pay]),
    )
    have_pre = all(f"_pre_{c}" in changes.columns for c in pay)
    if have_pre:
        # preimage NULL-ness marks inserts (no old row) — key rides along
        before = F.when(
            F.col("_change_type") != "insert",
            F.struct(F.col(key).alias(key),
                     *[F.col(f"_pre_{c}").alias(c) for c in pay]),
        )
    else:
        before = F.when(is_del, F.struct(F.col(key).alias(key)))
    ts_us = F.when(
        is_del & (F.col("_event_ts").isNull() | F.col("_lsn").isNull()),
        F.raise_error(F.concat(
            F.lit("changes_to_debezium: delete of key '"), F.col(key),
            F.lit("' carries no LWW coordinate — its tombstone expired "
                  "inside the relay window; re-snapshot the mirror or widen "
                  "tombstone retention"),
        )).cast("long"),
    ).otherwise(F.unix_micros(F.col("_event_ts")))
    op = (
        F.when(F.col("_change_type") == "snapshot", "r")
        .when(F.col("_change_type") == "insert", "c")
        .when(F.col("_change_type") == "update", "u")
        .otherwise("d")
    )
    return changes.select(
        F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.struct(
                    F.lit("concept-catalog-etl-spark").alias("connector"),
                    F.lit(db).alias("db"),
                    F.lit(table).alias("table"),
                    F.col("_lsn").alias("lsn"),
                    (ts_us / 1000).cast("long").alias("ts_ms"),
                    ts_us.alias("ts_us"),
                    F.when(F.col("_change_type") == "snapshot", "true")
                    .otherwise("false").alias("snapshot"),
                ).alias("source"),
                op.alias("op"),
                (ts_us / 1000).cast("long").alias("ts_ms"),
            )
        ).alias("value")
    )


_RELAY_STATE = "_RELAY_STATE.json"


def _relay_state(dest: str) -> dict | None:
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(dest, _RELAY_STATE)) as f:
            return _json.load(f)
    except FileNotFoundError:
        return None


def relay_debezium(spark, table, dest: str,
                   db: str = "lake", table_name: str = "table") -> dict:
    """Incremental CDC-out service: publish the table's changes since the
    last relay as a Debezium JSON-lines window directory under ``dest`` —
    the scheduler-loopable sink counterpart of ``sinks.export.sync_export``,
    for consumers that speak the standard wire format.

    **Consumer contract**: replay the window dirs in name order through
    ``parse_debezium``; whenever a window named ``relay-NNNNNN-snap``
    appears, REBUILD the mirror from it (truncate, then load) before
    continuing with later windows. Window names lead with the zero-padded
    monotone to-version (``relay-{to:06d}-snap`` /
    ``relay-{to:06d}-delta-{frm:06d}``), so lexicographic name order equals
    publish order even when a lag-recovery snapshot lands between deltas —
    a trailing-kind name like ``relay-snap-N`` would sort after every
    delta ('s' > digit) and make a name-order replay apply the recovery
    snapshot last, losing all post-recovery deltas.

    * first call → a SNAPSHOT window: every live row as a Debezium
      snapshot read (``op: "r"``, ``source.snapshot: "true"``) with its
      true LWW coordinates (``read(with_system_cols=True)``) — Debezium's
      own initial-snapshot semantics;
    * normally → a DELTA window over ``read_changes`` (O(window));
    * relay lagged past vacuum retention (the from-version is gone) →
      recover with a fresh snapshot window, same contract as
      ``sync_export``. The rebuild-at-snapshot rule above is what makes
      this correct: upstream deletes inside the lag gap are not
      individually replayable (the standard log-retention gap), so a
      mirror that merely upserts the recovery snapshot would keep
      gap-deleted keys forever.

    Exactly-once: window dirs are deterministic in (from, to) and published
    write-temp-then-rename BEFORE the state pointer swaps — a crash between
    the two re-derives the same window, finds the dir already published,
    and just advances the pointer. Windows with zero changes publish no dir
    (pointer still advances)."""
    import json as _json
    import os as _os
    import uuid as _uuid

    from ..lakehouse.table import VersionVacuumedError

    _os.makedirs(dest, exist_ok=True)
    st = _relay_state(dest)
    to = table.current_version()
    if st is not None and st["version"] >= to:
        return {"skipped": True, "version": to}

    key = table.schema().key_name
    if st is None:
        frm, kind = None, "snap"
        lines = None
    else:
        frm, kind = st["version"], "delta"
        try:
            lines = changes_to_debezium(
                table.read_changes(spark, frm, to), table.schema(),
                db=db, table=table_name,
            )
        except VersionVacuumedError:
            frm, kind, lines = None, "snap", None
    if lines is None:  # snapshot window (initial or lag recovery)
        live = table.read(spark, with_system_cols=True, version=to)
        pay = [f.name for f in table.schema().fields
               if f.name != key and f.name in live.columns]
        lines = changes_to_debezium(
            live.select(
                F.lit("snapshot").alias("_change_type"),
                F.col("_event_ts"), F.col("_lsn"),
                F.col(key), *[F.col(c) for c in pay],
            ),
            table.schema(), db=db, table=table_name,
        )

    name = (f"relay-{to:06d}-snap" if kind == "snap"
            else f"relay-{to:06d}-delta-{frm:06d}")
    out = _os.path.join(dest, name)
    rows = None
    if not _os.path.exists(out):  # else: crashed after publish — just advance
        # Write FIRST, then derive the row count from the written files: a
        # count() on the plan would evaluate the change-feed twice per
        # window, and Catalyst prunes the to_json projection under count()
        # anyway, so a coordinate-less-delete raise_error only ever fires at
        # write time. The single write is still before the dir publish and
        # the pointer swap, so a write-time error leaves only a tmp dir.
        import shutil as _shutil

        tmp = _os.path.join(dest, f".tmp-{_uuid.uuid4().hex}")
        lines.write.mode("overwrite").text(tmp)
        rows = spark.read.text(tmp).count()
        if rows == 0 and kind == "delta":
            _shutil.rmtree(tmp)  # maintenance-only window: no dir
            out = None  # advance pointer only
        else:
            # the window's SCHEMA sidecar (Debezium's schema-registry /
            # DDL-topic analog): the upstream schema as of this window's
            # to-version, so a schema-tracking consumer (relay_mirror)
            # can evolve BEFORE parsing — without it, payload fields added
            # upstream are silently dropped by the mirror's from_json.
            # Travels inside the window dir, so it publishes atomically
            # with the data in the same rename.
            with open(_os.path.join(tmp, "_schema.json"), "w") as f:
                _json.dump(table.schema().to_json(), f)
            _os.replace(tmp, out)
    stmp = _os.path.join(dest, f".state-{_uuid.uuid4().hex}")
    with open(stmp, "w") as f:
        _json.dump({"version": to, "kind": kind}, f)
    _os.replace(stmp, _os.path.join(dest, _RELAY_STATE))
    return {"skipped": False, "kind": kind, "from": frm, "to": to,
            "rows": rows, "dir": out}
