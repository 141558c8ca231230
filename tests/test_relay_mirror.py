"""mirror_relay (sources/relay_mirror.py): the library-side relay
consumer. Delta windows ride the merge kernel; snapshot windows (initial
load / lag recovery) ride snapshot reconciliation — so a mirror that
fell into a retention gap converges WITHOUT truncate-and-reload, with
gap deletes applied and unchanged rows untouched."""

import os

from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.sources.debezium import relay_debezium
from concept_catalog_etl_spark.sources.relay_mirror import (
    MIRROR_WRITER,
    list_windows,
    mirror_relay,
)
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state


def test_mirror_bootstrap_deltas_and_idempotence(spark, scratch):
    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=1200,
                            n_docs=120, n_files=4, seed=41, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    t_b = make_table(os.path.join(scratch, "b"))

    replay_batch(spark, paths[:2], t_a, files_per_batch=2)
    relay_debezium(spark, t_a, dest)
    m = mirror_relay(spark, t_b, dest)
    assert m["windows_applied"] == 1 and m["windows_skipped"] == 0
    assert table_state(spark, t_b) == table_state(spark, t_a)

    replay_batch(spark, paths[2:], t_a, files_per_batch=2, start_batch_id=1)
    relay_debezium(spark, t_a, dest)
    m2 = mirror_relay(spark, t_b, dest)
    assert m2["windows_applied"] == 1 and m2["windows_skipped"] == 1
    assert table_state(spark, t_b) == table_state(spark, t_a)

    # idempotent: a re-run applies nothing and moves nothing
    v = t_b.current_version()
    m3 = mirror_relay(spark, t_b, dest)
    assert m3["windows_applied"] == 0 and m3["windows_skipped"] == 2
    assert t_b.current_version() == v


def test_mirror_lag_recovery_reconciles_gap(spark, scratch):
    """Mirror syncs, then the relay lags past vacuum retention and
    publishes a recovery snapshot. The reconcile-based mirror must (a)
    drop keys deleted upstream inside the gap, (b) adopt gap updates,
    (c) NOT rewrite rows that never changed."""
    blog = os.path.join(scratch, "blog")
    paths = generate_binlog(blog, n_events=1500, n_docs=150, n_files=6,
                            seed=43, p_malformed=0.0, p_delete=0.15)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    t_b = make_table(os.path.join(scratch, "b"))

    replay_batch(spark, paths[:3], t_a, files_per_batch=3)
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)
    before = table_state(spark, t_a)
    assert table_state(spark, t_b) == before

    # the gap: more events (updates + deletes) land upstream, and the
    # relay's from-version is vacuumed away before it runs again
    replay_batch(spark, paths[3:], t_a, files_per_batch=3, start_batch_id=1)
    t_a.vacuum(retain_last=1, orphan_grace_sec=0)
    m = relay_debezium(spark, t_a, dest)
    assert m["kind"] == "snap"

    after = table_state(spark, t_a)
    gap_deleted = set(before) - set(after)
    assert gap_deleted, "scenario needs deletes inside the gap"
    unchanged = {k for k in before if after.get(k) == before[k]}
    assert unchanged, "scenario needs untouched rows"

    import pyspark.sql.functions as F
    coords_before = {
        r["doc_id"]: (r["_event_ts"], r["_lsn"])
        for r in t_b.read(spark, with_system_cols=True).collect()
    }
    mm = mirror_relay(spark, t_b, dest)
    assert mm["windows_applied"] == 1
    assert table_state(spark, t_b) == after  # gap deletes + updates applied
    coords_after = {
        r["doc_id"]: (r["_event_ts"], r["_lsn"])
        for r in t_b.read(spark, with_system_cols=True).collect()
    }
    for k in unchanged:
        assert coords_after[k] == coords_before[k], (
            f"unchanged row {k} was rewritten by the recovery snapshot"
        )
    # windows parse + ledger bookkeeping
    wins = list_windows(dest)
    assert [w["kind"] for w in wins] == ["snap", "snap"] or \
        [w["kind"] for w in wins][0] == "snap"
    assert all(t_b.is_committed(w["to"], MIRROR_WRITER) for w in wins)


def test_live_cdc_chain_stream_relay_mirror(spark, scratch):
    """The full CDC chain in ONE streaming run: binlog → upstream table
    (checkpointed Structured Streaming replay) → Debezium relay windows →
    downstream mirror, with the relay AND the mirror riding the same
    maintenance tick (`sync_derived`). After the stream drains and one
    final catch-up pass, the mirror equals the upstream table — the
    lake-to-lake replication loop with no test-side consumer logic."""
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    d = os.path.join(scratch, "binlog")
    generate_binlog(d, n_events=1000, n_docs=100, n_files=6, seed=47,
                    p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    t_b = make_table(os.path.join(scratch, "b"))
    dest = os.path.join(scratch, "relay")

    replay_stream(
        spark, d, t_a, os.path.join(scratch, "ckpt"),
        max_files_per_trigger=2,
        maintenance_every=2, vacuum_retain_last=2,
        sync_derived=[
            lambda s: relay_debezium(s, t_a, dest),
            lambda s: mirror_relay(s, t_b, dest),
        ],
    )
    # catch-up for batches after the last tick
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)
    assert table_state(spark, t_b) == table_state(spark, t_a)


def test_mirror_tracks_upstream_schema_evolution(spark, scratch):
    """Upstream ADD COLUMN (with DEFAULT) and widen propagate to the
    mirror through the window's _schema.json sidecar BEFORE parsing — so
    new payload fields are not silently dropped, and the initial-default
    backfills the mirror's pre-add rows too."""
    import json

    from concept_catalog_etl_spark.operators.merge import (
        MergeConfig, apply_batch,
    )
    from concept_catalog_etl_spark.operators.sql import run_dml

    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=800,
                            n_docs=80, n_files=2, seed=53, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    t_b = make_table(os.path.join(scratch, "b"))

    replay_batch(spark, paths, t_a, files_per_batch=2)
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)
    assert table_state(spark, t_b) == table_state(spark, t_a)

    # upstream evolves: new column with a default, plus a widen
    run_dml(spark, t_a,
            "ALTER TABLE docs ADD COLUMN quality double DEFAULT 0.5",
            batch_id=900, event_ts="2027-01-01T00:00:00")
    run_dml(spark, t_a, "ALTER TABLE docs ALTER COLUMN n_tok TYPE bigint",
            batch_id=901, event_ts="2027-01-01T00:00:01")
    # and new data lands under the evolved schema
    lines = [json.dumps({
        "op": "insert", "doc_id": f"evo-{i}", "event_ts":
        "2027-01-02T00:00:00.000000", "lsn": 10_000 + i,
        "schema_version": 2,
        "payload": {"tokens": [i], "n_tok": 1, "source": "curated",
                    "quality": 0.9}}) for i in range(5)]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    apply_batch(spark, t_a, raw, 902, MergeConfig.for_table(t_a))

    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)

    bs = t_b.schema()
    assert bs.field_by_name("quality").type == "double"
    assert bs.field_by_name("quality").initial_default == 0.5
    assert bs.field_by_name("n_tok").type == "bigint"

    a_rows = {r["doc_id"]: (r["quality"], r["n_tok"])
              for r in t_a.read(spark).collect()}
    b_rows = {r["doc_id"]: (r["quality"], r["n_tok"])
              for r in t_b.read(spark).collect()}
    assert b_rows == a_rows
    # the default backfilled BOTH sides' pre-add rows; new rows carry 0.9
    assert b_rows["evo-0"][0] == 0.9
    assert all(q == 0.5 for d, (q, _) in b_rows.items()
               if not d.startswith("evo-"))

    # idempotent re-run
    v = t_b.current_version()
    m = mirror_relay(spark, t_b, dest)
    assert m["windows_applied"] == 0 and t_b.current_version() == v


def test_mirror_divergent_type_raises(spark, scratch):
    """A mirror column whose type neither widens to nor from the
    upstream's stops loudly instead of silently nulling every value."""
    import pytest

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema

    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=200,
                            n_docs=20, n_files=1, seed=59, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    replay_batch(spark, paths, t_a, files_per_batch=1)
    dest = os.path.join(scratch, "relay")
    relay_debezium(spark, t_a, dest)

    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "boolean")], key="doc_id")  # source: boolean vs string
    t_b = LakeTable.create(os.path.join(scratch, "b", "table"), schema,
                           n_buckets=4)
    with pytest.raises(ValueError, match="divergent types"):
        mirror_relay(spark, t_b, dest)


def test_mirror_upstream_rename_applies_as_rename(spark, scratch):
    """Round-5 verdict task 6: an upstream RENAME reaches the mirror AS a
    rename when the upstream field id proves it — the mirror column keeps
    its values under the new name instead of degrading to add-plus-stale.
    The proof rides ``mirror_upstream_schema`` (last-seen upstream schema,
    with ids) persisted in the mirror's own properties."""
    import json

    from concept_catalog_etl_spark.operators.merge import (
        MergeConfig, apply_batch,
    )
    from concept_catalog_etl_spark.operators.sql import run_dml

    paths = generate_binlog(os.path.join(scratch, "blog"), n_events=400,
                            n_docs=40, n_files=1, seed=61, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    t_b = make_table(os.path.join(scratch, "b"))

    replay_batch(spark, paths, t_a, files_per_batch=1)
    run_dml(spark, t_a,
            "ALTER TABLE docs ADD COLUMN quality double DEFAULT 0.5",
            batch_id=900, event_ts="2027-01-01T00:00:00")
    lines = [json.dumps({
        "op": "insert", "doc_id": f"q-{i}",
        "event_ts": "2027-01-02T00:00:00.000000", "lsn": 10_000 + i,
        "schema_version": 2,
        "payload": {"tokens": [i], "n_tok": 1, "source": "curated",
                    "quality": 0.75}}) for i in range(4)]
    apply_batch(spark, t_a,
                spark.createDataFrame([(x,) for x in lines], "value string"),
                901, MergeConfig.for_table(t_a))
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)  # mirror learns the upstream ids here
    assert table_state(spark, t_b) == table_state(spark, t_a)

    # upstream renames the column; more data lands under the NEW name
    run_dml(spark, t_a, "ALTER TABLE docs RENAME COLUMN quality TO q2",
            batch_id=902, event_ts="2027-01-03T00:00:00")
    lines2 = [json.dumps({
        "op": "insert", "doc_id": f"r-{i}",
        "event_ts": "2027-01-04T00:00:00.000000", "lsn": 20_000 + i,
        "schema_version": 3,
        "payload": {"tokens": [i], "n_tok": 1, "source": "curated",
                    "q2": 0.9}}) for i in range(3)]
    apply_batch(spark, t_a,
                spark.createDataFrame([(x,) for x in lines2], "value string"),
                903, MergeConfig.for_table(t_a))
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)

    bs = t_b.schema()
    assert "q2" in bs.names()
    assert "quality" not in bs.names(), "rename degraded to add-plus-stale"
    b_rows = {r["doc_id"]: r["q2"] for r in t_b.read(spark).collect()}
    a_rows = {r["doc_id"]: r["q2"] for r in t_a.read(spark).collect()}
    assert b_rows == a_rows
    assert b_rows["q-0"] == 0.75   # pre-rename value KEPT under new name
    assert b_rows["r-0"] == 0.9

    # idempotent re-run converges
    v = t_b.current_version()
    m = mirror_relay(spark, t_b, dest)
    assert m["windows_applied"] == 0 and t_b.current_version() == v


def test_list_windows_numeric_order_beyond_padding(tmp_path):
    """to-versions >= 1,000,000 overflow the 6-digit zero padding: the
    regex must still accept them and the ordering must be NUMERIC (lexical
    name order would interleave 1000000 between 000999 and 999999... or
    worse, skip it entirely under the old exactly-six-digits regex)."""
    import os

    names = [
        "relay-000999-snap",
        "relay-001000-delta-000999",
        "relay-999999-delta-001000",
        "relay-1000000-delta-999999",
        "relay-1000001-delta-1000000",
        "not-a-window",
    ]
    for n in names:
        os.makedirs(tmp_path / n)
    ws = list_windows(str(tmp_path))
    assert [w["to"] for w in ws] == [999, 1000, 999999, 1000000, 1000001]
    assert ws[-1]["frm"] == 1000000


def test_snapshot_window_with_corrupt_line_aborts(spark, scratch):
    """A corrupt line in a SNAPSHOT window must abort the window (not DLQ
    and proceed): reconcile deletes live keys absent from the snapshot, so
    a dropped line would silently delete that row from the mirror."""
    import glob

    import pytest

    blog = os.path.join(scratch, "blog")
    paths = generate_binlog(blog, n_events=600, n_docs=60, n_files=2,
                            seed=67, p_malformed=0.0)
    t_a = make_table(os.path.join(scratch, "a"))
    dest = os.path.join(scratch, "relay")
    t_b = make_table(os.path.join(scratch, "b"))

    replay_batch(spark, paths[:1], t_a, files_per_batch=1)
    relay_debezium(spark, t_a, dest)
    mirror_relay(spark, t_b, dest)

    # force a lag-recovery snapshot window, then corrupt one line of it
    replay_batch(spark, paths[1:], t_a, files_per_batch=1, start_batch_id=1)
    t_a.vacuum(retain_last=1, orphan_grace_sec=0)
    m = relay_debezium(spark, t_a, dest)
    assert m["kind"] == "snap"
    snap_dir = [w for w in list_windows(dest) if w["kind"] == "snap"][-1]
    files = sorted(glob.glob(os.path.join(snap_dir["path"], "*.txt")))
    assert files
    # a NEW file (not an append): Spark's session FileStatusCache pins the
    # listed size of known files, so an append would fail the read outright
    # instead of exercising the lossy-reconcile guard
    with open(os.path.join(snap_dir["path"], "zz-corrupt.txt"), "w") as f:
        f.write('{"this is": "not a debezium line"\n')

    before = table_state(spark, t_b)
    with pytest.raises(ValueError, match="snapshot window"):
        mirror_relay(spark, t_b, dest)
    # the mirror was not touched by the refused window
    assert table_state(spark, t_b) == before
