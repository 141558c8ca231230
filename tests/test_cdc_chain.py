"""CDC chaining: a DOWNSTREAM table fed exclusively from the upstream
table's change-data-feed must converge to the upstream's exact state.

This is the claim in read_changes' docstring ("downstream CDC consumers
chain from this the same way this engine tails an upstream binlog") made
executable: each upstream commit window's read_changes output is
re-serialized as change events (the CDF row carries the original LWW
coordinate, so the downstream merge resolves ties identically) and applied
through the same apply_batch MERGE into a second table.
"""

import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state


def _changes_as_events(changes_df):
    """CDF rows → JSON change-event lines the envelope parser accepts."""
    op = F.when(F.col("_change_type") == "delete", "delete").otherwise("update")
    payload = F.when(
        F.col("_change_type") != "delete",
        F.struct(
            F.col("tokens"), F.col("n_tok").cast("int").alias("n_tok"), F.col("source")
        ),
    )
    return changes_df.select(
        F.to_json(
            F.struct(
                op.alias("op"),
                F.col("doc_id"),
                F.date_format("_event_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("event_ts"),
                F.col("_lsn").alias("lsn"),
                payload.alias("payload"),
            )
        ).alias("value")
    )


def test_downstream_table_converges_via_cdf(spark, scratch):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=3000, n_docs=250, n_files=6, seed=13,
                            p_delete=0.15)
    up = make_table(os.path.join(scratch, "up"))
    down = make_table(os.path.join(scratch, "down"))

    v0 = up.current_version()
    # two upstream ingest windows; after each, ship its CDF window downstream
    for i, (lo, hi) in enumerate(((0, 3), (3, 6))):
        replay_batch(spark, paths[lo:hi], up, files_per_batch=3, start_batch_id=i)
        v1 = up.current_version()
        ev = _changes_as_events(up.read_changes(spark, v0, v1))
        replay_batch_events(spark, ev, down, batch_id=i)
        v0 = v1

    assert table_state(spark, down) == table_state(spark, up)


def replay_batch_events(spark, events_df, table, batch_id):
    from concept_catalog_etl_spark.operators.merge import apply_batch

    apply_batch(spark, table, events_df, batch_id, MergeConfig())


def test_downstream_delete_propagates(spark, scratch):
    """A key deleted upstream between windows arrives downstream as a
    delete event and leaves no live row."""
    import json

    up = make_table(os.path.join(scratch, "up"))
    down = make_table(os.path.join(scratch, "down"))

    def ev(op, doc, lsn, toks=None):
        payload = None
        if op != "delete":
            payload = {"tokens": toks, "n_tok": len(toks), "source": "crawl"}
        return json.dumps({
            "op": op, "doc_id": doc,
            "event_ts": f"1970-01-01T00:00:{lsn:02d}.000000", "lsn": lsn,
            "payload": payload,
        })

    def apply_lines(table, lines, bid):
        df = spark.createDataFrame([(x,) for x in lines], "value string")
        replay_batch_events(spark, df, table, bid)

    v0 = up.current_version()
    apply_lines(up, [ev("insert", "doc-a", 1, [1, 2]), ev("insert", "doc-b", 2, [3])], 0)
    v1 = up.current_version()
    apply_lines(down, [r["value"] for r in _changes_as_events(
        up.read_changes(spark, v0, v1)).collect()], 0)

    apply_lines(up, [ev("delete", "doc-a", 3), ev("update", "doc-b", 4, [9])], 1)
    v2 = up.current_version()
    apply_lines(down, [r["value"] for r in _changes_as_events(
        up.read_changes(spark, v1, v2)).collect()], 1)

    assert table_state(spark, down) == table_state(spark, up)
    assert "doc-a" not in table_state(spark, down)


def test_maintenance_commits_are_cdf_silent(spark, scratch):
    """Compaction (minor + major) and vacuum move files, not logical state:
    a change-feed window that covers ONLY maintenance commits must be empty,
    and a window spanning [data batch, maintenance] must emit exactly the
    data batch's changes — file rewrites never masquerade as row changes
    (the diff is LWW-coordinate-based, not file-based)."""
    import json

    from concept_catalog_etl_spark.operators.merge import apply_batch

    t = make_table(scratch, n_buckets=2)
    cfg = MergeConfig.for_table(t, write_mode="mor")

    def _batch(bid, rows):
        lines = [json.dumps(
            {"op": op, "doc_id": d,
             "event_ts": f"1970-01-01T00:00:{bid + 1:02d}.000000",
             "lsn": bid * 100 + i, "schema_version": 1,
             "payload": ({"tokens": tk, "n_tok": len(tk), "source": "crawl"}
                         if tk is not None else None)}
            ) for i, (op, d, tk) in enumerate(rows)]
        apply_batch(spark, t,
                    spark.createDataFrame([(ln,) for ln in lines],
                                          "value string"), bid, cfg)

    _batch(0, [("insert", "a", [1]), ("insert", "b", [2]),
               ("insert", "c", [3])])
    _batch(1, [("update", "a", [9]), ("delete", "b", None)])
    v_data = t.current_version()

    t.compact_minor(spark)
    t.compact(spark)
    t.vacuum(retain_last=8, orphan_grace_sec=0)
    v_maint = t.current_version()
    assert v_maint > v_data  # maintenance really committed

    assert t.read_changes(spark, v_data, v_maint).count() == 0
    # ...including under the full-diff plan (no candidate-key shortcut)
    assert t.read_changes(spark, v_data, v_maint,
                          max_candidate_keys=0).count() == 0
    # a window spanning batch 1 + maintenance: exactly batch 1's changes
    got = {r["doc_id"]: r["_change_type"]
           for r in t.read_changes(spark, v_data - 1, v_maint).collect()}
    assert got == {"a": "update", "b": "delete"}


def test_rebucket_and_alter_are_cdf_silent(spark, scratch):
    """Bucket-layout evolution rewrites every file and an ALTER commits a
    new schema — neither changes any row's LWW coordinate, so both windows
    are change-feed silent (rebucket takes the full-diff fallback: its
    added files cover the whole table, blowing the candidate-key budget)."""
    import json

    from concept_catalog_etl_spark.operators.merge import apply_batch
    from concept_catalog_etl_spark.operators.sql import alter_table_sql

    t = make_table(scratch, n_buckets=2)
    cfg = MergeConfig.for_table(t)
    lines = [json.dumps(
        {"op": "insert", "doc_id": f"d{i}",
         "event_ts": "1970-01-01T00:00:01.000000", "lsn": i,
         "schema_version": 1,
         "payload": {"tokens": [i], "n_tok": 1, "source": "crawl"}})
        for i in range(20)]
    apply_batch(spark, t,
                spark.createDataFrame([(ln,) for ln in lines],
                                      "value string"), 0, cfg)
    v0 = t.current_version()

    t.rebucket(spark, 4)
    v_rb = t.current_version()
    assert t.read_changes(spark, v0, v_rb, max_candidate_keys=5).count() == 0

    alter_table_sql(spark, t, "ALTER TABLE t ADD COLUMN q double",
                    batch_id=1, event_ts="1970-01-01T00:00:02")
    v_alter = t.current_version()
    assert v_alter > v_rb
    assert t.read_changes(spark, v_rb, v_alter).count() == 0
    # the evolved column appears (as NULL) in a window that has real changes
    apply_batch(spark, t, spark.createDataFrame([(json.dumps(
        {"op": "update", "doc_id": "d0",
         "event_ts": "1970-01-01T00:00:03.000000", "lsn": 100,
         "schema_version": 2,
         "payload": {"tokens": [7], "n_tok": 1, "source": "crawl",
                     "q": 0.5}}),)], "value string"), 2, cfg)
    ch = t.read_changes(spark, v_alter).collect()
    assert [(r["doc_id"], r["_change_type"], r["q"]) for r in ch] == [
        ("d0", "update", 0.5)]
