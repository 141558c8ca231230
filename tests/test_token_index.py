"""Incrementally-maintained inverted token index (posting lists).

Pins: the index converges to a batch recompute of the live upstream after
any change mix (preimage retraction is exact — pairs that stopped existing
are tombstoned, pairs that remain keep their new counts); sync work is
O(tokens of changed docs), never O(index); exactly-once replay skip;
token-clustered compaction makes ``lookup_token`` prune files via column
stats; rebuild recovers an index that lagged past upstream vacuum
retention.
"""

import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable
from concept_catalog_etl_spark.lakehouse.table import VersionVacuumedError
from concept_catalog_etl_spark.operators.token_index import (
    lookup_token,
    rebuild_token_index,
    sync_token_index,
    token_index_schema,
)
from tests.helpers import make_table


def make_index(root):
    return LakeTable.create(
        os.path.join(root, "tokidx"), token_index_schema(), n_buckets=8
    )


def doc_rows(spark, docs, ts="2026-01-01 00:00:00", lsn_base=0):
    """docs: list of (doc_id, [tokens]). Duplicate tokens allowed (counted)."""
    rows = [
        (d, toks, len(toks), "crawl", i + lsn_base)
        for i, (d, toks) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, _lsn long"
    )
    return df.withColumn("_event_ts", F.lit(ts).cast("timestamp"))


def expected_postings(spark, table):
    """Batch recompute from the live upstream snapshot."""
    live = table.read(spark)
    rows = (
        live.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .count()
        .collect()
    )
    return {(r["token"], r["doc_id"]): r["count"] for r in rows}


def index_state(spark, index):
    return {
        (r["token"], r["doc_id"]): r["n_occur"]
        for r in index.read(spark).collect()
    }


def test_initial_sync_builds_full_postings(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    docs = [("doc-a", [1, 2, 2, 3]), ("doc-b", [2, 4]), ("doc-c", [5])]
    up.commit(add_files=up.write_data_files(doc_rows(spark, docs)), batch_id=0)
    res = sync_token_index(spark, up, idx)
    assert res["applied"] and res["rows_written"] == 6  # distinct pairs
    assert index_state(spark, idx) == expected_postings(spark, up)
    assert index_state(spark, idx)[(2, "doc-a")] == 2  # counted, not distinct
    # replay skip: same upstream version is a no-op
    assert not sync_token_index(spark, up, idx)["applied"]


def test_update_retracts_exactly_the_vanished_pairs(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(
        add_files=up.write_data_files(
            doc_rows(spark, [("doc-a", [1, 2, 3]), ("doc-b", [7, 8])])
        ),
        batch_id=0,
    )
    sync_token_index(spark, up, idx)

    # doc-a: loses 1, keeps 2 (count 1→2), gains 9; doc-b untouched
    upd = doc_rows(spark, [("doc-a", [2, 2, 3, 9])],
                   ts="2026-02-01 00:00:00", lsn_base=100)
    up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=1)
    res = sync_token_index(spark, up, idx)
    assert res["applied"]
    # 3 live pairs for the new doc-a + 1 retraction (token 1) — doc-b's
    # 2 pairs are NOT rewritten
    assert res["rows_written"] == 4
    state = index_state(spark, idx)
    assert state == expected_postings(spark, up)
    assert (1, "doc-a") not in state and state[(2, "doc-a")] == 2


def test_delete_tombstones_all_postings(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(
        add_files=up.write_data_files(
            doc_rows(spark, [("doc-a", [1, 2]), ("doc-b", [2, 3])])
        ),
        batch_id=0,
    )
    sync_token_index(spark, up, idx)
    dead = (
        doc_rows(spark, [("doc-a", [1, 2])], ts="2026-02-01 00:00:00",
                 lsn_base=100)
        .withColumn("_deleted", F.lit(True))
    )
    up.commit(add_files=up.write_data_files(dead, delta=True), batch_id=1)
    res = sync_token_index(spark, up, idx)
    assert res["applied"] and res["rows_written"] == 2  # two retractions
    state = index_state(spark, idx)
    assert state == {(2, "doc-b"): 1, (3, "doc-b"): 1}
    # token 2 still finds doc-b, not the dead doc-a
    got = {r["doc_id"] for r in lookup_token(spark, idx, 2).collect()}
    assert got == {"doc-b"}


def test_multi_window_catchup_and_exactly_once(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(add_files=up.write_data_files(
        doc_rows(spark, [("doc-a", [1])])), batch_id=0)
    up.commit(add_files=up.write_data_files(
        doc_rows(spark, [("doc-b", [2])], ts="2026-02-01 00:00:00",
                 lsn_base=10), delta=True), batch_id=1)
    # one sync spans both upstream commits
    res = sync_token_index(spark, up, idx)
    assert res["applied"] and res["from_version"] == 0
    assert index_state(spark, idx) == expected_postings(spark, up)
    v = idx.current_version()
    assert not sync_token_index(spark, up, idx)["applied"]
    assert idx.current_version() == v


def test_lookup_prunes_files_after_token_clustering(spark, scratch):
    up, idx = make_table(scratch), make_index(scratch)
    # 200 docs, each carrying one narrow token band → many distinct tokens
    docs = [
        (f"doc-{i:04d}", [i * 4 + j for j in range(4)]) for i in range(200)
    ]
    up.commit(add_files=up.write_data_files(doc_rows(spark, docs)), batch_id=0)
    sync_token_index(spark, up, idx)
    # fragment the index across several files per bucket, then cluster
    upd = doc_rows(spark, [("doc-0000", [800, 801])],
                   ts="2026-02-01 00:00:00", lsn_base=900)
    up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=1)
    sync_token_index(spark, up, idx)
    idx.compact(spark, max_files_per_bucket=1, cluster_by=["token"],
                target_rows_per_file=40)
    rep = idx.scan_report(spark, col_ranges={"token": (100, 100)})
    assert rep["files_after_col_stats"] < rep["files_in_selected_buckets"]
    got = {(r["doc_id"], r["n_occur"])
           for r in lookup_token(spark, idx, 100).collect()}
    assert got == {("doc-0025", 1)}


_hst = __import__("hypothesis").strategies
op_st = _hst.fixed_dictionaries({
    "op": _hst.sampled_from(["upsert", "upsert", "delete"]),
    "doc": _hst.integers(0, 4),
    "toks": _hst.lists(_hst.integers(0, 9), min_size=0, max_size=5),
})


def _window_rows(spark, ops, ts, lsn0):
    rows = []
    for i, op in enumerate(ops):
        doc = f"doc-{op['doc']}"
        if op["op"] == "delete":
            rows.append((doc, None, None, None, lsn0 + i, True))
        else:
            rows.append((doc, op["toks"], len(op["toks"]), "crawl",
                         lsn0 + i, False))
    df = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "_lsn long, _deleted boolean",
    )
    return df.withColumn("_event_ts", F.lit(ts).cast("timestamp"))


def test_random_change_mix_converges_to_batch_recompute(spark, scratch):
    """Property: for arbitrary upsert/delete mixes (few keys → forced
    collisions, empty token arrays, same doc hit twice in one window),
    arbitrary sync points and a mid-stream index compaction, the
    incrementally-synced index equals a batch recompute of the live
    upstream. Retraction correctness is exactly what this stresses: every
    wrong preimage diff leaves a stale posting behind."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    scratch_root = os.path.join(scratch, "prop")

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(windows=st.lists(st.lists(op_st, min_size=1, max_size=6),
                            min_size=1, max_size=3),
           sync_each=st.booleans(), compact_at=st.integers(0, 2),
           seed=st.integers(0, 10**6))
    def run(windows, sync_each, compact_at, seed):
        d = os.path.join(scratch_root, f"ex_{seed}_{len(windows)}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        up, idx = make_table(d, n_buckets=4), make_index(d)
        lsn = 0
        for w, ops in enumerate(windows):
            rows = _window_rows(
                spark, ops, f"2026-01-01 00:00:{w:02d}", lsn)
            lsn += len(ops)
            up.commit(add_files=up.write_data_files(rows, delta=True),
                      batch_id=w)
            if sync_each:
                sync_token_index(spark, up, idx)
            if w == compact_at:
                idx.compact(spark, max_files_per_bucket=1)
        sync_token_index(spark, up, idx)
        assert index_state(spark, idx) == expected_postings(spark, up)

    run()


def test_index_rides_streaming_maintenance(spark, scratch):
    """The posting index stays live inside the streaming ingest loop via
    sync_derived, including through the tick's compaction/vacuum of the
    upstream (the sync windows must stay inside retention), and the final
    index equals a batch recompute of the final table state."""
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    up, idx = make_table(scratch), make_index(scratch)
    blog = os.path.join(scratch, "binlog")
    generate_binlog(blog, n_events=2000, n_docs=150, n_files=4, seed=9)
    replay_stream(
        spark, blog, up,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
        maintenance_every=2,
        sync_derived=[lambda s: sync_token_index(s, up, idx)],
    )
    sync_token_index(spark, up, idx)  # catch-up past the last tick
    assert index_state(spark, idx) == expected_postings(spark, up)


def test_sync_across_upstream_rebucket(spark, scratch):
    """A bucket-layout evolution (rebucket) inside the sync window defeats
    the change feed's candidate-key pruning — it must fall back to the full
    snapshot diff, and the index still converges. Also pins that rows
    UNCHANGED across the rebucket (rewritten into new buckets but with the
    same LWW coordinate) do not echo into the index as spurious changes."""
    up, idx = make_table(scratch, n_buckets=4), make_index(scratch)
    up.commit(
        add_files=up.write_data_files(
            doc_rows(spark, [("doc-a", [1, 2]), ("doc-b", [3])])
        ),
        batch_id=0,
    )
    sync_token_index(spark, up, idx)
    v_synced = idx.current_version()

    up.rebucket(spark, 8)
    # rebucket alone: no logical change → sync must write zero rows
    res = sync_token_index(spark, up, idx)
    if res["applied"]:
        assert res["rows_written"] == 0
    assert index_state(spark, idx) == expected_postings(spark, up)

    upd = doc_rows(spark, [("doc-a", [2, 9])], ts="2026-02-01 00:00:00",
                   lsn_base=100)
    up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=1)
    res = sync_token_index(spark, up, idx)
    assert res["applied"]
    assert index_state(spark, idx) == expected_postings(spark, up)
    state = index_state(spark, idx)
    assert (1, "doc-a") not in state and (9, "doc-a") in state
    assert idx.current_version() > v_synced


def test_sync_across_tokens_rename(spark, scratch):
    """Upstream renames the token-array column inside the sync window: the
    change feed maps preimages to NEW names by field id, so retraction
    stays exact — the sync just passes the current name."""
    up, idx = make_table(scratch), make_index(scratch)
    up.commit(
        add_files=up.write_data_files(
            doc_rows(spark, [("doc-a", [1, 2]), ("doc-b", [3])])
        ),
        batch_id=0,
    )
    sync_token_index(spark, up, idx)

    evolved = up.schema().rename_column("tokens", "toks")
    upd = (
        doc_rows(spark, [("doc-a", [2, 9])], ts="2026-02-01 00:00:00",
                 lsn_base=100)
        .withColumnRenamed("tokens", "toks")
    )
    up.commit(
        add_files=up.write_data_files(upd, delta=True,
                                      schema_override=evolved),
        new_schema=evolved, batch_id=1,
    )
    res = sync_token_index(spark, up, idx, tokens_col="toks")
    assert res["applied"]
    state = index_state(spark, idx)
    live = up.read(spark)
    expect = {
        (r["token"], r["doc_id"]): r["count"]
        for r in live.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token").count().collect()
    }
    assert state == expect
    assert (1, "doc-a") not in state and state[(9, "doc-a")] == 1


def test_rebuild_recovers_lagged_index(spark, scratch):
    up, idx = make_table(scratch, n_buckets=4), make_index(scratch)
    up.commit(add_files=up.write_data_files(
        doc_rows(spark, [("doc-a", [1, 2])])), batch_id=0)
    sync_token_index(spark, up, idx)
    # advance upstream far past the retention window
    for i in range(1, 7):
        up.commit(
            add_files=up.write_data_files(
                doc_rows(spark, [(f"doc-{i}", [i * 10])],
                         ts="2026-02-01 00:00:00", lsn_base=i * 100),
                delta=True),
            batch_id=i,
        )
    up.vacuum(retain_last=2, orphan_grace_sec=0)
    with pytest.raises(VersionVacuumedError):
        sync_token_index(spark, up, idx)
    res = rebuild_token_index(spark, up, idx)
    assert res["rebuilt"]
    assert index_state(spark, idx) == expected_postings(spark, up)
    # incremental sync resumes from the rebuilt watermark
    up.commit(
        add_files=up.write_data_files(
            doc_rows(spark, [("doc-z", [999])], ts="2026-03-01 00:00:00",
                     lsn_base=10_000),
            delta=True),
        batch_id=99,
    )
    res = sync_token_index(spark, up, idx)
    assert res["applied"] and res["rows_written"] == 1
    assert index_state(spark, idx) == expected_postings(spark, up)
