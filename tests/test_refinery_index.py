"""Incremental refinery (operators/refinery_index.py): the chunk manifest
maintained through the change feed must equal the batch refinery recompute
(``plans.queries.refinery_plan``'s packing over the refinery's clean set)
after every sync — including keeper promotion, gate flips, contamination
and the eval-change rebuild path.
"""

import json
import os
import shutil

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.operators.refinery_index import (
    refinery_tables,
    sync_refinery,
)
from concept_catalog_etl_spark.plans.queries import refinery_plan

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "refinery_index")

# ten-word sentences that PASS the gate when repeated (n>=10, mean word
# length in range, alpha, stopword present); doc text = sentence * reps
SENTENCES = [
    "the quick brown fox jumps over a lazy dog today",
    "a stitch in time saves nine of the best threads",
    "to be or not to be that is the question",
    "all that glitters is not gold in the old mine",
]
JUNK = "zz qq"  # fails the gate (too short)


def _text(ev):
    if ev["junk"]:
        return JUNK
    return " ".join([SENTENCES[ev["sent"]]] * ev["reps"])


def _mk_upstream(root):
    return LakeTable.create(
        os.path.join(root, "corpus"),
        TableSchema.create(
            [("doc_id", "string"), ("text", "string"), ("source", "string")],
            key="doc_id"),
        n_buckets=4)


def _apply(spark, table, events, batch_id):
    lines = [json.dumps({
        "op": e["op"], "doc_id": str(e["doc"]),
        "event_ts": f"1970-01-01T00:00:{e['ts']:02d}.000000",
        "lsn": i, "schema_version": 1,
        "payload": None if e["op"] == "delete" else
        {"text": _text(e), "source": e["source"]},
    }) for i, e in enumerate(events)]
    raw = spark.createDataFrame([(x,) for x in lines], "value string")
    # source here is a free-form corpus tag ("web"/"books") — disable the
    # canonical-trio resolution so the kernel does not canonicalize it
    apply_batch(spark, table, raw, batch_id,
                MergeConfig(tokens_fid=None, ntok_fid=None, source_fid=None))


def _batch_manifest(spark, upstream, budget=512):
    corpus = upstream.read(spark).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "text")
    return {
        (r["source"], r["chunk_id"]): (r["n_docs"], r["chunk_tokens"])
        for r in refinery_plan(corpus, budget).collect()
    }


def _chunks_state(spark, chunks):
    return {
        (r["source"], r["chunk_id"]): (r["n_docs"], r["chunk_tokens"])
        for r in chunks.read(spark).collect()
    }


def test_sync_tracks_batch_through_promotion_and_deletes(spark, scratch):
    """Deterministic walk: bootstrap (eval present → rebuild), then
    incremental windows exercising keeper promotion (delete the min-id
    duplicate), gate flips (doc becomes junk), and source moves."""
    up = _mk_upstream(scratch)
    t = refinery_tables(os.path.join(scratch, "ref"))

    def ev(op, doc, ts, sent=0, reps=3, junk=False, source="web"):
        return {"op": op, "doc": doc, "ts": ts, "sent": sent, "reps": reps,
                "junk": junk, "source": source}

    # window 1: bootstrap — includes an eval doc (37) → rebuild path
    _apply(spark, up, [
        ev("insert", 1, 1), ev("insert", 2, 1),          # dup group (sent 0)
        ev("insert", 3, 1, sent=1),
        ev("insert", 37, 1, sent=2),                      # eval member
        ev("insert", 40, 1, sent=2),                      # contaminated
        ev("insert", 50, 1, sent=3, source="books"),
        ev("insert", 60, 1, junk=True),                   # gated out
    ], batch_id=1)
    m1 = sync_refinery(spark, up, t)
    assert m1.get("rebuilt") and m1.get("eval_touched")
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)

    # window 2: delete the keeper of the dup group → doc 2 promotes;
    # doc 3 turns junk → leaves the manifest. No eval change → incremental
    _apply(spark, up, [
        ev("delete", 1, 2),
        ev("update", 3, 2, junk=True),
    ], batch_id=2)
    m2 = sync_refinery(spark, up, t)
    assert not m2.get("rebuilt")
    assert m2["keeper_flips"] >= 1
    assert "web" in m2["affected_sources"]
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)

    # window 3: move a doc between sources; add a fresh duplicate pair
    _apply(spark, up, [
        ev("update", 50, 3, sent=3, source="web"),
        ev("insert", 70, 3, sent=1, source="books"),
        ev("insert", 71, 3, sent=1, source="books"),   # dup of 3's old text
    ], batch_id=3)
    m3 = sync_refinery(spark, up, t)
    assert not m3.get("rebuilt")
    assert set(m3["affected_sources"]) >= {"web", "books"}
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)

    # window 4: eval doc EDITED → contamination is corpus-wide → rebuild
    _apply(spark, up, [ev("update", 37, 4, sent=1)], batch_id=4)
    m4 = sync_refinery(spark, up, t)
    assert m4.get("rebuilt") and m4.get("eval_touched")
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)

    # idempotent re-sync: no new version upstream → no-op
    m5 = sync_refinery(spark, up, t)
    assert not m5["applied"]


event_st = st.fixed_dictionaries({
    "op": st.sampled_from(["insert", "update", "update", "delete"]),
    "doc": st.sampled_from([1, 2, 3, 37, 40, 74, 80]),  # 37/74 eval
    "ts": st.integers(1, 9),
    "sent": st.integers(0, 3),
    "reps": st.integers(2, 4),
    "junk": st.booleans(),
    "source": st.sampled_from(["web", "web", "books"]),
})


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=2, max_size=14),
       cut=st.integers(1, 13), seed=st.integers(0, 10**6))
def test_random_syncs_match_batch_recompute(spark, events, cut, seed):
    """Hypothesis pin: arbitrary event mixes over few keys (dup collisions,
    eval members, gate flips), split into two sync windows — after each
    sync the chunks table equals the batch refinery recompute."""
    d = os.path.join(SCRATCH, f"ex_{seed}_{len(events)}_{cut}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    up = _mk_upstream(d)
    t = refinery_tables(os.path.join(d, "ref"))

    w1, w2 = events[:cut], events[cut:]
    if w1:
        _apply(spark, up, w1, batch_id=1)
        sync_refinery(spark, up, t)
        assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)
    if w2:
        _apply(spark, up, w2, batch_id=2)
        sync_refinery(spark, up, t)
        assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, up)
    shutil.rmtree(d, ignore_errors=True)


def test_refinery_rides_the_relay_mirror_chain(spark, scratch):
    """The full live chain: upstream corpus → Debezium relay → mirror →
    incremental refinery synced OFF THE MIRROR. Three CDC hops, one
    equality pin: the chunks manifest equals the batch recompute over the
    mirror (== upstream) after each relay/mirror/sync tick."""
    from concept_catalog_etl_spark.sources.debezium import relay_debezium
    from concept_catalog_etl_spark.sources.relay_mirror import mirror_relay

    up = _mk_upstream(scratch)
    mirror = LakeTable.create(
        os.path.join(scratch, "mirror"),
        TableSchema.create(
            [("doc_id", "string"), ("text", "string"), ("source", "string")],
            key="doc_id"),
        n_buckets=4)
    dest = os.path.join(scratch, "relay")
    t = refinery_tables(os.path.join(scratch, "ref"))

    def ev(op, doc, ts, sent=0, reps=3, junk=False, source="web"):
        return {"op": op, "doc": doc, "ts": ts, "sent": sent, "reps": reps,
                "junk": junk, "source": source}

    mcfg = MergeConfig(tokens_fid=None, ntok_fid=None, source_fid=None,
                       write_mode="mor", writer_id="mirror")

    # tick 1: bootstrap (eval member present → rebuild path off the mirror)
    _apply(spark, up, [
        ev("insert", 1, 1), ev("insert", 2, 1),
        ev("insert", 37, 1, sent=2),
        ev("insert", 40, 1, sent=2),
    ], batch_id=1)
    relay_debezium(spark, up, dest)
    mirror_relay(spark, mirror, dest, cfg=mcfg)
    sync_refinery(spark, mirror, t)
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, mirror)
    assert _batch_manifest(spark, mirror) == _batch_manifest(spark, up)

    # tick 2: keeper deletion + a new source, relayed through the chain
    _apply(spark, up, [
        ev("delete", 1, 2),
        ev("insert", 70, 2, sent=3, source="books"),
    ], batch_id=2)
    relay_debezium(spark, up, dest)
    mirror_relay(spark, mirror, dest, cfg=mcfg)
    m = sync_refinery(spark, mirror, t)
    assert not m.get("rebuilt")
    assert _chunks_state(spark, t["chunks"]) == _batch_manifest(spark, mirror)
    assert _batch_manifest(spark, mirror) == _batch_manifest(spark, up)
