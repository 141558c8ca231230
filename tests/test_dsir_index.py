"""Incrementally-maintained DSIR selection stats + scores.

Pins: stats converge to a batch recompute of the live upstream after any
change mix (insert/update/delete/membership flip — preimage retraction
exact); zero-count buckets leave the table; exactly-once replay skip;
scores match a pure-Python recompute under the fixed-point LLR; drift is
0 for an unchanged snapshot and positive after skewed growth; rebuild
recovers a lagged stats table."""

import math
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable
from concept_catalog_etl_spark.operators.dsir_index import (
    dsir_stats_schema,
    llr_frame,
    rebuild_dsir_stats,
    score_documents,
    stats_drift,
    sync_dsir_stats,
)
from tests.helpers import make_table

D = 8  # tiny bucket count → collisions exercised


def make_stats(root):
    return LakeTable.create(
        os.path.join(root, "dsirstats"), dsir_stats_schema(), n_buckets=4)


def doc_rows(spark, docs, ts="2026-01-01 00:00:00", lsn_base=0):
    """docs: list of (doc_id, [tokens], source)."""
    rows = [
        (d, toks, len(toks), src, i + lsn_base)
        for i, (d, toks, src) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, _lsn long",
    )
    return df.withColumn("_event_ts", F.lit(ts).cast("timestamp"))


def expected_stats(spark, up):
    """Batch recompute from the live upstream snapshot."""
    out = {}
    for r in up.read(spark).collect():
        tgt = r["source"] == "curated"
        for t in r["tokens"] or []:
            b = t % D
            ct, cr = out.get(b, (0, 0))
            out[b] = (ct + (1 if tgt else 0), cr + (0 if tgt else 1))
    return out


def stats_state(spark, stats):
    return {
        r["b"]: (r["ct"], r["cr"])
        for r in stats.read(spark).collect()
    }


def expected_scores(spark, up, stats):
    """Pure-Python recompute of the fixed-point LLR scores."""
    st = stats_state(spark, stats)
    tt = sum(v[0] for v in st.values())
    tr = sum(v[1] for v in st.values())

    def llr(b):
        ct, cr = st.get(b, (0, 0))
        return (round(math.log((ct + 1) / (tt + D)) * 1e6)
                - round(math.log((cr + 1) / (tr + D)) * 1e6))

    out = {}
    for r in up.read(spark).collect():
        toks = r["tokens"] or []
        if not toks:
            continue
        out[r["doc_id"]] = (len(toks), sum(llr(t % D) for t in toks))
    return out


def test_initial_sync_builds_full_stats(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    docs = [("doc-a", [1, 2, 2, 9], "curated"),
            ("doc-b", [2, 4], "crawl"),
            ("doc-c", [17], "synthetic")]  # 17 % 8 == 1: collision with 9? 9%8=1, 17%8=1
    up.commit(add_files=up.write_data_files(doc_rows(spark, docs)), batch_id=0)
    res = sync_dsir_stats(spark, up, st, d=D)
    assert res["applied"]
    assert stats_state(spark, st) == expected_stats(spark, up)
    # replay skip
    assert not sync_dsir_stats(spark, up, st, d=D)["applied"]


def test_update_delete_and_membership_flip_retract_exactly(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    up.commit(add_files=up.write_data_files(doc_rows(spark, [
        ("doc-a", [1, 2, 3], "curated"),
        ("doc-b", [3, 4], "crawl"),
        ("doc-c", [5, 5], "crawl"),
    ])), batch_id=0)
    sync_dsir_stats(spark, up, st, d=D)

    # update tokens, flip membership, delete a doc — one window
    upd = doc_rows(spark, [("doc-a", [1, 7], "crawl")],
                   ts="2026-01-02 00:00:00", lsn_base=100)
    dele = spark.createDataFrame(
        [("doc-c",)], "doc_id string"
    ).select(
        "doc_id",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
        F.lit(200).cast("long").alias("_lsn"),
        F.lit("2026-01-02 00:00:00").cast("timestamp").alias("_event_ts"),
    ).withColumn("_deleted", F.lit(True))
    rows = upd.withColumn("_deleted", F.lit(False)).unionByName(dele)
    up.commit(add_files=up.write_data_files(rows, delta=True), batch_id=1)

    sync_dsir_stats(spark, up, st, d=D)
    exp = expected_stats(spark, up)
    got = stats_state(spark, st)
    assert got == exp
    # doc-c's tokens (5,5 → bucket 5) are fully retracted: bucket row gone
    assert 5 not in got


def test_multi_window_catchup_and_scores(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    for i, batch in enumerate([
        [("doc-%d" % k, [k, k + 1, k * 3], "curated" if k % 3 == 0 else "crawl")
         for k in range(10)],
        [("doc-%d" % k, [k * 2, 5], "crawl") for k in range(0, 10, 2)],
        [("doc-%d" % k, [k], "curated") for k in range(1, 10, 4)],
    ]):
        up.commit(add_files=up.write_data_files(
            doc_rows(spark, batch, ts=f"2026-01-0{i + 1} 00:00:00",
                     lsn_base=i * 1000), delta=True), batch_id=i)
    # ONE sync folds all three windows
    res = sync_dsir_stats(spark, up, st, d=D)
    assert res["applied"] and res["from_version"] == 0
    assert stats_state(spark, st) == expected_stats(spark, up)

    got = {
        r["doc_id"]: (r["n_occ"], r["logw_e6"])
        for r in score_documents(
            spark, up.read(spark), st, d=D).collect()
    }
    assert got == expected_scores(spark, up, st)


def test_scores_against_frozen_version_and_drift(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    up.commit(add_files=up.write_data_files(doc_rows(spark, [
        ("doc-a", [1, 2], "curated"), ("doc-b", [3, 4], "crawl"),
    ])), batch_id=0)
    sync_dsir_stats(spark, up, st, d=D)
    frozen = st.current_version()
    frozen_exp = expected_scores(spark, up, st)

    # unchanged snapshot: zero drift
    assert stats_drift(spark, st, frozen, d=D) == 0.0

    # skewed growth moves the raw distribution
    up.commit(add_files=up.write_data_files(doc_rows(
        spark, [("doc-%d" % k, [7, 7, 7], "crawl") for k in range(20)],
        ts="2026-01-05 00:00:00", lsn_base=500), delta=True), batch_id=1)
    sync_dsir_stats(spark, up, st, d=D)
    assert stats_drift(spark, st, frozen, d=D) > 0.0

    # scoring against the FROZEN version reproduces the frozen-era scores
    # for the docs that existed then
    got = {
        r["doc_id"]: (r["n_occ"], r["logw_e6"])
        for r in score_documents(
            spark, up.read(spark).where(F.col("doc_id").isin("doc-a", "doc-b")),
            st, d=D, version=frozen).collect()
    }
    assert got == frozen_exp


def test_llr_frame_is_d_bounded(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    up.commit(add_files=up.write_data_files(doc_rows(spark, [
        ("doc-%d" % k, list(range(k, k + 5)), "crawl") for k in range(30)
    ])), batch_id=0)
    sync_dsir_stats(spark, up, st, d=D)
    assert llr_frame(spark, st, d=D).count() <= D


def test_random_change_mix_converges(spark, scratch):
    import random

    up, st = make_table(scratch), make_stats(scratch)
    rng = random.Random(7)
    live = {}
    bid = 0
    for w in range(4):
        ops = []
        for _ in range(15):
            k = "doc-%d" % rng.randrange(12)
            if k in live and rng.random() < 0.25:
                ops.append((k, None, None))  # delete
                live.pop(k)
            else:
                toks = [rng.randrange(40) for _ in range(rng.randrange(1, 6))]
                src = rng.choice(["curated", "crawl", "synthetic"])
                ops.append((k, toks, src))
                live[k] = (toks, src)
        seen = set()
        rows = []
        for i, (k, toks, src) in enumerate(reversed(ops)):
            if k in seen:  # engine folds LWW within a batch; keep last only
                continue
            seen.add(k)
            rows.append((k, toks, src, len(ops) - i))
        df = spark.createDataFrame(
            [(k, t, len(t) if t else None, s, ln) for k, t, s, ln in rows],
            "doc_id string, tokens array<int>, n_tok int, source string, _lsn long",
        ).withColumn(
            "_event_ts",
            F.lit(f"2026-02-0{w + 1} 00:00:00").cast("timestamp"),
        ).withColumn("_deleted", F.col("tokens").isNull())
        up.commit(add_files=up.write_data_files(df, delta=True), batch_id=bid)
        bid += 1
        if w % 2 == 1:  # sync every other window (multi-window catchup)
            sync_dsir_stats(spark, up, st, d=D)
    sync_dsir_stats(spark, up, st, d=D)
    assert stats_state(spark, st) == expected_stats(spark, up)


def test_rebuild_recovers(spark, scratch):
    up, st = make_table(scratch), make_stats(scratch)
    up.commit(add_files=up.write_data_files(doc_rows(spark, [
        ("doc-a", [1, 2, 3], "curated"), ("doc-b", [4], "crawl"),
    ])), batch_id=0)
    rebuild_dsir_stats(spark, up, st, d=D)
    assert stats_state(spark, st) == expected_stats(spark, up)
    # incremental sync resumes from the rebuilt watermark
    up.commit(add_files=up.write_data_files(doc_rows(
        spark, [("doc-z", [6, 6], "crawl")], ts="2026-01-03 00:00:00",
        lsn_base=50), delta=True), batch_id=1)
    res = sync_dsir_stats(spark, up, st, d=D)
    assert res["applied"]
    assert stats_state(spark, st) == expected_stats(spark, up)


def test_stats_ride_streaming_maintenance(spark, scratch):
    """The DSIR stats stay live inside the streaming ingest loop via
    sync_derived (the same seam as the neardup/token indexes), through the
    tick's compaction/vacuum of the upstream, and the final stats equal a
    batch recompute of the final table state."""
    from concept_catalog_etl_spark.sources.binlog import generate_binlog
    from concept_catalog_etl_spark.streaming.replay import replay_stream

    up, st = make_table(scratch), make_stats(scratch)
    blog = os.path.join(scratch, "binlog")
    generate_binlog(blog, n_events=2000, n_docs=150, n_files=4, seed=19)
    replay_stream(
        spark, blog, up,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_files_per_trigger=1,
        maintenance_every=2,
        sync_derived=[lambda s: sync_dsir_stats(s, up, st, d=D)],
    )
    sync_dsir_stats(spark, up, st, d=D)  # catch-up past the last tick
    assert stats_state(spark, st) == expected_stats(spark, up)
