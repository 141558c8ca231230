"""Incrementally-maintained hyperplane-LSH ANN index (second rowview
instance). Pins: index == batch recompute across change mixes, O(changed)
sync writes, probes find their near-identical vector at sim≈1.0,
precision-1.0 (every emitted sim is the exact cosine), deletes leave the
index."""

import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.ann_index import ann_candidates, sync_index


def make_up(root):
    schema = TableSchema.create(
        [("doc_id", "string"), ("emb", "array<float>")], key="doc_id"
    )
    return LakeTable.create(os.path.join(root, "up"), schema, n_buckets=8)


def make_idx(root):
    schema = TableSchema.create(
        [("doc_id", "string"), ("codes", "array<int>"),
         ("emb", "array<float>"), ("norm", "double")], key="doc_id",
    )
    return LakeTable.create(os.path.join(root, "index"), schema, n_buckets=8)


def vec_rows(spark, n=120, start=0, phase=0.0, ts="2026-01-01 00:00:00", lsn_base=0):
    """Deterministic 64-dim unit-ish vectors: dim d of doc i = sin(i + d/7 + phase)."""
    return spark.range(start, start + n).select(
        F.format_string("v-%05d", F.col("id")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda d: F.sin(F.col("id") + d.cast("double") / 7.0 + F.lit(phase)),
        ).cast("array<float>").alias("emb"),
        F.lit(ts).cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn_base).alias("_lsn"),
    )


def test_sync_and_probe(spark, scratch):
    up, idx = make_up(scratch), make_idx(scratch)
    up.commit(add_files=up.write_data_files(vec_rows(spark, 120)), batch_id=0)
    res = sync_index(spark, up, idx)
    assert res["applied"] and res["rows_written"] == 120

    # probe = doc v-00037's vector, barely perturbed (phase 0.001): its own
    # row must come back as the top hit at sim ~ 1.0
    probe = vec_rows(spark, 1, start=37, phase=0.001).select(
        F.lit("probe-37").alias("doc_id"), "emb"
    )
    top = ann_candidates(spark, idx, probe, top_k=3).collect()
    assert top and top[0]["doc_id"] == "v-00037" and top[0]["sim"] > 0.999

    # incremental: change 4 vectors, delete 1 — O(changed) writes only
    upd = vec_rows(spark, 4, start=10, phase=2.5,
                   ts="2026-02-01 00:00:00", lsn_base=10_000)
    dead = vec_rows(spark, 1, start=50, ts="2026-02-01 00:00:00",
                    lsn_base=20_000).withColumn("_deleted", F.lit(True))
    up.commit(add_files=up.write_data_files(upd, delta=True), batch_id=1)
    up.commit(add_files=up.write_data_files(dead, delta=True), batch_id=2)
    res2 = sync_index(spark, up, idx)
    assert res2["applied"] and res2["rows_written"] == 5
    got = {r["doc_id"] for r in idx.read(spark).collect()}
    assert "v-00050" not in got and len(got) == 119

    # precision 1.0: every emitted sim equals the exact cosine recomputed
    # from the upstream's live vectors
    probe2 = vec_rows(spark, 1, start=11, phase=2.5).select(
        F.lit("probe-11").alias("doc_id"), "emb"
    )
    hits = ann_candidates(spark, idx, probe2, top_k=5).collect()
    assert hits and hits[0]["doc_id"] == "v-00011" and hits[0]["sim"] > 0.999
    live = {r["doc_id"]: list(r["emb"]) for r in up.read(spark).collect()}
    import math

    pe = [float(x) for x in probe2.collect()[0]["emb"]]
    for h in hits:
        ve = live[h["doc_id"]]
        dot = sum(a * b for a, b in zip(ve, pe))
        na = math.sqrt(sum(a * a for a in ve))
        nb = math.sqrt(sum(b * b for b in pe))
        assert abs(h["sim"] - round(dot / (na * nb), 6)) < 1e-4, h
