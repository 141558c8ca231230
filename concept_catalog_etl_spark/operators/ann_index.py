"""Incrementally-maintained hyperplane-LSH ANN index over embeddings.

The second row-view instance (see ``operators/rowview.py``; the first is
the token MinHash index): a derived table keyed like the upstream holding,
per document, its ``n_tables x bits`` random-hyperplane bucket codes, its
embedding and its precomputed norm. CDC churn re-signs only changed rows;
deletes tombstone out; exactly-once rides the row-view ledger.

Query path mirrors the batch ``q_ann_lsh`` (plans/queries.py): probe
vectors are coded with the SAME seeded planes, candidates meet in ONE
(table, code)-keyed equi-join (OR-construction — a candidate collides in
any table), and survivors are verified with the exact cosine computed from
the STORED embedding+norm, so results are a subset of brute force by
construction (precision 1.0; recall set by n_tables x bits, the standard
LSH dial — at 10^10 vectors you'd run 24-28 bits and more tables).

Pure JVM end to end: plane dot products are expression trees over
literals, cosine is a zip_with/aggregate fold — no Python on the data
path.

Index rows PERSIST norms computed by signature_transform, so the stored
values are pinned to the fold in functions/vector.py at write time: if
that fold's arithmetic ever changes (e.g. element cast width), run
``rebuild_rowview`` — mixing index generations would make round(sim, 6)
differ in the last digit across rows near a threshold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vector import cap_hot_buckets, dot as _dot
from ..lakehouse.table import LakeTable
from .rowview import sync_rowview

N_TABLES = 16
BITS = 4
DIM = 64
SEED = 42


def _planes(n_tables: int = N_TABLES, bits: int = BITS, dim: int = DIM,
            seed: int = SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_tables * bits, dim))


def _codes_expr(emb_col, planes: np.ndarray, n_tables: int, bits: int):
    def code_of(t):
        sig = None
        for b in range(bits):
            arr = F.array(*[F.lit(float(x)) for x in planes[t * bits + b]])
            bit = (_dot(emb_col, arr) > 0).cast("int")
            sig = bit if sig is None else sig * 2 + bit
        return sig

    return F.array(*[code_of(t) for t in range(n_tables)])


def signature_transform(df: DataFrame) -> DataFrame:
    """Row-view transform: (doc_id, emb, ...) → index row."""
    planes = _planes()
    emb = F.col("emb")
    return df.select(
        "doc_id",
        _codes_expr(emb, planes, N_TABLES, BITS).alias("codes"),
        emb.alias("emb"),
        F.sqrt(_dot(emb, emb)).alias("norm"),
    )


def sync_index(spark: SparkSession, upstream: LakeTable, index: LakeTable) -> dict:
    return sync_rowview(
        spark, upstream, index, signature_transform, writer_id="ann_index"
    )


def ann_candidates(
    spark: SparkSession,
    index: LakeTable,
    probes: DataFrame,
    top_k: int = 5,
    min_sim: float = 0.0,
    broadcast_probes: bool = True,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Top-k approximate nearest neighbours per probe (doc_id, emb):
    bucket collision in any table → exact-cosine verify → per-probe top-k.
    ``max_bucket_size`` drops degenerate buckets (near-zero vectors all
    code to the same cell) before the join, the same hot-bucket hygiene as
    the MinHash lookup."""
    planes = _planes()
    idx = index.read(spark).select("doc_id", "codes", "emb", "norm")
    pr = probes.select(
        F.col("doc_id").alias("probe_id"),
        _codes_expr(F.col("emb"), planes, N_TABLES, BITS).alias("pcodes"),
        F.col("emb").alias("pemb"),
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("pnorm"),
    )

    def banded(df, id_col, codes_col):
        arr = F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     F.element_at(F.col(codes_col), t + 1).alias("code"))
            for t in range(N_TABLES)
        ])
        return df.select(id_col, F.explode(arr).alias("x")).select(id_col, "x.*")

    ib = cap_hot_buckets(banded(idx, "doc_id", "codes"), ["tbl", "code"],
                         max_bucket_size)
    pb = banded(pr.withColumnRenamed("probe_id", "doc_id")
                  .withColumnRenamed("pcodes", "codes"), "doc_id", "codes") \
        .withColumnRenamed("doc_id", "probe_id")
    if broadcast_probes:
        pb = F.broadcast(pb)
    cand = (
        ib.join(pb, ["tbl", "code"])
        .where(F.col("doc_id") != F.col("probe_id"))
        .select("probe_id", "doc_id")
        .distinct()
    )
    sim = F.round(
        _dot(F.col("emb"), F.col("pemb")) / (F.col("norm") * F.col("pnorm")), 6
    )
    scored = (
        cand.join(idx.select("doc_id", "emb", "norm"), "doc_id")
        .join(F.broadcast(pr.select("probe_id", "pemb", "pnorm"))
              if broadcast_probes else pr.select("probe_id", "pemb", "pnorm"),
              "probe_id")
        .select("probe_id", "doc_id", sim.alias("sim"))
        .where(F.col("sim") >= min_sim)
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .drop("rk")
    )
