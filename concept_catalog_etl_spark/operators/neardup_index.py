"""Incrementally-maintained MinHash near-dup index over token sequences.

The CDC engine's tables hold pre-tokenized training sequences
(doc_id, tokens:array<int>, ...). Deduplication at 10^10 docs cannot
re-shingle the corpus every sync — this module keeps a MinHash signature
table (doc_id, mh:array<bigint>) live against the upstream via the
row-view sync (``operators/rowview.py``): only changed documents are
re-signed (O(changed rows) compute, one MoR delta write), deletes drop out
of the index through ordinary tombstones, and candidate lookup is the same
banded equi-join the batch query ``q_minhash_pairs`` uses.

Design choices:

- The index stores the k=32 MINHASH VALUES, not band keys: bands are
  contiguous slices of the signature, derived at query time, so band
  geometry (bands x rows-per-band — the precision/recall dial) can be
  re-tuned per query without rebuilding the index.
- Shingles are 3-token rolling windows hashed with a per-step-mod
  polynomial combine — pure JVM expression tree, no Python on the data
  path, and exactly reproducible in SQL (the oracle-exact pattern of
  ``q_minhash_pairs_poly``).
- Lookup explodes index and probe signatures into (band, v1, v2) rows and
  equi-joins: ONE shuffle keyed by the band tuple (bucketed, never
  all-pairs); a small probe side is broadcast so the index never shuffles
  at all. Candidates are then verified with the signature-overlap Jaccard
  estimate before crossing the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.vector import cap_hot_buckets
from ..lakehouse.table import LakeTable
from .rowview import sync_rowview

_P = 2_147_483_647
K = 32


def shingle_hashes(tokens_col) -> F.Column:
    """Distinct 3-token rolling shingle hashes (array<bigint>, pure JVM).

    Hash = per-step-mod polynomial combine of the 3 token ids; windows
    short of 3 tokens (doc shorter than a shingle) pad with 0, so every
    non-null tokens array yields at least one shingle deterministically.
    """
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))

    def sh(i):
        # try_element_at: windows near the tail (docs shorter than a
        # shingle) pad with 0 instead of tripping ANSI bounds checks
        t1 = F.coalesce(F.try_element_at(tokens_col, i + 1), F.lit(0)).cast("bigint")
        t2 = F.coalesce(F.try_element_at(tokens_col, i + 2), F.lit(0)).cast("bigint")
        t3 = F.coalesce(F.try_element_at(tokens_col, i + 3), F.lit(0)).cast("bigint")
        return ((t1 * 8191 + t2) % _P * 8191 + t3) % _P

    return F.array_distinct(F.transform(idx, sh))


def minhash_signature(tokens_col, k: int = K) -> F.Column:
    """k-permutation MinHash signature (array<bigint>) over token shingles —
    same affine-permutation family as the batch minhash queries."""
    hs = shingle_hashes(tokens_col)
    return F.array(*[
        F.array_min(
            F.transform(hs, lambda h: (h * (2 * i + 1) + F.lit(i * 7919)) % _P)
        )
        for i in range(k)
    ])


def signature_transform(df: DataFrame) -> DataFrame:
    """Row-view transform: upstream payload rows → index rows."""
    return df.select("doc_id", minhash_signature(F.col("tokens")).alias("mh"))


def sync_index(spark: SparkSession, upstream: LakeTable, index: LakeTable) -> dict:
    """Advance the signature index to the upstream's current version —
    re-signs ONLY changed documents (see module docstring)."""
    return sync_rowview(
        spark, upstream, index, signature_transform, writer_id="neardup_index"
    )


def _banded(df: DataFrame, id_alias: str, mh_col: str,
            bands: int, rows_per_band: int) -> DataFrame:
    arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.element_at(F.col(mh_col), b * rows_per_band + r + 1).alias(f"v{r}")
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ])
    return df.select(F.col("doc_id").alias(id_alias), F.explode(arr).alias("x")).select(
        id_alias, "x.*"
    )


def near_dup_candidates(
    spark: SparkSession,
    index: LakeTable,
    probes: DataFrame,
    bands: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.25,
    broadcast_probes: bool = True,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Banded-LSH candidate lookup: for each probe document (doc_id, tokens)
    return indexed docs sharing any band, with the signature-estimate
    Jaccard, filtered to ``threshold``. Probe signatures are computed on the
    fly (the probe set is typically an incoming batch, not yet indexed);
    self-matches are excluded so an indexed batch can probe itself.

    ``max_bucket_size`` drops DEGENERATE index buckets (a (band, values)
    key holding more than that many docs — boilerplate/empty-doc clusters)
    before the join: one hot bucket of b docs emits b candidates per
    matching probe, so an unbounded bucket turns the lookup quadratic at
    corpus scale (standard LSH hygiene; the docs in a dropped bucket still
    collide with probes in their other 15 bands, so recall degrades only
    for docs near-identical to >max_bucket_size others — which are exactly
    the docs exact-dedup already removes)."""
    assert bands * rows_per_band <= K
    idx = index.read(spark).select("doc_id", "mh")
    pr = probes.select(
        F.col("doc_id").alias("probe_id"),
        minhash_signature(F.col("tokens")).alias("pmh"),
    )
    ib = cap_hot_buckets(
        _banded(idx, "doc_id", "mh", bands, rows_per_band),
        ["band"] + [f"v{r}" for r in range(rows_per_band)],
        max_bucket_size,
    )
    pb = _banded(
        pr.select(F.col("probe_id").alias("doc_id"), F.col("pmh").alias("mh")),
        "probe_id", "mh", bands, rows_per_band,
    )
    if broadcast_probes:
        pb = F.broadcast(pb)
    on = ["band"] + [f"v{r}" for r in range(rows_per_band)]
    cand = (
        ib.join(pb, on)
        .where(F.col("doc_id") != F.col("probe_id"))
        .select("probe_id", "doc_id")
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("mh", "pmh", lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(K)
    return (
        cand.join(idx, "doc_id")
        .join(F.broadcast(pr) if broadcast_probes else pr, "probe_id")
        .select("probe_id", "doc_id", F.round(est, 4).alias("jac_est"))
        .where(F.col("jac_est") >= threshold)
    )
