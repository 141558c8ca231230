"""Incrementally-maintained DSIR selection stats + importance scores.

Data selection via importance resampling (the batch query
``q_dsir_weights``, Xie et al. 2023) needs two artifacts: per-feature-bucket
occurrence counts for the target and raw distributions, and a per-document
importance weight. At 10^10 documents neither can be recomputed per sync —
this module keeps BOTH live against a CDC table via the change feed:

* **Bucket stats** (fourth instance of the change-feed-consumer pattern,
  after aggregate IVM / rowview / posting lists): each changed document's
  token-feature occurrences are signed (+post, −preimage) and folded into a
  stats LakeTable keyed by bucket — ``operators/incremental.apply_deltas``
  does the bucket-pruned CoW apply with the exactly-once ledger. Sync cost
  is O(tokens of changed docs); the stats table itself is D-bounded
  (default 2048 rows) regardless of corpus size.

* **Scores** are computed per document against a FROZEN stats version: the
  LLR table derives from one stats read (broadcastable by construction),
  and only changed documents need re-scoring — the standard DSIR serving
  discipline, because re-scoring the corpus on every count drift would be
  O(corpus) per sync. The freshness contract is explicit: ``stats_drift``
  measures symmetric KL between the frozen and current bucket
  distributions (the stats table's own time travel provides the frozen
  side), and the caller re-freezes + re-scores when it exceeds a
  threshold. Unchanged-doc scores are stale ONLY in LLR terms bounded by
  that drift — never in document terms.

Feature = token id folded into D buckets (pmod — the hashing trick over an
integer vocabulary; collisions are inherent and harmless at D << vocab).
Fixed-point LLR snapping (round(ln·1e6) as BIGINT, summed exactly) keeps
scores bit-identical across engines and partitionings — the
q_unigram_logprob discipline.

Target membership is a row predicate over the upstream payload (default:
``source == 'curated'``) — it must depend only on columns carried by the
change feed (payload + preimage), so membership flips (an update moving a
doc between corpora) retract from one distribution and add to the other in
the same window.

Reference analog: the reference tags each record with a derived source
field and upserts it (/root/reference/files/transform.py:11-25,
load.py:20-22); this keeps corpus-level statistics OF those tags live.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..lakehouse.schema import TableSchema
from ..lakehouse.table import LakeTable
from .incremental import apply_deltas

WATERMARK_PROP = "ivm_upstream_version"
D_PROP = "dsir_feature_buckets"
DEFAULT_D = 2048


def dsir_stats_schema() -> TableSchema:
    return TableSchema.create(
        [("b", "int"), ("ct", "bigint"), ("cr", "bigint"),
         ("n_occ", "bigint")],
        key="b",
    )


def default_target() -> Column:
    return F.col("source") == "curated"


def _bucket(tok, d: int) -> Column:
    return F.pmod(tok.cast("bigint"), F.lit(d)).cast("int")


def _signed_occurrences(rows: DataFrame, tokens_col: str, is_tgt: Column,
                        d: int, sign: int) -> DataFrame:
    """(b, ±ct, ±cr, ±n_occ) per token occurrence of ``rows``."""
    occ = rows.where(F.col(tokens_col).isNotNull()).select(
        is_tgt.alias("_t"), F.explode(F.col(tokens_col)).alias("_tok")
    )
    s = F.lit(sign).cast("bigint")
    return occ.select(
        _bucket(F.col("_tok"), d).alias("b"),
        F.when(F.col("_t"), s).otherwise(0).alias("ct"),
        F.when(~F.col("_t"), s).otherwise(0).alias("cr"),
        s.alias("n_occ"),
    )


def token_bucket_deltas(changes: DataFrame, d: int,
                        target: Column | None = None,
                        tokens_col: str = "tokens") -> DataFrame:
    """Signed per-bucket (ct, cr, n_occ) deltas of a preimage-bearing
    change window. One explode per image side, one map-side-combinable
    agg — O(tokens of changed docs), never O(corpus)."""
    target = default_target() if target is None else target
    pre_names = [c[len("_pre_"):] for c in changes.columns
                 if c.startswith("_pre_")]
    if tokens_col not in pre_names:
        raise ValueError(
            "changes lacks _pre_* payload — call "
            "read_changes(..., include_preimage=True)")
    post = _signed_occurrences(
        changes.where(F.col("_change_type").isin("insert", "update")),
        tokens_col, target, d, +1)
    pre_rows = changes.where(
        F.col("_change_type").isin("update", "delete")
    ).select(*[F.col(f"_pre_{c}").alias(c) for c in pre_names])
    pre = _signed_occurrences(pre_rows, tokens_col, target, d, -1)
    out = (
        post.unionByName(pre)
        .groupBy("b")
        .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"),
             F.sum("n_occ").alias("n_occ"))
    )
    return out.where(
        (F.col("ct") != 0) | (F.col("cr") != 0) | (F.col("n_occ") != 0))


def sync_dsir_stats(
    spark: SparkSession,
    upstream: LakeTable,
    stats: LakeTable,
    d: int = DEFAULT_D,
    target: Column | None = None,
    tokens_col: str = "tokens",
    writer_id: str = "dsir_stats",
) -> dict:
    """Advance the bucket-stats table to the upstream's current version.
    Same watermark/ledger contract as the other change-feed consumers: the
    synced-through version commits atomically with the state, a re-run
    window ledger-skips, and lagging past upstream vacuum retention raises
    ``VersionVacuumedError`` (recovery: ``rebuild_dsir_stats``)."""
    to_v = upstream.current_version()
    from_v = int(stats.properties().get(WATERMARK_PROP, 0))
    if to_v == from_v or stats.is_committed(to_v, writer_id):
        return {"applied": False, "from_version": from_v, "to_version": to_v}
    changes = upstream.read_changes(
        spark, from_version=from_v, to_version=to_v, include_preimage=True)
    deltas = token_bucket_deltas(changes, d, target, tokens_col)
    snap = apply_deltas(
        spark, stats, deltas, batch_id=to_v, count_col="n_occ",
        writer_id=writer_id,
        extra_props={WATERMARK_PROP: to_v, D_PROP: d})
    return {"applied": snap is not None,
            "from_version": from_v, "to_version": to_v}


def rebuild_dsir_stats(
    spark: SparkSession,
    upstream: LakeTable,
    stats: LakeTable,
    d: int = DEFAULT_D,
    target: Column | None = None,
    tokens_col: str = "tokens",
    writer_id: str = "dsir_stats",
) -> dict:
    """Full re-derivation from the live upstream snapshot — recovery when
    the incremental window is vacuumed away. One O(corpus) pass; the
    result atomically supersedes all prior stats state."""
    from ..lakehouse.table import bucket_expr

    target = default_target() if target is None else target
    to_v = upstream.current_version()
    rows = (
        _signed_occurrences(upstream.read(spark), tokens_col, target, d, +1)
        .groupBy("b")
        .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"),
             F.sum("n_occ").alias("n_occ"))
        .withColumn("_deleted", F.lit(False))
        .withColumn("_event_ts", F.timestamp_seconds(F.lit(to_v)))
        .withColumn("_lsn", F.lit(to_v).cast("long"))
        .withColumn("_bucket", bucket_expr("b", stats.n_buckets()))
    )
    expect = stats.current_version()
    files = stats.write_data_files(rows)
    stats.commit_with_retry(
        add_files=files,
        remove_buckets=set(range(stats.n_buckets())),
        batch_id=to_v,
        writer_id=writer_id,
        expect_version=expect,
        extra_props={WATERMARK_PROP: to_v, D_PROP: d},
    )
    return {"applied": True, "rebuilt": True, "to_version": to_v}


def llr_frame(spark: SparkSession, stats: LakeTable, d: int = DEFAULT_D,
              version: int | None = None) -> DataFrame:
    """(b, llr_e6) from a stats snapshot (``version`` = frozen read via
    time travel; None = current). D-bounded — broadcast it at any corpus
    size. Laplace smoothing means absent buckets have a well-defined
    default; ``score_documents`` fills it via the same formula."""
    s = stats.read(spark, version=version)
    tot = s.agg(F.sum("ct").cast("double").alias("_tt"),
                F.sum("cr").cast("double").alias("_tr"))
    return s.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.round(F.log((F.col("ct") + 1) / (F.col("_tt") + d)) * 1e6, 0)
            - F.round(F.log((F.col("cr") + 1) / (F.col("_tr") + d)) * 1e6, 0)
        ).cast("bigint").alias("llr_e6"),
    )


def score_documents(spark: SparkSession, docs: DataFrame, stats: LakeTable,
                    d: int = DEFAULT_D, version: int | None = None,
                    tokens_col: str = "tokens",
                    doc_col: str = "doc_id") -> DataFrame:
    """Importance weight per document of ``docs`` against a (frozen) stats
    snapshot: (doc_id, n_occ, logw_e6). Pass the CHANGED docs after a sync
    — scoring is row-local given the broadcast LLR table, so incremental
    re-scoring costs O(changed docs)."""
    # absent buckets score as count-0 under the same smoothing — derived
    # from the same 1-row totals so the default is exactly consistent
    s = stats.read(spark, version=version)
    tot = s.agg(F.sum("ct").cast("double").alias("_tt"),
                F.sum("cr").cast("double").alias("_tr"))
    default = tot.select(
        (
            F.round(F.log(1 / (F.col("_tt") + d)) * 1e6, 0)
            - F.round(F.log(1 / (F.col("_tr") + d)) * 1e6, 0)
        ).cast("bigint").alias("_dflt"))
    occ = docs.where(F.col(tokens_col).isNotNull()).select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.col(tokens_col)).alias("_tok"),
    ).select("doc_id", _bucket(F.col("_tok"), d).alias("b"))
    llr = llr_frame(spark, stats, d, version)
    return (
        occ.join(F.broadcast(llr), "b", "left")
        .crossJoin(F.broadcast(default))
        .select("doc_id", F.coalesce("llr_e6", "_dflt").alias("llr_e6"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_occ"),
             F.sum("llr_e6").cast("bigint").alias("logw_e6"))
    )


def stats_drift(spark: SparkSession, stats: LakeTable,
                frozen_version: int, d: int = DEFAULT_D) -> float:
    """Symmetric KL divergence between the frozen and current bucket
    distributions (pooled ct+cr mass, Laplace-smoothed) — the re-freeze
    trigger. O(D) work off two metadata-pruned stats reads; returns 0.0
    when the state is unchanged."""
    cur = stats.read(spark).select("b", (F.col("ct") + F.col("cr")).alias("n"))
    old = stats.read(spark, version=frozen_version).select(
        "b", (F.col("ct") + F.col("cr")).alias("n"))
    j = cur.alias("c").join(old.alias("o"), "b", "full_outer").select(
        F.coalesce(F.col("c.n"), F.lit(0)).alias("nc"),
        F.coalesce(F.col("o.n"), F.lit(0)).alias("no"),
    )
    tots = j.agg(F.sum("nc").alias("tc"), F.sum("no").alias("to")).first()
    tc, to = (tots["tc"] or 0) + d, (tots["to"] or 0) + d
    r = j.select(
        ((F.col("nc") + 1) / F.lit(float(tc))).alias("p"),
        ((F.col("no") + 1) / F.lit(float(to))).alias("q"),
    ).agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
        .alias("skl")
    ).first()
    return float(r["skl"] or 0.0)
