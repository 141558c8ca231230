"""Incrementally-maintained refinery (round-5 verdict task 5): the fifth
change-feed consumer, after aggregate IVM / rowview / posting lists / DSIR
stats. The batch refinery (``plans.queries.refinery_plan``: quality gate →
exact dedup → decontamination → packing) recomputes from the full corpus;
this module keeps its OUTPUT — the training-batch chunk manifest — live
against a CDC corpus table, recomputing only what a sync window can have
changed.

State (four LakeTables, all exactly-once via the per-writer ledger):

* ``groups`` (key ``h`` = md5(lower(text))): the duplicate-group
  membership each content hash has among GATED docs, with the keeper
  (min doc_id) — the state that makes keeper PROMOTION O(touched groups)
  when a keeper is deleted/edited, instead of O(corpus). Groups are
  sorted-capped at ``GROUP_CAP`` members; an overflowing group keeps an
  exact ``n_total`` and the smallest ``GROUP_CAP`` members (the keeper and
  every possible promotion candidate live in the kept prefix unless the
  whole prefix empties, which raises with a rebuild instruction).
* ``eval_shingles`` (key ``sh``): occurrence counts of the eval split's
  3-word shingles (eval membership is ``doc_id % 37 == 0`` — derived from
  the id, so only an eval doc's own edit moves this table). KB-scale by
  construction; broadcast at probe time.
* ``docs_state`` (key ``(source, doc_id)``, partitioned
  ``identity(source)``): one row per CANDIDATE doc (gated, non-eval) with
  its token count and the resolved ``clean`` flag (keeper ∧
  ¬contaminated). Partitioning by the leading key component makes the
  per-source repack a partition-pruned scan.
* ``chunks`` (key ``(source, chunk_id)``): the manifest itself, converged
  per AFFECTED source through ``reconcile_snapshot`` with a
  ``delete_condition`` scoped to those sources.

Cost model per sync: O(changed docs) row-local recompute + O(touched
duplicate groups) point lookups + O(size of affected sources) for the
repack — the last term is inherent to greedy packing (inserting a doc
shifts every later chunk in its source; the batch query documents the
(source, shard) sharding that bounds it at 100 TB). An EVAL-side text
change can invalidate contamination corpus-wide, so it takes the
documented degradation path: the sync detects it and falls back to
``rebuild_refinery`` (full batch recompute, atomic supersede) — eval
splits are small and near-static, so this is rare by construction.

Reference analog: the reference repairs records one at a time and upserts
them (files/transform.py:11-25, load.py:20-22); this keeps the CORPUS-
level derived artifact those upserts feed (the training manifest) equally
live.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..lakehouse.schema import TableSchema
from ..lakehouse.table import LakeTable
from .envelope import SCHEMA_CHANGE_T, payload_struct
from .incremental import apply_deltas
from .merge import MergeConfig, apply_batch
from .reconcile import reconcile_snapshot

WATERMARK_PROP = "ivm_upstream_version"
GROUP_CAP = 256
EVAL_MOD = 37
BUDGET = 512

W_GROUPS = "refinery_groups"
W_EVAL = "refinery_eval"
W_DOCS = "refinery_docs"
W_CHUNKS = "refinery_chunks"


# ---------------------------------------------------------------------------
# row-local text derivations — EXACTLY refinery_plan's formulas
# ---------------------------------------------------------------------------

def _words(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def _gate(text: Column) -> Column:
    w = _words(text)
    n = F.size(w)
    sum_len = F.aggregate(w, F.lit(0).cast("bigint"),
                          lambda a, x: a + F.length(x))
    alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    has_stop = F.exists(
        w, lambda x: x.isin("the", "a", "and", "of", "to", "in"))
    return (
        n.between(10, 1000)
        & F.round(sum_len / n, 4).between(2.0, 12.0)
        & (F.round(alpha / n, 4) >= 0.8)
        & has_stop
    )


def _ntok(text: Column) -> Column:
    return F.size(_words(text)).cast("bigint")


def _h(text: Column) -> Column:
    return F.md5(F.lower(text))


def _shingles(text: Column) -> Column:
    w = _words(text)
    n = F.size(w)
    return F.array_distinct(F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - 2),
                    lambda i: F.concat_ws(" ", F.slice(w, i, 3))),
    ).otherwise(F.expr("CAST(array() AS array<string>)")))


def _is_eval(doc_id: Column) -> Column:
    return doc_id % EVAL_MOD == 0


# ---------------------------------------------------------------------------
# state-table creation
# ---------------------------------------------------------------------------

def refinery_tables(root: str, n_buckets: int = 8) -> dict[str, LakeTable]:
    """Create the four state tables under ``root`` (groups / eval_shingles
    / docs_state / chunks)."""
    import os

    groups = LakeTable.create(
        os.path.join(root, "groups"),
        TableSchema.create(
            [("h", "string"),
             ("members", "array<struct<doc_id:bigint,source:string>>"),
             ("keeper", "bigint"), ("n_total", "bigint")],
            key="h"),
        n_buckets=n_buckets)
    ev = LakeTable.create(
        os.path.join(root, "eval_shingles"),
        TableSchema.create([("sh", "string"), ("cnt", "bigint")], key="sh"),
        n_buckets=n_buckets)
    docs = LakeTable.create(
        os.path.join(root, "docs_state"),
        TableSchema.create(
            [("source", "string"), ("doc_id", "bigint"),
             ("n", "bigint"), ("clean", "boolean")],
            key=["source", "doc_id"]),
        n_buckets=n_buckets,
        partition_spec={"column": "source", "transform": "identity"})
    chunks = LakeTable.create(
        os.path.join(root, "chunks"),
        TableSchema.create(
            [("source", "string"), ("chunk_id", "bigint"),
             ("n_docs", "bigint"), ("chunk_tokens", "bigint")],
            key=["source", "chunk_id"]),
        n_buckets=n_buckets)
    return {"groups": groups, "eval_shingles": ev, "docs_state": docs,
            "chunks": chunks}


# ---------------------------------------------------------------------------
# envelope builder (columnar change batch for apply_batch)
# ---------------------------------------------------------------------------

def _envelope(table: LakeTable, rows: DataFrame, op: Column,
              to_v: int) -> DataFrame:
    """rows (key cols + payload cols + ``op`` expression) → columnar change
    envelope. Coordinates are (to_v as epoch seconds, 0) — monotone across
    syncs, so later windows always win LWW against earlier state."""
    schema = table.schema()
    pstruct = payload_struct(schema)
    payload = F.when(
        op == "delete", F.lit(None).cast(pstruct)
    ).otherwise(F.struct(*[
        (F.col(f.name) if f.name in rows.columns else F.lit(None))
        .cast(f.dataType).alias(f.name)
        for f in pstruct.fields
    ]))
    return rows.select(
        op.alias("op"),
        *[F.col(k) for k in schema.key_names],
        F.timestamp_seconds(F.lit(int(to_v))).alias("event_ts"),
        F.lit(0).cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        payload.alias("payload"),
        F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
    )


def _coord(to_v: int):
    """Deterministic LWW coordinate for window ``to_v``: epoch + to_v
    seconds. EVERY write in this module (incremental envelopes AND the
    rebuild reconciles) uses this regime — mixing it with wall-clock
    coordinates would let an older regime's rows  outrank newer syncs."""
    import datetime as dt

    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=int(to_v))


def _cfg(table: LakeTable, writer: str) -> MergeConfig:
    # the state tables' `source` column is an ORDINARY payload column (the
    # corpus source tag, e.g. "web"/"books") — explicitly None-out the
    # canonical-trio fids so MergeConfig.for_table's name-resolution does
    # not canonicalize it to crawl/curated/synthetic
    return MergeConfig(write_mode="mor", writer_id=writer,
                       tokens_fid=None, ntok_fid=None, source_fid=None)


# ---------------------------------------------------------------------------
# sync
# ---------------------------------------------------------------------------

def sync_refinery(
    spark: SparkSession,
    upstream: LakeTable,
    tables: dict[str, LakeTable],
    text_col: str = "text",
    source_col: str = "source",
    doc_col: str = "doc_id",
    budget: int = BUDGET,
) -> dict:
    """Advance the refinery state to the upstream's current version.

    Same watermark/ledger contract as the other change-feed consumers:
    each state table ledger-skips replayed windows, so a crash between the
    four commits converges on re-run. Returns sync metrics; when the
    window touched the EVAL split it reports ``{"rebuilt": True}`` (full
    batch recompute — see module docstring)."""
    groups, evt = tables["groups"], tables["eval_shingles"]
    docs_state, chunks = tables["docs_state"], tables["chunks"]
    to_v = upstream.current_version()
    from_v = int(chunks.properties().get(WATERMARK_PROP, 0))
    if to_v == from_v:
        return {"applied": False, "from_version": from_v, "to_version": to_v}

    changes = upstream.read_changes(
        spark, from_version=from_v, to_version=to_v, include_preimage=True)
    did = F.col(doc_col).cast("bigint")

    post = changes.where(F.col("_change_type").isin("insert", "update")).select(
        did.alias("doc_id"), F.col(source_col).alias("source"),
        F.col(text_col).alias("text"))
    # the key rides unchanged on every change row (it IS the row identity),
    # so the preimage re-uses it; only payload columns have _pre_ twins
    pre = changes.where(F.col("_change_type").isin("update", "delete")).select(
        did.alias("doc_id"),
        F.col(f"_pre_{source_col}").alias("source"),
        F.col(f"_pre_{text_col}").alias("text"))

    # ---- eval-side detection: any changed doc in the eval split --------
    eval_touched = not post.unionByName(pre).where(
        _is_eval(F.col("doc_id"))).isEmpty()
    if eval_touched:
        out = rebuild_refinery(spark, upstream, tables, text_col=text_col,
                               source_col=source_col, doc_col=doc_col,
                               budget=budget)
        out["eval_touched"] = True
        return out

    # ---- membership deltas + group recompute ---------------------------
    mem = (
        post.where(_gate(F.col("text"))).select(
            _h(F.col("text")).alias("h"), "doc_id", "source",
            F.lit(1).alias("sgn"))
        .unionByName(pre.where(_gate(F.col("text"))).select(
            _h(F.col("text")).alias("h"), "doc_id", "source",
            F.lit(-1).alias("sgn")))
        .groupBy("h", "doc_id", "source")
        .agg(F.sum("sgn").alias("net"))
        .where(F.col("net") != 0)
    ).cache()
    touched_h = [r["h"] for r in mem.select("h").distinct().collect()]

    flips: list[tuple] = []           # (doc_id, source, promoted?)
    affected_sources: set[str] = set()
    group_rows = []                   # (h, members, keeper, n_total, op)
    if touched_h:
        old = {
            r["h"]: r
            for r in groups.read(spark, keys=touched_h).collect()
        }
        net = {}
        for r in mem.collect():       # O(changed gated docs) — sync-window
            net.setdefault(r["h"], []).append(r)
        for h in touched_h:
            o = old.get(h)
            members = {(m["doc_id"], m["source"])
                       for m in (o["members"] if o else [])}
            n_total = int(o["n_total"]) if o else 0
            old_keeper = int(o["keeper"]) if o else None
            for r in net.get(h, []):
                n_total += int(r["net"])
                if r["net"] > 0:
                    members.add((r["doc_id"], r["source"]))
                else:
                    members.discard((r["doc_id"], r["source"]))
            if n_total < 0:
                raise RuntimeError(
                    f"group {h!r} membership went negative — state is "
                    "corrupt; run rebuild_refinery")
            if n_total > 0 and not members:
                raise RuntimeError(
                    f"group {h!r} overflowed its {GROUP_CAP}-member cap and "
                    "every tracked member was removed — keeper unknown; "
                    "run rebuild_refinery")
            kept = sorted(members)[:GROUP_CAP]
            keeper = kept[0][0] if kept else None
            if o is not None and old_keeper != keeper:
                demoted = next(
                    (m for m in members | set(kept) if m[0] == old_keeper),
                    None)
                if demoted is not None:
                    flips.append((demoted[0], demoted[1], False))
                if keeper is not None:
                    flips.append((keeper, next(
                        s for d, s in kept if d == keeper), True))
            elif o is None and keeper is not None:
                pass  # brand-new group: its keeper is a changed doc anyway
            if n_total == 0:
                group_rows.append((h, None, None, 0, "delete"))
            else:
                group_rows.append((
                    h,
                    [{"doc_id": d, "source": s} for d, s in kept],
                    keeper, n_total, "update"))
        gdf = spark.createDataFrame(
            group_rows,
            "h string, members array<struct<doc_id:bigint,source:string>>, "
            "keeper bigint, n_total bigint, _op string")
        apply_batch(spark, groups,
                    _envelope(groups, gdf, F.col("_op"), to_v),
                    batch_id=to_v, cfg=_cfg(groups, W_GROUPS))
    # keepers of touched groups (for changed docs' clean flag)
    keeper_of = {g[0]: g[2] for g in group_rows}

    # ---- eval_shingles: nothing to do (eval untouched this window) -----

    # ---- docs_state updates --------------------------------------------
    ev_set = F.broadcast(evt.read(spark).where(F.col("cnt") > 0).select("sh"))

    def _with_contam(df: DataFrame) -> DataFrame:
        """df(doc_id, source, text, n, h) + contam flag via one broadcast
        probe of the doc's shingles against the eval set."""
        sh = df.select("doc_id", "source",
                       F.explode_outer(_shingles(F.col("text"))).alias("sh"))
        hits = (sh.join(ev_set, "sh", "left_semi")
                .select("doc_id", "source").distinct()
                .withColumn("contam", F.lit(True)))
        return df.join(hits, ["doc_id", "source"], "left").withColumn(
            "contam", F.coalesce("contam", F.lit(False)))

    post_cand = post.where(_gate(F.col("text")) & ~_is_eval(F.col("doc_id"))) \
        .select("doc_id", "source", "text", _ntok(F.col("text")).alias("n"),
                _h(F.col("text")).alias("h"))
    post_cand = _with_contam(post_cand).cache()
    # keeper per content hash: touched groups come from the recompute
    # above; a payload-only update (same text → membership nets to zero →
    # group untouched) still needs its group's keeper — point-lookup the
    # remainder from the groups table (O(changed docs) keys)
    cand_hs = {r["h"] for r in post_cand.select("h").distinct().collect()}
    keeper_map = {h: k for h, k in keeper_of.items() if k is not None}
    rest = sorted(cand_hs - set(keeper_of))
    if rest:
        for r in groups.read(spark, keys=rest).collect():
            keeper_map[r["h"]] = int(r["keeper"])
    keeper_df = spark.createDataFrame(
        list(keeper_map.items()) or [(None, None)],
        "h string, _keeper bigint")
    post_cand = post_cand.join(F.broadcast(keeper_df), "h", "left")
    upserts = post_cand.select(
        "source", "doc_id", "n",
        ((F.col("doc_id") == F.col("_keeper")) & ~F.col("contam"))
        .alias("clean"),
        F.lit("update").alias("_op"))

    # rows to DELETE from docs_state: pre-image candidates whose post form
    # is gone (deleted) or no longer a candidate
    pre_cand = pre.where(_gate(F.col("text")) & ~_is_eval(F.col("doc_id"))) \
        .select("doc_id", "source")
    gone = pre_cand.join(upserts.select("doc_id", "source"),
                         ["doc_id", "source"], "left_anti").select(
        "source", "doc_id",
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("boolean").alias("clean"),
        F.lit("delete").alias("_op"))

    # keeper flips touching docs OUTSIDE the sync window: point-lookup
    # their text upstream (O(flips)) to resolve gate/n/contam
    flip_rows = None
    changed_docs = {(r["doc_id"], r["source"]) for r in
                    upserts.select("doc_id", "source").collect()}
    ext = [(d, s, p) for d, s, p in flips
           if (d, s) not in changed_docs and not (d % EVAL_MOD == 0)]
    if ext:
        ktype = upstream.schema().field_by_id(
            upstream.schema().key_field_ids[0]).type
        kvals = [str(d) if ktype == "string" else d for d, _s, _p in ext]
        fdf = upstream.read(spark, keys=kvals).select(
            F.col(doc_col).cast("bigint").alias("doc_id"),
            F.col(source_col).alias("source"),
            F.col(text_col).alias("text"))
        pmap = spark.createDataFrame(
            [(d, s, p) for d, s, p in ext],
            "doc_id bigint, source string, _promoted boolean")
        fdf = fdf.join(pmap, ["doc_id", "source"])
        fdf = _with_contam(fdf.withColumn("n", _ntok(F.col("text"))))
        flip_rows = fdf.select(
            "source", "doc_id", "n",
            (F.col("_promoted") & ~F.col("contam")).alias("clean"),
            F.lit("update").alias("_op"))

    all_updates = upserts.unionByName(gone)
    if flip_rows is not None:
        all_updates = all_updates.unionByName(flip_rows)
    all_updates = all_updates.cache()
    affected_sources |= {r["source"] for r in
                         all_updates.select("source").distinct().collect()}
    if not docs_state.is_committed(to_v, W_DOCS) and affected_sources:
        apply_batch(spark, docs_state,
                    _envelope(docs_state, all_updates, F.col("_op"), to_v),
                    batch_id=to_v, cfg=_cfg(docs_state, W_DOCS))

    # ---- repack affected sources ---------------------------------------
    n_chunks = _repack(spark, docs_state, chunks, sorted(affected_sources),
                       to_v, budget)
    mem.unpersist()
    post_cand.unpersist()
    all_updates.unpersist()
    return {"applied": True, "from_version": from_v, "to_version": to_v,
            "touched_groups": len(touched_h), "keeper_flips": len(flips),
            "affected_sources": sorted(affected_sources),
            "chunks": n_chunks}


def _repack(spark: SparkSession, docs_state: LakeTable, chunks: LakeTable,
            sources: list[str], to_v: int, budget: int) -> int:
    """Recompute the chunk manifest for ``sources`` only and converge the
    chunks table to it (scoped deletes via delete_condition)."""
    from pyspark.sql import Window as W

    if chunks.is_committed(to_v, W_CHUNKS):
        # replayed window (crash between the reconcile and the watermark
        # commit): still advance the watermark or the sync loop would
        # re-enter this window forever
        if int(chunks.properties().get(WATERMARK_PROP, 0)) < to_v:
            chunks.commit(extra_props={WATERMARK_PROP: to_v})
        return -1
    if not sources:
        # nothing moved, but the watermark must still advance exactly-once
        chunks.commit(batch_id=to_v, writer_id=W_CHUNKS,
                      extra_props={WATERMARK_PROP: to_v})
        return 0
    clean = (
        # parts= prunes at the MANIFEST level (identity(source) partition
        # dimension): unaffected sources' files are never even listed —
        # the where() on source is then only a correctness belt
        docs_state.read(spark, parts=set(sources))
        .where(F.col("source").isin(sources) & F.col("clean"))
        .select("source", "doc_id", "n")
    )
    wp = (W.partitionBy("source").orderBy("doc_id")
          .rowsBetween(W.unboundedPreceding, -1))
    cum = F.coalesce(F.sum("n").over(wp), F.lit(0).cast("bigint"))
    manifest = (
        clean.withColumn("chunk_id", F.floor(cum / budget))
        .groupBy("source", "chunk_id")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n").cast("bigint").alias("chunk_tokens"))
    )
    m = reconcile_snapshot(
        spark, chunks, manifest, batch_id=to_v,
        cfg=_cfg(chunks, W_CHUNKS), event_ts=_coord(to_v),
        delete_condition=F.col("source").isin(sources),
    )
    chunks.commit(extra_props={WATERMARK_PROP: to_v})
    return int(m.get("events_applied") or 0)


# ---------------------------------------------------------------------------
# rebuild (bootstrap + eval-change / overflow recovery)
# ---------------------------------------------------------------------------

def rebuild_refinery(
    spark: SparkSession,
    upstream: LakeTable,
    tables: dict[str, LakeTable],
    text_col: str = "text",
    source_col: str = "source",
    doc_col: str = "doc_id",
    budget: int = BUDGET,
) -> dict:
    """Full batch re-derivation of all four state tables from the live
    upstream snapshot — bootstrap, eval-split change, and cap-overflow
    recovery. Each table converges via a FULL-mode reconcile (upserts +
    deletes of everything stale), so a crash mid-way re-runs safely."""
    to_v = upstream.current_version()
    groups, evt = tables["groups"], tables["eval_shingles"]
    docs_state, chunks = tables["docs_state"], tables["chunks"]

    corpus = upstream.read(spark).select(
        F.col(doc_col).cast("bigint").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"))
    gated = corpus.where(_gate(F.col("text"))).select(
        "doc_id", "source", _h(F.col("text")).alias("h"),
        _ntok(F.col("text")).alias("n"), "text")

    g = (
        gated.groupBy("h")
        .agg(F.sort_array(F.collect_list(
            F.struct(F.col("doc_id"), F.col("source")))).alias("_m"),
            F.count("*").cast("bigint").alias("n_total"))
        .select(
            "h", F.slice("_m", 1, GROUP_CAP).alias("members"),
            F.element_at("_m", 1)["doc_id"].alias("keeper"), "n_total")
    )
    reconcile_snapshot(spark, groups, g, batch_id=to_v,
                       cfg=_cfg(groups, W_GROUPS), mode="full",
                       event_ts=_coord(to_v))

    ev = (
        corpus.where(_is_eval(F.col("doc_id")))
        .select(F.explode(_shingles(F.col("text"))).alias("sh"))
        .groupBy("sh").agg(F.count("*").cast("bigint").alias("cnt"))
    )
    reconcile_snapshot(spark, evt, ev, batch_id=to_v,
                       cfg=_cfg(evt, W_EVAL), mode="full",
                       event_ts=_coord(to_v))

    ev_set = F.broadcast(evt.read(spark).where(F.col("cnt") > 0).select("sh"))
    cand = gated.where(~_is_eval(F.col("doc_id")))
    keepers = g.select("h", F.col("keeper").alias("_keeper"))
    sh = cand.select("doc_id", "source",
                     F.explode_outer(_shingles(F.col("text"))).alias("sh"))
    contam = (sh.join(ev_set, "sh", "left_semi")
              .select("doc_id", "source").distinct()
              .withColumn("_contam", F.lit(True)))
    ds = (
        cand.join(keepers, "h", "left")
        .join(contam, ["doc_id", "source"], "left")
        .select("source", "doc_id", "n",
                ((F.col("doc_id") == F.col("_keeper"))
                 & F.coalesce(~F.col("_contam"), F.lit(True))).alias("clean"))
    )
    reconcile_snapshot(spark, docs_state, ds, batch_id=to_v,
                       cfg=_cfg(docs_state, W_DOCS), mode="full",
                       event_ts=_coord(to_v))

    srcs = [r["source"] for r in
            docs_state.read(spark).select("source").distinct().collect()]
    # full repack: every source is affected
    from pyspark.sql import Window as W

    wp = (W.partitionBy("source").orderBy("doc_id")
          .rowsBetween(W.unboundedPreceding, -1))
    cum = F.coalesce(F.sum("n").over(wp), F.lit(0).cast("bigint"))
    manifest = (
        docs_state.read(spark).where(F.col("clean"))
        .withColumn("chunk_id", F.floor(cum / budget))
        .groupBy("source", "chunk_id")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n").cast("bigint").alias("chunk_tokens"))
    )
    reconcile_snapshot(spark, chunks, manifest, batch_id=to_v,
                       cfg=_cfg(chunks, W_CHUNKS), mode="full",
                       event_ts=_coord(to_v))
    chunks.commit(extra_props={WATERMARK_PROP: to_v})
    return {"applied": True, "rebuilt": True, "to_version": to_v,
            "sources": sorted(srcs)}


__all__ = ["refinery_tables", "sync_refinery", "rebuild_refinery",
           "GROUP_CAP", "WATERMARK_PROP"]
