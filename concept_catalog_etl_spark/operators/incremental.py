"""Incremental view maintenance (IVM) over the change-data-feed.

Proves the engine's CDF is *consumable*, not just emittable: a derived
aggregate LakeTable (e.g. per-source corpus stats) is kept in sync with an
upstream CDC table by reading ``upstream.read_changes(from, to,
include_preimage=True)`` and applying only the *deltas* — never
recomputing the aggregate from the full table. This is the downstream half
of the CDC chain the reference pipeline implies (its Mongo sink is a final
state other jobs read; ``/root/reference/files/load.py:20-22``), done the
lakehouse way: upstream binlog → table → change feed → derived table.

Semantics: classic sum/count IVM. Every change row carries the new payload
and (``include_preimage``) the old payload, so each update/delete retracts
its old contribution (``-measure(pre)``) and each insert/update adds its
new one (``+measure(post)``); summing the signed contributions per group
yields exact per-group deltas. Works for any measure that is a sum of a
per-row expression (counts, token totals, byte totals, ...) — the
commutative-group aggregates every streaming IVM system restricts to.

Scale posture (100 TB): contributions are summed with an ordinary
``groupBy`` (map-side partial agg — one bounded shuffle of O(changed
groups)); the apply step rewrites ONLY the downstream buckets containing
changed groups (bucket-pruned read + CoW rewrite, O(changed buckets), not
O(table)); the only driver-side materialization is the affected *bucket
id* set, which is ≤ n_buckets by construction. Exactly-once: the apply
commit carries ``batch_id = upstream to_version`` under a dedicated writer
ledger, so re-running a sync window is skipped, and the synced-through
version travels in the same atomic commit (``ivm_upstream_version``).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lakehouse.table import LakeTable, SYS_NAMES, bucket_expr


def change_deltas(
    changes: DataFrame,
    group_col: str,
    measures: dict[str, F.Column],
) -> DataFrame:
    """Turn a preimage-bearing change feed into signed per-group deltas.

    ``measures`` maps output column name → a per-row expression over the
    upstream payload columns (e.g. ``{"n_docs": F.lit(1), "n_tokens":
    F.col("n_tok")}``). The same expression is evaluated against the
    post-image (weight +1, for insert/update) and the preimage (weight −1,
    for update/delete); NULL contributions count as 0. Groups whose every
    delta nets to zero are dropped — an update that doesn't move any
    measure triggers no downstream write.
    """
    pre_names = [c[len("_pre_"):] for c in changes.columns if c.startswith("_pre_")]
    if not pre_names:
        raise ValueError(
            "changes has no _pre_* columns — call "
            "read_changes(..., include_preimage=True)"
        )

    post = changes.where(F.col("_change_type").isin("insert", "update")).select(
        F.col(group_col).alias("_g"),
        *[m.alias(k) for k, m in measures.items()],
    )
    # preimage rows re-expose the old payload under the payload names, so
    # the SAME measure expressions apply; sign flips via negation
    pre_rows = changes.where(F.col("_change_type").isin("update", "delete")).select(
        *[F.col(f"_pre_{c}").alias(c) for c in pre_names]
    )
    pre = pre_rows.select(
        F.col(group_col).alias("_g"),
        *[(-m).alias(k) for k, m in measures.items()],
    )
    out = (
        post.unionByName(pre)
        .groupBy("_g")
        .agg(*[F.coalesce(F.sum(k), F.lit(0)).alias(k) for k in measures])
    )
    nonzero = reduce(or_, [F.col(k) != 0 for k in measures])
    return out.where(nonzero).withColumnRenamed("_g", group_col)


def apply_deltas(
    spark: SparkSession,
    downstream: LakeTable,
    deltas: DataFrame,
    batch_id: int,
    count_col: str,
    writer_id: str = "ivm",
    extra_props: dict | None = None,
) -> dict | None:
    """CoW-apply per-group deltas to the downstream aggregate table.

    ``count_col`` names the measure that tracks the group's live row count:
    a group whose count reaches 0 is removed from the table (all its
    upstream rows are gone). Returns the new snapshot, or None when the
    ledger shows ``batch_id`` already applied (exactly-once replay skip).
    """
    if downstream.is_committed(batch_id, writer_id):
        return None
    key = downstream.schema().key_name
    nb = downstream.n_buckets()
    if key not in deltas.columns:
        deltas = deltas.withColumnRenamed(deltas.columns[0], key)
    measure_cols = [c for c in deltas.columns if c != key]

    # NULL-propagating bucket: xxhash64(NULL) returns the seed, so the raw
    # bucket_expr would silently file NULL keys under pmod(42, nb) — and a
    # NULL downstream key can never be retracted (full_outer NULL != NULL).
    # Keep NULL visible so the guard below actually fires.
    deltas = deltas.withColumn(
        "_bucket",
        F.when(F.col(key).isNull(), F.lit(None).cast("int")).otherwise(
            bucket_expr(key, nb)
        ),
    )
    # O(n_buckets) driver-side metadata, never O(groups)
    buckets = {r[0] for r in deltas.select("_bucket").distinct().collect()}
    if None in buckets:
        raise ValueError(f"NULL {key} in deltas — the group column becomes "
                         "the downstream key and must be non-null")
    if not buckets:  # no net change in this window: ledger-only commit
        expect = downstream.current_version()
        return downstream.commit(batch_id=batch_id, writer_id=writer_id,
                                 expect_version=expect,
                                 extra_props=extra_props)

    expect = downstream.current_version()
    cur = downstream.read(spark, buckets=buckets, with_system_cols=True)
    # full_outer makes same-name columns ambiguous — resolve via aliases
    merged = cur.drop(*[c for c in SYS_NAMES if c in cur.columns]).alias("c").join(
        deltas.alias("d"), on=key, how="full_outer"
    ).select(
        F.col(key),
        *[
            (F.coalesce(F.col(f"c.{c}"), F.lit(0))
             + F.coalesce(F.col(f"d.{c}"), F.lit(0))).alias(c)
            for c in measure_cols
        ],
    )
    live = merged.where(F.col(count_col) > 0)
    # deterministic LWW coordinates: the upstream version IS the logical
    # clock of this derived state
    rows = (
        live.withColumn("_event_ts", F.timestamp_seconds(F.lit(batch_id)))
        .withColumn("_lsn", F.lit(batch_id).cast("long"))
        .withColumn("_deleted", F.lit(False))
        .withColumn("_bucket", bucket_expr(key, nb))
    )
    files = downstream.write_data_files(rows)
    # only files landing in the rewritten buckets may be referenced; an
    # empty bucket writes no file, which is exactly "group removed"
    return downstream.commit_with_retry(
        add_files=files,
        remove_buckets=buckets,
        batch_id=batch_id,
        writer_id=writer_id,
        expect_version=expect,
        extra_props=extra_props,
    )


def sync_increment(
    spark: SparkSession,
    upstream: LakeTable,
    downstream: LakeTable,
    group_col: str,
    measures: dict[str, F.Column],
    count_col: str,
    writer_id: str = "ivm",
) -> dict:
    """Advance ``downstream`` to reflect ``upstream``'s current version.

    The last-synced upstream version rides in the downstream table's own
    snapshot properties (``ivm_upstream_version``) — state and watermark
    commit atomically, so a crash between sync runs can only re-run a
    window, which the batch ledger then skips. The very first sync uses
    ``from_version=0`` (the empty snapshot), so the initial full build is
    just the degenerate change window where everything is an insert.
    """
    to_v = upstream.current_version()
    from_v = int(downstream.properties().get("ivm_upstream_version", 0))
    if to_v == from_v or downstream.is_committed(to_v, writer_id):
        return {"applied": False, "from_version": from_v, "to_version": to_v}
    changes = upstream.read_changes(
        spark, from_version=from_v, to_version=to_v, include_preimage=True
    )
    deltas = change_deltas(changes, group_col, measures)
    snap = apply_deltas(
        spark, downstream, deltas, batch_id=to_v, count_col=count_col,
        writer_id=writer_id, extra_props={"ivm_upstream_version": to_v},
    )
    return {"applied": snap is not None, "from_version": from_v, "to_version": to_v}
