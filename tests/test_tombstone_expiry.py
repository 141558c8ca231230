"""Tombstone-expiry automation (VERDICT.md round-1 task 8): the streaming
maintenance tick derives an expiry floor from per-source lineage offsets
(min high-water LSN − horizon) and drops tombstones older than it while
compacting, K buckets per tick. Soak-style invariants:

* tombstone storage is BOUNDED: far fewer tombstones remain than deletes
  were applied (only those newer than the horizon survive)
* correctness is untouched: final state still equals the oracle replay
* late events OLDER than a RETAINED tombstone still lose (the tombstone's
  job) — expiry only removes tombstones no source can still contradict
"""

import json
import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_stream

from helpers import assert_state_equals_oracle, make_table


def _tombstones(spark, table):
    df = table.read(spark, with_system_cols=True, include_deleted=True)
    return df.filter(F.coalesce(F.col("_deleted"), F.lit(False))).collect()


def test_maintenance_tick_expires_old_tombstones(spark, scratch):
    d = os.path.join(scratch, "binlog")
    generate_binlog(
        d, n_events=6000, n_docs=250, n_files=12, seed=11, p_delete=0.25
    )
    table = make_table(scratch, n_buckets=8)
    replay_stream(
        spark,
        d,
        table,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        cfg=MergeConfig(write_mode="mor"),
        max_files_per_trigger=2,
        maintenance_every=2,
        maintenance_max_buckets=4,
        tombstone_horizon_lsns=500,
    )
    oracle_state, _s, ostats = replay_dir(d)
    assert_state_equals_oracle(spark, table, oracle_state)

    remaining = _tombstones(spark, table)
    assert ostats["deletes"] > 100
    # bounded: expiry dropped the old tombstones; only those within (or
    # past) the rotating coverage horizon survive
    assert len(remaining) < ostats["deletes"] * 0.8, (
        f"{len(remaining)} tombstones vs {ostats['deletes']} deletes — expiry idle?"
    )
    offsets = table.properties()["lineage_offsets"]
    floor = min(offsets.values()) - 500
    # every bucket the rotating cursor visited honours the floor; globally,
    # anything below floor that survived is only in not-yet-visited buckets
    assert any(r["_lsn"] >= floor for r in remaining) or not remaining

    # a late event OLDER than a retained tombstone still loses
    retained = max(remaining, key=lambda r: r["_lsn"], default=None)
    if retained is not None:
        key = retained["doc_id"]
        # strictly older LWW coordinate than the tombstone's (the generator's
        # synthetic event_ts values are near-epoch, so "older" must be too)
        late = spark.createDataFrame(
            [json.dumps({
                "op": "update", "doc_id": key,
                "event_ts": "1970-01-01T00:00:00.000001",
                "lsn": int(retained["_lsn"]) - 1,
                "payload": {"tokens": [1, 2, 3], "n_tok": 3, "source": "late"},
            })],
            "string",
        ).toDF("value")
        apply_batch(spark, table, late, batch_id=10_000,
                    cfg=MergeConfig(write_mode="mor"))
        live = table.read(spark).filter(F.col("doc_id") == key)
        assert live.count() == 0, "late update resurrected a deleted key"
