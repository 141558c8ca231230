"""Predicate DML (delete_where / update_where): rides the ordinary merge
kernel, so exactly-once, LWW composition with the WAL tail, MoR/CoW modes
and the n_tok invariant all hold. Oracle: a sequential fold of the same
WAL events + the DML interpreted at its coordinate."""

import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.operators.dml import delete_where, update_where
from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import make_table, table_state

TS_DML = "2027-01-01T00:00:00"  # after every generated event


def _setup(spark, scratch, seed=21):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(d, n_events=2000, n_docs=200, n_files=4, seed=seed)
    table = make_table(scratch)
    replay_batch(spark, paths, table, files_per_batch=2)
    oracle_state, _s, _st = replay_dir(d)
    return table, oracle_state


def test_delete_where_matches_predicate_fold(spark, scratch):
    table, oracle = _setup(spark, scratch)
    pred = "source = 'crawl' AND n_tok >= 8"
    m = delete_where(spark, table, pred, batch_id=1, event_ts=TS_DML)
    assert not m.get("skipped")
    want = {k: v for k, v in oracle.items()
            if not (v["source"] == "crawl" and v["n_tok"] >= 8)}
    assert table_state(spark, table) == want
    # exactly-once: same batch id is a ledgered no-op
    v = table.current_version()
    m2 = delete_where(spark, table, pred, batch_id=1, event_ts=TS_DML)
    assert m2.get("skipped") and table.current_version() == v


def test_update_where_sets_columns_and_recomputes_invariants(spark, scratch):
    table, oracle = _setup(spark, scratch, seed=22)
    matched = {k for k, v in oracle.items() if v["source"] == "synthetic"}
    assert matched, "test needs synthetic-source rows"
    m = update_where(
        spark, table, F.col("source") == "synthetic",
        {"source": F.lit("curated"),
         "tokens": "slice(tokens, 1, 3)"},
        batch_id=1, event_ts=TS_DML,
    )
    assert not m.get("skipped")
    st = table_state(spark, table)
    assert set(st) == set(oracle)
    for k, row in oracle.items():
        got = st[k]
        if k in matched:
            # the new payload rode the merge's NORMAL transforms: the
            # source vocabulary tag kept 'curated', n_tok recomputed
            assert got["source"] == "curated"
            assert got["tokens"] == row["tokens"][:3]
            assert got["n_tok"] == len(got["tokens"])
        else:
            assert got == row


def test_update_payload_passes_through_normalization(spark, scratch):
    """DML payloads are ordinary merge payloads: an out-of-vocabulary
    source tag normalizes to 'crawl' (reference transform semantics), the
    same as it would arriving from the feed."""
    table, oracle = _setup(spark, scratch, seed=25)
    update_where(spark, table, "n_tok >= 0", {"source": F.lit("api-v2")},
                 batch_id=1, event_ts=TS_DML)
    st = table_state(spark, table)
    assert st and all(v["source"] == "crawl" for v in st.values())


def test_dml_composes_with_wal_under_lww(spark, scratch):
    """A WAL event NEWER than the DML coordinate beats it; older loses —
    the one LWW order decides, exactly like two feed events."""
    import json

    table, oracle = _setup(spark, scratch, seed=23)
    victim = sorted(oracle)[0]
    delete_where(spark, table, F.col("doc_id") == victim,
                 batch_id=1, event_ts=TS_DML)
    assert victim not in table_state(spark, table)

    d2 = os.path.join(scratch, "wal2")
    os.makedirs(d2)

    def ev(doc, ts, lsn):
        return json.dumps({
            "op": "update", "doc_id": doc, "event_ts": ts, "lsn": lsn,
            "schema_version": 1,
            "payload": {"tokens": [5, 5], "tokens_raw": None, "n_tok": 2,
                        "source": "crawl"},
            "schema_change": None,
        })

    # older than the delete -> tombstone defends; newer -> resurrects
    p = os.path.join(d2, "late.txt")
    open(p, "w").write(ev(victim, "2026-12-31T23:59:59", 10**9) + "\n")
    replay_batch(spark, [p], table, start_batch_id=100)
    assert victim not in table_state(spark, table)
    p2 = os.path.join(d2, "newer.txt")
    open(p2, "w").write(ev(victim, "2027-01-02T00:00:00", 10**9 + 1) + "\n")
    replay_batch(spark, [p2], table, start_batch_id=101)
    assert table_state(spark, table)[victim]["tokens"] == [5, 5]


def test_dml_validations_and_mor_default(spark, scratch):
    import pytest

    table, _ = _setup(spark, scratch, seed=24)
    files_before = len(table.files())
    delete_where(spark, table, "n_tok < 0", batch_id=7)  # matches nothing
    # MoR default: pure delta append, base files untouched
    assert all(
        f.get("delta") for f in table.files()[files_before:]
    )
    with pytest.raises(ValueError, match="key column"):
        update_where(spark, table, "true", {"doc_id": F.lit("x")}, batch_id=8)
    with pytest.raises(ValueError, match="unknown column"):
        update_where(spark, table, "true", {"nope": F.lit(1)}, batch_id=9)
    # CoW mode works too
    m = update_where(spark, table, "n_tok = 1", {"source": F.lit("curated")},
                     batch_id=10, cfg=MergeConfig(writer_id="dml"),
                     event_ts=TS_DML)
    assert not m.get("skipped") and m["write_mode"] == "cow"
    st = table_state(spark, table)
    ones = [v for v in st.values() if v["n_tok"] == 1]
    assert ones and all(v["source"] == "curated" for v in ones)
