"""End-to-end CDC replay into a table with binary / struct / map / date /
decimal payload columns (round-5 verdict task 3).

The reference's document is itself a nested struct with array-of-struct
(``/root/reference/files/extract.py:33-35``), and multimodal pipelines
store blobs as binary next to typed metadata (``functions/multimodal.py``)
— this is the test that a LakeTable can BE that system of record, not just
mirror its scalar projection.

Wire forms (JSON binlog): binary = base64 string (Spark's from_json
BinaryType contract), date = ISO string, decimal = JSON number,
map/struct = JSON objects.
"""

import base64
import datetime as dt
import json
import os
from decimal import Decimal

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.streaming.replay import replay_batch

COLS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
    ("blob", "binary"),
    ("meta", "struct<w:int,lang:string>"),
    ("tags", "map<string,string>"),
    ("day", "date"),
    ("score", "decimal(10,2)"),
]


def _mk(root, n_buckets=4):
    return LakeTable.create(
        os.path.join(root, "table"),
        TableSchema.create(COLS, key="doc_id"),
        n_buckets=n_buckets,
    )


def _ev(op, doc, ts, lsn, payload=None):
    return json.dumps(
        {"op": op, "doc_id": doc, "event_ts": ts, "lsn": lsn,
         "schema_version": 1, "payload": payload, "schema_change": None}
    )


def _p(toks, blob=None, meta=None, tags=None, day=None, score=None,
       source="crawl"):
    return {
        "tokens": toks, "tokens_raw": None, "n_tok": len(toks),
        "source": source,
        "blob": base64.b64encode(blob).decode() if blob is not None else None,
        "meta": meta, "tags": tags, "day": day, "score": score,
    }


def _state(spark, table):
    out = {}
    for r in table.read(spark).collect():
        d = r.asDict(recursive=True)
        out[d["doc_id"]] = d
    return out


def test_replay_extended_types(spark, scratch):
    d = os.path.join(scratch, "log")
    os.makedirs(d)
    f1, f2 = os.path.join(d, "b0.jsonl"), os.path.join(d, "b1.jsonl")
    _write = lambda p, lines: open(p, "w").write("\n".join(lines) + "\n")
    _write(f1, [
        _ev("insert", "doc-1", "2026-01-01T00:00:01.000000", 1,
            _p([1, 2], blob=b"\x00\x01img", meta={"w": 640, "lang": "no"},
               tags={"k1": "v1", "k2": "v2"}, day="2026-01-05",
               score=12.34)),
        _ev("insert", "doc-2", "2026-01-01T00:00:02.000000", 2,
            _p([3], meta={"w": 1, "lang": "en"})),
    ])
    _write(f2, [
        # update doc-1: new blob + map; delete doc-2
        _ev("update", "doc-1", "2026-01-01T00:00:03.000000", 3,
            _p([1, 2, 3], blob=b"v2", meta={"w": 641, "lang": "no"},
               tags={"k1": "v9"}, day="2026-01-06", score=99.5)),
        _ev("delete", "doc-2", "2026-01-01T00:00:04.000000", 4),
    ])
    table = _mk(scratch)
    replay_batch(spark, [f1, f2], table, files_per_batch=1)

    st = _state(spark, table)
    assert set(st) == {"doc-1"}
    row = st["doc-1"]
    assert bytes(row["blob"]) == b"v2"
    assert row["meta"] == {"w": 641, "lang": "no"}
    assert row["tags"] == {"k1": "v9"}
    assert row["day"] == dt.date(2026, 1, 6)
    assert row["score"] == Decimal("99.50")
    assert row["tokens"] == [1, 2, 3] and row["n_tok"] == 3


def test_replay_is_idempotent_and_lww_total_with_map(spark, scratch):
    """Exactly-once double-apply, plus the LWW tie case that forces the
    max_by fallback: two events with IDENTICAL (event_ts, lsn) and
    different map payloads IN ONE BATCH must pick a deterministic,
    line-order-invariant winner. (Cross-batch coordinate ties with
    differing payloads are outside the engine contract — a parallel engine
    has no total order for them; see operators/merge.py's tie contract.)"""
    table = _mk(scratch)
    rows = [
        _ev("insert", "k", "2026-01-01T00:00:01.000000", 7,
            _p([1], tags={"a": "1"})),
        _ev("insert", "k", "2026-01-01T00:00:01.000000", 7,
            _p([1], tags={"b": "2"})),
    ]
    raw = spark.createDataFrame([(r,) for r in rows], ["value"])
    m1 = apply_batch(spark, table, raw, batch_id=1)
    assert not m1.get("skipped")
    m2 = apply_batch(spark, table, raw, batch_id=1)
    assert m2.get("skipped")
    one_batch = _state(spark, table)

    # the same two lines in the REVERSE order — same winner
    table2 = _mk(os.path.join(scratch, "t2"))
    raw_rev = spark.createDataFrame([(r,) for r in reversed(rows)], ["value"])
    apply_batch(spark, table2, raw_rev, batch_id=1)
    assert _state(spark, table2) == one_batch

    # distinct lsn across batches: genuinely later event must win
    table3 = _mk(os.path.join(scratch, "t3"))
    later = _ev("update", "k", "2026-01-01T00:00:01.000000", 8,
                _p([2], tags={"z": "9"}))
    apply_batch(spark, table3,
                spark.createDataFrame([(rows[0],)], ["value"]), batch_id=1)
    apply_batch(spark, table3,
                spark.createDataFrame([(later,)], ["value"]), batch_id=2)
    assert _state(spark, table3)["k"]["tags"] == {"z": "9"}


def test_map_column_equal_maps_tie_break_is_entry_order_invariant(
        spark, scratch):
    """Two payloads whose maps are EQUAL but serialized with different key
    order must compare equal in the tie-break (key-sorted entries), so the
    winner is decided by the next column, not by JSON accident."""
    table = _mk(scratch)
    rows = [
        _ev("insert", "k", "2026-01-01T00:00:01.000000", 7,
            {"tokens": [5], "tokens_raw": None, "n_tok": 1,
             "source": "crawl", "blob": None, "meta": None,
             "tags": {"x": "1", "y": "2"}, "day": None, "score": None}),
        _ev("insert", "k", "2026-01-01T00:00:01.000000", 7,
            {"tokens": [4], "tokens_raw": None, "n_tok": 1,
             "source": "crawl", "blob": None, "meta": None,
             "tags": {"y": "2", "x": "1"}, "day": None, "score": None}),
    ]
    raw = spark.createDataFrame([(r,) for r in rows], ["value"])
    apply_batch(spark, table, raw, batch_id=1)
    st = _state(spark, table)
    # maps equal → tokens [5] > [4] decides (later ordering term)
    assert st["k"]["tokens"] == [5]
    assert st["k"]["tags"] == {"x": "1", "y": "2"}


def test_extended_types_cow_and_mor_agree(spark, scratch):
    events = [
        _ev("insert", f"d{i}", f"2026-01-01T00:00:{i:02d}.000000", i,
            _p([i], tags={"n": str(i)}, meta={"w": i, "lang": "no"},
               day="2026-02-01", score=i + 0.25))
        for i in range(1, 8)
    ] + [
        _ev("update", "d3", "2026-01-01T00:01:00.000000", 50,
            _p([9, 9], tags={"n": "patched"})),
        _ev("delete", "d5", "2026-01-01T00:01:01.000000", 51),
    ]
    raw = spark.createDataFrame([(r,) for r in events], ["value"])
    t_cow = _mk(os.path.join(scratch, "cow"))
    t_mor = _mk(os.path.join(scratch, "mor"))
    apply_batch(spark, t_cow, raw, batch_id=1)
    apply_batch(spark, t_mor, raw, batch_id=1, cfg=MergeConfig(write_mode="mor"))
    assert _state(spark, t_cow) == _state(spark, t_mor)
    assert set(_state(spark, t_cow)) == {f"d{i}" for i in (1, 2, 3, 4, 6, 7)}


def test_stats_skip_unordered_types_but_keep_date(spark, scratch):
    """Manifest col_stats must cover date (orderable, prunable) and skip
    binary/struct/map/decimal without error."""
    table = _mk(scratch)
    raw = spark.createDataFrame(
        [(_ev("insert", "a", "2026-01-01T00:00:01.000000", 1,
              _p([1], blob=b"z", meta={"w": 1, "lang": "x"},
                 tags={"a": "b"}, day="2026-03-04", score=1.0)),)],
        ["value"],
    )
    apply_batch(spark, table, raw, batch_id=1)
    fid = {f.name: str(f.id) for f in table.schema().fields}
    seen = set()
    for e in table.files():
        seen |= set((e.get("col_stats") or {}).keys())
    assert fid["day"] in seen
    for skip in ("blob", "meta", "tags", "score"):
        assert fid[skip] not in seen
