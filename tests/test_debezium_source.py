"""Debezium-envelope adapter: standard CDC JSON replays to the same final
state as the internal binlog format, with the same DLQ semantics.

The fixture converts the deterministic internal binlog line-by-line into
Debezium envelopes (c/u/d + before/after + source.{lsn,ts_us}), so both
replays see the SAME logical event sequence and must land byte-identical
table state — interop proof for the de-facto CDC wire format.
"""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.sources.debezium import parse_debezium
from concept_catalog_etl_spark.streaming.replay import replay_batch, replay_stream

from helpers import make_table, table_state

_EPOCH = dt.datetime(1970, 1, 1)
_OP = {"insert": "c", "update": "u", "delete": "d"}


def _epoch_us(iso: str) -> int:
    t = dt.datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f") - _EPOCH
    return (t.days * 86400 + t.seconds) * 1_000_000 + t.microseconds


def _deb_line(ev: dict) -> str:
    """Internal envelope dict → Debezium data-event line (exact mapping)."""
    op = _OP[ev["op"]]
    # exercise the snapshot-read op: every 5th insert arrives as 'r'
    if op == "c" and ev["lsn"] % 5 == 0:
        op = "r"
    row_key = {"doc_id": ev["doc_id"]}
    after = None if ev["op"] == "delete" else {**row_key, **(ev["payload"] or {})}
    before = row_key if ev["op"] == "delete" else None
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {
                "connector": "postgresql",
                "db": "concepts",
                "table": "sequences",
                "lsn": ev["lsn"],
                "ts_ms": _epoch_us(ev["event_ts"]) // 1000,
                "ts_us": _epoch_us(ev["event_ts"]),
                "snapshot": "true" if op == "r" else "false",
            },
            "op": op,
            "ts_ms": _epoch_us(ev["event_ts"]) // 1000 + 5,  # processing time
        }
    )


def _convert_dir(text_files, out_dir: str) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for p in sorted(text_files):
        q = os.path.join(out_dir, os.path.basename(p))
        with open(p) as fin, open(q, "w") as fout:
            for line in fin:
                fout.write(_deb_line(json.loads(line)) + "\n")
        outs.append(q)
    return outs


@pytest.fixture()
def feeds(scratch):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(
        d, n_events=3000, n_docs=250, n_files=6, seed=7, p_malformed=0.0
    )
    deb = _convert_dir(paths, os.path.join(scratch, "debezium"))
    return paths, deb


def test_debezium_replay_equals_internal(spark, scratch, feeds):
    text_paths, deb_paths = feeds
    t_int = make_table(os.path.join(scratch, "a"))
    t_deb = make_table(os.path.join(scratch, "b"))
    replay_batch(spark, text_paths, t_int, files_per_batch=2)
    replay_batch(spark, deb_paths, t_deb, files_per_batch=2,
                 source_format="debezium")
    assert table_state(spark, t_deb) == table_state(spark, t_int)
    # both feeds were clean → no DLQ on either side
    for t in (t_int, t_deb):
        dlq = t.read_dlq(spark)
        assert dlq is None or dlq.count() == 0


def test_debezium_dlq_and_unknown_ops(spark, scratch):
    table = make_table(scratch)
    schema = table.schema()
    good = {
        "before": None,
        "after": {"doc_id": "doc-1", "tokens": [1, 2, 3], "n_tok": 3,
                  "source": "crawl", "tokens_raw": None},
        "source": {"lsn": 10, "ts_us": 1_000_000},
        "op": "c",
    }
    trunc = dict(good, op="t", after=None)  # Debezium truncate → unknown_op
    lines = [
        json.dumps(good),
        "{not json at all",
        json.dumps(trunc),
        json.dumps({  # delete carries only `before` — key must resolve
            "before": {"doc_id": "doc-2"},
            "after": None,
            "source": {"lsn": 11, "ts_us": 2_000_000},
            "op": "d",
        }),
        json.dumps(dict(good, op="u", after=None,  # null payload on update
                        before={"doc_id": "doc-3"},
                        source={"lsn": 12, "ts_us": 3_000_000})),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    env = parse_debezium(raw, schema)
    from concept_catalog_etl_spark.operators.merge import apply_batch

    apply_batch(spark, table, env, batch_id=0)
    st = table_state(spark, table)
    assert st["doc-1"]["tokens"] == [1, 2, 3]
    assert "doc-2" not in st  # delete of a non-existent key is a no-op
    dlq = table.read_dlq(spark)
    reasons = {r["_dlq_reason"] for r in dlq.collect()}
    assert reasons == {"unparseable", "unknown_op", "null_payload"}
    # the foreign-op row keeps its original line for forensics
    raws = {r["_dlq_reason"]: r["_raw"] for r in dlq.collect()}
    assert raws["unknown_op"] is not None and '"op": "t"' in raws["unknown_op"]


def test_debezium_internal_op_collision_is_dlq_not_poison(spark, scratch):
    """A hostile/garbage Debezium line whose op literally says
    "schema_change" (or any internal op name) must die in the DLQ as
    unknown_op — NOT reach the evolution path, where a null change struct
    would crash the batch (poison pill: checkpoint restart replays and
    crashes again)."""
    table = make_table(scratch)
    lines = [
        json.dumps({"op": "schema_change", "after": None, "before": None,
                    "source": {"lsn": 1, "ts_us": 1}}),
        json.dumps({"op": "insert", "after": {"doc_id": "doc-7"},
                    "source": {"lsn": 2, "ts_us": 2}}),
        json.dumps({
            "before": None,
            "after": {"doc_id": "doc-1", "tokens": [5], "n_tok": 1,
                      "source": "crawl"},
            "source": {"lsn": 3, "ts_us": 3},
            "op": "c",
        }),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    from concept_catalog_etl_spark.operators.merge import apply_batch

    apply_batch(spark, table, parse_debezium(raw, table.schema()), batch_id=0)
    st = table_state(spark, table)
    assert list(st) == ["doc-1"]
    reasons = sorted(r["_dlq_reason"] for r in table.read_dlq(spark).collect())
    assert reasons == ["unknown_op", "unknown_op"]
    # schema untouched by the forged lines
    assert table.schema().schema_version == 1


def test_relay_refuses_coordinate_less_delete(spark, scratch):
    """A delete whose tombstone expired inside the relay window has no LWW
    coordinate — the export must fail loudly, not emit a line the consumer
    would DLQ (silent divergence)."""
    from concept_catalog_etl_spark.sources.debezium import changes_to_debezium

    table = make_table(scratch)
    changes = spark.createDataFrame(
        [("delete", None, None, "doc-3", None, None, None)],
        "_change_type string, _event_ts timestamp, _lsn long, "
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    lines = changes_to_debezium(changes, table.schema())
    with pytest.raises(Exception, match="tombstone"):
        lines.collect()


def test_debezium_ts_precision_and_millis_fallback(spark, scratch):
    """ts_us is preferred for LWW ordering; a millis-only feed still works."""
    table = make_table(scratch)

    def line(op, lsn, ts_us=None, ts_ms=None, toks=None):
        src = {"lsn": lsn}
        if ts_us is not None:
            src["ts_us"] = ts_us
        if ts_ms is not None:
            src["ts_ms"] = ts_ms
        return json.dumps({
            "before": None,
            "after": {"doc_id": "doc-9", "tokens": toks,
                      "n_tok": len(toks), "source": "crawl"},
            "source": src,
            "op": op,
        })

    # same millisecond, different micros: the LATER micros must win even
    # though its lsn is smaller (event-time beats arrival order)
    lines = [
        line("c", lsn=5, ts_us=1_000_900, toks=[7, 7]),
        line("u", lsn=6, ts_us=1_000_400, toks=[8, 8]),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    from concept_catalog_etl_spark.operators.merge import apply_batch

    apply_batch(spark, table, parse_debezium(raw, table.schema()), batch_id=0)
    assert table_state(spark, table)["doc-9"]["tokens"] == [7, 7]

    # millis-only feed: ties on event_ts break by lsn
    t2 = make_table(os.path.join(scratch, "m"))
    lines = [
        line("c", lsn=5, ts_ms=1_000, toks=[1]),
        line("u", lsn=6, ts_ms=1_000, toks=[2]),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    apply_batch(spark, t2, parse_debezium(raw, t2.schema()), batch_id=0)
    assert table_state(spark, t2)["doc-9"]["tokens"] == [2]


def test_change_feed_debezium_relay(spark, scratch, feeds):
    """Both halves of the adapter: table A's change feed, exported as
    Debezium lines and re-ingested through parse_debezium into table B,
    reproduces A exactly — the engine as CDC producer AND consumer."""
    from concept_catalog_etl_spark.operators.merge import apply_batch
    from concept_catalog_etl_spark.sources.debezium import changes_to_debezium

    text_paths, _ = feeds
    t_a = make_table(os.path.join(scratch, "a"))
    t_b = make_table(os.path.join(scratch, "b"))
    v0 = t_a.current_version()
    # two relay windows so inserts, updates AND deletes cross the wire
    replay_batch(spark, text_paths[:3], t_a, files_per_batch=3)
    v1 = t_a.current_version()
    replay_batch(spark, text_paths[3:], t_a, files_per_batch=3,
                 start_batch_id=1)
    v2 = t_a.current_version()
    for bid, (lo, hi) in enumerate([(v0, v1), (v1, v2)]):
        lines = changes_to_debezium(
            t_a.read_changes(spark, lo, hi), t_a.schema()
        )
        env = parse_debezium(lines, t_b.schema())
        apply_batch(spark, t_b, env, batch_id=bid)
    assert table_state(spark, t_b) == table_state(spark, t_a)
    dlq = t_b.read_dlq(spark)
    assert dlq is None or dlq.count() == 0


def test_debezium_stream_replay(spark, scratch, feeds):
    """Structured Streaming mode parses per batch under the registry schema."""
    text_paths, deb_paths = feeds
    t_int = make_table(os.path.join(scratch, "a"))
    t_deb = make_table(os.path.join(scratch, "b"))
    replay_batch(spark, text_paths, t_int, files_per_batch=3)
    replay_stream(
        spark,
        os.path.dirname(deb_paths[0]),
        t_deb,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
        max_files_per_trigger=3,
        source_format="debezium",
    )
    assert table_state(spark, t_deb) == table_state(spark, t_int)
