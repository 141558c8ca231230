"""The lake table as a drop-in refinery corpus: the composed pretraining
pipeline (gate → dedup → decontaminate → pack) over a CDC-INGESTED table
must produce exactly the manifest it produces over the static parquet of
the same logical corpus — even when the ingest arrived as noisy CDC
(stale pre-versions later overwritten, junk docs later deleted, out-of-order
LWW coordinates). This pins the composition of the engine's two halves:
the lakehouse keeps a corpus current; the pipeline consumes it unchanged.
"""

import json
import os

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.plans.queries import refinery_plan
from concept_catalog_etl_spark.streaming.replay import replay_batch

SF = "/root/testdata/sf0.001"


def _ev(op, doc_id, lsn, payload=None, ts_s=None):
    t = ts_s if ts_s is not None else lsn
    ts = f"1970-01-01T{t // 3600:02d}:{t % 3600 // 60:02d}:{t % 60:02d}.000000"
    ev = {"op": op, "doc_id": doc_id, "event_ts": ts, "lsn": lsn,
          "schema_version": 1}
    if payload is not None:
        ev["payload"] = payload
    return json.dumps(ev)


def test_refinery_equal_over_static_and_cdc_ingested_corpus(spark, scratch):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [r.asDict() for r in docs.collect()]
    assert len(rows) >= 50

    schema = TableSchema.create(
        [("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
         ("source", "string"), ("n_chars", "bigint")],
        key="doc_id",
    )
    table = LakeTable.create(os.path.join(scratch, "docs_lake"), schema,
                             n_buckets=8)
    # this table has a column NAMED source but it is corpus metadata
    # (src0..src19), not the CDC contract trio — switch canonicalization off
    cfg = MergeConfig.for_table(table, source_fid=None)

    lines, lsn = [], 0

    def emit(op, doc_id, payload=None, ts_s=None):
        nonlocal lsn
        lsn += 1
        lines.append(_ev(op, doc_id, lsn, payload, ts_s))

    for i, r in enumerate(rows):
        payload = {k: r[k] for k in ("text", "lang", "source", "n_chars")}
        if i % 7 == 0:
            # noisy history: a stale pre-version lands FIRST and must lose
            emit("insert", r["doc_id"],
                 {**payload, "text": "stale draft " + (r["text"] or "")[:20]})
            emit("update", r["doc_id"], payload)
        elif i % 11 == 3:
            # out-of-order: the final version arrives BEFORE an older one;
            # LWW on (event_ts, lsn) must keep the final version
            emit("update", r["doc_id"], payload, ts_s=3600 + i)
            emit("insert", r["doc_id"],
                 {**payload, "text": "late stale " + (r["text"] or "")[:20]},
                 ts_s=100 + i)
        else:
            emit("insert", r["doc_id"], payload)
    # junk docs that are inserted then deleted: invisible to the refinery
    for j in range(5):
        ghost = 10_000_000 + j
        emit("insert", ghost, {"text": "the a and of to in " * 30,
                               "lang": "en", "source": "src0",
                               "n_chars": 100})
        emit("delete", ghost)

    # arbitrary micro-batch boundaries
    d = os.path.join(scratch, "binlog")
    os.makedirs(d)
    per = max(1, len(lines) // 4)
    paths = []
    for i in range(0, len(lines), per):
        p = os.path.join(d, f"f{i:06d}.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(lines[i:i + per]) + "\n")
        paths.append(p)
    replay_batch(spark, paths, table, files_per_batch=1, cfg=cfg)

    base_cols = ("doc_id", "source", "text")
    want = sorted(
        tuple(r) for r in refinery_plan(docs.select(*base_cols)).collect()
    )
    got = sorted(
        tuple(r)
        for r in refinery_plan(table.read(spark).select(*base_cols)).collect()
    )
    assert got == want
    assert len(want) > 0
