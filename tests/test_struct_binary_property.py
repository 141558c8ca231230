"""Hypothesis replay property over a struct+binary payload (round-5
verdict task 3 done-criterion): arbitrary small event sequences carrying a
nested struct column, a binary blob column and a map column — mixed ops,
colliding coordinates, arbitrary batch split points, optionally a nested
schema_change (add with default / rename) mid-stream — must reach ORACLE
EQUALITY on final table state.
"""

import base64
import json
import os
import shutil

from hypothesis import HealthCheck, given, settings, strategies as st

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.streaming.replay import replay_batch

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "struct_binary_property")

COLS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
    ("meta", "struct<w:int,lang:string>"),
    ("blob", "binary"),
    ("tags", "map<string,string>"),
]

event_st = st.fixed_dictionaries({
    "op": st.sampled_from(["insert", "update", "update", "delete"]),
    "doc": st.integers(0, 4),              # few keys → collisions guaranteed
    "ts_s": st.integers(0, 3),             # few timestamps → LWW ties on ts
    "toks": st.lists(st.integers(0, 99), min_size=0, max_size=4),
    "w": st.one_of(st.none(), st.integers(-5, 5)),
    "lang": st.one_of(st.none(), st.sampled_from(["no", "en"])),
    "meta_null": st.booleans(),
    "blob": st.one_of(st.none(), st.binary(min_size=0, max_size=6)),
    "tags": st.one_of(
        st.none(),
        st.dictionaries(st.sampled_from(["a", "b", "c"]),
                        st.sampled_from(["x", "y"]), max_size=3),
    ),
    # after a mid-stream nested add, optionally carry the new member
    "h": st.one_of(st.none(), st.integers(0, 9)),
})


def _line(ev, lsn, meta_has_h):
    doc = f"doc-{ev['doc']:06d}"
    ts = f"1970-01-01T00:00:{ev['ts_s']:02d}.000000"
    if ev["op"] == "delete":
        return json.dumps({"op": "delete", "doc_id": doc,
                           "event_ts": ts, "lsn": lsn})
    meta = None
    if not ev["meta_null"]:
        meta = {"w": ev["w"], "lang": ev["lang"]}
        if meta_has_h and ev["h"] is not None:
            meta["h"] = ev["h"]
    payload = {
        "tokens": ev["toks"], "tokens_raw": None, "n_tok": len(ev["toks"]),
        "source": "crawl", "meta": meta,
        "blob": base64.b64encode(ev["blob"]).decode()
        if ev["blob"] is not None else None,
        "tags": ev["tags"],
    }
    return json.dumps({"op": ev["op"], "doc_id": doc, "event_ts": ts,
                       "lsn": lsn, "payload": payload})


def _normalize_engine(d: dict) -> dict:
    out = dict(d)
    if out.get("blob") is not None:
        out["blob"] = base64.b64encode(bytes(out["blob"])).decode()
    if out.get("tokens") is not None:
        out["tokens"] = [int(t) for t in out["tokens"]]
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=20),
       split=st.integers(1, 19), seed=st.integers(0, 10**6),
       mode=st.sampled_from(["cow", "mor"]),
       evolve=st.sampled_from(["none", "add_h", "rename_w"]))
def test_struct_binary_replay_matches_oracle(spark, events, split, seed,
                                             mode, evolve):
    d = os.path.join(SCRATCH, f"ex_{seed}_{len(events)}_{split}_{mode}_{evolve}")
    shutil.rmtree(d, ignore_errors=True)
    binlog = os.path.join(d, "binlog")
    os.makedirs(binlog)

    cut = min(split, len(events))
    lines, lsn = [], 0
    for i, ev in enumerate(events):
        if i == cut and evolve != "none":
            sc = ({"kind": "add", "column": "meta.h", "new_name": None,
                   "new_type": "int", "new_default": json.dumps(7)}
                  if evolve == "add_h" else
                  {"kind": "rename", "column": "meta.w", "new_name": "width",
                   "new_type": None})
            lines.append(json.dumps({
                "op": "schema_change", "doc_id": None,
                "event_ts": "1970-01-01T00:00:05.000000", "lsn": lsn,
                "schema_change": sc}))
            lsn += 1
        # events after a rename keep sending the OLD member name — the
        # stale-key-reads-null rule must hold inside structs too
        lines.append(_line(ev, lsn, meta_has_h=(evolve == "add_h" and i >= cut)))
        lsn += 1

    for i, chunk in enumerate((lines[:cut], lines[cut:])):
        if chunk:
            with open(os.path.join(binlog, f"f{i}.jsonl"), "w") as f:
                f.write("\n".join(chunk) + "\n")
    paths = sorted(os.path.join(binlog, f) for f in os.listdir(binlog))

    table = LakeTable.create(
        os.path.join(d, "table"), TableSchema.create(COLS, key="doc_id"),
        n_buckets=4,
    )
    from concept_catalog_etl_spark.operators.merge import MergeConfig

    replay_batch(spark, paths, table, files_per_batch=1,
                 cfg=MergeConfig(write_mode=mode))

    oracle_state, _schema, _stats = replay_dir(binlog, COLS)
    got = {r["doc_id"]: _normalize_engine(r.asDict(recursive=True))
           for r in table.read(spark).collect()}
    assert set(got) == set(oracle_state)
    for doc, orow in oracle_state.items():
        for col, oval in orow.items():
            assert got[doc].get(col) == oval, (
                f"{doc}.{col}: engine={got[doc].get(col)!r} oracle={oval!r}"
            )
    shutil.rmtree(d, ignore_errors=True)
