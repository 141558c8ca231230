"""Single-threaded pure-Python oracle reducer (FIXTURES.md F5).

Replays an F2 binlog exactly like the engine must — last writer by
``(event_ts, lsn)`` per key, deletes remove, malformed events dropped (DLQ),
token normalization + n_tok recompute + source tagging, schema changes
applied in lsn order — producing the golden final table state. This plays
the role the reference ETL's own replay plays in the north metric: the
engine's table after full replay must equal this, row for row, token for
token (per-row token-array-equality invariant).

Deliberately naive (dicts + one loop) so it cannot share bugs with the
Spark implementation.
"""

from __future__ import annotations

import json
import os
import re

WRAP_RE = re.compile("^{\"?'?no\"?'?: ?\"?'?(.*)(\"+|'+)}$")
VALID_OPS = {"insert", "update", "delete", "schema_change"}
KNOWN_SOURCES = {"crawl", "curated", "synthetic"}


def _normalize_tokens(payload: dict) -> list[int] | None:
    toks = payload.get("tokens")
    if toks is not None:
        return [int(t) for t in toks]
    raw = payload.get("tokens_raw")
    if isinstance(raw, str):
        m = WRAP_RE.match(raw)
        if m:
            s = m.group(1).strip()
            if not s:
                return []
            try:
                return [int(x) for x in s.split()]
            except ValueError:
                return None
    return None


def _tag_source(src) -> str:
    s = str(src).strip().lower() if src is not None else ""
    return s if s in KNOWN_SOURCES else "crawl"


class OracleSchema:
    """Mirror of TableSchema: field ids 1..4 = doc_id, tokens, n_tok, source."""

    def __init__(self):
        self.fields: list[dict] = [
            {"id": 1, "name": "doc_id", "type": "string"},
            {"id": 2, "name": "tokens", "type": "array<int>"},
            {"id": 3, "name": "n_tok", "type": "int"},
            {"id": 4, "name": "source", "type": "string"},
        ]
        self.next_id = 5

    def apply(self, sc: dict) -> None:
        kind = sc["kind"]
        if kind == "add":
            self.fields.append(
                {"id": self.next_id, "name": sc["column"], "type": sc.get("new_type") or "string"}
            )
            self.next_id += 1
        elif kind == "rename":
            for f in self.fields:
                if f["name"] == sc["column"]:
                    f["name"] = sc["new_name"]
        elif kind == "widen":
            for f in self.fields:
                if f["name"] == sc["column"]:
                    f["type"] = sc["new_type"]
        elif kind == "drop":
            # field id retired: stored values for it vanish from the final
            # projection; a later re-add mints a fresh id (no resurrection).
            # The key and the contract trio (tokens/n_tok/source, ids 1-4)
            # refuse, mirroring the engine (operators/merge.py)
            if any(f["name"] == sc["column"] and f["id"] <= 4 for f in self.fields):
                raise ValueError(f"cannot drop contract column: {sc['column']}")
            self.fields = [f for f in self.fields if f["name"] != sc["column"]]

    def payload_names(self) -> list[tuple[int, str]]:
        return [(f["id"], f["name"]) for f in self.fields if f["id"] != 1]


def replay(files: list[str]) -> tuple[dict[str, dict], OracleSchema, dict]:
    """→ (final_state keyed by doc_id with CURRENT column names,
          final schema, stats)."""
    schema = OracleSchema()
    # state[doc_id] = (event_ts_str, lsn, values_by_field_id | None-for-delete)
    state: dict[str, tuple] = {}
    stats = {"events": 0, "dlq": 0, "deletes": 0, "schema_changes": 0}

    for path in sorted(files):
        with open(path) as f:
            for line in f:
                stats["events"] += 1
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    stats["dlq"] += 1
                    continue
                op = ev.get("op")
                if op not in VALID_OPS:
                    stats["dlq"] += 1
                    continue
                if op == "schema_change":
                    sc = ev.get("schema_change")
                    if sc is None:  # mirror engine 'null_schema_change' DLQ
                        stats["dlq"] += 1
                        continue
                    schema.apply(sc)
                    stats["schema_changes"] += 1
                    continue
                doc, ts, lsn = ev.get("doc_id"), ev.get("event_ts"), ev.get("lsn")
                if doc is None or ts is None or lsn is None:
                    stats["dlq"] += 1
                    continue
                payload = ev.get("payload")
                if op in ("insert", "update"):
                    if payload is None:
                        stats["dlq"] += 1
                        continue
                    tokens = _normalize_tokens(payload)
                    if tokens is None:
                        stats["dlq"] += 1
                        continue
                    vals: dict[int, object] = {2: tokens, 3: len(tokens)}
                    for fid, name in schema.payload_names():
                        if fid in (2, 3):
                            continue
                        if fid == 4:
                            vals[4] = _tag_source(payload.get(name))
                        elif name in payload:
                            vals[fid] = payload.get(name)
                    new = (ts, lsn, vals)
                else:  # delete
                    stats["deletes"] += 1
                    new = (ts, lsn, None)
                cur = state.get(doc)
                if cur is None or (new[0], new[1]) > (cur[0], cur[1]):
                    state[doc] = new

    final: dict[str, dict] = {}
    for doc, (_ts, _lsn, vals) in state.items():
        if vals is None:
            continue
        row = {"doc_id": doc}
        for fid, name in schema.payload_names():
            row[name] = vals.get(fid)
        final[doc] = row
    return final, schema, stats


def replay_dir(binlog_dir: str) -> tuple[dict[str, dict], OracleSchema, dict]:
    # .jsonl = python generator; .txt = Spark-native generator output
    files = [
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith((".jsonl", ".txt"))
    ]
    if not files:
        raise FileNotFoundError(f"no .jsonl/.txt binlog files in {binlog_dir}")
    return replay(files)
