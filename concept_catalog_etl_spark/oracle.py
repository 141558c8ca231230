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


def _struct_members(type_str: str) -> list[tuple[str, str]] | None:
    """Parse ``struct<name:type,...>`` (bracket-aware) → [(name, type)]."""
    s = type_str.strip()
    if not (s.startswith("struct<") and s.endswith(">")):
        return None
    body, parts, depth, start = s[7:-1], [], 0, 0
    for i, ch in enumerate(body):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    if body:
        parts.append(body[start:])
    return [(p.partition(":")[0].strip(), p.partition(":")[2].strip())
            for p in parts]


class OracleSchema:
    """Mirror of TableSchema: field ids 1..4 = doc_id, tokens, n_tok, source.

    Struct-typed columns carry per-member ``nested`` defs with their own
    ids; a dotted ``schema_change`` column addresses a member INSIDE a
    struct (same wire contract as the engine)."""

    #: the canonical table's creation columns (helpers.make_table)
    CANONICAL = [
        ("doc_id", "string"), ("tokens", "array<int>"),
        ("n_tok", "int"), ("source", "string"),
    ]

    def __init__(self, cols: list[tuple[str, str]] | None = None):
        """``cols`` mirrors the TableSchema.create column list (defaults to
        the canonical 4-column table). Id minting follows the engine's
        order exactly: column id, then its nested member ids, then the
        next column — so drop/re-add freshness agrees."""
        self.fields: list[dict] = []
        self.next_id = 1
        for name, typ in (cols or self.CANONICAL):
            fid = self.next_id
            self.next_id += 1
            f = {"id": fid, "name": name, "type": typ, "default": None}
            f["nested"] = self._mint_nested(typ)
            self.fields.append(f)

    def _mint_nested(self, type_str: str) -> list[dict] | None:
        members = _struct_members(type_str)
        if members is None:
            return None
        out = []
        for name, typ in members:
            nid = self.next_id
            self.next_id += 1
            out.append({"id": nid, "name": name, "type": typ,
                        "default": None, "nested": self._mint_nested(typ)})
        return out

    def _walk(self, column: str) -> tuple[list[dict], str]:
        """Dotted path → (the member list holding the leaf, leaf name)."""
        segs = column.split(".")
        fld = next(f for f in self.fields if f["name"] == segs[0])
        members = fld.get("nested")
        for seg in segs[1:-1]:
            members = next(m for m in members if m["name"] == seg)["nested"]
        return members, segs[-1]

    def apply(self, sc: dict) -> None:
        kind = sc["kind"]
        column = sc["column"]
        if "." in column:
            members, leaf = self._walk(column)
            if kind == "add":
                nd = sc.get("new_default")
                nid = self.next_id
                self.next_id += 1
                members.append({
                    "id": nid, "name": leaf,
                    "type": sc.get("new_type") or "string",
                    "default": json.loads(nd) if isinstance(nd, str) else nd,
                    "nested": self._mint_nested(sc.get("new_type") or "string"),
                })
            elif kind == "rename":
                next(m for m in members if m["name"] == leaf)["name"] = sc["new_name"]
            elif kind == "widen":
                next(m for m in members if m["name"] == leaf)["type"] = sc["new_type"]
            elif kind == "drop":
                members[:] = [m for m in members if m["name"] != leaf]
            return
        if kind == "add":
            nd = sc.get("new_default")
            self.fields.append(
                {"id": self.next_id, "name": column,
                 "type": sc.get("new_type") or "string",
                 "default": json.loads(nd) if isinstance(nd, str) else nd}
            )
            self.next_id += 1
            self.fields[-1]["nested"] = self._mint_nested(
                sc.get("new_type") or "string"
            )
        elif kind == "rename":
            for f in self.fields:
                if f["name"] == column:
                    f["name"] = sc["new_name"]
        elif kind == "widen":
            for f in self.fields:
                if f["name"] == column:
                    f["type"] = sc["new_type"]
        elif kind == "drop":
            # field id retired: stored values for it vanish from the final
            # projection; a later re-add mints a fresh id (no resurrection).
            # The key and the contract trio (tokens/n_tok/source, ids 1-4)
            # refuse, mirroring the engine (operators/merge.py)
            if any(f["name"] == column and f["id"] <= 4 for f in self.fields):
                raise ValueError(f"cannot drop contract column: {column}")
            self.fields = [f for f in self.fields if f["name"] != column]

    def payload_names(self) -> list[tuple[int, str]]:
        return [(f["id"], f["name"]) for f in self.fields if f["id"] != 1]

    def payload_fields(self) -> list[dict]:
        return [f for f in self.fields if f["id"] != 1]


def _capture(members: list[dict], val) -> dict | None:
    """Struct value → id-keyed tree AT EVENT TIME (current member names):
    a missing/null member key stores an explicit None (the row was written
    while the member existed — nulls stay null); a member the schema does
    not know YET at this line is simply not captured (its id is absent), so
    the final projection backfills its initial-default — the Iceberg v3
    rule, applied per-event exactly like the engine's lsn add-gate."""
    if not isinstance(val, dict):
        return None  # from_json parity: non-object where a struct expected
    out: dict[int, object] = {}
    for m in members:
        v = val.get(m["name"])
        out[m["id"]] = (
            _capture(m["nested"], v) if m.get("nested") is not None and v is not None
            else (None if m.get("nested") is not None else v)
        )
    return out


def _project(members: list[dict], tree) -> dict | None:
    """id-keyed tree → row dict under FINAL member names; ids the tree
    predates read their initial-default (None for struct members)."""
    if tree is None:
        return None
    row: dict[str, object] = {}
    for m in members:
        if m["id"] in tree:
            v = tree[m["id"]]
            row[m["name"]] = (
                _project(m["nested"], v) if m.get("nested") is not None else v
            )
        else:
            row[m["name"]] = None if m.get("nested") is not None else m.get("default")
    return row


def replay(files: list[str],
           cols: list[tuple[str, str]] | None = None,
           ) -> tuple[dict[str, dict], OracleSchema, dict]:
    """→ (final_state keyed by doc_id with CURRENT column names,
          final schema, stats). ``cols`` = the table's creation column
    list when it differs from the canonical 4 (struct/binary tables)."""
    schema = OracleSchema(cols)
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
                    for fld in schema.payload_fields():
                        fid, name = fld["id"], fld["name"]
                        if fid in (2, 3):
                            continue
                        if fid == 4:
                            vals[4] = _tag_source(payload.get(name))
                        elif name in payload:
                            vals[fid] = (
                                _capture(fld["nested"], payload.get(name))
                                if fld.get("nested") is not None
                                else payload.get(name)
                            )
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
        for fld in schema.payload_fields():
            v = vals.get(fld["id"])
            row[fld["name"]] = (
                _project(fld["nested"], v)
                if fld.get("nested") is not None else v
            )
        final[doc] = row
    return final, schema, stats


def replay_dir(binlog_dir: str,
               cols: list[tuple[str, str]] | None = None,
               ) -> tuple[dict[str, dict], OracleSchema, dict]:
    # .jsonl = python generator; .txt = Spark-native generator output
    files = [
        os.path.join(binlog_dir, f)
        for f in os.listdir(binlog_dir)
        if f.endswith((".jsonl", ".txt"))
    ]
    if not files:
        raise FileNotFoundError(f"no .jsonl/.txt binlog files in {binlog_dir}")
    return replay(files, cols)
