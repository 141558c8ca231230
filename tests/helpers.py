"""Shared test helpers: canonical table creation + state comparison."""

from __future__ import annotations

import os

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema

CANONICAL_COLS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
]


def make_table(root: str, n_buckets: int = 8) -> LakeTable:
    schema = TableSchema.create(CANONICAL_COLS, key="doc_id")
    return LakeTable.create(os.path.join(root, "table"), schema, n_buckets=n_buckets)


def table_state(spark, table: LakeTable) -> dict[str, dict]:
    """Engine final state as {doc_id: row-dict} with plain-python values."""
    rows = table.read(spark).collect()
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        if d.get("tokens") is not None:
            d["tokens"] = [int(t) for t in d["tokens"]]
        out[d["doc_id"]] = d
    return out


def assert_state_equals_oracle(spark, table: LakeTable, oracle_state: dict[str, dict]):
    eng = table_state(spark, table)
    assert set(eng) == set(oracle_state), (
        f"key sets differ: engine-only={sorted(set(eng) - set(oracle_state))[:5]} "
        f"oracle-only={sorted(set(oracle_state) - set(eng))[:5]}"
    )
    for doc, orow in oracle_state.items():
        erow = eng[doc]
        for col, oval in orow.items():
            eval_ = erow.get(col)
            assert eval_ == oval, f"{doc}.{col}: engine={eval_!r} oracle={oval!r}"
        # per-row invariant: n_tok == len(tokens) (token-array equality gate)
        assert erow["n_tok"] == len(erow["tokens"])
