"""Local mirror of the driver's CORRECTNESS gate: run every oracle-backed
query in ``__spark_entry__.queries()`` Spark-side AND its DuckDB oracle SQL
on the same parquet tables, compare row count / column names / value
multiset, and print one JSON line per query.

Usage: python oracle_check.py [sf_dir] [query ...] [--group NAME ...]
Defaults to /root/testdata/sf0.01 and all queries. ``--group`` selects a
named registry family (core/cdc/dedup/ann/text/pipeline — see
``plans.queries.GROUPS``); it composes with explicit query names.
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _value_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        t = tuple(_norm(r[i]) for i in order)
        out[t] = out.get(t, 0) + 1
    return out


def main() -> int:
    args = sys.argv[1:]
    groups: list[str] = []
    rest: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--group":
            groups.append(args[i + 1])
            i += 2
        else:
            rest.append(args[i])
            i += 1
    sf = rest[0] if rest else "/root/testdata/sf0.01"
    only = set(rest[1:])
    if groups:
        from concept_catalog_etl_spark.plans.queries import GROUPS

        for g in groups:
            if g not in GROUPS:
                print(json.dumps({"err": f"unknown group {g!r}; "
                                         f"one of {sorted(GROUPS)}"}))
                return 2
            only |= set(GROUPS[g])
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf  # generated oracles follow sf
    import __spark_entry__ as entry_mod
    from concept_catalog_etl_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": name, "err": f"spark: {e}"[:200]}))
            bad += 1
            continue
        if name not in sqls:
            print(json.dumps({"q": name, "rows": len(s_rows), "oracle": None}))
            continue
        try:
            cur = con.execute(sqls[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": name, "err": f"duckdb: {e}"[:200]}))
            bad += 1
            continue
        rows_match = len(s_rows) == len(o_rows)
        schema_match = sorted(s_cols) == sorted(o_cols)
        hash_match = (
            schema_match
            and _value_multiset(s_cols, s_rows) == _value_multiset(o_cols, o_rows)
        )
        ok = rows_match and schema_match and hash_match
        bad += not ok
        print(json.dumps({
            "q": name, "rows": len(s_rows), "oracle_rows": len(o_rows),
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match,
        }))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
