"""Local mirror of the driver's CORRECTNESS gate: run every oracle-backed
query in ``__spark_entry__.queries()`` Spark-side AND its DuckDB oracle SQL
on the same parquet tables, compare row count / column names / value
multiset, and print one JSON line per query.

Usage: python oracle_check.py [sf_dir] [query ...] [--group NAME ...]
                              [--changed GIT_RANGE]
Defaults to /root/testdata/sf0.01 and all queries. ``--group`` selects a
named registry family (core/cdc/dedup/ann/text/pipeline — see
``plans.queries.GROUPS``); it composes with explicit query names.

``--changed GIT_RANGE`` (round-5 verdict task 7) maps the files touched
in a git range to the affected query set, so the iteration loop re-checks
only what a change can break instead of the full ~30-min registry sweep:
* a hunk inside ``plans/queries.py`` maps to the query whose ``def``
  encloses it (git's hunk header function context), plus any query whose
  oracle/helper constant shares the hunk;
* engine-module changes map module → family via _CHANGED_GROUPS;
* anything unmapped (conftest, bench, lakehouse core...) is conservative:
  it selects the whole registry (printed, so silent under-coverage is
  impossible).
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


# engine module prefix → registry families its changes can break. Query
# plans touch ONLY functions/ + plans/ at runtime; the lakehouse/CDC
# modules are exercised by their own pytest suites, but dedup.py feeds
# the q_lww_* / q_merge_* combinators, so map what's genuinely shared.
_CHANGED_GROUPS: dict[str, list[str]] = {
    "concept_catalog_etl_spark/functions/vector": ["ann", "dedup"],
    "concept_catalog_etl_spark/functions/vectorized": ["core"],
    "concept_catalog_etl_spark/functions/multimodal": ["pipeline"],
    "concept_catalog_etl_spark/functions/reference_repair": ["core"],
    "concept_catalog_etl_spark/operators/dedup": ["core", "cdc", "dedup"],
    "concept_catalog_etl_spark/operators/skew": ["core", "cdc"],
    "concept_catalog_etl_spark/plans/": [],  # per-def mapping below
}
# paths that cannot affect any registry query's result
_CHANGED_IGNORE = ("tests/", "bench", "BENCH", "docs", ".md", ".json",
                   "package_zip.py", "submit_main.py", "__spark_entry__.py",
                   "oracle_check.py", ".scratch", ".claude")


def _queries_py_changed(git_range: str, path: str) -> set[str] | None:
    """Changed lines inside plans/queries.py → affected query names, by
    enclosing top-level block + a transitive name-reference closure (a
    helper like ``refinery_plan`` or an oracle constant like
    ``SQL_REFINERY`` maps back to every ``q_*`` whose definition
    references it, directly or through other helpers)."""
    import ast
    import re
    import subprocess

    diff = subprocess.check_output(
        ["git", "diff", "-U0", git_range, "--", path], text=True
    )
    new_lines: set[int] = set()
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff,
                         re.MULTILINE):
        start, n = int(m.group(1)), int(m.group(2) or "1")
        # pure deletions (n=0) still anchor at the enclosing new-file line
        new_lines.update(range(start, start + max(n, 1)))
    if not new_lines:
        return set()

    src = open(path).read()
    tree = ast.parse(src)
    spans: dict[str, tuple[int, int]] = {}
    refs: dict[str, set[str]] = {}
    for node in tree.body:
        names = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        if not names:
            continue
        end = getattr(node, "end_lineno", node.lineno)
        used = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for nm in names:
            spans[nm] = (node.lineno, end)
            refs[nm] = used - {nm}

    changed_blocks = {
        nm for nm, (a, b) in spans.items()
        if any(a <= ln <= b for ln in new_lines)
    }
    if not changed_blocks:
        return set()
    # a direct edit to the registry dicts (reorder, re-wire) is
    # unattributable to specific queries — run everything
    registry = {"QUERIES", "ORACLES", "GROUPS", "DRIVER_WINDOW"}
    if changed_blocks & registry:
        return None
    # fixed-point closure OUTSIDE the registry aggregates (they reference
    # every query, so walking through them would select the world): a
    # block is affected if it references an affected block
    # (q_refinery -> refinery_plan -> changed helper)
    affected = set(changed_blocks)
    while True:
        grew = {nm for nm, used in refs.items()
                if nm not in affected and nm not in registry
                and used & affected}
        if not grew:
            return {nm for nm in affected if nm.startswith("q_")}
        affected |= grew


def _changed_queries(git_range: str) -> set[str] | None:
    """Touched files in ``git_range`` → affected query names; None means
    'everything' (an unmapped engine file changed)."""
    import re
    import subprocess

    from concept_catalog_etl_spark.plans.queries import GROUPS, QUERIES

    files = subprocess.check_output(
        ["git", "diff", "--name-only", git_range], text=True
    ).splitlines()
    picked: set[str] = set()
    for f in files:
        if not f or any(tok in f for tok in _CHANGED_IGNORE):
            continue
        if f == "concept_catalog_etl_spark/plans/queries.py":
            sel = _queries_py_changed(git_range, f)
            if sel is None:
                return None  # registry edited in an unattributable way
            picked |= {q for q in sel if q in QUERIES}
            continue
        hit = next((g for p, g in _CHANGED_GROUPS.items() if f.startswith(p)),
                   None)
        if hit is None:
            return None  # unmapped engine file — be conservative
        for fam in hit:
            picked |= set(GROUPS[fam])
    return picked


def main() -> int:
    args = sys.argv[1:]
    groups: list[str] = []
    changed: list[str] = []
    rest: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--group":
            groups.append(args[i + 1])
            i += 2
        elif args[i] == "--changed":
            changed.append(args[i + 1])
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
    for rng in changed:
        sel = _changed_queries(rng)
        if sel is None:
            print(json.dumps({"changed": rng, "selected": "ALL",
                              "reason": "unmapped file touched"}))
            only = set()
            break
        print(json.dumps({"changed": rng, "selected": sorted(sel)}))
        if not sel and not only and not groups:
            print(json.dumps({"note": "no registry queries affected"}))
            return 0
        only |= sel
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
