"""Thin SQL surface over the lake table: SELECT via temp views, and
``MERGE INTO`` / ``UPDATE`` / ``DELETE`` strings lowered onto the existing
merge kernel (``operators.merge.apply_batch``) — so the SQL path inherits
exactly-once ledgering, LWW ordering, CoW/MoR write modes, DLQ and metrics
instead of reimplementing write semantics.

The reference's only write is the per-record ``$set`` upsert
(``/root/reference/files/load.py:20-22``) — morally ``MERGE INTO ... WHEN
MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``; this module
gives an analyst that statement (plus conditional clauses and DELETE)
without opening a second write path.

Grammar (deliberately restricted; anything else raises with the reason):

    MERGE INTO <target alias?> USING <view | (subquery) alias> ON <cond>
      [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | t.c = <expr>, ...]
      [WHEN MATCHED [AND <cond>] THEN DELETE]
      [WHEN NOT MATCHED [BY TARGET] [AND <cond>]
         THEN INSERT * | (cols) VALUES (exprs)]
      [WHEN NOT MATCHED BY SOURCE [AND <cond>]
         THEN DELETE | UPDATE SET t.c = <expr>, ...]

    UPDATE <name> SET c = <expr>, ... [WHERE <cond>]
    DELETE FROM <name> [WHERE <cond>]
    INSERT [OR REPLACE | OR IGNORE] INTO <name> [(cols)]
      VALUES (exprs), ... | SELECT ...
    CREATE TABLE [IF NOT EXISTS] <name> (
      <col> <type>, ..., PRIMARY KEY (k, ...)
      [, [CONSTRAINT nm] CHECK (<expr>)] ...
    ) [PARTITIONED BY (day(col) | month(col) | ... | col)] [BUCKETS n]
    ALTER TABLE <name> ADD COLUMN c <type> | RENAME COLUMN a TO b
      | ALTER COLUMN c [SET DATA] TYPE <type> | DROP COLUMN c
      | ADD CONSTRAINT nm CHECK (<expr>) | DROP CONSTRAINT nm
      | SET PARTITIONED BY (day(c) | c | ())   (spec evolution; () drops)
      | CREATE TAG nm [AS OF VERSION n] | DROP TAG nm
      | CREATE BRANCH nm [AS OF VERSION n] | DROP BRANCH nm
      | FAST FORWARD TO BRANCH nm
    SELECT ... FROM <name> [FOR VERSION AS OF n | 'tag'
      | FOR TIMESTAMP AS OF '<iso>'] ...   (time travel, via ``sql()``)
    OPTIMIZE <name> [MINOR] [ZORDER BY (c, ...) | CLUSTER BY (c, ...)]
    VACUUM <name> [RETAIN n SNAPSHOTS]
    ROLLBACK TABLE <name> TO VERSION n    (via ``run_maintenance``)
    DESCRIBE [HISTORY] <name>             (via ``describe_sql``)
    SHOW CREATE TABLE                     (via ``show_create_table``)

* ``ON`` must equate EVERY key component (``t.k = s.k AND ...``): the
  kernel upserts by full key, so a partial-key merge would be a different
  (join-update) operation — refused, not approximated.
* Clause conditions and expressions are Spark SQL, evaluated against the
  joined row with aliases ``t`` (target) and ``s`` (source) in scope —
  Catalyst does the expression work; this module only plans.
* SQL MERGE semantics: clauses fire first-match-wins per source row;
  duplicate source keys raise (like Delta/SQL:2016 cardinality violation)
  unless ``allow_duplicate_source=True``, in which case the kernel's
  deterministic LWW tie-break picks one.

At scale: the only extra work vs the Python API is one join of the source
against the (bucket-pruned by Catalyst AQE, filter-pushed) target read when
a clause actually needs target state; the unconditional upsert form
(``UPDATE SET * / INSERT *``) skips the target read entirely and is exactly
``apply_batch``.
"""

from __future__ import annotations

import json as _json
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lakehouse.schema import TableSchema, parse_type
from ..lakehouse.table import LakeTable
from .dml import DML_WRITER, _coordinate, delete_where, update_where
from .envelope import SCHEMA_CHANGE_T, payload_struct
from .merge import MergeConfig, apply_batch


def register(spark: SparkSession, table: LakeTable, name: str, **read_kw) -> None:
    """Expose a lake table snapshot to ``spark.sql`` as a temp view."""
    table.read(spark, **read_kw).createOrReplaceTempView(name)


_TIME_TRAVEL_RE = re.compile(
    r"\b(?P<name>\w+)\s+FOR\s+(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(?P<val>'[^']*'|\S+)",
    re.IGNORECASE,
)


def sql(spark: SparkSession, tables: dict[str, LakeTable], query: str) -> DataFrame:
    """Run a SELECT with every named lake table registered as a view.

    Time travel (Iceberg/Delta ``FOR ... AS OF`` dialect)::

        SELECT ... FROM t FOR VERSION AS OF 3
        SELECT ... FROM t FOR TIMESTAMP AS OF '2026-01-01T00:00:00'

    The suffix is rewritten to a pinned temp view (``t__v3``) registered at
    that snapshot — the table's retained-version window applies
    (``VersionVacuumedError`` past it). ``TIMESTAMP AS OF`` resolves through
    ``LakeTable.version_as_of`` (commit wall-clock, monotone over versions).
    The rewrite is textual over table-name suffixes; a string literal that
    happens to contain the pattern is out of scope for this thin surface.
    """
    def _pin(m: re.Match) -> str:
        name = m.group("name")
        t = tables.get(name)
        if t is None:
            return m.group(0)
        val = m.group("val").strip("'")
        if m.group("kind").upper() == "VERSION":
            # a non-numeric value is a TAG name (Iceberg's VERSION AS OF
            # accepts tags) — resolved through the table's tag registry
            try:
                v = int(val)
            except ValueError:
                tags = t.tags()
                if val not in tags:
                    raise ValueError(f"no such tag on {name!r}: {val!r}")
                v = tags[val]
        else:
            v = t.version_as_of(val)
        view = f"{name}__v{v}"
        register(spark, t, view, version=v)
        return view

    query = _TIME_TRAVEL_RE.sub(_pin, query)
    for name, t in tables.items():
        register(spark, t, name)
    return spark.sql(query)


# --------------------------------------------------------------- parsing

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>\w+)(?:\s+(?:AS\s+)?(?P<talias>\w+))?"
    r"\s+USING\s+(?P<source>\(.*?\)|\w+)(?:\s+(?:AS\s+)?(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.*?)(?=\s+WHEN\s)(?P<clauses>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.*?|DELETE|INSERT\s+.*?)"
    r"(?=\s+WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_ON_EQ_RE = re.compile(
    r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", re.IGNORECASE
)


def _split_cols(s: str) -> list[str]:
    """Comma-split a COLUMN-DEFINITION list: additionally ``<>``-aware so
    struct/map/array type strings keep their internal commas. Only safe
    where ``<``/``>`` cannot be comparison operators at depth 0 — i.e. the
    CREATE TABLE body (CHECK expressions sit inside their own parens);
    expression contexts use ``_split_top_level``."""
    out, depth, ang, q, cur = [], 0, 0, None, []
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "<":
            ang += 1
        elif ch == ">" and ang:
            ang -= 1
        elif ch == "," and depth == 0 and ang == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside parens/quotes (assignment/value lists)."""
    out, depth, q, cur = [], 0, None, []
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _parse_on(on: str, talias: str, salias: str, key_names: list[str]) -> dict:
    """ON must equate every key component; returns {target_key: source_col}."""
    pairs: dict[str, str] = {}
    for part in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
        m = _ON_EQ_RE.match(part)
        if not m:
            raise ValueError(
                f"unsupported ON term {part!r}: need <alias>.<col> = <alias>.<col>"
            )
        a1, c1, a2, c2 = m.groups()
        if a1.lower() == talias.lower() and a2.lower() == salias.lower():
            pairs[c1] = c2
        elif a1.lower() == salias.lower() and a2.lower() == talias.lower():
            pairs[c2] = c1
        else:
            raise ValueError(f"ON term {part!r} must relate {talias!r} and {salias!r}")
    missing = [k for k in key_names if k not in pairs]
    if missing:
        raise ValueError(
            f"ON must equate every key component; missing {missing} "
            f"(key: {key_names}) — a partial-key MERGE is a join-update, "
            "which this kernel deliberately does not express"
        )
    extra = [k for k in pairs if k not in key_names]
    if extra:
        raise ValueError(f"ON references non-key target column(s): {extra}")
    return pairs


def merge_into_sql(
    spark: SparkSession,
    table: LakeTable,
    stmt: str,
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
    allow_duplicate_source: bool = False,
) -> dict:
    """Lower a MERGE INTO statement onto ``apply_batch``; returns the merge
    metrics dict. The target name in the statement is decorative (the table
    handle is authoritative); the source is a temp view name or an inline
    ``(subquery) alias``."""
    m = _MERGE_RE.match(stmt)
    if not m:
        raise ValueError(
            "unsupported MERGE shape — expected MERGE INTO t USING s ON ... "
            "WHEN [NOT] MATCHED [AND ...] THEN UPDATE SET ...|DELETE|INSERT ..."
        )
    talias = m.group("talias") or "t"
    salias = m.group("salias") or "s"
    src_sql = m.group("source")
    src = (
        spark.sql(src_sql[1:-1]) if src_sql.startswith("(") else spark.table(src_sql)
    )
    schema = table.schema()
    key_names = schema.key_names
    on_pairs = _parse_on(m.group("on"), talias, salias, key_names)

    clauses = []
    for cm in _CLAUSE_RE.finditer(m.group("clauses")):
        action = cm.group("action").strip()
        by = (cm.group("by") or "").upper()
        clauses.append({
            "matched": cm.group("not") is None,
            "by": by,
            "by_source": cm.group("not") is not None and by == "SOURCE",
            "cond": cm.group("cond"),
            "action": action,
        })
    if not clauses:
        raise ValueError("MERGE needs at least one WHEN clause")
    for c in clauses:
        up = c["action"].upper()
        if c["matched"] and c["by"]:
            raise ValueError("BY SOURCE/TARGET is only valid with WHEN NOT MATCHED")
        if c["by_source"]:
            # target rows with no source row: DELETE or UPDATE SET only,
            # and the action can reference target columns only
            if up.startswith("INSERT"):
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports UPDATE SET ... or DELETE"
                )
        elif not c["matched"] and not up.startswith("INSERT"):
            raise ValueError("WHEN NOT MATCHED [BY TARGET] supports only INSERT")
        if c["matched"] and up.startswith("INSERT"):
            raise ValueError("WHEN MATCHED supports UPDATE SET ... or DELETE")
    src_missing = [c for c in clauses if c["by_source"]]
    main_clauses = [c for c in clauses if not c["by_source"]]

    if not allow_duplicate_source:
        # SQL:2016 / Delta cardinality rule: two source rows hitting one
        # target key is an error, not a nondeterministic pick. One agg on
        # the (batch-sized) source.
        dup = (
            src.groupBy(*[F.col(on_pairs[k]).alias(k) for k in key_names])
            .count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"duplicate source rows for key {tuple(dup[0][k] for k in key_names)}; "
                "dedupe the source or pass allow_duplicate_source=True"
            )

    # The classic upsert — unconditional UPDATE SET * + INSERT * covering
    # BOTH sides — needs no target state at all (matched or not, the source
    # row wins wholesale), so it lowers to apply_batch with zero target
    # read. Anything else (a clause condition, a partial SET, DELETE, or a
    # one-sided statement where fire/skip depends on existence) joins the
    # target once.
    upsert_only = (
        len(clauses) == 2
        and not src_missing
        and {c["matched"] for c in clauses} == {True, False}
        and all(c["cond"] is None for c in clauses)
        and all(
            c["action"].upper().replace(" ", "") in ("UPDATESET*", "INSERT*")
            for c in clauses
        )
    )
    pstruct = payload_struct(schema)
    payload_names = [f.name for f in pstruct.fields]
    ts = F.lit(_coordinate(event_ts)).cast("timestamp")

    def _payload_from(prefix: str | None, overrides: dict[str, str],
                      visible: list[str]):
        parts = []
        for f in pstruct.fields:
            if f.name in overrides:
                col = F.expr(overrides[f.name])
            elif prefix is not None and f.name in visible:
                col = F.col(f"{prefix}.{f.name}")
            else:
                col = F.lit(None)
            parts.append(col.cast(f.dataType).alias(f.name))
        return F.struct(*parts)

    if upsert_only:
        # pure upsert: no target read at all — this IS apply_batch, payload
        # straight from the source columns by name (SET * / INSERT *)
        env = src.select(
            F.lit("update").alias("op"),
            *[F.col(on_pairs[k]).alias(k) for k in key_names],
            ts.alias("event_ts"),
            F.lit(int(lsn)).cast("long").alias("lsn"),
            F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
            F.struct(*[
                (F.col(f.name) if f.name in src.columns else F.lit(None))
                .cast(f.dataType).alias(f.name)
                for f in pstruct.fields
            ]).alias("payload"),
            F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
        )
        cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                           writer_id=DML_WRITER)
        return apply_batch(spark, table, env, batch_id, cfg)

    # general form: join source against the live target ONCE; aliases t/s
    # stay in scope for clause conditions and SET expressions. With a
    # BY SOURCE clause the join is FULL OUTER (target-only rows must
    # surface) — still one key-partitioned join, never a second target
    # scan for an anti side.
    tgt = table.read(spark).withColumn("_matched", F.lit(True))
    tgt_cols = [c for c in tgt.columns if c != "_matched"]
    srcm = src.withColumn("_s_present", F.lit(True))
    joined = srcm.alias(salias).join(
        tgt.alias(talias),
        on=[F.col(f"{salias}.{on_pairs[k]}") == F.col(f"{talias}.{k}")
            for k in key_names],
        how="full" if src_missing else "left",
    )
    t_present = F.col(f"{talias}._matched").isNotNull()
    s_present = F.col(f"{salias}._s_present").isNotNull()
    matched_col = t_present & s_present

    op_col = F.lit(None).cast("string")
    payload_col = F.lit(None).cast(pstruct)
    # first-match-wins: build when-chains in REVERSE so earlier clauses
    # override later ones. The two families (main vs BY SOURCE) fire on
    # disjoint rows (source present vs absent), so chaining them into one
    # op column is order-independent across families.
    for c in reversed(main_clauses):
        fire = matched_col if c["matched"] else s_present & ~t_present
        if c["cond"]:
            fire = fire & F.expr(c["cond"])
        up = c["action"].upper()
        if up == "DELETE":
            op, pay = "delete", F.lit(None).cast(pstruct)
        elif up.startswith("UPDATE"):
            body = re.sub(r"^UPDATE\s+SET\s+", "", c["action"],
                          flags=re.IGNORECASE).strip()
            if body == "*":
                overrides = {
                    n: f"{salias}.{n}" for n in payload_names if n in src.columns
                }
            else:
                overrides = {}
                for a in _split_top_level(body):
                    am = re.match(r"^(?:(\w+)\.)?(\w+)\s*=\s*(.*)$", a, re.DOTALL)
                    if not am or (am.group(1) or talias).lower() != talias.lower():
                        raise ValueError(f"bad SET assignment {a!r}")
                    if am.group(2) in key_names:
                        raise ValueError(f"cannot SET key column {am.group(2)!r}")
                    overrides[am.group(2)] = am.group(3)
            # unset columns keep the CURRENT row's values (row-granular LWW);
            # payload fields with no stored column (transform-era extras
            # like tokens_raw) carry null like the DML planner does
            op, pay = "update", _payload_from(talias, overrides, tgt_cols)
        else:  # INSERT
            body = re.sub(r"^INSERT\s*", "", c["action"], flags=re.IGNORECASE).strip()
            if body == "*":
                overrides = {
                    n: f"{salias}.{n}" for n in payload_names if n in src.columns
                }
            else:
                im = re.match(r"^\((?P<cols>.*?)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                              body, re.IGNORECASE | re.DOTALL)
                if not im:
                    raise ValueError(f"bad INSERT clause {body!r}")
                cols = [x.strip() for x in _split_top_level(im.group("cols"))]
                vals = _split_top_level(im.group("vals"))
                if len(cols) != len(vals):
                    raise ValueError("INSERT column/value count mismatch")
                overrides = {
                    c_: v for c_, v in zip(cols, vals) if c_ not in key_names
                }
            op, pay = "update", _payload_from(None, overrides, [])
        op_col = F.when(fire, F.lit(op)).otherwise(op_col)
        payload_col = F.when(fire, pay).otherwise(payload_col)

    # WHEN NOT MATCHED BY SOURCE: target rows with NO source row — the
    # snapshot-reconciliation form of MERGE (cf. operators/reconcile).
    # Conditions and SET expressions may reference TARGET columns only.
    # Source refs are rejected HERE at parse time (standard SQL does the
    # same): the joined frame would resolve them without error, but every
    # source column is all-null on these rows, so a condition like
    # ``s.flag = 1`` would silently evaluate to NULL (never fire) instead
    # of failing loudly.
    _sref = re.compile(rf"\b{re.escape(salias)}\s*\.\s*\w+", re.IGNORECASE)
    for c in reversed(src_missing):
        if c["cond"] and _sref.search(c["cond"]):
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE condition {c['cond']!r} "
                f"references source alias {salias!r}: there is no source "
                "row on these matches — use target columns only"
            )
        if c["action"].upper() != "DELETE" and _sref.search(c["action"]):
            raise ValueError(
                f"WHEN NOT MATCHED BY SOURCE SET {c['action']!r} "
                f"references source alias {salias!r}: there is no source "
                "row on these matches — use target columns only"
            )
        fire = t_present & ~s_present
        if c["cond"]:
            fire = fire & F.expr(c["cond"])
        up = c["action"].upper()
        if up == "DELETE":
            op, pay = "delete", F.lit(None).cast(pstruct)
        else:  # UPDATE SET (validated above)
            body = re.sub(r"^UPDATE\s+SET\s+", "", c["action"],
                          flags=re.IGNORECASE).strip()
            if body == "*":
                raise ValueError(
                    "UPDATE SET * is meaningless in WHEN NOT MATCHED BY "
                    "SOURCE (there is no source row) — list assignments"
                )
            overrides = {}
            for a in _split_top_level(body):
                am = re.match(r"^(?:(\w+)\.)?(\w+)\s*=\s*(.*)$", a, re.DOTALL)
                if not am or (am.group(1) or talias).lower() != talias.lower():
                    raise ValueError(f"bad SET assignment {a!r}")
                if am.group(2) in key_names:
                    raise ValueError(f"cannot SET key column {am.group(2)!r}")
                overrides[am.group(2)] = am.group(3)
            op, pay = "update", _payload_from(talias, overrides, tgt_cols)
        op_col = F.when(fire, F.lit(op)).otherwise(op_col)
        payload_col = F.when(fire, pay).otherwise(payload_col)

    env = (
        joined.select(
            op_col.alias("op"),
            *[
                F.coalesce(F.col(f"{salias}.{on_pairs[k]}"),
                           F.col(f"{talias}.{k}")).alias(k)
                for k in key_names
            ],
            ts.alias("event_ts"),
            F.lit(int(lsn)).cast("long").alias("lsn"),
            F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
            payload_col.alias("payload"),
            F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
        )
        .filter(F.col("op").isNotNull())  # rows firing no clause: no event
    )
    cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                       writer_id=DML_WRITER)
    return apply_batch(spark, table, env, batch_id, cfg)


_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<t>\w+)\s*",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_PK_RE = re.compile(
    r"^PRIMARY\s+KEY\s*\((?P<k>[^)]*)\)\s*", re.IGNORECASE | re.DOTALL,
)
_CREATE_TAIL_RE = re.compile(
    r"^\s*(?:PARTITIONED\s+BY\s*\(\s*"
    r"(?:(?P<ptrans>\w+)\s*\(\s*(?P<pcol1>\w+)\s*\)|(?P<pcol2>\w+))"
    r"\s*\)\s*)?"
    r"(?:BUCKETS\s+(?P<nb>\d+)\s*)?"
    r"(?:AS\s+(?P<select>SELECT\s+.*))?$",
    re.IGNORECASE | re.DOTALL,
)

def _type_str(dt) -> str:
    """Spark type → this engine's DDL dialect, for CTAS schema inference.
    The dialect is aligned with Spark's simpleString, so the round trip is
    validated through parse_type (anything the dialect can't hold fails
    loudly, e.g. void/interval)."""
    from ..lakehouse.schema import parse_type as _pt

    s = dt.simpleString()
    try:
        _pt(s)
    except ValueError:
        raise ValueError(f"CTAS cannot map Spark type {s!r} "
                         "into the table DDL dialect")
    return s


def _matched_paren_span(s: str, open_idx: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in CREATE TABLE")


def create_table_sql(stmt: str, *, root: str,
                     spark: SparkSession | None = None,
                     batch_id: int = 0, event_ts=None) -> LakeTable:
    """Lower a CREATE TABLE statement onto ``LakeTable.create``. ``root`` is
    the parent directory; the table lands at ``{root}/{name}``. The column
    types are this engine's DDL dialect (``lakehouse.schema.parse_type``:
    string/int/bigint/float/double/boolean/timestamp/array<T>); PRIMARY KEY
    is mandatory because every table is a keyed CDC target (the Mongo
    ``_id`` invariant, ``/root/reference/files/load.py:21``) — there is no
    heap-table mode to default into. ``PARTITIONED BY`` takes one identity
    column or one time transform over a key component (the partition module
    enforces the soundness contract); ``BUCKETS n`` sets the hash-bucket
    count. ``IF NOT EXISTS`` returns the existing handle untouched.

    CTAS: ``CREATE TABLE t PRIMARY KEY (k, ...) [PARTITIONED BY ...]
    [BUCKETS n] AS SELECT ...`` infers the schema from the SELECT (types
    reverse-mapped into the dialect) and loads the result through the merge
    kernel as batch ``batch_id`` — so even table seeding is exactly-once
    and DLQ'd. An explicit column list composes with AS SELECT (positional
    binding, like INSERT). Duplicate keys in the SELECT raise (cardinality
    rule). Requires ``spark``."""
    stmt = stmt.strip()
    m = _CREATE_HEAD_RE.match(stmt)
    if not m:
        raise ValueError(
            "unsupported CREATE TABLE shape — expected CREATE TABLE "
            "[IF NOT EXISTS] t (col type, ..., PRIMARY KEY (k, ...)) "
            "[PARTITIONED BY (transform(col) | col)] [BUCKETS n] "
            "[AS SELECT ...]"
        )
    rest = stmt[m.end():]

    cols: list[tuple[str, str]] | None = None
    keys: list[str] | None = None
    checks: dict[str, str] = {}
    if rest.startswith("("):
        close_idx = _matched_paren_span(rest, 0)
        body, rest = rest[1:close_idx - 1], rest[close_idx:]
        cols = []
        for part in _split_cols(body):
            km = re.match(r"^PRIMARY\s+KEY\s*\((?P<k>.*)\)$", part,
                          re.IGNORECASE | re.DOTALL)
            if km:
                if keys is not None:
                    raise ValueError("duplicate PRIMARY KEY clause")
                keys = [k.strip() for k in _split_top_level(km.group("k"))]
                continue
            ck = re.match(
                r"^(?:CONSTRAINT\s+(?P<nm>\w+)\s+)?CHECK\s*\((?P<e>.*)\)$",
                part, re.IGNORECASE | re.DOTALL)
            if ck:
                nm = ck.group("nm") or f"check_{len(checks) + 1}"
                if nm in checks:
                    raise ValueError(f"duplicate CHECK constraint name {nm!r}")
                checks[nm] = ck.group("e").strip()
                continue
            cm = re.match(r"^(\w+)\s+(.+)$", part, re.DOTALL)
            if not cm:
                raise ValueError(f"bad column definition {part!r}")
            type_str = re.sub(r"\s+", "", cm.group(2)).lower()
            parse_type(type_str)  # validate NOW — schema storage is lazy
            cols.append((cm.group(1), type_str))
    else:
        pk = _CREATE_PK_RE.match(rest)
        if pk:
            keys = [k.strip() for k in _split_top_level(pk.group("k"))]
            rest = rest[pk.end():]

    tail = _CREATE_TAIL_RE.match(rest)
    if not tail:
        raise ValueError(
            f"unsupported CREATE TABLE tail {rest!r} — expected "
            "[PARTITIONED BY (transform(col) | col)] [BUCKETS n] "
            "[AS SELECT ...]"
        )
    select = tail.group("select")
    if cols is None and select is None:
        raise ValueError(
            "CREATE TABLE needs a column list or AS SELECT (CTAS)"
        )
    if not keys:
        raise ValueError(
            "CREATE TABLE requires PRIMARY KEY (...) — every table in this "
            "engine is a keyed CDC target; there is no heap-table mode"
        )

    src = None
    if select is not None:
        if spark is None:
            raise ValueError("CTAS requires the spark session")
        src = spark.sql(select)
        if cols is None:
            cols = [(f.name, _type_str(f.dataType)) for f in src.schema.fields]
        elif len(src.columns) != len(cols):
            raise ValueError(
                f"CTAS SELECT produces {len(src.columns)} columns, "
                f"declared list has {len(cols)}"
            )
    bad_keys = [k for k in keys if k not in {c for c, _ in cols}]
    if bad_keys:
        raise ValueError(f"PRIMARY KEY references unknown column(s): {bad_keys}")
    if src is not None:
        # cardinality check BEFORE the table exists — a failing CTAS must
        # not leave a half-created table behind
        named = src.toDF(*[c for c, _ in cols])
        dup = (named.groupBy(*keys).count()
               .filter(F.col("count") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"duplicate source rows for key {tuple(dup[0][k] for k in keys)}; "
                "CTAS requires key-unique SELECT output"
            )
        src = named

    table_root = os.path.join(root, m.group("t"))
    if m.group("ine") and LakeTable.exists(table_root):
        return LakeTable(table_root)

    schema = TableSchema.create(cols, key=keys)
    pcol = tail.group("pcol1") or tail.group("pcol2")
    spec = (
        {"column": pcol,
         "transform": (tail.group("ptrans") or "identity").lower()}
        if pcol else None
    )
    if checks and spark is not None:
        # analyze each expression against an empty frame of the declared
        # schema NOW — an unknown column or bad syntax fails before the
        # table exists, not on the first ingest batch
        probe = spark.createDataFrame(
            [], ", ".join(f"{c} {ty}" for c, ty in cols))
        for nm, ex in checks.items():
            try:
                probe.filter(F.expr(ex).cast("boolean")).schema
            except Exception as e:
                raise ValueError(
                    f"CHECK constraint {nm!r} does not analyze against the "
                    f"declared columns: {e}") from None
    nb = int(tail.group("nb")) if tail.group("nb") else 32
    table = LakeTable.create(table_root, schema, n_buckets=nb,
                             partition_spec=spec,
                             check_constraints=checks or None)
    if src is not None:
        src.createOrReplaceTempView(f"_ctas_{m.group('t')}")
        insert_into_sql(
            spark, table,
            f"INSERT INTO {m.group('t')} SELECT * FROM _ctas_{m.group('t')}",
            batch_id=batch_id, event_ts=event_ts, on_conflict="replace",
            allow_duplicate_source=True,  # pre-checked above
        )
    return table


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:OR\s+(?P<or_>REPLACE|IGNORE)\s+)?INTO\s+(?P<t>\w+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?"
    r"(?P<body>VALUES\s*\(.*|SELECT\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)


def insert_into_sql(
    spark: SparkSession,
    table: LakeTable,
    stmt: str,
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
    on_conflict: str = "error",
    allow_duplicate_source: bool = False,
) -> dict:
    """Lower an INSERT INTO statement onto ``apply_batch``.

    This table has a primary key (≤1 live row per key — the Mongo ``_id``
    uniqueness invariant, ``/root/reference/files/load.py:21``), so INSERT
    carries primary-key semantics, not blind-append semantics:

    * ``on_conflict="error"`` (default, SQL PK behavior): a source key that
      already exists in the live table raises. Costs one key-pruned
      semi-join probe of the target.
    * ``on_conflict="ignore"`` (``INSERT OR IGNORE``): existing keys are
      dropped from the batch (anti-join), new keys land.
    * ``on_conflict="replace"`` (``INSERT OR REPLACE``): pure upsert —
      ZERO target read, exactly the kernel's LWW apply.

    Column list semantics are standard SQL: positional for the SELECT
    form, name-binding for the VALUES form; omitted columns are null;
    omitting a KEY column raises. Duplicate keys *within* the source are a
    cardinality error unless ``allow_duplicate_source=True`` (then the
    kernel's deterministic LWW tie-break picks one) — same rule as MERGE.
    """
    m = _INSERT_RE.match(stmt)
    if not m:
        raise ValueError(
            "unsupported INSERT shape — expected INSERT [OR REPLACE|OR IGNORE] "
            "INTO t [(cols)] VALUES (...)[, ...] | SELECT ..."
        )
    if m.group("or_"):
        on_conflict = m.group("or_").lower()
    if on_conflict not in ("error", "ignore", "replace"):
        raise ValueError(f"on_conflict must be error|ignore|replace, got {on_conflict!r}")

    schema = table.schema()
    key_names = schema.key_names
    pstruct = payload_struct(schema)
    default_cols = schema.names()  # stored columns in schema order
    cols = ([c.strip() for c in _split_top_level(m.group("cols"))]
            if m.group("cols") else default_cols)
    missing_keys = [k for k in key_names if k not in cols]
    if missing_keys:
        raise ValueError(f"INSERT must supply every key column; missing {missing_keys}")
    unknown = [c for c in cols if c not in default_cols]
    if unknown:
        raise ValueError(f"INSERT references unknown column(s): {unknown}")

    body = m.group("body").strip()
    if body.upper().startswith("VALUES"):
        src = spark.sql(f"SELECT * FROM {body} AS v({', '.join(cols)})")
    else:
        src = spark.sql(body)
        if len(src.columns) != len(cols):
            raise ValueError(
                f"INSERT SELECT produces {len(src.columns)} columns, "
                f"target list has {len(cols)}"
            )
        src = src.toDF(*cols)  # positional binding, standard SQL

    if not allow_duplicate_source:
        dup = (src.groupBy(*key_names).count()
               .filter(F.col("count") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"duplicate source rows for key {tuple(dup[0][k] for k in key_names)}; "
                "dedupe the source or pass allow_duplicate_source=True"
            )

    if on_conflict != "replace":
        # one probe of the live target, key columns only — bucket/partition
        # pruning and column pruning both apply to this read
        tgt_keys = table.read(spark).select(*key_names)
        if on_conflict == "error":
            clash = src.join(tgt_keys, on=key_names, how="semi").limit(1).collect()
            if clash:
                raise ValueError(
                    f"INSERT conflict: key {tuple(clash[0][k] for k in key_names)} "
                    "already exists (use OR IGNORE / OR REPLACE)"
                )
        else:  # ignore
            src = src.join(tgt_keys, on=key_names, how="left_anti")

    ts = F.lit(_coordinate(event_ts)).cast("timestamp")
    env = src.select(
        F.lit("insert").alias("op"),
        *[F.col(k) for k in key_names],
        ts.alias("event_ts"),
        F.lit(int(lsn)).cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        F.struct(*[
            (F.col(f.name) if f.name in cols else F.lit(None))
            .cast(f.dataType).alias(f.name)
            for f in pstruct.fields
        ]).alias("payload"),
        F.lit(None).cast(SCHEMA_CHANGE_T).alias("schema_change"),
    )
    cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                       writer_id=DML_WRITER)
    return apply_batch(spark, table, env, batch_id, cfg)


_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+ADD\s+CONSTRAINT\s+(?P<nm>\w+)\s+"
    r"CHECK\s*\((?P<e>.*)\)\s*$", re.IGNORECASE | re.DOTALL)
_REF_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+"
    r"(?:(?P<create>CREATE)|(?P<drop>DROP))\s+(?P<kind>TAG|BRANCH)\s+"
    r"(?P<nm>\w+)(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?\s*$",
    re.IGNORECASE,
)
_FF_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+FAST\s+FORWARD\s+TO\s+BRANCH\s+"
    r"(?P<nm>\w+)\s*$",
    re.IGNORECASE,
)


def _alter_ref_sql(table: LakeTable, stmt: str) -> dict | None:
    """Snapshot-ref DDL: tags (named immutable versions) and branches
    (forked writable histories) — metadata-only, no batch id (nothing is
    ingested; the ops are idempotent-by-name like their API forms).

        ALTER TABLE t CREATE TAG nm [AS OF VERSION n]
        ALTER TABLE t DROP TAG nm
        ALTER TABLE t CREATE BRANCH nm [AS OF VERSION n]
        ALTER TABLE t DROP BRANCH nm
        ALTER TABLE t FAST FORWARD TO BRANCH nm

    ``SELECT ... FROM t FOR VERSION AS OF 'nm'`` time-travels to a tag.
    Iceberg analogs: ALTER TABLE ... CREATE TAG/BRANCH, fast_forward."""
    fm = _FF_RE.match(stmt)
    if fm:
        return table.fast_forward(fm.group("nm"))
    m = _REF_RE.match(stmt)
    if not m:
        return None
    nm, kind = m.group("nm"), m.group("kind").upper()
    v = int(m.group("v")) if m.group("v") else None
    if m.group("create"):
        if kind == "TAG":
            return {"tag": nm, "version": table.tag(nm, v)}
        b = table.create_branch(nm, v)
        return {"branch": nm, "head_version": b.current_version()}
    if kind == "TAG":
        table.drop_tag(nm)
        return {"dropped_tag": nm}
    table.drop_branch(nm)
    return {"dropped_branch": nm}


_ROLLBACK_RE = re.compile(
    r"^\s*ROLLBACK\s+TABLE\s+(?P<name>\w+)\s+TO\s+VERSION\s+(?P<v>\d+)\s*$",
    re.IGNORECASE,
)


_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+DROP\s+CONSTRAINT\s+(?P<nm>\w+)\s*$",
    re.IGNORECASE)


def _alter_constraint_sql(spark: SparkSession, table: LakeTable,
                          stmt: str) -> dict | None:
    """ADD/DROP CONSTRAINT: a table-properties commit, not a schema_change.

    ADD validates EXISTING rows first (Delta semantics: a constraint you
    could not have ingested under must not appear retroactively) and the
    commit anchors ``expect_version`` at the version the scan read — a row
    landing between scan and commit fails the version check loudly instead
    of slipping in unvalidated (same anchor discipline as the schema-race
    guard). Enforcement starts at the next batch: ``apply_batch`` reads
    constraints from the live snapshot."""
    am = _ADD_CONSTRAINT_RE.match(stmt)
    dm = _DROP_CONSTRAINT_RE.match(stmt) if not am else None
    if not am and not dm:
        return None
    cur = table.current_version()
    checks = dict(table.snapshot(cur)["properties"]
                  .get("check_constraints") or {})
    if am:
        nm, ex = am.group("nm"), am.group("e").strip()
        if nm in checks:
            raise ValueError(f"constraint {nm!r} already exists")
        viol = (table.read(spark, version=cur)
                .filter(~F.coalesce(F.expr(ex).cast("boolean"), F.lit(True)))
                .limit(1).collect())
        if viol:
            raise ValueError(
                f"cannot ADD CONSTRAINT {nm}: existing row violates it "
                f"(e.g. {viol[0].asDict()})")
        checks[nm] = ex
    else:
        nm = dm.group("nm")
        if nm not in checks:
            raise KeyError(f"no such constraint: {nm}")
        del checks[nm]
    table.commit(extra_props={"check_constraints": checks},
                 expect_version=cur)
    return {"check_constraints": checks, "version": table.current_version()}


_ALTER_FORMS = [
    # (kind, regex over the clause after "ALTER TABLE <name> ")
    # A dotted column path (meta.h) addresses a member INSIDE a struct
    # column — Iceberg-style nested evolution by stable field-id path.
    ("add", re.compile(
        r"^ADD\s+COLUMN\s+(?P<column>\w+(?:\.\w+)*)\s+(?P<new_type>.+?)"
        r"(?:\s+DEFAULT\s+(?P<default>.+?))?\s*$",
        re.IGNORECASE | re.DOTALL)),
    ("rename", re.compile(
        r"^RENAME\s+COLUMN\s+(?P<column>\w+(?:\.\w+)*)\s+TO\s+(?P<new_name>\w+)\s*$",
        re.IGNORECASE)),
    ("widen", re.compile(
        r"^ALTER\s+COLUMN\s+(?P<column>\w+(?:\.\w+)*)\s+(?:SET\s+DATA\s+)?TYPE\s+"
        r"(?P<new_type>.+?)\s*$", re.IGNORECASE | re.DOTALL)),
    ("drop", re.compile(
        r"^DROP\s+COLUMN\s+(?P<column>\w+(?:\.\w+)*)\s*$", re.IGNORECASE)),
]
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+(?P<clause>.*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SET_PARTITION_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+SET\s+PARTITIONED\s+BY\s*\(\s*"
    r"(?:(?P<ptrans>\w+)\s*\(\s*(?P<pcol1>\w+)\s*\)|(?P<pcol2>\w+))?"
    r"\s*\)\s*$", re.IGNORECASE)


def _alter_partition_sql(table: LakeTable, stmt: str) -> dict | None:
    """``ALTER TABLE t SET PARTITIONED BY (day(col) | col | )``: partition
    spec evolution — a metadata-only commit (``LakeTable.set_partition_spec``,
    Iceberg spec-evolution analog), same clause grammar as CREATE TABLE's
    ``PARTITIONED BY``. An empty clause ``()`` drops partitioning for new
    writes. No data moves; old files keep pruning under the spec they were
    written with, and OPTIMIZE migrates them to the new spec."""
    m = _SET_PARTITION_RE.match(stmt)
    if not m:
        return None
    col = m.group("pcol1") or m.group("pcol2")
    spec = None
    if col is not None:
        spec = {"column": col,
                "transform": (m.group("ptrans") or "identity").lower()}
    snap = table.set_partition_spec(spec)
    return {"partition_spec": snap.get("partition_spec"),
            "default_spec_id": snap.get("default_spec_id"),
            "version": snap["version"]}


def alter_table_sql(
    spark: SparkSession,
    table: LakeTable,
    stmt: str,
    *,
    batch_id: int,
    cfg: MergeConfig | None = None,
    event_ts=None,
    lsn: int = 0,
) -> dict:
    """Lower an ALTER TABLE statement onto the schema_change event path.

    Forms::

        ALTER TABLE t ADD COLUMN c <type>
        ALTER TABLE t RENAME COLUMN a TO b
        ALTER TABLE t ALTER COLUMN c [SET DATA] TYPE <type>   -- widen only
        ALTER TABLE t DROP COLUMN c
        ALTER TABLE t ADD CONSTRAINT nm CHECK (<expr>)   -- props commit,
        ALTER TABLE t DROP CONSTRAINT nm                 -- existing rows
                                                         -- validated
        ALTER TABLE t SET PARTITIONED BY (day(c) | c | ())  -- spec
                                                            -- evolution

    Rather than opening a second metadata-write path, the statement becomes
    a one-row ``op=schema_change`` envelope applied through ``apply_batch``
    — so SQL DDL inherits exactly the feed's evolution semantics: the same
    add/rename/widen/drop kernel (``operators.merge._apply_schema_changes``,
    field-id rename mapping, ``can_widen`` legality, contract-column DROP
    protection for tokens/n_tok/source) and the same exactly-once batch-id
    ledger (re-running a committed ``batch_id`` is a no-op) the binlog's
    in-stream ``schema_change`` events get. Reference analog: the feed's
    envelope evolution (FIXTURES.md F2); Iceberg analog: ``ALTER TABLE``
    producing a new schema-id snapshot.

    Illegal evolutions (unknown column, non-widening TYPE change, ADD of an
    existing name, DROP of a contract column) raise from the kernel before
    any write — the commit is all-or-nothing.
    """
    r = _alter_constraint_sql(spark, table, stmt)
    if r is not None:
        return r
    r = _alter_partition_sql(table, stmt)
    if r is not None:
        return r
    r = _alter_ref_sql(table, stmt)
    if r is not None:
        return r
    m = _ALTER_RE.match(stmt)
    if not m:
        raise ValueError("expected ALTER TABLE <name> <clause>")
    clause = m.group("clause")
    for kind, rx in _ALTER_FORMS:
        cm = rx.match(clause)
        if cm:
            break
    else:
        raise ValueError(
            "unsupported ALTER TABLE clause — expected ADD COLUMN c <type> | "
            "RENAME COLUMN a TO b | ALTER COLUMN c [SET DATA] TYPE <type> | "
            f"DROP COLUMN c; got {clause!r}"
        )
    g = cm.groupdict()
    new_type = g.get("new_type")
    if new_type is not None:
        new_type = new_type.strip().lower()
        parse_type(new_type)  # unknown type strings fail here, pre-flight

    # ADD COLUMN ... DEFAULT <literal>: Iceberg-style initial-default —
    # rows written before the add read the literal back instead of null
    # (metadata-only backfill; see lakehouse.schema.Field). SQL string
    # literals use '...'; everything else must be a JSON literal (number,
    # true/false, [array]). Travels JSON-encoded in the wire struct.
    default_json = None
    draw = g.get("default")
    if draw is not None:
        lit = draw.strip()
        if lit.startswith("'") and lit.endswith("'") and len(lit) >= 2:
            val = lit[1:-1].replace("''", "'")
        else:
            try:
                val = _json.loads(lit)
            except ValueError:
                raise ValueError(
                    f"bad DEFAULT literal {lit!r}: use 'string', a number, "
                    "true/false, or a JSON array"
                )
        # pre-flight the default against the declared type at DDL time:
        # DEFAULT 'abc' on an int column (reads back NULL — the cast fails
        # at scan) and JSON objects (no Spark literal exists) are rejected
        # HERE with a clear message instead of poisoning the table
        from ..lakehouse.schema import _default_ok

        if not _default_ok(new_type or "string", val):
            raise ValueError(
                f"DEFAULT {lit} does not fit column type "
                f"{(new_type or 'string')!r} (defaults are supported for "
                "scalar and array types only, and must match the type)"
            )
        default_json = _json.dumps(val)

    schema = table.schema()
    ts = F.lit(_coordinate(event_ts)).cast("timestamp")
    env = spark.range(1).select(
        F.lit("schema_change").alias("op"),
        *[F.lit(None).cast(parse_type(f.type)).alias(f.name)
          for f in (schema.field_by_id(i) for i in schema.key_field_ids)],
        ts.alias("event_ts"),
        F.lit(int(lsn)).cast("long").alias("lsn"),
        F.lit(int(schema.schema_version)).cast("int").alias("schema_version"),
        F.lit(None).cast(payload_struct(schema)).alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(g["column"]).alias("column"),
            F.lit(g.get("new_name")).cast("string").alias("new_name"),
            F.lit(new_type).cast("string").alias("new_type"),
            F.lit(default_json).cast("string").alias("new_default"),
        ).alias("schema_change"),
    )
    cfg = cfg or MergeConfig.for_table(table, write_mode="mor",
                                       writer_id=DML_WRITER)
    return apply_batch(spark, table, env, batch_id, cfg)


_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<name>\w+)(?P<minor>\s+MINOR)?"
    r"(?:\s+(?P<mode>ZORDER|CLUSTER)\s+BY\s*\((?P<cols>[^)]*)\))?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<name>\w+)(?:\s+RETAIN\s+(?P<n>\d+)\s+SNAPSHOTS?)?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_RE = re.compile(
    r"^\s*DESCRIBE\s+(?P<hist>HISTORY\s+)?(?P<name>\w+)\s*$", re.IGNORECASE
)


def run_maintenance(spark: SparkSession, table: LakeTable, stmt: str,
                    **kw) -> dict:
    """Lower a maintenance statement onto the table's background-job API.

    ``OPTIMIZE t`` → major compaction (``LakeTable.compact``: rewrite
    fragmented buckets, fold MoR deltas, expire aged tombstones);
    ``OPTIMIZE t MINOR`` → ``compact_minor`` (delta fold only, no base
    rewrite); ``ZORDER BY (a, b)`` / ``CLUSTER BY (a, b)`` set the rewrite
    sort order so manifest col_stats prune after the rewrite. ``VACUUM t
    [RETAIN n SNAPSHOTS]`` → ``LakeTable.vacuum`` (returns
    ``{"files_removed": n}``); time travel keeps working inside the
    retention window. Extra kwargs (``max_buckets_per_run``,
    ``orphan_grace_sec``, writer fencing, ...) pass through — the SQL form
    names the job, the knobs stay API-level. Iceberg analogs:
    rewrite_data_files / expire_snapshots."""
    om = _OPTIMIZE_RE.match(stmt)
    if om:
        if om.group("minor"):
            if om.group("mode"):
                raise ValueError("OPTIMIZE MINOR folds deltas in place; a "
                                 "sort order needs the major rewrite")
            return table.compact_minor(spark, **kw)
        if om.group("mode"):
            cols = [c.strip() for c in om.group("cols").split(",") if c.strip()]
            if not cols:
                raise ValueError(f"{om.group('mode').upper()} BY needs columns")
            kw.setdefault("cluster_by", cols)
            kw.setdefault("cluster_mode",
                          "zorder" if om.group("mode").upper() == "ZORDER"
                          else "linear")
        return table.compact(spark, **kw)
    vm = _VACUUM_RE.match(stmt)
    if vm:
        if vm.group("n") is not None:
            kw.setdefault("retain_last", int(vm.group("n")))
        return {"files_removed": table.vacuum(**kw)}
    rm = _ROLLBACK_RE.match(stmt)
    if rm:
        # ROLLBACK TABLE t TO VERSION n — publishes a NEW snapshot whose
        # state is v<n> (history only moves forward; ledgers/lineage
        # restore so the undone batches can re-apply — LakeTable.rollback)
        snap = table.rollback(int(rm.group("v")))
        return {"version": snap["version"],
                "rolled_back_to": int(rm.group("v"))}
    raise ValueError(
        "maintenance statement must be OPTIMIZE <t> [MINOR] "
        "[ZORDER|CLUSTER BY (...)] | VACUUM <t> [RETAIN n SNAPSHOTS] | "
        "ROLLBACK TABLE <t> TO VERSION n")


def describe_sql(spark: SparkSession, table: LakeTable, stmt: str) -> DataFrame:
    """``DESCRIBE <t>`` → one row per column (name, type, nullable, field_id,
    is_key, with the partition/bucket spec echoed on every row for easy
    display); ``DESCRIBE HISTORY <t>`` → the snapshot log
    (``LakeTable.history``: version, committed_at, operation, row counts)."""
    m = _DESCRIBE_RE.match(stmt)
    if not m:
        raise ValueError("expected DESCRIBE [HISTORY] <table>")
    if m.group("hist"):
        return table.history(spark)
    schema = table.schema()
    snap = table.snapshot()
    part = snap.get("partition_spec") or {}
    # stored spec is rename-safe {field_id, transform}; resolve the CURRENT name
    pcol = (schema.field_by_id(int(part["field_id"])).name
            if part.get("field_id") is not None else "")
    part_str = (f"{part['transform']}({pcol})"
                if part.get("transform") not in (None, "identity") else pcol)
    rows = []
    for f in schema.fields:
        rows.append(
            (f.name, f.type, bool(f.nullable), int(f.id),
             f.id in schema.key_field_ids,
             _json.dumps(f.initial_default) if f.initial_default is not None
             else None,
             part_str, int(table.n_buckets())))
        if f.nested:
            # struct members surface as dotted child rows with their own
            # stable field ids (nested evolution is introspectable from SQL)
            from ..lakehouse.schema import _flatten_nested

            flat = _flatten_nested(f.nested)
            by_id = {nid: (p, t) for nid, (p, t) in flat.items()}
            dflts = {}

            def walk(ns, prefix=""):
                for n in ns:
                    if n.initial_default is not None:
                        dflts[n.id] = n.initial_default
                    if n.nested:
                        walk(n.nested, prefix + n.name + ".")

            walk(f.nested)
            for nid in sorted(by_id):
                p, t = by_id[nid]
                rows.append(
                    (f"{f.name}.{p}", t, True, int(nid), False,
                     _json.dumps(dflts[nid]) if nid in dflts else None,
                     part_str, int(table.n_buckets())))
    return spark.createDataFrame(
        rows,
        "col_name string, data_type string, nullable boolean, field_id int, "
        "is_key boolean, initial_default string, partition string, "
        "n_buckets int",
    )


def show_create_table(table: LakeTable, name: str = "t") -> str:
    """Reconstruct the CREATE TABLE statement for the table's CURRENT
    schema and layout — round-trips through ``create_table_sql`` (modulo
    the evolved-schema history, which DDL cannot express)."""
    schema = table.schema()
    parts = [f"{f.name} {f.type}" for f in schema.fields]
    parts.append(f"PRIMARY KEY ({', '.join(schema.key_names)})")
    for nm, ex in sorted(
            (table.properties().get("check_constraints") or {}).items()):
        parts.append(f"CONSTRAINT {nm} CHECK ({ex})")
    stmt = f"CREATE TABLE {name} (\n  " + ",\n  ".join(parts) + "\n)"
    part = table.snapshot().get("partition_spec") or {}
    if part.get("field_id") is not None:
        pcol = schema.field_by_id(int(part["field_id"])).name
        tf = part.get("transform", "identity")
        stmt += (f" PARTITIONED BY ({pcol})" if tf == "identity"
                 else f" PARTITIONED BY ({tf}({pcol}))")
    return stmt + f" BUCKETS {table.n_buckets()}"


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<t>\w+)\s+SET\s+(?P<set>.*?)(?:\s+WHERE\s+(?P<where>.*))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>\w+)(?:\s+WHERE\s+(?P<where>.*))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def run_dml(spark: SparkSession, table: LakeTable, stmt: str, *,
            batch_id: int, cfg: MergeConfig | None = None,
            event_ts=None, lsn: int = 0) -> dict:
    """Dispatch an INSERT / UPDATE / DELETE / MERGE INTO / ALTER TABLE
    string onto the kernel.

    CHECK-constraint semantics on DML: a written row that violates a table
    constraint dead-letters (reason ``check:<name>``, metrics
    ``check_violations``/``dlq_count``) and the key keeps its previous
    state — the engine's per-row fail-log philosophy applies to every
    ingest path uniformly, SQL included; inspect the batch metrics (or the
    DLQ) rather than expecting a statement-level abort."""
    if re.match(r"^\s*MERGE\b", stmt, re.IGNORECASE):
        return merge_into_sql(spark, table, stmt, batch_id=batch_id, cfg=cfg,
                              event_ts=event_ts, lsn=lsn)
    if re.match(r"^\s*INSERT\b", stmt, re.IGNORECASE):
        return insert_into_sql(spark, table, stmt, batch_id=batch_id, cfg=cfg,
                               event_ts=event_ts, lsn=lsn)
    if re.match(r"^\s*ALTER\b", stmt, re.IGNORECASE):
        return alter_table_sql(spark, table, stmt, batch_id=batch_id, cfg=cfg,
                               event_ts=event_ts, lsn=lsn)
    um = _UPDATE_RE.match(stmt)
    if um:
        sets = {}
        for a in _split_top_level(um.group("set")):
            am = re.match(r"^(\w+)\s*=\s*(.*)$", a, re.DOTALL)
            if not am:
                raise ValueError(f"bad SET assignment {a!r}")
            sets[am.group(1)] = am.group(2)
        return update_where(spark, table, F.expr(um.group("where") or "true"),
                            sets, batch_id=batch_id, cfg=cfg,
                            event_ts=event_ts, lsn=lsn)
    dm = _DELETE_RE.match(stmt)
    if dm:
        return delete_where(spark, table, F.expr(dm.group("where") or "true"),
                            batch_id=batch_id, cfg=cfg,
                            event_ts=event_ts, lsn=lsn)
    raise ValueError(
        "statement must be MERGE INTO / INSERT INTO / UPDATE / DELETE FROM / "
        "ALTER TABLE")
