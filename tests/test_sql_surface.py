"""SQL surface (round-4 verdict task 4): MERGE INTO / UPDATE / DELETE
strings lowered onto the merge kernel, SELECT through registered views —
end-to-end with state oracles. The reference analog is the per-record
``$set`` upsert (``files/load.py:20-22``) == the unconditional
UPDATE SET * / INSERT * merge."""

import json

import pytest
from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema
from concept_catalog_etl_spark.operators.merge import MergeConfig, apply_batch
from concept_catalog_etl_spark.operators.sql import merge_into_sql, register, run_dml, sql


def make_table(root, key=("doc_id",)):
    schema = TableSchema.create(
        [("doc_id", "string"), ("n", "int"), ("tag", "string")]
        if key == ("doc_id",)
        else [("tenant", "string"), ("doc_id", "string"), ("n", "int"),
              ("tag", "string")],
        key=list(key),
    )
    return LakeTable.create(f"{root}/table", schema, n_buckets=4)


def _seed(spark, t, rows, batch_id=0):
    """rows: list of (doc_id, n, tag)"""
    lines = [
        json.dumps({"op": "insert", "doc_id": d,
                    "event_ts": "1970-01-01T00:00:01.000000", "lsn": i,
                    "schema_version": 1, "payload": {"n": n, "tag": g}})
        for i, (d, n, g) in enumerate(rows)
    ]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    apply_batch(spark, t, raw, batch_id, MergeConfig.for_table(t))


def _state(spark, t):
    return {r["doc_id"]: (r["n"], r["tag"]) for r in t.read(spark).collect()}


def test_upsert_merge_and_select(spark, scratch):
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y")])
    spark.sql(
        "SELECT * FROM VALUES ('a', 10, 'xx'), ('c', 3, 'z') AS v(doc_id, n, tag)"
    ).createOrReplaceTempView("updates")
    m = merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING updates s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        batch_id=0, event_ts="1970-01-01T00:00:05",
    )
    assert m["events_total"] == 2 and m["rows_written"] == 2
    assert _state(spark, t) == {"a": (10, "xx"), "b": (2, "y"), "c": (3, "z")}
    # SELECT through the view helper, column math in SQL
    got = sql(spark, {"docs": t},
              "SELECT tag, sum(n) AS total FROM docs GROUP BY tag ORDER BY tag")
    assert [(r["tag"], r["total"]) for r in got.collect()] == [
        ("xx", 10), ("y", 2), ("z", 3)]
    # exactly-once: same batch id replays as a no-op
    m2 = merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING updates s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        batch_id=0, event_ts="1970-01-01T00:00:09",
    )
    assert m2["skipped"]


def test_conditional_clauses_and_expressions(spark, scratch):
    """Clause conditions + SET expressions referencing both sides, clause
    order first-match-wins, DELETE, INSERT (cols) VALUES (...)."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "keep"), ("b", 100, "big"), ("c", 5, "mid")])
    spark.sql(
        "SELECT * FROM VALUES ('a', 7), ('b', 8), ('c', 9), ('d', 10) "
        "AS v(doc_id, delta)"
    ).createOrReplaceTempView("src2")
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING src2 s ON t.doc_id = s.doc_id
           WHEN MATCHED AND t.n >= 100 THEN DELETE
           WHEN MATCHED AND t.tag = 'keep' THEN UPDATE SET n = t.n + s.delta
           WHEN MATCHED THEN UPDATE SET tag = concat(t.tag, '!')
           WHEN NOT MATCHED AND s.delta > 9 THEN INSERT (doc_id, n, tag)
             VALUES (s.doc_id, s.delta * 2, 'new')""",
        batch_id=1, event_ts="1970-01-01T00:00:05",
    )
    assert _state(spark, t) == {
        "a": (8, "keep"),      # matched, tag=keep → n = 1 + 7
        "c": (5, "mid!"),      # matched fallback → tag append, n kept
        "d": (20, "new"),      # not matched, delta>9 → inserted
    }                          # b deleted (n >= 100)


def test_composite_key_on_validation(spark, scratch):
    t = make_table(scratch, key=("tenant", "doc_id"))
    spark.sql(
        "SELECT * FROM VALUES ('t1', 'a', 1, 'x') AS v(tenant, doc_id, n, tag)"
    ).createOrReplaceTempView("src3")
    with pytest.raises(ValueError, match="missing \\['tenant'\\]"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING src3 s ON t.doc_id = s.doc_id
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""",
            batch_id=0)
    # full composite ON works end-to-end
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING src3 s
           ON t.tenant = s.tenant AND t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        batch_id=0, event_ts="1970-01-01T00:00:05")
    rows = t.read(spark).collect()
    assert [(r["tenant"], r["doc_id"], r["n"]) for r in rows] == [("t1", "a", 1)]


def test_duplicate_source_raises(spark, scratch):
    t = make_table(scratch)
    spark.sql(
        "SELECT * FROM VALUES ('a', 1, 'x'), ('a', 2, 'y') AS v(doc_id, n, tag)"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="duplicate source rows"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING dup_src s ON t.doc_id = s.doc_id
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""",
            batch_id=0)
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING dup_src s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        batch_id=0, allow_duplicate_source=True,
        event_ts="1970-01-01T00:00:05")
    assert len(_state(spark, t)) == 1  # deterministic single winner


def test_update_delete_sql_strings(spark, scratch):
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "y")])
    run_dml(spark, t, "UPDATE docs SET n = n * 10 WHERE tag = 'y'",
            batch_id=10, event_ts="1970-01-01T00:00:05")
    run_dml(spark, t, "DELETE FROM docs WHERE doc_id = 'a'",
            batch_id=11, event_ts="1970-01-01T00:00:06")
    assert _state(spark, t) == {"b": (20, "y"), "c": (30, "y")}
    with pytest.raises(ValueError, match="MERGE INTO / INSERT INTO / UPDATE"):
        run_dml(spark, t, "TRUNCATE TABLE docs", batch_id=12)


def test_insert_values_pk_semantics(spark, scratch):
    """INSERT INTO on a PK table: VALUES form, default column order,
    conflict raises by default, OR IGNORE drops, OR REPLACE upserts."""
    from concept_catalog_etl_spark.operators.sql import insert_into_sql

    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    m = insert_into_sql(
        spark, t,
        "INSERT INTO docs VALUES ('b', 2, 'y'), ('c', 3, 'z')",
        batch_id=1, event_ts="1970-01-01T00:00:05")
    assert m["events_total"] == 2
    assert _state(spark, t) == {"a": (1, "x"), "b": (2, "y"), "c": (3, "z")}
    # PK conflict (default on_conflict="error")
    with pytest.raises(ValueError, match="INSERT conflict: key \\('a',\\)"):
        insert_into_sql(spark, t, "INSERT INTO docs VALUES ('a', 9, 'w')",
                        batch_id=2)
    # OR IGNORE: existing key dropped, new key lands
    insert_into_sql(
        spark, t,
        "INSERT OR IGNORE INTO docs VALUES ('a', 9, 'w'), ('d', 4, 'q')",
        batch_id=2, event_ts="1970-01-01T00:00:06")
    st = _state(spark, t)
    assert st["a"] == (1, "x") and st["d"] == (4, "q")
    # OR REPLACE: pure upsert, no probe
    insert_into_sql(
        spark, t, "INSERT OR REPLACE INTO docs VALUES ('a', 9, 'w')",
        batch_id=3, event_ts="1970-01-01T00:00:07")
    assert _state(spark, t)["a"] == (9, "w")
    # exactly-once: replaying a committed batch id is a no-op
    m2 = insert_into_sql(
        spark, t, "INSERT OR REPLACE INTO docs VALUES ('a', 99, 'ww')",
        batch_id=3, event_ts="1970-01-01T00:00:08")
    assert m2["skipped"] and _state(spark, t)["a"] == (9, "w")


def test_insert_select_columns_and_errors(spark, scratch):
    """SELECT form binds positionally to the column list; omitted non-key
    columns are null; omitted key / unknown / dup-key inputs raise."""
    from concept_catalog_etl_spark.operators.sql import insert_into_sql

    t = make_table(scratch)
    spark.sql("SELECT * FROM VALUES ('x1', 11), ('x2', 12) AS v(id, val)") \
        .createOrReplaceTempView("stage_rows")
    run_dml(spark, t,
            "INSERT INTO docs (doc_id, n) SELECT id, val FROM stage_rows",
            batch_id=1, event_ts="1970-01-01T00:00:05")
    assert _state(spark, t) == {"x1": (11, None), "x2": (12, None)}
    with pytest.raises(ValueError, match="missing \\['doc_id'\\]"):
        insert_into_sql(spark, t, "INSERT INTO docs (n, tag) VALUES (1, 'x')",
                        batch_id=2)
    with pytest.raises(ValueError, match="unknown column"):
        insert_into_sql(spark, t,
                        "INSERT INTO docs (doc_id, nope) VALUES ('z', 1)",
                        batch_id=2)
    with pytest.raises(ValueError, match="produces 1 columns"):
        insert_into_sql(spark, t,
                        "INSERT INTO docs (doc_id, n) SELECT id FROM stage_rows",
                        batch_id=2)
    with pytest.raises(ValueError, match="duplicate source rows"):
        insert_into_sql(spark, t,
                        "INSERT INTO docs VALUES ('y', 1, 'a'), ('y', 2, 'b')",
                        batch_id=2)


def test_insert_composite_key(spark, scratch):
    from concept_catalog_etl_spark.operators.sql import insert_into_sql

    t = make_table(scratch, key=("tenant", "doc_id"))
    insert_into_sql(
        spark, t,
        "INSERT INTO docs VALUES ('t1', 'a', 1, 'x'), ('t2', 'a', 2, 'y')",
        batch_id=1, event_ts="1970-01-01T00:00:05")
    with pytest.raises(ValueError, match=r"key \('t1', 'a'\)"):
        insert_into_sql(spark, t,
                        "INSERT INTO docs VALUES ('t1', 'a', 9, 'w')",
                        batch_id=2)
    rows = {(r["tenant"], r["doc_id"]): r["n"] for r in t.read(spark).collect()}
    assert rows == {("t1", "a"): 1, ("t2", "a"): 2}


def test_create_table_ddl_lifecycle(spark, scratch):
    """CREATE TABLE DDL → INSERT → MERGE → SELECT: the full SQL lifecycle
    with no Python-API table construction."""
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = create_table_sql(
        """CREATE TABLE seqs (
             doc_id string, tokens array<int>, n_tok int, source string,
             PRIMARY KEY (doc_id)
           ) BUCKETS 4""",
        root=scratch)
    assert t.schema().key_names == ["doc_id"] and t.n_buckets() == 4
    run_dml(spark, t,
            "INSERT INTO seqs VALUES ('a', array(1,2,3), 3, 'crawl')",
            batch_id=0, event_ts="1970-01-01T00:00:05")
    run_dml(spark, t,
            """MERGE INTO seqs t
               USING (SELECT 'a' AS doc_id, array(9) AS tokens,
                             1 AS n_tok, 'curated' AS source) s
               ON t.doc_id = s.doc_id
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""",
            batch_id=1, event_ts="1970-01-01T00:00:06")
    got = sql(spark, {"seqs": t},
              "SELECT doc_id, tokens, n_tok, source FROM seqs").collect()
    # source lands tagged through the kernel's canonical-source invariant
    assert [(r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
            for r in got] == [("a", [9], 1, "curated")]
    # IF NOT EXISTS returns the live handle; bare CREATE collides
    t2 = create_table_sql(
        "CREATE TABLE IF NOT EXISTS seqs (x string, PRIMARY KEY (x))",
        root=scratch)
    assert t2.schema().key_names == ["doc_id"]
    with pytest.raises(FileExistsError):
        create_table_sql("CREATE TABLE seqs (x string, PRIMARY KEY (x))",
                         root=scratch)


def test_create_table_partitioned_and_errors(scratch):
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = create_table_sql(
        """CREATE TABLE byday (
             event_date timestamp, doc_id string, n int,
             PRIMARY KEY (event_date, doc_id)
           ) PARTITIONED BY (day(event_date)) BUCKETS 2""",
        root=scratch)
    assert t.snapshot()["partition_spec"]["transform"] == "day"
    assert t.schema().key_names == ["event_date", "doc_id"]
    with pytest.raises(ValueError, match="requires PRIMARY KEY"):
        create_table_sql("CREATE TABLE nope (x string)", root=scratch)
    with pytest.raises(ValueError, match="unsupported type"):
        create_table_sql(
            "CREATE TABLE nope (x varchar(9), PRIMARY KEY (x))", root=scratch)
    with pytest.raises(ValueError, match="unknown partition transform"):
        create_table_sql(
            """CREATE TABLE nope (x timestamp, PRIMARY KEY (x))
               PARTITIONED BY (century(x))""", root=scratch)


def test_ctas(spark, scratch):
    """CREATE TABLE ... AS SELECT: schema inferred from the SELECT, rows
    loaded through the merge kernel (exactly-once batch 0)."""
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = create_table_sql(
        """CREATE TABLE derived PRIMARY KEY (doc_id) BUCKETS 2
           AS SELECT * FROM VALUES
             ('a', array(1,2), 2), ('b', array(3), 1)
             AS v(doc_id, tokens, n_tok)""",
        root=scratch, spark=spark, event_ts="1970-01-01T00:00:05")
    assert [(f.name, f.type) for f in t.schema().fields] == [
        ("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int")]
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in t.read(spark).collect()}
    assert got == {"a": ([1, 2], 2), "b": ([3], 1)}
    assert t.is_committed(0, writer_id="dml")  # seeding went through the ledger
    # explicit column list binds positionally over the SELECT
    t2 = create_table_sql(
        """CREATE TABLE renamed (k string, cnt bigint, PRIMARY KEY (k))
           AS SELECT 'x', 9L""",
        root=scratch, spark=spark, event_ts="1970-01-01T00:00:05")
    r = t2.read(spark).collect()[0]
    assert (r["k"], r["cnt"]) == ("x", 9)
    # errors
    with pytest.raises(ValueError, match="duplicate source rows"):
        create_table_sql(
            """CREATE TABLE dup PRIMARY KEY (k)
               AS SELECT * FROM VALUES ('a', 1), ('a', 2) AS v(k, n)""",
            root=scratch, spark=spark)
    with pytest.raises(ValueError, match="requires the spark session"):
        create_table_sql("CREATE TABLE nope PRIMARY KEY (k) AS SELECT 1 AS k",
                         root=scratch)
    with pytest.raises(ValueError, match="unknown column"):
        create_table_sql(
            "CREATE TABLE nope PRIMARY KEY (zz) AS SELECT 1 AS k",
            root=scratch, spark=spark)
    # round-5 type dialect: decimal/date/binary/map/struct now CTAS cleanly
    t3 = create_table_sql(
        "CREATE TABLE typed PRIMARY KEY (k) "
        "AS SELECT 'a' AS k, CAST(1 AS decimal(10,2)) AS d, "
        "named_struct('x', 1) AS s, map('a', 1) AS m",
        root=scratch, spark=spark, event_ts="1970-01-01T00:00:05")
    assert [(f.name, f.type) for f in t3.schema().fields] == [
        ("k", "string"), ("d", "decimal(10,2)"),
        ("s", "struct<x:int>"), ("m", "map<string,int>")]
    # genuinely unmappable Spark types still fail loudly
    with pytest.raises(ValueError, match="cannot map Spark type"):
        create_table_sql(
            "CREATE TABLE nope PRIMARY KEY (k) "
            "AS SELECT 'a' AS k, INTERVAL '1' DAY AS iv",
            root=scratch, spark=spark)
    with pytest.raises(ValueError, match="column list or AS SELECT"):
        create_table_sql("CREATE TABLE nope PRIMARY KEY (k)", root=scratch)


def test_inline_subquery_source_and_mor(spark, scratch):
    """(subquery) source + MoR write mode; register() exposes col_ranges."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t
           USING (SELECT 'a' AS doc_id, 5 AS n, 'up' AS tag) s
           ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        batch_id=1, event_ts="1970-01-01T00:00:05",
        cfg=MergeConfig.for_table(t, write_mode="mor", writer_id="dml"),
    )
    assert _state(spark, t) == {"a": (5, "up")}
    register(spark, t, "docs_now")
    assert spark.sql("SELECT n FROM docs_now").collect()[0]["n"] == 5


def test_alter_table_ddl(spark, scratch):
    """ALTER TABLE lifecycle: add → insert-into-new-column → rename →
    widen → drop, each through SQL strings onto the schema_change kernel."""
    t = make_table(scratch)  # (doc_id, n, tag)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y")])

    run_dml(spark, t, "ALTER TABLE docs ADD COLUMN quality double",
            batch_id=10, event_ts="1970-01-01T00:00:05")
    assert "quality" in t.schema().names()
    # exactly-once: the same batch_id replays as a ledgered no-op
    assert run_dml(spark, t, "ALTER TABLE docs ADD COLUMN quality double",
                   batch_id=10)["skipped"] is True

    run_dml(spark, t, "INSERT OR REPLACE INTO docs VALUES ('c', 3, 'z', 0.9)",
            batch_id=11, event_ts="1970-01-01T00:00:06")
    got = {r["doc_id"]: r["quality"] for r in t.read(spark).collect()}
    assert got == {"a": None, "b": None, "c": 0.9}  # pre-add rows read null

    run_dml(spark, t, "ALTER TABLE docs RENAME COLUMN quality TO q",
            batch_id=12, event_ts="1970-01-01T00:00:07")
    names = t.schema().names()
    assert "q" in names and "quality" not in names
    assert {r["doc_id"]: r["q"] for r in t.read(spark).collect()}["c"] == 0.9

    run_dml(spark, t, "ALTER TABLE docs ALTER COLUMN n TYPE bigint",
            batch_id=13, event_ts="1970-01-01T00:00:08")
    assert dict(t.read(spark).dtypes)["n"] == "bigint"
    assert _state(spark, t) == {"a": (1, "x"), "b": (2, "y"), "c": (3, "z")}

    run_dml(spark, t, "ALTER TABLE docs DROP COLUMN tag",
            batch_id=14, event_ts="1970-01-01T00:00:09")
    assert "tag" not in t.schema().names()
    assert "tag" not in t.read(spark).columns


def test_alter_table_errors(spark, scratch):
    """Illegal evolutions raise pre-commit; contract columns refuse DROP."""
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    v0 = t.current_version()
    with pytest.raises(ValueError, match="narrow|widen"):
        run_dml(spark, t, "ALTER TABLE docs ALTER COLUMN n TYPE string",
                batch_id=20)
    with pytest.raises(KeyError):  # same failure the feed's event path gives
        run_dml(spark, t, "ALTER TABLE docs RENAME COLUMN nope TO x",
                batch_id=21)
    with pytest.raises(ValueError, match="unsupported ALTER TABLE clause"):
        run_dml(spark, t, "ALTER TABLE docs SET TBLPROPERTIES ('a'='b')",
                batch_id=22)
    with pytest.raises(ValueError, match="unsupported type"):
        run_dml(spark, t, "ALTER TABLE docs ADD COLUMN z varchar(9)",
                batch_id=23)
    assert t.current_version() == v0  # nothing committed

    # the contract trio refuses DROP (the per-row invariant is defined on it)
    seqs = create_table_sql(
        """CREATE TABLE seqs (
             doc_id string, tokens array<int>, n_tok int, source string,
             PRIMARY KEY (doc_id)
           ) BUCKETS 2""",
        root=scratch)
    with pytest.raises(ValueError, match="contract column"):
        run_dml(spark, seqs, "ALTER TABLE seqs DROP COLUMN tokens",
                batch_id=0)


def test_time_travel_select(spark, scratch):
    """FOR VERSION AS OF / FOR TIMESTAMP AS OF pin a snapshot view."""
    from datetime import datetime

    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")], batch_id=0)
    v1 = t.current_version()
    run_dml(spark, t, "INSERT INTO docs VALUES ('b', 2, 'y')",
            batch_id=1, event_ts="1970-01-01T00:00:06")

    assert sql(spark, {"docs": t},
               "SELECT count(*) AS c FROM docs").collect()[0]["c"] == 2
    got = sql(spark, {"docs": t},
              f"SELECT doc_id FROM docs FOR VERSION AS OF {v1}").collect()
    assert [r["doc_id"] for r in got] == ["a"]

    # timestamp between the two commits resolves to the earlier snapshot
    at1 = t.snapshot(v1)["committed_at"]
    at2 = t.snapshot()["committed_at"]
    assert at2 > at1
    mid = datetime.fromtimestamp((at1 + at2) / 2).isoformat()
    got = sql(spark, {"docs": t},
              f"SELECT doc_id FROM docs FOR TIMESTAMP AS OF '{mid}'").collect()
    assert [r["doc_id"] for r in got] == ["a"]

    # both the pinned view and the live view stay usable in one query
    joined = sql(spark, {"docs": t}, f"""
        SELECT live.doc_id FROM docs live
        LEFT ANTI JOIN docs FOR VERSION AS OF {v1} old
        ON live.doc_id = old.doc_id""").collect()
    assert [r["doc_id"] for r in joined] == ["b"]


def test_optimize_vacuum_describe_sql(spark, scratch):
    """Maintenance + introspection statements lower onto compact/vacuum/
    schema metadata."""
    from concept_catalog_etl_spark.operators.sql import (
        describe_sql, run_maintenance)

    t = make_table(scratch)
    cfg = MergeConfig.for_table(t, write_mode="mor")
    for b, rows in enumerate([[("a", 1, "x")], [("a", 2, "y")],
                              [("b", 3, "z")]]):
        lines = [json.dumps(
            {"op": "insert", "doc_id": d,
             "event_ts": f"1970-01-01T00:00:0{b + 1}.000000", "lsn": b,
             "schema_version": 1, "payload": {"n": n, "tag": g}})
            for d, n, g in rows]
        apply_batch(spark, t,
                    spark.createDataFrame([(ln,) for ln in lines],
                                          "value string"), b, cfg)
    n_files_before = len(t.files())  # MoR: one delta file per batch

    r = run_maintenance(spark, t, "OPTIMIZE docs CLUSTER BY (doc_id)")
    assert len(t.files()) < n_files_before
    assert not any(f.get("delta") for f in t.files())  # deltas folded
    assert _state(spark, t) == {"a": (2, "y"), "b": (3, "z")}

    # minor form refuses a sort order (delta fold only), bad verb refused
    with pytest.raises(ValueError, match="major rewrite"):
        run_maintenance(spark, t, "OPTIMIZE docs MINOR ZORDER BY (doc_id)")
    with pytest.raises(ValueError, match="maintenance statement"):
        run_maintenance(spark, t, "ANALYZE docs")

    v_now = t.current_version()
    out = run_maintenance(spark, t, "VACUUM docs RETAIN 1 SNAPSHOTS",
                          orphan_grace_sec=0)
    assert out["files_removed"] > 0
    assert t.oldest_retained_version() == v_now
    assert _state(spark, t) == {"a": (2, "y"), "b": (3, "z")}

    d = {r["col_name"]: r for r in describe_sql(spark, t, "DESCRIBE docs").collect()}
    assert set(d) == {"doc_id", "n", "tag"}
    assert d["doc_id"]["is_key"] and not d["n"]["is_key"]
    assert d["n"]["data_type"] == "int" and d["doc_id"]["n_buckets"] == 4

    h = describe_sql(spark, t, "DESCRIBE HISTORY docs").collect()
    assert [r["version"] for r in h] == [v_now]  # window after vacuum
    assert h[-1]["n_rows"] == 2


def test_describe_partitioned_and_alter_key_protection(spark, scratch):
    """DESCRIBE resolves the rename-safe partition spec to the CURRENT
    column name; ALTER refuses to drop a key column; renaming the
    partition column is id-safe (reads + pruning survive)."""
    from concept_catalog_etl_spark.operators.sql import (
        create_table_sql, describe_sql)

    t = create_table_sql(
        """CREATE TABLE byday (
             event_date timestamp, doc_id string, n int,
             PRIMARY KEY (event_date, doc_id)
           ) PARTITIONED BY (day(event_date)) BUCKETS 2""",
        root=scratch)
    run_dml(spark, t,
            """INSERT INTO byday VALUES
               (timestamp'2026-01-01 06:00:00', 'a', 1),
               (timestamp'2026-01-02 06:00:00', 'b', 2)""",
            batch_id=0, event_ts="1970-01-01T00:00:05")

    d = describe_sql(spark, t, "DESCRIBE byday").collect()
    by = {r["col_name"]: r for r in d}
    assert by["event_date"]["partition"] == "day(event_date)"
    assert by["event_date"]["is_key"] and by["doc_id"]["is_key"]

    with pytest.raises(ValueError, match="cannot drop a key column"):
        run_dml(spark, t, "ALTER TABLE byday DROP COLUMN doc_id", batch_id=1)

    run_dml(spark, t, "ALTER TABLE byday RENAME COLUMN event_date TO ts_day",
            batch_id=2, event_ts="1970-01-01T00:00:06")
    by = {r["col_name"]: r
          for r in describe_sql(spark, t, "DESCRIBE byday").collect()}
    assert by["ts_day"]["partition"] == "day(ts_day)"
    got = t.read(spark, col_ranges={
        "ts_day": ("2026-01-02 00:00:00", "2026-01-03 00:00:00")}).collect()
    assert [r["doc_id"] for r in got] == ["b"]


def test_time_travel_exposes_as_of_schema(spark, scratch):
    """A pinned snapshot reads under the column names AS OF that version
    (each snapshot stores its schema) — rename doesn't rewrite history."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    v1 = t.current_version()
    run_dml(spark, t, "ALTER TABLE docs RENAME COLUMN n TO m",
            batch_id=1, event_ts="1970-01-01T00:00:05")
    assert sql(spark, {"docs": t},
               f"SELECT n FROM docs FOR VERSION AS OF {v1}"
               ).collect()[0]["n"] == 1
    assert sql(spark, {"docs": t},
               "SELECT m FROM docs").collect()[0]["m"] == 1


def test_show_create_table_round_trips(spark, scratch):
    """show_create_table output re-creates an equivalent table, including
    the partition spec and an ALTER-evolved schema."""
    from concept_catalog_etl_spark.operators.sql import (
        create_table_sql, show_create_table)

    t = create_table_sql(
        """CREATE TABLE byday (
             event_date timestamp, doc_id string, n int,
             PRIMARY KEY (event_date, doc_id)
           ) PARTITIONED BY (day(event_date)) BUCKETS 2""",
        root=scratch)
    run_dml(spark, t, "ALTER TABLE byday ADD COLUMN q double", batch_id=0,
            event_ts="1970-01-01T00:00:05")
    ddl = show_create_table(t, "byday2")
    assert "day(event_date)" in ddl and "BUCKETS 2" in ddl and "q double" in ddl
    t2 = create_table_sql(ddl, root=scratch)
    assert t2.schema().names() == t.schema().names()
    assert t2.schema().key_names == t.schema().key_names
    assert t2.snapshot()["partition_spec"]["transform"] == "day"


def test_check_constraints_route_to_dlq(spark, scratch):
    """CHECK constraints declared in CREATE TABLE are enforced at ingest:
    violating rows dead-letter with reason check:<name> (never crash the
    batch), NULL expressions pass (SQL three-valued logic), constraints
    survive commits, and SHOW CREATE TABLE echoes them."""
    from concept_catalog_etl_spark.operators.sql import (
        create_table_sql, show_create_table)

    t = create_table_sql(
        """CREATE TABLE gated (
             doc_id string, n int, tag string,
             PRIMARY KEY (doc_id),
             CONSTRAINT n_pos CHECK (n > 0),
             CHECK (tag IN ('x', 'y'))
           ) BUCKETS 2""",
        root=scratch, spark=spark)
    m = run_dml(spark, t,
                "INSERT INTO gated VALUES ('a', 1, 'x'), ('b', -1, 'y'), "
                "('c', 2, 'zz'), ('d', NULL, 'y')",
                batch_id=0, event_ts="1970-01-01T00:00:05")
    assert m["dlq_count"] == 2
    assert sorted(r["doc_id"] for r in t.read(spark).collect()) == ["a", "d"]
    got = {r["doc_id"]: r["_dlq_reason"] for r in t.read_dlq(spark).collect()}
    assert got == {"b": "check:n_pos", "c": "check:check_2"}

    # still enforced on a later batch (property survives commits)
    m2 = run_dml(spark, t, "INSERT OR REPLACE INTO gated VALUES ('e', 0, 'x')",
                 batch_id=1, event_ts="1970-01-01T00:00:06")
    assert m2["dlq_count"] == 1

    ddl = show_create_table(t, "gated2")
    assert "CONSTRAINT n_pos CHECK (n > 0)" in ddl
    t2 = create_table_sql(ddl, root=scratch, spark=spark)
    assert t2.properties()["check_constraints"]["n_pos"] == "n > 0"

    # bad expression fails at CREATE, before the table exists
    with pytest.raises(ValueError, match="does not analyze"):
        create_table_sql(
            "CREATE TABLE nope (x string, PRIMARY KEY (x), CHECK (zz > 0))",
            root=scratch, spark=spark)
    import os
    assert not os.path.exists(f"{scratch}/nope")


def test_check_constraint_blocks_rename_drop_of_referenced_column(spark, scratch):
    from concept_catalog_etl_spark.operators.sql import create_table_sql

    t = create_table_sql(
        """CREATE TABLE gated (
             doc_id string, n int, tag string,
             PRIMARY KEY (doc_id), CONSTRAINT n_pos CHECK (n > 0)
           ) BUCKETS 2""",
        root=scratch, spark=spark)
    with pytest.raises(ValueError, match="referenced by CHECK"):
        run_dml(spark, t, "ALTER TABLE gated RENAME COLUMN n TO m", batch_id=0)
    with pytest.raises(ValueError, match="referenced by CHECK"):
        run_dml(spark, t, "ALTER TABLE gated DROP COLUMN n", batch_id=1)
    # unreferenced columns still evolve freely; widening n is fine too
    run_dml(spark, t, "ALTER TABLE gated RENAME COLUMN tag TO label",
            batch_id=2, event_ts="1970-01-01T00:00:05")
    run_dml(spark, t, "ALTER TABLE gated ALTER COLUMN n TYPE bigint",
            batch_id=3, event_ts="1970-01-01T00:00:06")
    assert "label" in t.schema().names()


def test_add_drop_constraint_sql(spark, scratch):
    """ADD CONSTRAINT validates existing rows and enforces from the next
    batch; DROP CONSTRAINT lifts enforcement; both are anchored commits."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y")])

    # existing violation → refused, nothing committed
    v0 = t.current_version()
    with pytest.raises(ValueError, match="existing row violates"):
        run_dml(spark, t, "ALTER TABLE docs ADD CONSTRAINT big CHECK (n > 1)",
                batch_id=9)
    assert t.current_version() == v0

    r = run_dml(spark, t,
                "ALTER TABLE docs ADD CONSTRAINT n_pos CHECK (n > 0)",
                batch_id=9)
    assert r["check_constraints"] == {"n_pos": "n > 0"}
    m = run_dml(spark, t, "INSERT OR REPLACE INTO docs VALUES ('c', -3, 'z')",
                batch_id=10, event_ts="1970-01-01T00:00:06")
    assert m["dlq_count"] == 1 and "c" not in _state(spark, t)

    run_dml(spark, t, "ALTER TABLE docs DROP CONSTRAINT n_pos", batch_id=11)
    m2 = run_dml(spark, t, "INSERT OR REPLACE INTO docs VALUES ('c', -3, 'z')",
                 batch_id=12, event_ts="1970-01-01T00:00:07")
    assert m2["dlq_count"] == 0 and _state(spark, t)["c"] == (-3, "z")
    with pytest.raises(KeyError, match="no such constraint"):
        run_dml(spark, t, "ALTER TABLE docs DROP CONSTRAINT nope", batch_id=13)


# ---------------------------------------------------------------- BY SOURCE

def test_merge_not_matched_by_source_delete(spark, scratch):
    """The snapshot-reconcile MERGE: source is ground truth — matched rows
    update, new rows insert, target-only rows DELETE."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    spark.sql(
        "SELECT * FROM VALUES ('b', 20, 'yy'), ('e', 5, 'w') AS v(doc_id, n, tag)"
    ).createOrReplaceTempView("truth")
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING truth s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        batch_id=0, event_ts="1970-01-01T00:00:05",
    )
    assert _state(spark, t) == {"b": (20, "yy"), "e": (5, "w")}


def test_merge_not_matched_by_source_conditional_update(spark, scratch):
    """BY SOURCE with a condition and an UPDATE action: only stale 'x'
    rows are retagged; other target-only rows are untouched."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "x")])
    spark.sql(
        "SELECT * FROM VALUES ('c', 30, 'zz') AS v(doc_id, n, tag)"
    ).createOrReplaceTempView("truth2")
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING truth2 s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED BY SOURCE AND t.tag = 'x'
             THEN UPDATE SET t.tag = 'stale'""",
        batch_id=0, event_ts="1970-01-01T00:00:05",
    )
    assert _state(spark, t) == {
        "a": (1, "stale"), "b": (2, "y"), "c": (30, "zz")}


def test_merge_by_source_only_statement(spark, scratch):
    """A statement with ONLY a BY SOURCE clause (prune-to-source) works."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x"), ("b", 2, "y")])
    spark.sql(
        "SELECT * FROM VALUES ('a', 0, '') AS v(doc_id, n, tag)"
    ).createOrReplaceTempView("keep_only")
    merge_into_sql(
        spark, t,
        """MERGE INTO docs t USING keep_only s ON t.doc_id = s.doc_id
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        batch_id=0, event_ts="1970-01-01T00:00:05",
    )
    assert _state(spark, t) == {"a": (1, "x")}


def test_merge_by_source_validation(spark, scratch):
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    spark.sql("SELECT 'a' AS doc_id, 1 AS n, 'x' AS tag") \
        .createOrReplaceTempView("v1")
    with pytest.raises(ValueError, match="BY SOURCE"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING v1 s ON t.doc_id = s.doc_id
               WHEN NOT MATCHED BY SOURCE THEN INSERT *""",
            batch_id=0,
        )
    with pytest.raises(ValueError, match="only valid with WHEN NOT MATCHED"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING v1 s ON t.doc_id = s.doc_id
               WHEN MATCHED BY SOURCE THEN DELETE""",
            batch_id=0,
        )
    with pytest.raises(ValueError, match="meaningless"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING v1 s ON t.doc_id = s.doc_id
               WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""",
            batch_id=0,
        )


# ------------------------------------------------------- refs & rollback

def test_sql_tags_branches_rollback(spark, scratch):
    """Snapshot-ref DDL + ROLLBACK verbs: tags time-travel through
    VERSION AS OF 'name', branches fork and fast-forward, rollback
    publishes a new head with the old state."""
    from concept_catalog_etl_spark.operators.sql import run_maintenance

    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")], batch_id=0)
    v1 = t.current_version()
    run_dml(spark, t, "ALTER TABLE docs CREATE TAG v1_state", batch_id=90)
    # "a" second so its lsn (position index) beats the batch-0 coordinate
    _seed(spark, t, [("b", 3, "z"), ("a", 2, "y")], batch_id=1)

    # tag time travel via VERSION AS OF 'name'
    got = sql(spark, {"docs": t},
              "SELECT n FROM docs FOR VERSION AS OF 'v1_state' WHERE doc_id = 'a'")
    assert [r["n"] for r in got.collect()] == [1]
    assert _state(spark, t)["a"] == (2, "y")  # head unaffected

    # rollback: a NEW head whose state is v1 (history only moves forward)
    m = run_maintenance(spark, t, f"ROLLBACK TABLE docs TO VERSION {v1}")
    assert m["rolled_back_to"] == v1
    assert _state(spark, t) == {"a": (1, "x")}

    # branch forked at the post-rollback head, written, fast-forwarded
    # (fast-forward requires main still at the fork version)
    run_dml(spark, t, "ALTER TABLE docs CREATE BRANCH fix", batch_id=91)
    br = t.branch("fix")
    _seed(spark, br, [("c", 9, "w")], batch_id=50)  # fork ledger holds 0/1
    run_dml(spark, t, "ALTER TABLE docs FAST FORWARD TO BRANCH fix",
            batch_id=92)
    st = _state(spark, t)
    assert st["c"] == (9, "w") and st["a"] == (1, "x")

    # drop refs
    run_dml(spark, t, "ALTER TABLE docs DROP TAG v1_state", batch_id=93)
    run_dml(spark, t, "ALTER TABLE docs DROP BRANCH fix", batch_id=94)
    assert t.tags() == {} and t.branches() == {}
    with pytest.raises(ValueError, match="no such tag"):
        sql(spark, {"docs": t},
            "SELECT * FROM docs FOR VERSION AS OF 'v1_state'")


def test_merge_by_source_rejects_source_refs(spark, scratch):
    """ADVICE r4: a BY SOURCE condition or SET referencing the source
    alias must raise at parse time — source columns are all-null on these
    rows, so the expression would silently evaluate to NULL (never fire)
    instead of failing."""
    t = make_table(scratch)
    _seed(spark, t, [("a", 1, "x")])
    spark.sql("SELECT 'a' AS doc_id, 1 AS n, 'x' AS tag") \
        .createOrReplaceTempView("vsrc")
    with pytest.raises(ValueError, match="references source alias"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING vsrc s ON t.doc_id = s.doc_id
               WHEN NOT MATCHED BY SOURCE AND s.n > 0 THEN DELETE""",
            batch_id=0,
        )
    with pytest.raises(ValueError, match="references source alias"):
        merge_into_sql(
            spark, t,
            """MERGE INTO docs t USING vsrc s ON t.doc_id = s.doc_id
               WHEN NOT MATCHED BY SOURCE
                 THEN UPDATE SET t.tag = s.tag""",
            batch_id=0,
        )
