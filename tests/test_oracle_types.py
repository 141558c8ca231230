"""Oracle output-dtype parity guard.

Root cause of the only two driver-red rows in CORRECTNESS_r04
(q_pack_sequences / q_refinery): DuckDB's SUM(BIGINT) is HUGEINT and //
preserves it, so the oracle's ``chunk_id`` column came back as int128.
The driver hashes values through pandas/arrow where HUGEINT surfaces as
object/decimal — a different byte representation from Spark's int64 even
when numerically equal, so rows+schema matched but the value hash did not
(our own oracle_check normalizes to Python ints, which is why the judge
could not reproduce it).

This test pins the fix class-wide: no registered oracle may type any
output column as HUGEINT/UHUGEINT or DECIMAL. Every aggregate-derived
integer column must be CAST to BIGINT in the oracle SQL so both engines
hand the comparator the same 64-bit representation.
"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT")


def test_no_oracle_outputs_hugeint_or_decimal():
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF
    from concept_catalog_etl_spark.plans.queries import ORACLES, dynamic_oracles

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    oracles = dict(ORACLES)
    oracles.update(dynamic_oracles())
    offenders = []
    for name, sql in oracles.items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, (str(t) for t in rel.types)):
            if typ in BANNED or "DECIMAL" in typ:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle columns with non-64-bit numeric types (will hash-mismatch "
        f"the driver even when values are equal): {offenders}"
    )


def test_pack_and_refinery_chunk_id_is_bigint():
    """The two formerly-red queries specifically: chunk_id must read back
    from DuckDB as a plain 64-bit integer (pandas int64), matching Spark's
    LongType."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF
    from concept_catalog_etl_spark.plans.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    for q in ("q_pack_sequences", "q_refinery"):
        df = con.sql(ORACLES[q]).df()
        assert str(df["chunk_id"].dtype) == "int64", (q, df.dtypes)
