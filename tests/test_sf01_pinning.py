"""sf0.1 pinning for the literal-capped quadratic verifiers (VERDICT.md
round-1 task 7): ``q_jaccard_ngram`` and ``q_embed_cosine_dup`` carry
``doc_id < 2000`` / ``vec_id < 2000`` caps whose behavior changes with data
size (at sf0.01 the cap is inert — 500 docs; at sf0.1 it bites — 5000
docs). This pins that at 10× data the capped result sets are non-trivial
AND still value-identical to the DuckDB oracle.

Runs in the default gate (~2 min of wall — the quadratic verifiers at
cap=2000 are intentionally expensive); set SPARK_GRAFT_SF01=0 to opt out
on fast iteration loops. Skips only if the sf0.1 testdata is absent.
"""

import os

import duckdb
import pytest

from concept_catalog_etl_spark.plans import queries as Q

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01") == "0"
    or not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="sf0.1 pinning disabled (SPARK_GRAFT_SF01=0) or sf0.1 data absent",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _tupleset(rows):
    return {tuple(r) for r in rows}


def test_jaccard_ngram_capped_matches_oracle_at_sf01(spark, duck):
    want = _tupleset(duck.execute(Q.SQL_JACCARD_NGRAM).fetchall())
    assert len(want) > 100_000, "cap made the result trivial at sf0.1"
    got_gemm = _tupleset(Q.q_jaccard_ngram_gemm(spark, SF).collect())
    assert got_gemm == want
    got = _tupleset(Q.q_jaccard_ngram(spark, SF).collect())
    assert got == want


def test_embed_cosine_dup_capped_matches_oracle_at_sf01(spark, duck):
    want = _tupleset(duck.execute(Q.SQL_EMBED_COSINE_DUP).fetchall())
    assert len(want) > 5_000, "cap made the result trivial at sf0.1"
    got_gemm = _tupleset(Q.q_embed_cosine_dup_gemm(spark, SF).collect())
    assert got_gemm == want
    got = _tupleset(Q.q_embed_cosine_dup(spark, SF).collect())
    assert got == want


def test_cluster_keep_best_invariants_at_sf01(spark):
    """The keeper policy at 10x data, WITHOUT the DuckDB recursive closure
    (prohibitively spill-heavy at sf0.1): pin structural invariants
    against the cluster labels instead — label sets agree with
    q_dedup_clusters, exactly one keeper per cluster, the keeper is a
    cluster member with maximal n_chars (min doc_id among ties)."""
    rows = Q.q_cluster_keep_best(spark, SF).collect()
    assert len(rows) == 2000  # cap bites at sf0.1 (500 docs at sf0.01)
    lab = {r["doc_id"]: r["cluster_id"] for r in rows}
    base = {r["doc_id"]: r["cluster_id"]
            for r in Q.q_dedup_clusters(spark, SF).collect()}
    assert lab == base  # same connected components
    from collections import defaultdict
    byc = defaultdict(list)
    for r in rows:
        byc[r["cluster_id"]].append(r)
    import duckdb as _dd
    n_chars = dict(_dd.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id < 2000").fetchall())
    for c, members in byc.items():
        keeps = [r for r in members if r["is_keep"]]
        assert len(keeps) == 1, f"cluster {c}: {len(keeps)} keepers"
        keep_doc = keeps[0]["doc_id"]
        assert all(r["keep_doc"] == keep_doc for r in members)
        best = min(members, key=lambda r: (-n_chars[r["doc_id"]], r["doc_id"]))
        assert keep_doc == best["doc_id"]
