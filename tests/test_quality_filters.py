"""Round-3 quality/repetition/LM-scoring ops. Correctness is oracle-gated
(SQL twins in plans/queries.py, verified via oracle_check.py); these pin the
plan-shape and determinism properties the oracle can't see: the row-local
gates must not shuffle, and the unigram-LM join must broadcast the vocab
(the corpus side never shuffles for scoring)."""

import os

from concept_catalog_etl_spark.plans.queries import (
    q_quality_gate,
    q_repetition_stats,
    q_unigram_logprob,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_stats_is_shuffle_free(spark):
    plan = _plan(q_repetition_stats(spark, SF))
    assert "Exchange" not in plan, plan


def test_quality_gate_is_shuffle_free(spark):
    plan = _plan(q_quality_gate(spark, SF))
    assert "Exchange" not in plan, plan


def test_quality_gate_bounds(spark):
    rows = q_quality_gate(spark, SF).collect()
    assert rows, "empty gate output"
    for r in rows:
        assert 0.0 <= r.alpha_word_frac <= 1.0
        if r.keep:
            assert 10 <= r.n_words <= 1000
            assert 2.0 <= r.mean_word_len <= 12.0
    # the synthetic corpus is clean lowercase prose: most rows survive
    kept = sum(r.keep for r in rows)
    assert kept / len(rows) > 0.5, (kept, len(rows))


def test_repetition_bounds_and_degenerate_doc(spark):
    for r in q_repetition_stats(spark, SF).collect():
        assert 0.0 < r.distinct_word_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_word_frac <= 1.0
        # a doc where every word is distinct has no duplicate bigrams
        if r.distinct_word_frac == 1.0:
            assert r.dup_bigram_frac == 0.0


def test_unigram_logprob_broadcasts_vocab(spark):
    plan = _plan(q_unigram_logprob(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_unigram_logprob_partition_invariant(spark):
    """The fixed-point (ln*1e6 as BIGINT) trick makes the mean independent
    of summation order — repartitioning must not move any emitted value."""
    a = {r.doc_id: (r.mean_logp, r.rarest_count)
         for r in q_unigram_logprob(spark, SF).collect()}
    b = {r.doc_id: (r.mean_logp, r.rarest_count)
         for r in q_unigram_logprob(spark, SF).repartition(17).collect()}
    assert a == b


def test_redact_pii_masks_and_counts(spark, scratch):
    """The driver corpus contains no PII shapes (the oracle check there
    pins identity behavior), so this pins the actual redaction: emails,
    IPv4s and international phone numbers are masked with typed
    placeholders and counted, everything else is byte-identical."""
    import os

    from pyspark.sql import functions as F

    from concept_catalog_etl_spark.plans.queries import QUERIES

    rows = [
        (0, "contact me at jo.doe+spam@example.org or admin@sub.host.io thanks"),
        (1, "server 10.0.255.7 replied; backup at 192.168.1.1."),
        (2, "call +47 22 44 66 88 (office) today"),
        (3, "nothing to hide here"),
        (4, "mixed: a@b.co from 8.8.8.8 dial +1 (555) 123-4567 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("crawl").alias("source"), F.length("text").alias("n_chars"),
    )
    d = os.path.join(scratch, "sf")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in QUERIES["q_redact_pii"](spark, d).collect()}

    assert (out[0]["n_email"], out[0]["n_ip"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (0, 2, 0)
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 1)
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)
    assert (out[4]["n_email"], out[4]["n_ip"]) == (1, 1)

    # the fingerprint is of the MASKED text: identical to hashing the
    # expected redacted strings
    import hashlib

    expect = {
        0: "contact me at <EMAIL> or <EMAIL> thanks",
        1: "server <IP> replied; backup at <IP>.",
        2: "call <PHONE> (office) today",
        3: "nothing to hide here",
    }
    for i, exp in expect.items():
        assert out[i]["clean_fp"] == hashlib.md5(exp.encode()).hexdigest(), i
