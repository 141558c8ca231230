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
