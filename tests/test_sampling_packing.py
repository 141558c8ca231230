"""Round-3 training-data ops: deterministic sampling, sequence packing,
benchmark decontamination. Correctness is driver/oracle-gated
(plans/queries.py SQL twins, verified via oracle_check.py); these tests pin
the properties the oracle can't see — plan shape at scale, determinism
under repartitioning, and the statistical behavior of the samplers."""

import os

from pyspark.sql import functions as F

from concept_catalog_etl_spark.plans.queries import (
    q_decontaminate,
    q_pack_sequences,
    q_sample_fixed_k,
    q_sample_hash,
    q_sample_stratified,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sample_hash_rate_and_determinism(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    total = d.count()
    s1 = q_sample_hash(spark, SF)
    n = s1.count()
    # md5 is uniform: p=0.25 within a wide tolerance at n=500
    assert 0.15 < n / total < 0.35, (n, total)
    # content-addressed: identical subset regardless of partitioning
    ids1 = {r.doc_id for r in s1.collect()}
    ids2 = {
        r.doc_id
        for r in q_sample_hash(spark, SF).repartition(13).collect()
    }
    assert ids1 == ids2


def test_sample_hash_is_shuffle_free(spark):
    plan = _plan(q_sample_hash(spark, SF))
    assert "Exchange" not in plan, plan


def test_sample_stratified_rates(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {
        r.lang: r.n
        for r in q_sample_stratified(spark, SF)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # en downweighted vs the rest (the data-mixing contract)
    assert got["en"] / totals["en"] < 0.40
    for lang in totals:
        if lang not in ("en", "zh"):
            assert got[lang] / totals[lang] > 0.55, (lang, got[lang], totals[lang])


def test_mixture_plan_invariants_and_plan_shape(spark):
    """Budget split: targets never exceed availability, rates are exact
    integer micro-rates in [0, 1e6], temperature weighting orders targets
    with availability, and the physical plan pays ONE data-side exchange
    (the per-source agg) with the weight total broadcast, never a second
    corpus pass."""
    from concept_catalog_etl_spark.plans.queries import q_mixture_plan

    rows = q_mixture_plan(spark, SF, budget=200_000).collect()
    assert rows
    for r in rows:
        assert 0 <= r.target_tokens <= r.tokens_avail
        assert 0 <= r.rate_e6 <= 1_000_000
        # rate is exactly target/avail in micro-units (floor division)
        assert r.rate_e6 == r.target_tokens * 1_000_000 // r.tokens_avail
    # sqrt weighting: a strictly more abundant source never gets a smaller
    # absolute target (monotone allocation)
    by_avail = sorted(rows, key=lambda r: r.tokens_avail)
    targets = [r.target_tokens for r in by_avail]
    assert targets == sorted(targets)
    plan = _plan(q_mixture_plan(spark, SF))
    assert "BroadcastExchange" in plan
    # one shuffle for the per-source agg; the weight-total branch reuses it
    data_exchanges = plan.count("Exchange hashpartitioning")
    assert data_exchanges <= 2, plan


def test_sample_fixed_k_uses_partial_topk(spark):
    """ORDER BY hash LIMIT k must plan as TakeOrderedAndProject (per-
    partition top-k + driver merge), not a global Sort + Exchange — the
    property that makes a fixed-size sample viable at 100 TB."""
    plan = _plan(q_sample_fixed_k(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan


def test_pack_sequences_invariants(spark):
    budget = 512
    out = q_pack_sequences(spark, SF, budget=budget).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    tok_per_src = {
        r.source: r.t
        for r in d.select(
            "source",
            F.size(F.split(F.trim("text"), "\\s+")).cast("bigint").alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
        .collect()
    }
    for src, chunks in by_src.items():
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk ids are dense from 0 (greedy packing leaves no gaps: every
        # chunk boundary is crossed by some doc's start offset)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # token conservation: packing moves docs, never drops them
        assert sum(c.chunk_tokens for c in chunks) == tok_per_src[src]
        # every chunk except the last covers its budget: the NEXT chunk
        # exists only because cumulative tokens crossed this chunk's end
        cum = 0
        for c in chunks[:-1]:
            cum += c.chunk_tokens
            assert cum >= (c.chunk_id + 1) * budget, (src, c)


def test_decontaminate_broadcasts_eval_side(spark):
    plan = _plan(q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_flags_only_train_docs(spark):
    out = q_decontaminate(spark, SF).collect()
    assert out, "expected some contamination in the synthetic corpus"
    for r in out:
        assert r.doc_id % 37 != 0
        assert r.n_hits >= 1


def test_chunk_overlap_invariants_and_no_shuffle(spark):
    """Sliding-window chunking: shuffle-free plan (scan -> generate ->
    project), full coverage (every token lands in >=1 chunk), overlap rule
    (consecutive chunks share window-stride tokens), and a kept partial
    tail chunk."""
    from concept_catalog_etl_spark.plans.queries import q_chunk_overlap

    plan = _plan(q_chunk_overlap(spark, SF))
    assert "Exchange" not in plan, plan

    rows = q_chunk_overlap(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    import pyspark.sql.functions as F

    ntok = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(ntok)
    W, S = 64, 48
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = ntok[doc]
        want_chunks = len(range(0, max(n, 1), S))
        assert len(chunks) == want_chunks, (doc, n, len(chunks))
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for i, c in enumerate(chunks):
            start = i * S
            assert c["chunk_ntok"] == min(W, n - start), (doc, n, i)
        # coverage: last chunk reaches the last token
        assert (len(chunks) - 1) * S + chunks[-1]["chunk_ntok"] == n
