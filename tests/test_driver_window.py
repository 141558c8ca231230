"""The frozen driver window (round-5 verdict task 4).

The driver's CORRECTNESS_r{N} snapshot covers only the FIRST 50 entries of
``plans.queries.QUERIES`` in dict order, so those 50 are the engine's
permanent driver-checked covering set. This test freezes the membership
and pins the covering policy; changing the window is a conscious act that
edits BOTH the registry order and the literal below (and the displacement
log next to QUERIES).

No Spark session needed — pure registry invariants.
"""

from concept_catalog_etl_spark.plans.queries import (
    DRIVER_WINDOW,
    GROUPS,
    ORACLES,
    QUERIES,
    dynamic_oracles,
)

# the frozen covering set, in registry (= driver) order
FROZEN_WINDOW = [
    "q_merge_composite_key",
    "q_merge_struct_payload",
    "q_sample_fixed_k",
    "q_pack_sequences",
    "q_chunk_overlap",
    "q_decontaminate",
    "q_vocab_topk",
    "q_len_histogram",
    "q_dedup_normalized",
    "q_repetition_stats",
    "q_quality_gate",
    "q_refinery",
    "q_unigram_logprob",
    "q_quality_classifier",
    "q_token_drift",
    "q_redact_pii",
    "q_ngram_dup_rate",
    "q_tfidf_topk",
    "q_scd2_history",
    "q_span_dedup",
    "q_scan_filter",
    "q_nested_prune",
    "q_counts",
    "q_hot_keys",
    "q_lww_dedup",
    "q_topk_per_group",
    "q_windowed_throughput",
    "q_sessionize",
    "q_merge_anti",
    "q_merge_semi",
    "q_merge_final_state",
    "q_merge_patch",
    "q_merge_aggregate",
    "q_join_enrich",
    "q_salted_join",
    "q_union_evolved",
    "q_scalar_funcs",
    "q_vectorized_ntok",
    "q_dedup_exact",
    "q_jaccard_ngram",
    "q_dedup_clusters",
    "q_minhash_pairs_poly",
    "q_simhash_poly",
    "q_fingerprint",
    "q_token_count",
    "q_quality_score",
    "q_lang_id",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_ivf",
]


def _window():
    return list(QUERIES)[:DRIVER_WINDOW]


def test_window_membership_is_frozen():
    assert DRIVER_WINDOW == 50
    assert _window() == FROZEN_WINDOW, (
        "the driver window changed — if intentional, update FROZEN_WINDOW "
        "and the displacement log next to QUERIES in plans/queries.py"
    )


def test_every_window_entry_is_oracle_backed():
    """Policy rule 2: a window slot spent on a rows-only (no_oracle) query
    wastes driver-exactness coverage — the engine-hash queries and the
    _gemm physical twins belong after position 50."""
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    covered = set(ORACLES) | set(dynamic_oracles())
    missing = [q for q in _window() if q not in covered]
    assert not missing, f"window entries without an oracle: {missing}"


def test_every_family_has_three_oracle_backed_reps_in_window():
    """Policy rule 1: each operator family keeps >= 3 exactly-checked
    representatives driver-visible (ann contributes its 3 algorithmic
    variants), so no family's correctness ever rests on the judge-side
    tail gate alone."""
    w = set(_window())
    for fam, members in GROUPS.items():
        inside = w & set(members)
        floor = 3
        assert len(inside) >= floor, (
            f"family {fam!r} has only {sorted(inside)} inside the driver "
            f"window (needs >= {floor})"
        )


def test_window_prefix_means_new_queries_append_after():
    """Everything outside the window must still be registered (whole-
    registry oracle_check coverage) and the registry must stay larger than
    the window — appending is the normal growth mode."""
    assert len(QUERIES) > DRIVER_WINDOW
    tail = list(QUERIES)[DRIVER_WINDOW:]
    flat = {q for g in GROUPS.values() for q in g}
    assert set(tail) <= flat
