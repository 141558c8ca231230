"""Physical-plan assertions (.explain-driven, SURVEY.md §4): the choices
that matter at 100 TB are pinned here so regressions show up as test
failures, not as cluster bills."""

import datetime as dt

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse import bucket_expr
from helpers import make_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_aggregation_single_shuffle(spark):
    """The merge kernel (union → repartition(bucket) → groupBy(bucket, key))
    must plan exactly ONE exchange: the bucket repartition satisfies the
    aggregation's required clustering, and the bucketed write reuses it."""
    rows = [
        (f"doc-{i}", "update", dt.datetime(2026, 1, 1), i, [1, 2], 2, "crawl")
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, op string, event_ts timestamp, lsn long, "
        "tokens array<int>, n_tok int, source string",
    )
    payload = ["op", "event_ts", "lsn", "tokens", "n_tok", "source"]
    bucketed = df.withColumn("_bucket", bucket_expr("doc_id", 8)).repartition(
        8, "_bucket"
    )
    winners = (
        bucketed.groupBy("_bucket", "doc_id")
        .agg(F.max(F.struct("event_ts", "lsn", *[c for c in payload
                                                 if c not in ("event_ts", "lsn")])).alias("_w"))
        .select("_bucket", "doc_id", "_w.*")
    )
    plan = _plan(winners)
    assert plan.count("Exchange") == 1, plan


def test_table_read_pushes_filters_and_prunes_columns(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    seed = spark.range(100).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("crawl").alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    table.commit(add_files=table.write_data_files(seed))
    df = table.read(spark).filter(F.col("n_tok") > 0).select("doc_id", "n_tok")
    plan = _plan(df)
    # tombstone + user predicates reach the parquet scan; projection pruned
    assert "PushedFilters" in plan
    assert "_deleted" in plan.split("PushedFilters")[1][:300], plan
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "tokens" not in read_schema, read_schema  # nested/col pruning works


def test_dim_join_is_broadcast(spark, sf_dir="/root/testdata/sf0.001"):
    from concept_catalog_etl_spark.plans.queries import q_join_enrich

    plan = _plan(q_join_enrich(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_lww_maxby_has_partial_aggregation(spark, sf_dir="/root/testdata/sf0.001"):
    from concept_catalog_etl_spark.plans.queries import q_lww_dedup_maxby

    plan = _plan(q_lww_dedup_maxby(spark, sf_dir))
    assert "partial_max_by" in plan, plan


def test_envelope_parsed_exactly_once(spark):
    """from_json must appear exactly once in the merge pipeline's physical
    plan. parse_raw's Generate barrier guarantees it; without the barrier,
    Catalyst's per-field JSON pruning re-lexes every line ~12x across the
    pipeline (measured ~2x total replay wall at 6M events)."""
    from concept_catalog_etl_spark.lakehouse.schema import TableSchema
    from concept_catalog_etl_spark.operators.dedup import lww_dedup_with_sideout
    from concept_catalog_etl_spark.operators.envelope import parse_raw
    from concept_catalog_etl_spark.operators.merge import MergeConfig, _normalize

    schema = TableSchema.create(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")],
        key="doc_id",
    )
    raw = spark.createDataFrame(
        [('{"op": "insert", "doc_id": "d1", "event_ts": "2026-01-01T00:00:00", '
          '"lsn": 1, "schema_version": 1, '
          '"payload": {"tokens": [1, 2], "n_tok": 2, "source": "crawl"}}',)],
        "value string",
    )
    parsed = parse_raw(raw, schema)
    data = parsed.filter(
        F.col("_dlq_reason").isNotNull() | (F.col("op") != "schema_change")
    )
    norm = _normalize(data, schema, MergeConfig(), {})
    is_bad = (F.col("_dlq_reason").isNull() & F.col("op").isin("insert", "update")
              & F.col("tokens").isNull())
    norm = norm.withColumn(
        "_dlq_reason",
        F.coalesce(F.col("_dlq_reason"), F.when(is_bad, F.lit("bad_tokens"))),
    )
    agg = lww_dedup_with_sideout(
        norm, key="doc_id",
        winner_cols=["op", "event_ts", "lsn", "tokens", "n_tok", "source"],
        sideout_cols=[F.col("_raw"), F.col("_dlq_reason"), F.col("op"),
                      F.col("doc_id").alias("doc_id"), F.col("event_ts"),
                      F.col("lsn")],
    )
    plan = _plan(agg)
    assert plan.count("from_json") == 1, plan


def test_ann_variants_recall_floor(spark):
    """Approximate ANN paths (LSH buckets, IVF cells) must retrieve a
    reasonable share of the brute-force cosine top-5 — guards against a
    broken quantizer/banding silently returning plausible-but-wrong
    neighbors."""
    from concept_catalog_etl_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    bf = {(r["qid"], r["nid"])
          for r in QUERIES["q_ann_topk"](spark, sf).collect()}
    ivf = {(r["qid"], r["nid"])
           for r in QUERIES["q_ann_ivf"](spark, sf).collect()}
    assert len(bf & ivf) / len(bf) >= 0.4, (len(bf & ivf), len(bf))



def test_approximate_dedup_plans_have_no_cartesian_product(spark):
    """The scale-path dedup/ANN queries must meet candidates through keyed
    joins (band/bucket/table hashes), never an all-pairs cross product —
    the plan-level guarantee that they survive 100 TB. (The capped
    quadratic VERIFIERS are allowed their crossJoin — that is their job.)"""
    from concept_catalog_etl_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    for name in ("q_minhash_pairs", "q_ann_lsh", "q_ann_ivf", "q_semdedup"):
        plan = _plan(Q.QUERIES[name](spark, sf))
        assert "CartesianProduct" not in plan, f"{name} planned an all-pairs join"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} planned a BNLJ"


def test_refinery_plan_shape(spark):
    """The composed refinery must keep each stage's scale shape: the
    decontamination probe is a broadcast hash join (eval side is small by
    construction), the dedup/flag joins are keyed (no cartesian), and the
    whole pipeline is one Catalyst tree."""
    from concept_catalog_etl_spark.plans import queries as Q

    plan = _plan(Q.QUERIES["q_refinery"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the eval-shingle probe


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping must converge in O(log diameter) rounds: a 60-hop
    path graph needs 59 rounds under plain one-hop propagation (and used to
    raise at 25) but ~6 with the label-of-label jump. Also checks a second
    disjoint component and a singleton keep their own minima."""
    from concept_catalog_etl_spark.plans.queries import connected_components

    chain = [(i, i + 1) for i in range(60)]          # component min = 0
    ring = [(100 + i, 100 + (i + 1) % 10) for i in range(10)]  # min = 100
    fwd = spark.createDataFrame(chain + ring, "u long, v long")
    edges = fwd.union(fwd.selectExpr("v AS u", "u AS v"))
    nodes = spark.createDataFrame(
        [(i,) for i in range(61)] + [(100 + i,) for i in range(10)] + [(999,)],
        "v long",
    )
    labels = {r["v"]: r["lbl"] for r in connected_components(edges, nodes, max_rounds=10).collect()}
    assert all(labels[i] == 0 for i in range(61))
    assert all(labels[100 + i] == 100 for i in range(10))
    assert labels[999] == 999


def test_dedup_clusters_source_has_no_collect(spark):
    """q_dedup_clusters must not materialize labels through the driver —
    cluster labels are O(corpus) at scale. Pin it at the source level (the
    round-2 version did collect()+createDataFrame) and check the query
    still runs green end-to-end."""
    import inspect

    from concept_catalog_etl_spark.plans import queries as Q

    src = inspect.getsource(Q.q_dedup_clusters) + inspect.getsource(
        Q.connected_components
    )
    assert ".collect()" not in src and "createDataFrame" not in src
    assert Q.QUERIES["q_dedup_clusters"](spark, "/root/testdata/sf0.001").count() == 500

def test_asof_join_single_shuffle_and_tie_semantics(spark, scratch, tmp_path):
    """The as-of composition must cost exactly one Exchange (hash on
    user_id feeding the window sort) — the property that makes it an as-of
    JOIN and not a nested loop. Semantics pinned on crafted ties: a click
    at the purchase's exact ts is excluded (strict <), equal-ts clicks
    break by max event_id, a purchase with no prior click drops out."""
    import datetime as dt

    from concept_catalog_etl_spark.plans import queries as Q

    plan = _plan(Q.q_asof_join(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t(5), 1, "click", 0.0, "{}"),
        (3, t(7), 1, "click", 0.0, "{}"),
        (4, t(7), 1, "click", 0.0, "{}"),   # equal-ts tie -> max id wins
        (9, t(10), 1, "click", 0.0, "{}"),  # same ts as purchase: excluded
        (10, t(10), 1, "purchase", 1.0, "{}"),
        (20, t(3), 2, "purchase", 1.0, "{}"),  # no prior click: dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    df.write.parquet(f"{scratch}/events.parquet")
    got = {r["event_id"]: (r["click_id"], r["gap_us"])
           for r in Q.q_asof_join(spark, scratch).collect()}
    assert got == {10: (4, 3_000_000)}


def test_range_join_is_keyed_not_nested_loop(spark):
    """The bin-bucketed range join must plan a hash/broadcast EQUI-join on
    the time bin — never a BNLJ/cartesian — and stay correct (oracle-checked
    separately); here we pin the plan shape that survives big×big."""
    from concept_catalog_etl_spark.plans import queries as Q

    plan = _plan(Q.q_range_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rollup_and_pivot_single_pass(spark):
    """ROLLUP: all grouping-set levels come out of ONE Expand + agg — at
    most the one post-expand shuffle (plus AQE's sort for the final
    collect, which is not an Exchange). PIVOT with pinned values: a single
    conditional-agg groupBy, one shuffle, no values-discovery distinct."""
    from concept_catalog_etl_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    roll = _plan(Q.q_rollup(spark, sf))
    assert "Expand" in roll, roll
    assert roll.count("Exchange") == 1, roll
    piv = _plan(Q.q_pivot(spark, sf))
    assert piv.count("Exchange") == 1, piv


def test_ngram_dup_rate_partial_agg_no_cartesian(spark, sf_dir="/root/testdata/sf0.001"):
    """Two-level aggregation: the (source,gram) count must have a partial
    (map-side) phase so duplicate grams die before the exchange, and the
    plan must not contain a cartesian/nested-loop join."""
    from concept_catalog_etl_spark.plans.queries import q_ngram_dup_rate

    plan = _plan(q_ngram_dup_rate(spark, sf_dir))
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tfidf_broadcasts_df_and_reuses_corpus_pass(spark, sf_dir="/root/testdata/sf0.001"):
    """df (vocab-bounded) and the 1-row N must both arrive by broadcast —
    the (doc,word) side never shuffles for either join."""
    from concept_catalog_etl_spark.plans.queries import q_tfidf_topk

    plan = _plan(q_tfidf_topk(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2 or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tfidf_vocab_guard_both_regimes(spark, sf_dir="/root/testdata/sf0.001"):
    """The vocab guard (round-4 task 7): under the broadcast budget the df
    join broadcasts; above it (adversarial vocabulary) it falls back to a
    shuffle join on word — the driver never materializes the vocab."""
    from concept_catalog_etl_spark.plans.queries import q_tfidf_topk

    # the sf0.001 vocabulary is tiny → auto resolves to broadcast
    auto = _plan(q_tfidf_topk(spark, sf_dir, join_strategy="auto"))
    assert "BroadcastHashJoin" in auto or "BroadcastExchange" in auto, auto
    # force the adversarial regime via a 1-word budget: the guard removes
    # the FORCED broadcast hint, so only Catalyst's size-bounded (10MB)
    # auto-broadcast remains — disable it to expose the shuffle fallback
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guard = _plan(q_tfidf_topk(spark, sf_dir, join_strategy="auto",
                                   broadcast_vocab_max=1))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in guard or "ShuffledHashJoin" in guard, guard
    # results identical in both regimes (same rows, any order)
    a = q_tfidf_topk(spark, sf_dir, join_strategy="broadcast")
    b = q_tfidf_topk(spark, sf_dir, join_strategy="shuffle")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_scd2_windows_share_one_user_exchange(spark,
                                              sf_dir="/root/testdata/sf0.001"):
    """The SCD2 chain (lag → running-sum → groupBy(user,run) → lead) is
    all user_id-clustered: after the first hash exchange on user_id the
    window/agg pipeline must not reshuffle."""
    from concept_catalog_etl_spark.plans.queries import q_scd2_history

    plan = _plan(q_scd2_history(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_span_dedup_keeper_agg_is_partial(spark,
                                          sf_dir="/root/testdata/sf0.001"):
    """The keeper set must come from min(struct(doc_id, idx)) — a map-side
    combinable aggregation (duplicate spans die pre-shuffle) — NOT from a
    row_number window over span groups, which would buffer every duplicate
    on the reduce side."""
    from concept_catalog_etl_spark.plans.queries import q_span_dedup

    plan = _plan(q_span_dedup(spark, sf_dir))
    assert "partial_min" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_merge_patch_one_shuffle_partial_agg(spark,
                                             sf_dir="/root/testdata/sf0.001"):
    """Per-field LWW must plan as ONE hash aggregation with map-side combine
    (partial_max on the field structs — hot keys die pre-shuffle), one
    exchange on the key, and NO window sort per field."""
    from concept_catalog_etl_spark.plans.queries import q_merge_patch

    plan = _plan(q_merge_patch(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_merge_aggregate_two_pass_no_window(spark,
                                            sf_dir="/root/testdata/sf0.001"):
    """Reset-aware aggregation must keep its documented shape: the final
    fold is an algebraic hash aggregation with map-side combine
    (partial_sum), and NO window sort sneaks in for the reset filter."""
    from concept_catalog_etl_spark.plans.queries import q_merge_aggregate

    plan = _plan(q_merge_aggregate(spark, sf_dir))
    assert "partial_sum" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_registry_groups_partition_the_queries():
    """GROUPS must be an exact partition of QUERIES (oracle_check --group
    coverage can't silently skip a query), and every query without an
    ORACLES entry must be one of the two documented engine-hash no_oracle
    cases."""
    from concept_catalog_etl_spark.plans.queries import (
        GROUPS, ORACLES, QUERIES, dynamic_oracles,
    )

    flat = [q for g in GROUPS.values() for q in g]
    assert len(flat) == len(set(flat)), "query listed in two groups"
    assert set(flat) == set(QUERIES)
    covered = set(ORACLES) | set(dynamic_oracles())
    assert set(QUERIES) - covered == {"q_minhash_pairs", "q_simhash"}


def test_dsir_broadcasts_llr_and_partial_aggs(spark, sf_dir="/root/testdata/sf0.001"):
    """DSIR scoring: the D-bounded LLR table must arrive by broadcast (the
    candidate side never shuffles for the scoring join), the bucket count
    must have a map-side partial phase, and there is no cartesian join
    (the 1-row mass table rides a broadcast nested-loop, which Spark
    prints as BroadcastNestedLoopJoin — allowed; CartesianProduct is
    not)."""
    from concept_catalog_etl_spark.plans.queries import q_dsir_weights

    plan = _plan(q_dsir_weights(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_sum" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cluster_keep_best_partial_agg_keeper(spark, sf_dir="/root/testdata/sf0.001"):
    """The quality keeper must be a min(struct) partial aggregate (no
    window over cluster groups) and the plan must stay cartesian-free."""
    from concept_catalog_etl_spark.plans.queries import q_cluster_keep_best

    plan = _plan(q_cluster_keep_best(spark, sf_dir))
    assert "partial_min" in plan or "partial_" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
