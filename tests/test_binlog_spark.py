"""The Spark-native generator produces valid F2 events; engine replay of a
spark-generated log matches the oracle (generator-independence check)."""

import os

from concept_catalog_etl_spark.oracle import replay
from concept_catalog_etl_spark.sources.binlog_spark import generate_binlog_files
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table


def test_spark_generated_binlog_replays_to_oracle_state(spark, scratch):
    d = os.path.join(scratch, "binlog")
    files = generate_binlog_files(
        spark, d, n_events=5000, n_files=4, n_docs=300, seed=77
    )
    assert len(files) == 4
    table = make_table(scratch)
    replay_batch(spark, files, table, files_per_batch=2)
    oracle_state, _s, ostats = replay(files)
    assert ostats["dlq"] > 0 and ostats["deletes"] > 0  # generator covers paths
    assert_state_equals_oracle(spark, table, oracle_state)


def test_spark_generator_is_deterministic(spark, scratch):
    from concept_catalog_etl_spark.sources.binlog_spark import generate_binlog_df

    a = generate_binlog_df(spark, 500, n_docs=50, seed=5).collect()
    b = generate_binlog_df(spark, 500, n_docs=50, seed=5).collect()
    assert a == b
    c = generate_binlog_df(spark, 500, n_docs=50, seed=6).collect()
    assert a != c
