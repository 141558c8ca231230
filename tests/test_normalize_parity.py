"""The two normalize implementations (JVM expressions vs combined Arrow UDF)
must produce identical final table state — and both must match the oracle."""

import os

from concept_catalog_etl_spark.operators.merge import MergeConfig
from concept_catalog_etl_spark.oracle import replay_dir
from concept_catalog_etl_spark.sources.binlog import generate_binlog
from concept_catalog_etl_spark.streaming.replay import replay_batch

from helpers import assert_state_equals_oracle, make_table, table_state


def test_jvm_and_arrow_impls_agree_and_match_oracle(spark, scratch):
    d = os.path.join(scratch, "binlog")
    paths = generate_binlog(
        d, n_events=3000, n_docs=250, n_files=4, seed=31,
        p_wrapped=0.4, p_wrong_ntok=0.2, p_null_ntok=0.1,
    )
    t_jvm = make_table(os.path.join(scratch, "jvm"))
    t_arrow = make_table(os.path.join(scratch, "arrow"))
    m1 = replay_batch(spark, paths, t_jvm, files_per_batch=2, cfg=MergeConfig(impl="jvm"))
    m2 = replay_batch(spark, paths, t_arrow, files_per_batch=2, cfg=MergeConfig(impl="arrow"))
    s1 = table_state(spark, t_jvm)
    s2 = table_state(spark, t_arrow)
    assert s1 == s2
    # dq counter parity (wrong n_tok detected the same way)
    assert sum(m["ntok_repaired"] for m in m1) == sum(m["ntok_repaired"] for m in m2) > 0
    oracle_state, _s, _st = replay_dir(d)
    assert_state_equals_oracle(spark, t_jvm, oracle_state)


def test_jvm_norm_edge_cases(spark, scratch):
    """Edge inputs: wrapped-empty → [], wrapped non-numeric → DLQ,
    garbage raw → DLQ; identical in both impls."""
    import json

    d = os.path.join(scratch, "log")
    os.makedirs(d)

    def ev(doc, lsn, tokens=None, raw=None):
        return json.dumps(
            {"op": "insert", "doc_id": doc, "event_ts": f"2026-01-01T00:00:{lsn:02d}.000000",
             "lsn": lsn, "schema_version": 1,
             "payload": {"tokens": tokens, "tokens_raw": raw, "n_tok": None, "source": None},
             "schema_change": None}
        )

    f = os.path.join(d, "b.jsonl")
    with open(f, "w") as fh:
        fh.write("\n".join([
            ev("d1", 1, raw="{'no': ''}"),           # empty inner → []
            ev("d2", 2, raw="{'no': 'a b c'}"),       # non-numeric → DLQ
            ev("d3", 3, raw="plain garbage"),          # unwrapped → DLQ
            ev("d4", 4, raw='{"no": "5  6"}'),        # double spaces OK
            ev("d5", 5, tokens=[9, 8]),                # passthrough
        ]) + "\n")

    for impl in ("jvm", "arrow"):
        t = make_table(os.path.join(scratch, impl))
        replay_batch(spark, [f], t, cfg=MergeConfig(impl=impl))
        s = table_state(spark, t)
        assert set(s) == {"d1", "d4", "d5"}, (impl, s)
        assert s["d1"]["tokens"] == [] and s["d1"]["n_tok"] == 0
        assert s["d4"]["tokens"] == [5, 6]
        assert s["d5"]["tokens"] == [9, 8]
        assert all(r["source"] == "crawl" for r in s.values())
    oracle_state, _s, ostats = replay_dir(d)
    assert set(oracle_state) == {"d1", "d4", "d5"}
    assert ostats["dlq"] == 2
