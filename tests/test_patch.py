"""Partial-update (merge-patch) operator tests: per-field LWW agrees with a
sequential ``$set`` fold (the reference's sink semantics,
/root/reference/files/load.py:20-22), deletes null fields at their
coordinate, later patches resurrect rows, and the result is
permutation/partition-invariant."""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from concept_catalog_etl_spark.operators.patch import partial_update_state

FIELDS = ["a", "b"]
SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (d, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), lsn, op, a, b)
            for d, s, lsn, op, a, b in rows
        ],
        SCHEMA,
    )


def _sequential_set(rows):
    """Golden model: apply events one at a time in (ts, lsn) order, exactly
    like a loop of Mongo ``$set`` calls; delete clears the doc but a later
    patch recreates it from an empty base."""
    state: dict[str, dict] = {}
    deleted: dict[str, bool] = {}
    for d, s, lsn, op, a, b in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        if op == "delete":
            state[d] = {}
            deleted[d] = True
            continue
        doc = state.setdefault(d, {})
        if a is not None:
            doc["a"] = a
        if b is not None:
            doc["b"] = b
        deleted[d] = False
    return {
        d: (state[d].get("a"), state[d].get("b"))
        for d in state
        if not deleted[d]
    }


def _result(df):
    return {r["doc_id"]: (r["a"], r["b"]) for r in df.collect()}


def test_patch_fields_merge_independently(spark):
    rows = [
        ("x", 1, 1, "update", 10, None),   # sets a
        ("x", 2, 2, "update", None, "hi"),  # sets b, a survives
        ("x", 3, 3, "update", 20, None),   # newer a, b survives
    ]
    out = _result(partial_update_state(_df(spark, rows), fields=FIELDS))
    assert out == {"x": (20, "hi")}


def test_patch_delete_nulls_all_then_resurrect(spark):
    rows = [
        ("x", 1, 1, "update", 10, "old"),
        ("x", 2, 2, "delete", None, None),
        ("x", 3, 3, "update", None, "new"),  # resurrects with ONLY b
        ("y", 1, 4, "update", 7, None),
        ("y", 2, 5, "delete", None, None),   # y stays dead (delete is latest)
    ]
    out = _result(partial_update_state(_df(spark, rows), fields=FIELDS))
    assert out == {"x": (None, "new")}
    kept = partial_update_state(_df(spark, rows), fields=FIELDS, keep_deleted=True)
    by_key = {r["doc_id"]: r for r in kept.collect()}
    assert by_key["y"]["_deleted"] is True
    assert by_key["y"]["a"] is None and by_key["y"]["b"] is None


def test_patch_late_event_older_than_delete_loses(spark):
    rows = [
        ("x", 5, 9, "delete", None, None),
        ("x", 1, 1, "update", 10, "old"),   # late arrival, pre-delete
        ("x", 6, 10, "update", None, "post"),
    ]
    out = _result(partial_update_state(_df(spark, rows), fields=FIELDS))
    assert out == {"x": (None, "post")}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.integers(min_value=0, max_value=50),  # ts seconds
            st.sampled_from(["update", "delete"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
            st.one_of(st.none(), st.sampled_from(["p", "q", "r"])),
        ),
        min_size=1,
        max_size=40,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_patch_matches_sequential_set_fold(spark, events, seed):
    # unique lsn per event gives the engine-wide total-order contract
    rows = [
        (d, s, i, op, None if op == "delete" else a, None if op == "delete" else b)
        for i, (d, s, op, a, b) in enumerate(events)
    ]
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)  # arrival order must not matter
    df = _df(spark, shuffled).repartition(5)
    out = _result(partial_update_state(df, fields=FIELDS))
    assert out == _sequential_set(rows)


# ---------------------------------------------------------------------------
# aggregation merge engine
# ---------------------------------------------------------------------------

from concept_catalog_etl_spark.operators.patch import aggregate_state  # noqa: E402


def _sequential_aggregate(rows):
    """Golden model: apply events in (ts, lsn) order; delete resets the key
    (drops accumulated state); key visible iff any event after its last
    delete."""
    state: dict[str, dict] = {}
    for d, s, lsn, op, a, b in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        if op == "delete":
            state.pop(d, None)
            continue
        doc = state.setdefault(d, {"sum": None, "last": None})
        if a is not None:
            doc["sum"] = a if doc["sum"] is None else doc["sum"] + a
        if b is not None:
            doc["last"] = b
    return {d: (v["sum"], v["last"]) for d, v in state.items()}


def _agg_result(df):
    return {r["doc_id"]: (r["a"], r["b"]) for r in df.collect()}


def test_aggregate_sum_and_last_with_reset(spark):
    rows = [
        ("x", 1, 1, "update", 10, "u"),
        ("x", 2, 2, "update", 5, None),    # sum accumulates, last survives
        ("x", 3, 3, "delete", None, None),  # reset
        ("x", 4, 4, "update", 7, "w"),     # only this survives the reset
        ("y", 1, 5, "update", 1, "a"),
        ("y", 2, 6, "delete", None, None),  # y's latest is the reset → gone
    ]
    out = _agg_result(
        aggregate_state(
            _df(spark, rows), aggs={"a": "sum", "b": "last_non_null"}
        )
    )
    assert out == {"x": (7, "w")}


def test_aggregate_unknown_fn_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        aggregate_state(_df(spark, []), aggs={"a": "median"})


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["update", "update", "delete"]),
            st.one_of(st.none(), st.integers(min_value=-5, max_value=20)),
            st.one_of(st.none(), st.sampled_from(["p", "q"])),
        ),
        min_size=1,
        max_size=30,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_aggregate_matches_sequential_fold(spark, events, seed):
    rows = [
        (d, s, i, op, None if op == "delete" else a, None if op == "delete" else b)
        for i, (d, s, op, a, b) in enumerate(events)
    ]
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    df = _df(spark, shuffled).repartition(5)
    out = _agg_result(
        aggregate_state(df, aggs={"a": "sum", "b": "last_non_null"})
    )
    assert out == _sequential_aggregate(rows)


def test_patch_map_typed_field(spark):
    """A map-typed patchable field (unorderable — cannot ride inside the
    max(struct) winner) takes the max_by fallback and still folds by
    coordinate: later setter wins, delete nulls, non-setting events leave
    it alone."""
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.IntegerType()),
        T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
    ])
    rows = [
        ("k", dt.datetime(2026, 1, 1, 0, 0, 1), 1, "update", 5, {"x": 1}),
        ("k", dt.datetime(2026, 1, 1, 0, 0, 2), 2, "update", None, {"y": 2}),
        ("k", dt.datetime(2026, 1, 1, 0, 0, 3), 3, "update", 7, None),
        ("z", dt.datetime(2026, 1, 1, 0, 0, 1), 4, "update", 1, {"q": 9}),
        ("z", dt.datetime(2026, 1, 1, 0, 0, 2), 5, "delete", None, None),
    ]
    out = {
        r["doc_id"]: (r["a"], r["m"])
        for r in partial_update_state(
            spark.createDataFrame(rows, schema), fields=["a", "m"]
        ).collect()
    }
    assert out == {"k": (7, {"y": 2})}
