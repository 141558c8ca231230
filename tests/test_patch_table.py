"""Stored partial-update (sequence-groups at rest): apply_patch_batch over
a patch_table_schema LakeTable equals a sequential ``$set`` fold of ALL
events regardless of how they are split into batches or reordered ACROSS
batches — including the case a collapsed row-coordinate design gets wrong
(an event newer than a field's true setter but older than the row's newest
field). Exactly-once and read-path compatibility (count, compaction) ride
the normal table machinery."""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from concept_catalog_etl_spark.lakehouse import LakeTable
from concept_catalog_etl_spark.operators.patch import (
    apply_patch_batch,
    patch_table_schema,
)

FIELDS = [("a", "int"), ("b", "string")]
EV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
    ]
)


def _mk(spark, scratch, n_buckets=4):
    import os

    return LakeTable.create(
        os.path.join(scratch, "patch_table"),
        patch_table_schema(FIELDS),
        n_buckets=n_buckets,
    )


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (d, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), lsn, op, a, b)
            for d, s, lsn, op, a, b in rows
        ],
        EV_SCHEMA,
    )


def _sequential_set(rows):
    state, deleted = {}, {}
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


def _state(spark, table):
    return {
        r["doc_id"]: (r["a"], r["b"])
        for r in table.read(spark).select("doc_id", "a", "b").collect()
    }


def test_cross_batch_field_older_than_row_coordinate(spark, scratch):
    """THE sequence-group case: after batch 1, x has a@t5 and b@t9 (row
    coordinate t9). Batch 2 delivers a@t7 — newer than a's true setter,
    older than the row. A collapsed-coordinate merge drops it; per-field
    companions must apply it."""
    table = _mk(spark, scratch)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 5, 1, "update", 10, None),
        ("x", 9, 2, "update", None, "b9"),
    ]), batch_id=1)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 7, 3, "update", 77, None),
    ]), batch_id=2)
    assert _state(spark, table) == {"x": (77, "b9")}
    # and a genuinely stale straggler still loses
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 4, 4, "update", 1, "b4"),
    ]), batch_id=3)
    assert _state(spark, table) == {"x": (77, "b9")}


def test_delete_defends_per_field_across_batches(spark, scratch):
    table = _mk(spark, scratch)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 1, 1, "update", 10, "old"),
        ("x", 6, 2, "delete", None, None),
    ]), batch_id=1)
    assert _state(spark, table) == {}
    # resurrect with only b; then a pre-delete straggler for a must lose
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 8, 3, "update", None, "new"),
    ]), batch_id=2)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 3, 4, "update", 55, None),  # older than the delete
    ]), batch_id=3)
    assert _state(spark, table) == {"x": (None, "new")}


def test_exactly_once_and_compaction(spark, scratch):
    table = _mk(spark, scratch)
    ev = _ev(spark, [("k", 1, 1, "update", 5, "v")])
    m1 = apply_patch_batch(spark, table, ev, batch_id=7)
    m2 = apply_patch_batch(spark, table, ev, batch_id=7)
    assert m1["skipped"] is False and m2["skipped"] is True
    apply_patch_batch(spark, table, _ev(spark, [
        ("k", 2, 2, "update", None, "w"),
        ("j", 1, 3, "update", 9, None),
    ]), batch_id=8)
    table.compact(spark)  # companions are ordinary columns: must survive
    assert _state(spark, table) == {"k": (5, "w"), "j": (9, None)}
    assert table.row_count(spark) == 2


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["update", "update", "delete"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
            st.one_of(st.none(), st.sampled_from(["p", "q"])),
        ),
        min_size=1,
        max_size=16,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_any_batch_split_matches_sequential_fold(spark, scratch_factory,
                                                 events, seed):
    import random

    rows = [
        (d, s, i, op, None if op == "delete" else a, None if op == "delete" else b)
        for i, (d, s, op, a, b) in enumerate(events)
    ]
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)  # cross-batch reordering
    cuts = sorted(rng.sample(range(len(shuffled)), min(2, len(shuffled) - 1))) \
        if len(shuffled) > 1 else []
    batches, prev = [], 0
    for c in cuts + [len(shuffled)]:
        if c > prev:
            batches.append(shuffled[prev:c])
            prev = c
    table = _mk(spark, scratch_factory(), n_buckets=2)
    for i, b in enumerate(batches):
        apply_patch_batch(spark, table, _ev(spark, b), batch_id=i)
    assert _state(spark, table) == _sequential_set(rows)


def _mor_state(spark, table):
    from concept_catalog_etl_spark.operators.patch import read_patch

    return {
        r["doc_id"]: (r["a"], r["b"])
        for r in read_patch(spark, table).select("doc_id", "a", "b").collect()
    }


def test_mor_patch_field_granular_resolve_and_guard(spark, scratch):
    import pytest

    from concept_catalog_etl_spark.operators.patch import compact_patch

    table = _mk(spark, scratch)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 5, 1, "update", 10, None),
        ("x", 9, 2, "update", None, "b9"),
    ]), batch_id=1, write_mode="mor")
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 7, 3, "update", 77, None),   # the sequence-group case
        ("y", 1, 4, "update", 5, "v"),
        ("y", 2, 5, "delete", None, None),
    ]), batch_id=2, write_mode="mor")
    # row-LWW read must REFUSE rather than silently mis-merge
    with pytest.raises(ValueError, match="sequence columns"):
        table.read(spark).collect()
    assert _mor_state(spark, table) == {"x": (77, "b9")}
    # compaction folds deltas; plain read works again and agrees
    res = compact_patch(spark, table)
    assert res["buckets_compacted"] >= 1
    assert _state(spark, table) == {"x": (77, "b9")}
    assert _mor_state(spark, table) == {"x": (77, "b9")}
    # post-compaction MoR batches keep composing (delete defends per field)
    apply_patch_batch(spark, table, _ev(spark, [
        ("x", 6, 6, "update", None, "stale-b"),  # older than b's t9 setter
        ("y", 3, 7, "update", None, "back"),     # resurrects y
    ]), batch_id=3, write_mode="mor")
    assert _mor_state(spark, table) == {"x": (77, "b9"), "y": (None, "back")}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["update", "update", "delete"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
            st.one_of(st.none(), st.sampled_from(["p", "q"])),
        ),
        min_size=1,
        max_size=14,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_mor_any_batch_split_matches_sequential_fold(spark, scratch_factory,
                                                     events, seed):
    import random

    from concept_catalog_etl_spark.operators.patch import compact_patch

    rows = [
        (d, s, i, op, None if op == "delete" else a, None if op == "delete" else b)
        for i, (d, s, op, a, b) in enumerate(events)
    ]
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    cuts = sorted(rng.sample(range(len(shuffled)), min(2, len(shuffled) - 1))) \
        if len(shuffled) > 1 else []
    batches, prev = [], 0
    for c in cuts + [len(shuffled)]:
        if c > prev:
            batches.append(shuffled[prev:c])
            prev = c
    table = _mk(spark, scratch_factory(), n_buckets=2)
    for i, b in enumerate(batches):
        # mid-stream compaction must not change semantics
        if i == 1:
            compact_patch(spark, table)
        apply_patch_batch(spark, table, _ev(spark, b), batch_id=i,
                          write_mode="mor")
    assert _mor_state(spark, table) == _sequential_set(rows)


def test_read_patch_point_lookup_and_guards(spark, scratch):
    """read_patch(keys=...) is the patch-table point-lookup path: it must
    agree with the full resolve for looked-up keys (base-only, delta-only
    and mixed buckets), return nothing for absent/deleted keys, and the
    invalid-parameter guards must refuse before doing work."""
    import pytest

    from concept_catalog_etl_spark.operators.patch import read_patch

    table = _mk(spark, scratch, n_buckets=4)
    # batch 1 CoW → base files only
    apply_patch_batch(spark, table, _ev(spark, [
        ("base-1", 1, 1, "update", 1, "one"),
        ("base-2", 1, 2, "update", 2, "two"),
        ("mix-1", 1, 3, "update", 3, "three"),
    ]), batch_id=1, write_mode="cow")
    # batch 2 MoR → deltas; patches mix-1 per-field, adds + deletes keys
    apply_patch_batch(spark, table, _ev(spark, [
        ("mix-1", 5, 4, "update", 33, None),   # a updated, b kept from base
        ("new-1", 5, 5, "update", 9, "nine"),
        ("gone-1", 5, 6, "update", 7, "seven"),
        ("gone-1", 6, 7, "delete", None, None),
    ]), batch_id=2, write_mode="mor")

    full = {
        r["doc_id"]: (r["a"], r["b"])
        for r in read_patch(spark, table).select("doc_id", "a", "b").collect()
    }
    assert full == {"base-1": (1, "one"), "base-2": (2, "two"),
                    "mix-1": (33, "three"), "new-1": (9, "nine")}
    for want in (["mix-1"], ["base-1", "new-1"], ["gone-1"], ["absent"],
                 ["base-2", "mix-1", "gone-1", "absent"]):
        got = {
            r["doc_id"]: (r["a"], r["b"])
            for r in read_patch(spark, table, keys=want)
            .select("doc_id", "a", "b").collect()
        }
        assert got == {k: full[k] for k in want if k in full}, want

    # read() refuses raw multi-version scans under a range filter (would
    # resurrect stale values at the caller's resolve) and without coords
    with pytest.raises(ValueError, match="col_ranges"):
        table.read(spark, resolve_deltas=False, with_system_cols=True,
                   col_ranges={"a": (0, 10)})
    with pytest.raises(ValueError, match="with_system_cols"):
        table.read(spark, resolve_deltas=False)
    # unknown write_mode is rejected, not silently treated as CoW
    with pytest.raises(ValueError, match="write_mode"):
        apply_patch_batch(spark, table, _ev(spark, []), batch_id=99,
                          write_mode="MOR")
