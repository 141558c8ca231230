"""Manifest column-stats pruning (Iceberg manifest min/max analog).

Pins: stats are harvested per file (keyed by field id, plus `_event_ts`);
`read(col_ranges=...)` prunes base files whose range can't match and still
returns exactly the live rows within range; delta-containing buckets are
NEVER pruned (a pruned winner version would resurrect a stale in-range row
past the LWW resolve); exact timestamp boundaries don't mis-prune for
string bounds."""

import datetime as dt

from pyspark.sql import functions as F

from concept_catalog_etl_spark.lakehouse.table import _stats_intersect
from tests.helpers import make_table


def _rows(spark, n, ntok, source, day, key_prefix, lsn0=0):
    return spark.range(n).select(
        F.format_string(f"{key_prefix}-%06d", F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(7)).alias("tokens"),
        F.lit(ntok).alias("n_tok"),
        F.lit(source).alias("source"),
        F.lit(f"2026-01-{day:02d} 00:00:00").cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn0).alias("_lsn"),
    )


def test_stats_harvested_and_pruning_exact(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    # 3 commits with disjoint key spaces AND disjoint n_tok/source/ts ranges
    for c, (ntok, src, day) in enumerate([(2, "crawl", 1), (5, "books", 10), (9, "wiki", 20)]):
        table.commit(
            add_files=table.write_data_files(_rows(spark, 40, ntok, src, day, f"c{c}")),
            batch_id=c,
        )
    files = table.files()
    assert all(f.get("col_stats") for f in files)
    schema = table.schema()
    fid = {f.name: str(f.id) for f in schema.fields}
    # one commit's files match n_tok in [4, 6] — the rest must prune
    kept = [f for f in files if _stats_intersect(f, {fid["n_tok"]: (4, 6)})]
    assert 0 < len(kept) < len(files)
    assert all("c1" in (f["min_key"] or "") for f in kept)
    got = table.read(spark, col_ranges={"n_tok": (4, 6)}).collect()
    assert len(got) == 40 and all(r["n_tok"] == 5 for r in got)
    # string column + combined ranges
    got2 = table.read(
        spark, col_ranges={"source": ("wiki", "wiki"), "n_tok": (0, 100)}
    ).collect()
    assert len(got2) == 40 and all(r["source"] == "wiki" for r in got2)
    # _event_ts range with an EXACT-boundary string bound (regression: the
    # fixed-width stats encoding must not lexically out-rank the bound)
    got3 = table.read(
        spark,
        col_ranges={"_event_ts": ("2026-01-10 00:00:00", "2026-01-10 00:00:00")},
        with_system_cols=True,
    ).collect()
    assert len(got3) == 40 and all(
        r["_event_ts"] == dt.datetime(2026, 1, 10) for r in got3
    )


def test_delta_buckets_never_pruned(spark, scratch):
    """A key's old version is in range, its NEWER delta version is not: the
    row must NOT appear, even though stats-pruning the delta file would
    'helpfully' drop the winner and resurrect the stale row."""
    table = make_table(scratch, n_buckets=2)
    table.commit(
        add_files=table.write_data_files(_rows(spark, 20, 5, "crawl", 1, "k")),
        batch_id=0,
    )
    # delta: same keys, newer coordinate, n_tok far OUT of the probed range
    newer = _rows(spark, 20, 99, "crawl", 2, "k", lsn0=1000).withColumn(
        "_event_ts", F.lit("2026-02-01 00:00:00").cast("timestamp")
    ).withColumn("_deleted", F.lit(False))
    table.commit(
        add_files=table.write_data_files(newer, delta=True), batch_id=1
    )
    got = table.read(spark, col_ranges={"n_tok": (4, 6)}).collect()
    assert got == []  # every live row has n_tok=99
    got_hi = table.read(spark, col_ranges={"n_tok": (90, 100)}).collect()
    assert len(got_hi) == 20 and all(r["n_tok"] == 99 for r in got_hi)


def test_missing_stats_and_unknown_column(spark, scratch):
    import pytest

    table = make_table(scratch, n_buckets=2)
    table.commit(
        add_files=table.write_data_files(_rows(spark, 10, 3, "crawl", 1, "m")),
        batch_id=0,
    )
    # files with no stats entry for a column are kept (conservative)
    assert _stats_intersect({"col_stats": {}}, {"9": (0, 1)}) is True
    assert _stats_intersect({}, {"9": (0, 1)}) is True
    with pytest.raises(ValueError):
        table.read(spark, col_ranges={"nope": (0, 1)}).collect()


def test_date_bound_and_eager_syscols_error(spark, scratch):
    import pytest

    table = make_table(scratch, n_buckets=2)
    # contract error raises even when the table is empty / fully pruned
    with pytest.raises(ValueError):
        table.read(spark, col_ranges={"_event_ts": (None, "2026-01-10")})
    table.commit(
        add_files=table.write_data_files(_rows(spark, 15, 3, "crawl", 10, "d")),
        batch_id=0,
    )
    # a bare datetime.date upper bound must include equal-midnight rows
    # (regression: short ISO encoding lexically under-ranked the stats)
    got = table.read(
        spark,
        col_ranges={"_event_ts": (None, dt.date(2026, 1, 10))},
        with_system_cols=True,
    ).collect()
    assert len(got) == 15
    none = table.read(
        spark,
        col_ranges={"_event_ts": (None, dt.date(2026, 1, 9))},
        with_system_cols=True,
    ).collect()
    assert none == []


def test_version_as_of_and_row_count(spark, scratch):
    import time

    import pytest

    from concept_catalog_etl_spark.lakehouse.table import VersionVacuumedError

    table = make_table(scratch, n_buckets=2)
    stamps = [table.snapshot(0).get("committed_at")]
    for c in range(2):
        table.commit(
            add_files=table.write_data_files(_rows(spark, 10, 3, "crawl", 1, f"v{c}")),
            batch_id=c,
        )
        stamps.append(table.snapshot(table.current_version())["committed_at"])
        time.sleep(0.05)
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)
    # as-of each stamp resolves to that version; mid-gap resolves backward
    assert table.version_as_of(stamps[1]) == 1
    assert table.version_as_of(stamps[1] + 0.02) == 1
    assert table.version_as_of(time.time() + 60) == 2
    with pytest.raises(VersionVacuumedError):
        table.version_as_of(stamps[0] - 10)
    # ISO-string input
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(stamps[2]).isoformat()
    assert table.version_as_of(iso) == 2
    # metadata-only count (no deltas, provably tombstone-free)
    assert table.row_count() == 20
    assert table.row_count(version=1) == 10
    # a delta commit forces the resolve path
    newer = _rows(spark, 10, 4, "crawl", 2, "v0", lsn0=100).withColumn(
        "_deleted", F.lit(False)
    )
    table.commit(add_files=table.write_data_files(newer, delta=True), batch_id=9)
    with pytest.raises(ValueError):
        table.row_count()
    assert table.row_count(spark) == 20  # upserts, not inserts
    # history carries the stamps
    hist = {r["version"]: r["committed_at"] for r in table.history(spark).collect()}
    assert hist[1] == pytest.approx(stamps[1])


def test_clustered_compaction_tightens_pruning(spark, scratch):
    """compact(cluster_by=['n_tok'], target_rows_per_file=...) must leave
    consecutive files with near-disjoint n_tok ranges, so a range read
    prunes most of the bucket — and results stay exact."""
    import pytest

    table = make_table(scratch, n_buckets=1)
    # one bucket, n_tok uniformly mixed across 4 commits (so pre-compaction
    # every file spans the whole range and nothing can prune)
    for c in range(4):
        df = spark.range(200).select(
            F.format_string(f"c{c}-%06d", F.col("id")).alias("doc_id"),
            F.array(F.col("id").cast("int")).alias("tokens"),
            (F.col("id") % 100).cast("int").alias("n_tok"),
            F.lit("crawl").alias("source"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
            (F.col("id") + c * 1000).alias("_lsn"),
        )
        table.commit(add_files=table.write_data_files(df), batch_id=c)
    pre = table.files()
    fid = {f.name: str(f.id) for f in table.schema().fields}
    probe = {fid["n_tok"]: (10, 19)}
    assert all(_stats_intersect(f, probe) for f in pre)  # nothing prunable
    res = table.compact(spark, cluster_by=["n_tok"], target_rows_per_file=200)
    assert res["buckets_compacted"] == 1
    post = table.files()
    assert len(post) >= 3
    kept = [f for f in post if _stats_intersect(f, probe)]
    assert len(kept) < len(post)  # clustering made the stats bite
    got = table.read(spark, col_ranges={"n_tok": (10, 19)}).collect()
    assert len(got) == 80 and all(10 <= r["n_tok"] <= 19 for r in got)
    # point lookups survive the changed sort order (bloom sidecars)
    one = table.read_keys(spark, ["c2-000042"]).collect()
    assert [r["doc_id"] for r in one] == ["c2-000042"]
    with pytest.raises(ValueError):
        table.compact(spark, cluster_by=["nope"])
