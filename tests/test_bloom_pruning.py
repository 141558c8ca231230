"""Bloom-sidecar point-lookup pruning (Iceberg Puffin-style auxiliary
files). Pins: no false negatives (lookups stay exact), files actually get
pruned on high-cardinality keys where min/max can't bite, compaction builds
the sidecars, MoR deltas stay LWW-correct under pruning, and vacuum removes
sidecars with their data files."""

import os

from pyspark.sql import functions as F

from tests.helpers import make_table


def _rows(spark, n=200, source="crawl", lsn0=0):
    return spark.range(n).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(7)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit(source).alias("source"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        (F.col("id") + lsn0).alias("_lsn"),
    )


def _all_blooms(root):
    out = []
    for r, _d, fns in os.walk(root):
        out += [os.path.join(r, f) for f in fns if f.endswith(".bloom")]
    return out


def test_bloom_prunes_files_and_stays_exact(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    # 5 commits -> >=5 files per bucket, disjoint key ranges per commit
    for c in range(5):
        df = _rows(spark, 100).withColumn(
            "doc_id", F.concat(F.lit(f"c{c}-"), F.col("doc_id"))
        )
        table.commit(
            add_files=table.write_data_files(df, with_bloom=True),
            batch_id=c,
        )
    files = table.files()
    assert all(f.get("bloom") for f in files)
    want = ["c2-doc-000042"]
    kept = [f for f in files if table._bloom_maybe(f, want)]
    # the key lives in exactly one commit's files; ~1% FPR means the other
    # ~20 files are almost all pruned
    assert len(kept) <= 3, (len(kept), len(files))
    got = table.read_keys(spark, want).collect()
    assert [r["doc_id"] for r in got] == want
    # multi-key lookup across commits: still exact
    want3 = ["c0-doc-000001", "c3-doc-000099", "c4-doc-000050"]
    got3 = sorted(r["doc_id"] for r in table.read_keys(spark, want3).collect())
    assert got3 == sorted(want3)


def test_compaction_builds_sidecars_lookup_correct(spark, scratch):
    table = make_table(scratch, n_buckets=4)
    for c in range(3):  # disjoint key ranges: base appends don't upsert
        df = _rows(spark, 150).withColumn(
            "doc_id", F.concat(F.lit(f"c{c}-"), F.col("doc_id"))
        )
        table.commit(add_files=table.write_data_files(df), batch_id=c)
    assert not _all_blooms(table.root)  # hot ingest path: no blooms
    table.compact(spark)
    files = table.files()
    assert files and all(f.get("bloom") for f in files)
    assert _all_blooms(table.root)
    got = table.read_keys(spark, ["c1-doc-000007"]).collect()
    assert [r["doc_id"] for r in got] == ["c1-doc-000007"]


def test_bloom_pruning_keeps_mor_lww_resolve_exact(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    table.commit(
        add_files=table.write_data_files(_rows(spark, 100), with_bloom=True),
        batch_id=0,
    )
    # newer delta version of one key, bloom'd as well
    delta = _rows(spark, 1, source="curated", lsn0=10_000).filter(
        F.col("doc_id") == "doc-000000"
    )
    table.commit(
        add_files=table.write_data_files(delta, delta=True, with_bloom=True),
        batch_id=1,
    )
    rows = {r["doc_id"]: r for r in
            table.read_keys(spark, ["doc-000000", "doc-000033"]).collect()}
    assert rows["doc-000000"]["source"] == "curated"  # delta won LWW
    assert rows["doc-000033"]["source"] == "crawl"


def test_vacuum_removes_sidecars_with_files(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    for c in range(2):  # 2 files/bucket so compact actually rewrites
        df = _rows(spark, 100).withColumn(
            "doc_id", F.concat(F.lit(f"c{c}-"), F.col("doc_id"))
        )
        table.commit(
            add_files=table.write_data_files(df, with_bloom=True), batch_id=c
        )
    before = _all_blooms(table.root)
    assert before
    table.compact(spark)  # replaces the bloom'd originals
    table.vacuum(retain_last=1, orphan_grace_sec=0)
    after = set(_all_blooms(table.root))
    assert not (set(before) & after), "stale sidecars survived vacuum"
    # every surviving sidecar sits next to a live parquet
    for b in after:
        assert os.path.exists(b[: -len(".bloom")])
    got = table.read_keys(spark, ["c0-doc-000042"]).collect()
    assert [r["doc_id"] for r in got] == ["c0-doc-000042"]


def test_missing_sidecar_never_breaks_lookup(spark, scratch):
    table = make_table(scratch, n_buckets=2)
    table.commit(
        add_files=table.write_data_files(_rows(spark, 50), with_bloom=True),
        batch_id=0,
    )
    for b in _all_blooms(table.root):
        os.remove(b)  # manifest says bloom, sidecar gone -> keep the file
    got = table.read_keys(spark, ["doc-000013"]).collect()
    assert [r["doc_id"] for r in got] == ["doc-000013"]


def test_bloom_no_false_negatives_for_int_keys(spark, scratch):
    """Build hashes str(v) of parquet values; probes may arrive as raw ints
    (read_changes collects typed key values). Both must canonicalize the
    same way or the bloom gives false negatives — dropped rows."""
    import os

    from concept_catalog_etl_spark.lakehouse import LakeTable, TableSchema

    t = LakeTable.create(
        os.path.join(scratch, "ints"),
        TableSchema.create([("doc_id", "bigint"), ("n_tok", "int")], key="doc_id"),
        n_buckets=4,
    )
    rows = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit(3).alias("n_tok"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("_event_ts"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.commit(add_files=t.write_data_files(rows, with_bloom=True), batch_id=0)
    assert all(f.get("bloom") for f in t.files())
    # probe with RAW int keys — every one must come back
    got = sorted(r["doc_id"] for r in t.read_keys(spark, [0, 57, 199]).collect())
    assert got == [0, 57, 199]
    # stringified probes against the bigint key behave like the ints
    got = sorted(r["doc_id"] for r in t.read_keys(spark, ["0", "57", "199"]).collect())
    assert got == [0, 57, 199]
