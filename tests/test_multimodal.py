"""Multimodal plumbing: binary columns through mapInPandas — metadata
extraction and frame-sampling row fan-out."""

from pyspark.sql import functions as F

from concept_catalog_etl_spark.functions.multimodal import extract_meta, frame_sample


def _blob_df(spark):
    return spark.createDataFrame(
        [(1, b"x" * 100), (2, b"y" * 17), (3, b"")], "doc_id long, blob binary"
    )


def test_extract_meta_shapes(spark):
    out = extract_meta(_blob_df(spark)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 100 and by_id[1]["width"] == 100 % 64 + 1
    assert by_id[1]["height"] == (100 // 64) % 64 + 1
    assert by_id[3]["n_bytes"] == 0


def test_frame_sample_fans_out(spark):
    out = frame_sample(_blob_df(spark), every=16).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[1]) == 7  # ceil(100/16)
    assert len(per_doc[2]) == 2
    assert len(per_doc[3]) == 1  # empty payload → one empty frame
    f0 = sorted(per_doc[1], key=lambda r: r["frame_idx"])[0]
    assert bytes(f0["frame"]) == b"x" * 16
    # frame indexes dense from 0
    assert sorted(r["frame_idx"] for r in per_doc[1]) == list(range(7))


def test_multimodal_query_matches_bytes(spark):
    """q_multimodal_meta plumbing: utf-8 byte lengths survive the
    binary→Arrow→pandas→Arrow round trip."""
    df = spark.createDataFrame([(1, "abcø")], "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    r = extract_meta(df).collect()[0]
    assert r["n_bytes"] == 5  # ø is 2 bytes


def test_resize_blob_downsamples(spark):
    from concept_catalog_etl_spark.functions.multimodal import resize_blob

    out = {r["doc_id"]: r for r in resize_blob(_blob_df(spark), factor=2).collect()}
    assert bytes(out[1]["blob"]) == b"x" * 50 and out[1]["n_bytes"] == 50
    assert out[1]["width"] == 50 % 64 + 1 and out[1]["height"] == (50 // 64) % 64 + 1
    # odd length keeps the trailing byte: 17 -> 9
    assert out[2]["n_bytes"] == 9
    assert out[3]["n_bytes"] == 0 and bytes(out[3]["blob"]) == b""
