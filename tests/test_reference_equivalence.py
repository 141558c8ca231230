"""Reference-equivalence fixtures (FIXTURES.md F3, SURVEY.md §5):
the PySpark re-expression of the concept-document repair (O3/O8/O9/O10)
reproduces the reference's regex semantics on every edge case —
/root/reference/files/extract.py:17-24, files/transform.py:33-44."""

from pyspark.sql import functions as F, types as T

from concept_catalog_etl_spark.functions.reference_repair import (
    affected_filter,
    repair_concepts,
)

CONCEPT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField(
            "ansvarligVirksomhet", T.StructType([T.StructField("_id", T.StringType())])
        ),
        T.StructField(
            "definisjon",
            T.StructType(
                [
                    T.StructField(
                        "kildebeskrivelse",
                        T.StructType(
                            [
                                T.StructField(
                                    "kilde",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("tekst", T.StringType()),
                                                T.StructField("uri", T.StringType()),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField("other_field", T.StringType()),
    ]
)


def _doc(_id, kilde, org="974761076"):
    # definisjon -> kildebeskrivelse -> kilde (two struct levels)
    return (_id, (org,), ((kilde,),), "opaque-data")


FIXTURES = [
    # (id, kilde elements, affected?, expected tekst after repair)
    ("single-quote", [("{'no': 'Skatteetaten'}", "u1")], True, ["Skatteetaten"]),
    ("double-quote", [('{"no": "Skatteetaten"}', "u1")], True, ["Skatteetaten"]),
    ("empty-inner", [("{'no': ''}", None)], True, [""]),
    ("plain-passthrough", [("just plain text", "u2")], False, ["just plain text"]),
    ("mixed", [("{'no': 'wrapped'}", None), ("plain", None)], True, ["wrapped", "plain"]),
    ("null-tekst", [(None, "u3")], False, [None]),
    ("empty-string-tekst", [("", None)], False, [""]),
    ("null-kilde", None, False, None),
    ("empty-kilde", [], False, []),
]


def _fixtures_df(spark):
    return spark.createDataFrame([_doc(i, k) for i, k, _a, _e in FIXTURES], CONCEPT_SCHEMA)


def test_affected_filter_matches_reference(spark):
    df = _fixtures_df(spark)
    got = {
        r["_id"]: r["aff"]
        for r in df.select("_id", affected_filter().alias("aff")).collect()
    }
    for _id, _k, affected, _e in FIXTURES:
        assert got[_id] == affected, _id


def test_repair_semantics_and_diff10(spark):
    df = _fixtures_df(spark)
    out = repair_concepts(df)
    rows = {r["_id"]: r for r in out.collect()}
    # only affected docs present (reference extract writes only matches)
    assert set(rows) == {i for i, _k, a, _e in FIXTURES if a}
    for _id, kilde, affected, expected in FIXTURES:
        if not affected:
            continue
        got = [e["tekst"] for e in rows[_id]["definisjon"]["kildebeskrivelse"]["kilde"]]
        assert got == expected, _id
        assert rows[_id]["dq_viol"] == 0  # length delta exactly 10 on repaired
        # non-tekst fields pass through untouched
        got_uri = [e["uri"] for e in rows[_id]["definisjon"]["kildebeskrivelse"]["kilde"]]
        assert got_uri == [u for _t, u in kilde]


def test_projection_drops_opaque_fields(spark):
    df = _fixtures_df(spark)
    out = repair_concepts(df)
    assert set(out.columns) == {"_id", "definisjon", "dq_viol"}  # O5 projection


def test_python_reference_regex_agreement(spark):
    """Cross-check the Spark rlike/regexp_extract against Python re with the
    reference's exact pattern string on all fixture texts."""
    import re

    ref_pat = "^{\"?'?no\"?'?: ?\"?'?(.*)(\"+|'+)}$"  # files/transform.py:37
    texts = [t for _i, k, _a, _e in FIXTURES if k for t, _u in k if t]
    df = spark.createDataFrame([(t,) for t in texts], "tekst string")
    from concept_catalog_etl_spark.functions.reference_repair import WRAP_RE_JAVA

    got = {
        r["tekst"]: (r["m"], r["x"])
        for r in df.select(
            "tekst",
            F.col("tekst").rlike(WRAP_RE_JAVA).alias("m"),
            F.regexp_extract("tekst", WRAP_RE_JAVA, 1).alias("x"),
        ).collect()
    }
    for t in texts:
        m = re.match(ref_pat, t)
        assert got[t][0] == (m is not None), t
        if m:
            assert got[t][1] == m.group(1), t
