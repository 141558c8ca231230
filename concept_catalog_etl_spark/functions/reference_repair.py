"""Spark-first re-expression of the reference's concept-document repair.

Covers reference operators O3/O4/O5/O8/O9/O10 (SURVEY.md §2) as pure
DataFrame column expressions — higher-order array functions, no explode,
no Python:

* O3 filter: a concept is *affected* iff ANY element of
  ``definisjon.kildebeskrivelse.kilde`` has truthy ``tekst`` matching the
  wrapper regex (``/root/reference/files/extract.py:17-24``).
* O4: nested access is already null-propagating in Spark SQL (the
  ``.get(..., {})`` chains at ``files/extract.py:32-35`` are free).
* O8/O9 repair: per-element, replace ``tekst`` by regex capture group 1 on
  matching elements only, pass everything else through
  (``files/transform.py:33-44``; safe semantics per SURVEY §2 O9).
* O10 invariant: repaired text must be exactly 10 chars shorter
  (``files/transform.py:38-42``); exposed as a ``dq_viol`` count column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java-regex rendering of the reference pattern (files/transform.py:37).
WRAP_RE_JAVA = "^\\{[\"']?no[\"']?: ?[\"']?(.*)([\"]+|[']+)\\}$"

KILDE = "definisjon.kildebeskrivelse.kilde"


def _tekst_matches(s: Column) -> Column:
    t = s.getField("tekst")
    return t.isNotNull() & (t != "") & t.rlike(WRAP_RE_JAVA)


def affected_filter(kilde: Column | None = None) -> Column:
    """O3: regex-existence over the kilde array; NULL array → not affected."""
    arr = kilde if kilde is not None else F.col(KILDE)
    return F.coalesce(F.exists(arr, _tekst_matches), F.lit(False))


def repaired_kilde(kilde: Column | None = None) -> Column:
    """O8+O9: element-wise repair — strip the wrapper on matching elements."""
    arr = kilde if kilde is not None else F.col(KILDE)
    return F.transform(
        arr,
        lambda s: s.withField(
            "tekst",
            F.when(
                _tekst_matches(s), F.regexp_extract(s.getField("tekst"), WRAP_RE_JAVA, 1)
            ).otherwise(s.getField("tekst")),
        ),
    )


def dq_violations(kilde_before: Column, kilde_after: Column) -> Column:
    """O10: count elements whose length delta != 10 among repaired elements."""
    pairs = F.zip_with(
        kilde_before,
        kilde_after,
        lambda b, a: F.when(
            _tekst_matches(b)
            & (F.length(b.getField("tekst")) - F.length(a.getField("tekst")) != 10),
            1,
        ).otherwise(0),
    )
    return F.coalesce(F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x), F.lit(0))


def repair_concepts(df: DataFrame) -> DataFrame:
    """End-to-end reference pipeline on a concept-document DataFrame:
    filter affected (O3) → project (O5) → repair (O8/O9) → dq count (O10)."""
    affected = df.filter(affected_filter()).select("_id", "definisjon")
    return (
        affected.withColumn("_repaired", repaired_kilde())
        .withColumn("dq_viol", dq_violations(F.col(KILDE), F.col("_repaired")))
        .withColumn(
            "definisjon",
            F.col("definisjon").withField("kildebeskrivelse.kilde", F.col("_repaired")),
        )
        .drop("_repaired")
    )
