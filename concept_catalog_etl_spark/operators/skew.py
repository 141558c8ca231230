"""Skew tooling: hot-key detection + salted join/aggregate helpers.

FIXTURES.md F1: ~1% of doc_ids carry ~50% of events. Engine posture:

* the dedup hot path uses partial aggregation (``max_by``), which absorbs
  within-batch key skew before any shuffle (see dedup.py);
* the MERGE join runs post-dedup (≤1 row per key on the change side), so key
  skew cannot occur there by construction;
* AQE skew-join splitting is enabled session-wide as the backstop;
* for workloads that DO need a skewed raw join (e.g. enrich-before-dedup),
  ``salted_join`` replicates the small side over ``n_salts`` and salts the
  big side — the classic explicit fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_key_histogram(df: DataFrame, key: str, min_count: int = 1000) -> DataFrame:
    """Per-batch key histogram, filtered to hot keys (drives salting/ops
    decisions and the metrics sink)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc())
    )


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Uniform salt column derived from row content (deterministic, no RNG)."""
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*src), F.lit(n_salts)))


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    ``n_salts``× via an explode, join on (key, salt)."""
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")
