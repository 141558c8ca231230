"""Shared JVM-expression vector/LSH primitives.

One home for the zip_with/aggregate dot-product fold and the hot-bucket
hygiene filter that the batch ANN queries (plans/queries.py), the live ANN
index (operators/ann_index.py) and the MinHash near-dup index
(operators/neardup_index.py) all need — previously three drifting copies.
The fold order (left-to-right aggregate) is part of the oracle contract:
DuckDB's list_reduce folds the same way, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dot(a, b) -> F.Column:
    """Exact dot product of two array columns as a left fold — pure JVM,
    element-cast to double so int arrays (token vectors) work too."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> F.Column:
    """L2 norm via the same fold shape (transform, not zip_with, so the
    expression tree stays small for the self-product)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cap_hot_buckets(df: DataFrame, part_cols: list[str], max_size: int | None) -> DataFrame:
    """Drop rows of DEGENERATE LSH buckets (> ``max_size`` members under
    ``part_cols``). One hot bucket of b docs emits b candidates per matching
    probe, so an unbounded bucket turns a candidate lookup quadratic at
    corpus scale. Standard LSH hygiene: a dropped doc still collides with
    probes in its other bands, so recall degrades only for docs
    near-identical to >max_size others — which exact dedup removes anyway.
    ``None`` disables the cap."""
    if max_size is None:
        return df
    w = Window.partitionBy(*part_cols)
    return (
        df.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= max_size)
        .drop("_bsz")
    )
