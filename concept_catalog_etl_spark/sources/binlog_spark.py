"""Spark-native deterministic binlog generator (bench-scale).

The NumPy generator (binlog.py) is the test fixture; this one produces the
same F2 event-line shape entirely in JVM expressions (`xxhash64`-derived
pseudo-randomness, `to_json`), so generating 10^7+ events takes seconds and
the path to the 10^10-event north-scale input is "add executors". Determinism:
every field is a pure function of (event index, seed) — no RNG state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB = 50_257


def _h(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic uniform bigint ≥ 0 from (seed, tag, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))


def generate_binlog_df(
    spark: SparkSession,
    n_events: int,
    n_docs: int = 200_000,
    seed: int = 42,
    max_tokens: int = 24,
    p_delete: float = 0.05,
    p_wrapped: float = 0.15,
    p_wrong_ntok: float = 0.10,
    p_null_ntok: float = 0.05,
    p_malformed: float = 0.01,
    hot_frac: float = 0.01,
    hot_mass: float = 0.5,
    start_lsn: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame[value: string] of JSON event lines, ordered by lsn."""
    n_hot = max(1, int(n_docs * hot_frac))
    npart = partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_events, 1, npart)
    i = F.col("id")

    def pct(tag, p):  # bernoulli(p)
        return (_h(seed, tag, i) % 10_000) < int(p * 10_000)

    hot = pct("hot", hot_mass)
    doc_idx = F.when(hot, _h(seed, "hd", i) % n_hot).otherwise(
        n_hot + _h(seed, "cd", i) % max(n_docs - n_hot, 1)
    )
    doc = F.format_string("doc-%06d", doc_idx.cast("int"))
    is_delete = pct("del", p_delete)
    is_insert = ~is_delete & pct("ins", 0.3)
    op = (
        F.when(is_delete, "delete").when(is_insert, "insert").otherwise("update")
    )
    # monotone-ish event time with jitter (LWW order ≠ lsn order, on purpose)
    ts_us = F.greatest(
        i * 2_500_000 + (_h(seed, "jit", i) % 4_000_000) - 2_000_000, F.lit(0)
    )
    event_ts = F.date_format(
        F.timestamp_micros(ts_us), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    lsn = i + start_lsn
    n_tok_true = (_h(seed, "len", i) % max_tokens + 1).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok_true),
        lambda j: ((doc_idx * 2654435761 + lsn + j) % VOCAB).cast("int"),
    )
    wrapped = pct("wrap", p_wrapped)
    toks_str = F.concat(
        F.lit("{'no': '"),
        F.array_join(F.transform(toks, lambda t: t.cast("string")), " "),
        F.lit("'}"),
    )
    n_tok_field = (
        F.when(pct("nulln", p_null_ntok), F.lit(None).cast("int"))
        .when(pct("wrongn", p_wrong_ntok), n_tok_true + 7)
        .otherwise(n_tok_true)
    )
    source = F.element_at(
        F.array(F.lit("crawl"), F.lit("curated"), F.lit("synthetic")),
        (_h(seed, "src", i) % 3 + 1).cast("int"),
    )
    payload = F.when(
        ~is_delete,
        F.struct(
            F.when(~wrapped, toks).alias("tokens"),
            F.when(wrapped, toks_str).alias("tokens_raw"),
            n_tok_field.alias("n_tok"),
            source.alias("source"),
        ),
    )
    line = F.to_json(
        F.struct(
            op.alias("op"),
            doc.alias("doc_id"),
            event_ts.alias("event_ts"),
            lsn.alias("lsn"),
            F.lit(1).alias("schema_version"),
            payload.alias("payload"),
        )
    )
    malformed = pct("mal", p_malformed)
    mal_kind = _h(seed, "malk", i) % 3
    bad_line = (
        F.when(mal_kind == 0, F.lit("{this is not json"))
        .when(
            mal_kind == 1,
            F.to_json(
                F.struct(
                    F.lit("upsert").alias("op"),
                    doc.alias("doc_id"),
                    event_ts.alias("event_ts"),
                    lsn.alias("lsn"),
                )
            ),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.lit("update").alias("op"),
                    F.lit(None).cast("string").alias("doc_id"),
                    event_ts.alias("event_ts"),
                    lsn.alias("lsn"),
                )
            )
        )
    )
    return df.select(
        "id", F.when(malformed, bad_line).otherwise(line).alias("value")
    )


def generate_binlog_files(
    spark: SparkSession, out_dir: str, n_events: int, n_files: int = 8, **kw
) -> list[str]:
    """Write the binlog as ``n_files`` text files, lexicographic order = lsn
    order (range partitioning on the event index)."""
    df = generate_binlog_df(spark, n_events, **kw)
    (
        df.repartitionByRange(n_files, "id")
        .sortWithinPartitions("id")
        .select("value")
        .write.mode("overwrite")
        .text(out_dir)
    )
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".txt")
    )
