"""Regression: the polynomial-hash modulus must keep acc*131+c inside int64
for EVERY residue, not just the short words in the checked-in corpus.

The original _P56 = 2^56-5 allowed residues acc > 2^63/131 (reached by any
word of >= 9 chars), where Spark's non-ANSI bigint arithmetic wraps silently
while DuckDB computes exactly — so q_simhash_poly's "oracle-exact" claim
held only because the sf0.01 corpus has 31 distinct words, all short. This
suite injects long words and pins Spark == DuckDB == pure-python fold.
"""

import random

import duckdb
import pandas as pd
import pytest

from concept_catalog_etl_spark.plans.queries import (
    _P56,
    SQL_SIMHASH_POLY,
    q_simhash_poly,
)


def _py_fold(word: str, mod: int) -> int:
    acc = 7
    for ch in word:
        acc = (acc * 131 + ord(ch)) % mod
    return acc


def test_modulus_bound_guarantees_no_int64_overflow():
    # worst case inside the fold: acc = mod-1, c = 127 (max ascii)
    assert (_P56 - 1) * 131 + 127 <= 2**63 - 1
    # still a 56-bit prime: all 56 simhash bit positions stay live
    assert _P56.bit_length() == 56


@pytest.fixture()
def long_word_docs(tmp_path):
    rng = random.Random(20260818)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = []
    for i in range(60):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(9, 24)))
            for _ in range(rng.randint(3, 12))
        ]
        text = " ".join(words)
        rows.append((i, text, "en", "synth", len(text)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path), pdf


def test_simhash_poly_matches_oracle_on_long_words(spark, long_word_docs):
    sf_dir, pdf = long_word_docs
    got = {
        r["doc_id"]: r["simhash"] for r in q_simhash_poly(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {int(d): int(s) for d, s in con.execute(SQL_SIMHASH_POLY).fetchall()}
    assert got == want


def test_spark_fold_matches_python_reference_on_long_words(spark, long_word_docs):
    sf_dir, pdf = long_word_docs
    # pure-python simhash over the same per-word fold — independent of both engines
    sig = {}
    for _, row in pdf.iterrows():
        votes = [0] * 56
        for w in row["text"].lower().split(" "):
            h = _py_fold(w, _P56)
            for b in range(56):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig[row["doc_id"]] = sum(1 << b for b in range(56) if votes[b] > 0)
    got = {
        r["doc_id"]: r["simhash"] for r in q_simhash_poly(spark, sf_dir).collect()
    }
    assert got == sig
