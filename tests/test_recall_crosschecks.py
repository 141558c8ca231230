"""Recall cross-checks for the approximate dedup/ANN queries (VERDICT.md
round-1 task 3): the four queries the driver records as ``no_oracle``
(q_minhash_pairs, q_simhash, q_ann_lsh, q_ann_ivf) are engine-specific by
construction (hash functions / cell boundaries), so they cannot be
SQL-oracled — but each has an EXACT counterpart in the same module, and
recall/precision against that counterpart is a machine-checkable invariant.
This is the reference's own verification style: observational invariants
where exact oracles don't exist (reference files/transform.py:38-42, the
diff==10 check).

Thresholds carry safety margin under the measured values (sf0.001,
cap=300): minhash recall@jac>=0.4 measured 0.95 → assert 0.8; LSH recall
measured 0.91 → assert 0.6 (plus exact subset); IVF recall@5 measured 0.74
→ assert 0.55; simhash near/far Hamming gap measured 15.0 vs 23.1 → assert
gap > 3 bits.
"""

import itertools

import pytest

from concept_catalog_etl_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"
CAP = 300  # quadratic-verifier corpus cap for test speed


@pytest.fixture(scope="module")
def jaccard_pairs(spark):
    """Exact 3-gram Jaccard pairs (>=0.3) on the capped corpus."""
    return {(r.doc_a, r.doc_b): r.jac for r in Q.q_jaccard_ngram(spark, SF, cap=CAP).collect()}


def test_minhash_recall_of_exact_jaccard(spark, jaccard_pairs):
    """MinHash+LSH banding must recall >=0.8 of the exact jac>=0.4 pairs
    (same 3-gram shingle definition on both sides)."""
    mh = {(r.doc_a, r.doc_b) for r in Q.q_minhash_pairs(spark, SF, cap=CAP).collect()}
    strong = {p for p, j in jaccard_pairs.items() if j >= 0.4}
    assert len(strong) > 100, "corpus too small for a meaningful recall check"
    recall = len(strong & mh) / len(strong)
    assert recall >= 0.8, f"minhash recall {recall:.3f} < 0.8 of {len(strong)} strong pairs"


def test_simhash_hamming_correlates_with_jaccard(spark, jaccard_pairs):
    """Hamming-close simhash <=> high n-gram Jaccard: the mean Hamming
    distance of near-dup pairs (jac>=0.6) must sit well below that of
    far pairs (jac<0.3). Also pins determinism (xxhash64 is seeded)."""
    sh = {
        r.doc_id: r.simhash
        for r in Q.q_simhash(spark, SF).collect()
        if r.doc_id < CAP
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [ham(sh[a], sh[b]) for (a, b), j in jaccard_pairs.items() if j >= 0.6]
    far = [
        ham(sh[a], sh[b])
        for a, b in itertools.combinations(sorted(sh), 2)
        if jaccard_pairs.get((a, b), 0.0) < 0.3
    ]
    assert len(near) > 50 and len(far) > 50
    mean_near = sum(near) / len(near)
    mean_far = sum(far) / len(far)
    assert mean_near + 3 < mean_far, (
        f"simhash does not separate near ({mean_near:.1f}) from far ({mean_far:.1f}) pairs"
    )


def test_ann_lsh_subset_and_recall(spark):
    """Multi-table hyperplane LSH: every emitted pair must appear in the
    exact cosine>=0.3 set (precision 1.0 — candidates are verified with the
    exact cosine), and recall must be >=0.6."""
    exact = {(r.vec_a, r.vec_b) for r in Q.q_embed_cosine_dup(spark, SF).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in Q.q_ann_lsh(spark, SF).collect()}
    assert lsh <= exact, f"{len(lsh - exact)} LSH pairs not in the exact set"
    assert len(exact) > 100
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.6, f"LSH recall {recall:.3f} < 0.6 of {len(exact)} exact pairs"


def test_ann_gemm_equals_bruteforce(spark):
    """The Arrow/GEMM physical plan must produce the exact same ranked
    top-5 as the JVM-expression brute force (both rank on round(sim, 6)
    with nid tie-break, so float reassociation cannot show through)."""
    a = sorted(tuple(r) for r in Q.q_ann_topk(spark, SF).collect())
    b = sorted(tuple(r) for r in Q.q_ann_topk_gemm(spark, SF).collect())
    assert a == b


def test_ann_ivf_recall_at_5(spark):
    """IVF (nprobe=4 of 16 cells) must recall >=0.55 of the brute-force
    top-5 neighbours, and return exactly 5 ranked rows per query."""
    topk = {(r.qid, r.nid) for r in Q.q_ann_topk(spark, SF).collect()}
    ivf_rows = Q.q_ann_ivf(spark, SF).collect()
    ivf = {(r.qid, r.nid) for r in ivf_rows}
    per_q = {}
    for r in ivf_rows:
        per_q.setdefault(r.qid, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    assert len(topk) == 50
    recall = len(topk & ivf) / len(topk)
    assert recall >= 0.55, f"IVF recall@5 {recall:.3f} < 0.55"
