"""Candidate-volume guards for the LSH constructions: the key spaces
must scale with the corpus, so candidate counts grow sub-quadratically
instead of collapsing toward within-bucket all-pairs at 100x the data.
Deterministic seeded inputs; all counts are exact."""

import random

from pdf2ontology_spark.operators import dedup, similarity


def _vectors(spark, n, dim=16, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _docs(spark, n, seed=11):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(5000)]
    rows = [
        (f"d{i:05d}", " ".join(rng.choice(vocab) for _ in range(30))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_planes_for_corpus_scales():
    assert similarity.planes_for_corpus(500) == 8  # floor: the oracle operating point
    assert similarity.planes_for_corpus(5_000) == 8
    assert similarity.planes_for_corpus(1_000_000) == 14
    assert similarity.planes_for_corpus(10**9) == 24  # cap
    assert similarity.planes_for_corpus(10) == 8  # tiny corpus -> floor


def test_embedding_candidates_subquadratic(spark):
    """8x the vectors must NOT give 64x the candidates: the corpus-sized
    band-key width (6 bits at n=500, 9 bits at n=4000 with the test's
    target_bucket=8) absorbs most of the quadratic term."""
    n_a, n_b = 500, 4000
    w_a = similarity.planes_for_corpus(n_a, target_bucket=8, floor=4)
    w_b = similarity.planes_for_corpus(n_b, target_bucket=8, floor=4)
    assert w_b > w_a  # the widths must actually scale across this range
    c_a = dedup.embedding_candidates(
        _vectors(spark, n_a), planes_per_band=w_a, bands=4
    ).count()
    c_b = dedup.embedding_candidates(
        _vectors(spark, n_b), planes_per_band=w_b, bands=4
    ).count()
    growth = c_b / max(c_a, 1)
    assert growth < 20, f"candidate growth {growth:.1f}x for 8x rows (quadratic = 64x)"
    # a FIXED narrow width at the larger corpus is strictly worse
    c_b_fixed = dedup.embedding_candidates(
        _vectors(spark, n_b), planes_per_band=w_a, bands=4
    ).count()
    assert c_b_fixed > 2 * c_b


def test_simhash_candidate_volume_vs_narrow_keys(spark):
    """The 64-bit/16-bit-key construction keeps collision-noise
    candidates near-linear where the old 32-bit/8-bit keys (256 buckets
    per band) were already two orders of magnitude denser at n=2000."""
    docs = _docs(spark, 2000)
    sig64 = dedup.simhash(docs, "doc_id", "text", bits=64)
    sig32 = dedup.simhash(docs, "doc_id", "text", bits=32)
    c64 = dedup.simhash_candidates(sig64, bits=64, bands=4).count()
    c32 = dedup.simhash_candidates(sig32, bits=32, bands=4).count()
    assert c64 * 20 < c32, f"expected ~256x fewer candidates, got {c32}/{c64}"
    assert c64 < 5 * 2000  # near-linear at this size
