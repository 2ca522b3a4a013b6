"""Candidate-volume guards for the LSH constructions: the key spaces
must scale with the corpus, so candidate counts grow sub-quadratically
instead of collapsing toward within-bucket all-pairs at 100x the data.
Deterministic seeded inputs; all counts are exact."""

import random

from pyspark.sql import functions as F

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


def test_centroids_for_corpus_scales():
    assert similarity.centroids_for_corpus(500) == 16  # the oracle operating point
    assert similarity.nprobe_for_centroids(16) == 2  # the oracle operating point
    assert similarity.centroids_for_corpus(10) == 16  # tiny corpus -> floor
    assert similarity.centroids_for_corpus(10_000) == 64
    assert similarity.centroids_for_corpus(1_000_000) == 512
    assert similarity.centroids_for_corpus(10**12) == 1 << 16  # cap
    assert similarity.nprobe_for_centroids(64) == 4
    assert similarity.nprobe_for_centroids(1024) == 16


def test_ivf_rerank_volume_subquadratic(spark):
    """16x the corpus must NOT give 16x the rerank candidates: the
    sqrt-sized quantizer (16 lists at n=500, 64 at n=8000) shrinks the
    probed fraction as the corpus grows, where fixed constants keep
    rerank volume a constant fraction of n (linear per query = the
    degradation toward brute force VERDICT r3 flagged)."""

    def rerank_volume(n, c, np_):
        emb = _vectors(spark, n)
        q = emb.filter("vec_id < 8")
        cent = similarity.ivf_centroids(emb, n_centroids=c)
        corpus = (
            similarity.ivf_assign(emb, cent, nprobe=1)
            .select(F.col("id").alias("cid"), "cluster")
        )
        probes = (
            similarity.ivf_assign(q, cent, nprobe=np_)
            .select(F.col("id").alias("qid"), "cluster")
        )
        return corpus.join(probes, "cluster").filter("cid != qid").count()

    n_a, n_b = 500, 8000
    c_a, c_b = similarity.centroids_for_corpus(n_a), similarity.centroids_for_corpus(n_b)
    assert c_b > c_a  # the quantizer must actually scale across this range
    v_a = rerank_volume(n_a, c_a, similarity.nprobe_for_centroids(c_a))
    v_b = rerank_volume(n_b, c_b, similarity.nprobe_for_centroids(c_b))
    growth = v_b / max(v_a, 1)
    assert growth < 12, f"rerank volume grew {growth:.1f}x for 16x rows (linear = 16x)"
    # the FIXED 16-list quantizer at the larger corpus is strictly worse
    v_b_fixed = rerank_volume(n_b, c_a, 2)
    assert v_b_fixed > 1.5 * v_b


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
