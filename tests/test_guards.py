"""The quadratic verification primitives must refuse full-corpus input."""

import pytest

from real_time_fraud_detection_system_spark.operators._guards import (
    QuadraticGuardError,
)
from real_time_fraud_detection_system_spark.operators.dedup import (
    dedup_ngram_jaccard,
)
from real_time_fraud_detection_system_spark.operators.similarity import (
    embedding_near_dup,
)


def test_embedding_near_dup_guard_trips(spark, sf_dir):
    with pytest.raises(QuadraticGuardError, match="ann_lsh_bucketed"):
        embedding_near_dup(spark, sf_dir, max_rows=1)


def test_ngram_jaccard_guard_trips(spark, sf_dir):
    with pytest.raises(QuadraticGuardError, match="dedup_minhash_lsh"):
        dedup_ngram_jaccard(spark, sf_dir, max_rows=1)


def test_guard_allows_within_bound(spark, sf_dir):
    # default bound (100k) far above the smoke corpus -> runs normally
    assert embedding_near_dup(spark, sf_dir).columns == [
        "a_id", "b_id", "cosine",
    ]


def test_sublinear_scaling_helpers_boundaries():
    """The sqrt(n)-rate centroid modulus and log2(n) plane count are the
    two knobs that keep IVF / semantic-dedup sublinear; pin their
    boundary behavior (powers of two are exact in IEEE log2/sqrt, so
    the engine-side Python matches the in-SQL computations)."""
    from real_time_fraud_detection_system_spark.operators.similarity import (
        SEM_BUCKET_TARGET,
        SEM_TABLES,
        centroid_modulus,
        sem_planes,
    )

    assert centroid_modulus(0) == 1
    assert centroid_modulus(1) == 1
    assert centroid_modulus(16) == 4
    assert centroid_modulus(17) == 4          # floor, not round
    assert centroid_modulus(1_000_000) == 1000
    # K ~ n/m stays within 2x of sqrt(n) across six orders of magnitude
    for n in (100, 10_000, 1_000_000, 10**8):
        k = n / centroid_modulus(n)
        assert 0.5 * n ** 0.5 <= k <= 2.2 * n ** 0.5

    # per-table planes for the multi-table scheme: planes(n) =
    # ceil(log2(n*T / target)), so T tables together do ~n*target work
    assert sem_planes(0) == 1
    assert sem_planes(SEM_BUCKET_TARGET // SEM_TABLES) == 1
    assert sem_planes(SEM_BUCKET_TARGET) == 2          # log2(T) = 2
    assert sem_planes(500) == 7
    assert sem_planes(200_000) == 16
    # expected TOTAL occupancy n*T / 2^planes stays in [target/2, target]
    for n in (1_000, 50_000, 10**7):
        occ = n * SEM_TABLES / (1 << sem_planes(n))
        assert SEM_BUCKET_TARGET / 2 <= occ <= SEM_BUCKET_TARGET
