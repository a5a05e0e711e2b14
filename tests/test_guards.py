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
