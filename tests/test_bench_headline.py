"""bench.py HEADLINE membership rule (stated above the list in
bench.py): round-changed queries enter the round they change, every
operator family keeps a member, members only accumulate, quadratic
teaching variants stay out. These tests make the rule executable so
BENCH_rN stays interpretable as operators accumulate (round-8 verdict:
the membership rule was only implicit in bench.py).
"""

import sys

sys.path.insert(0, "/root/repo")

from real_time_fraud_detection_system_spark.operators import (
    ROUND_CHANGED,
    _modules,
    all_queries,
)

from bench import HEADLINE

# the deliberately-quadratic teaching variants (guard_quadratic refuses
# them at bench scale); their scale-path twins are headline instead
_QUADRATIC_TEACHING = {
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "dedup_simhash16",
}


def test_headline_is_a_registry_subset_without_duplicates():
    registered = set(all_queries())
    assert len(HEADLINE) == len(set(HEADLINE))
    unknown = [q for q in HEADLINE if q not in registered]
    assert not unknown, f"headline names not in the registry: {unknown}"


def test_every_round_changed_query_is_headline():
    missing = [q for q in ROUND_CHANGED if q not in HEADLINE]
    assert not missing, (
        "queries changed this round but not bench-measured "
        f"(rule 1 of the HEADLINE membership rule): {missing}"
    )


def test_every_family_has_a_headline_member():
    head = set(HEADLINE)
    for mod in _modules():
        fam = set(getattr(mod, "QUERIES", {}))
        if fam and not fam - _QUADRATIC_TEACHING:
            continue  # family consists only of teaching variants
        if fam:
            assert fam & head, (
                f"{mod.__name__} has no headline member (rule 2)"
            )


def test_quadratic_teaching_variants_stay_out():
    inside = _QUADRATIC_TEACHING & set(HEADLINE)
    assert not inside, f"quadratic teaching variants in headline: {inside}"
