#!/bin/sh
# Pre-commit gate for INDEX-SCHEMA-TOUCHING diffs (the round-7 lesson:
# the signature index grew min_md5 and shipped before its consumer
# tests ran; one failed-test commit sat in history ~2h).
#
# Run this BEFORE committing any change to:
#   operators/dedup.py (signature_index / band tables / memoized builds)
#   operators/_memo.py
#   functions/text.py
#   operators/similarity.py (the _sem_labels / IVF index builders)
#
# It runs the hand-reference + memo test block (< 2 min): every test
# that pins an index artifact's values to a hand-computed reference,
# plus the memo layer's invalidation/eviction contract.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_memo.py -q --no-header
python -m pytest tests/test_operators.py tests/test_properties.py \
    -k "hand_reference or memo or fingerprint or signature or minhash or simhash" \
    -q --no-header
echo "precommit gate: GREEN"
