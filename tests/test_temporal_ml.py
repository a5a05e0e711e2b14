"""Invariant tests for the temporal operators and the deterministic ML
frame (value-level gate is tools/check_correctness.py vs DuckDB)."""

import pytest

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.operators.mlqueries import (
    logit_score,
    training_frame_det,
)
from real_time_fraud_detection_system_spark.operators.temporal import (
    approx_distinct_users,
    asof_click_before_purchase,
    clicks_before_errors,
)


def test_asof_click_is_latest_prior(spark, sf_dir):
    rows = asof_click_before_purchase(spark, sf_dir).collect()
    assert rows, "corpus has purchases preceded by clicks"
    for r in rows[:50]:
        assert r["click_ts"] <= r["purchase_ts"]
    # spot-check optimality on one row: no later click in between
    r = rows[0]
    from real_time_fraud_detection_system_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    later = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("user_id") == r["user_id"])
        & (F.col("ts") > r["click_ts"])
        & (F.col("ts") <= r["purchase_ts"])
    ).count()
    assert later == 0


def test_interval_join_window_bounds(spark, sf_dir):
    df = clicks_before_errors(spark, sf_dir)
    errs = df.count()
    from real_time_fraud_detection_system_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    assert errs == ev.filter(F.col("event_type") == "error").count()
    # zero-click errors are retained
    assert df.filter(F.col("n_clicks") == 0).count() >= 0


def test_approx_distinct_within_bound(spark, sf_dir):
    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows and all(r["approx_ok"] == 1 for r in rows)


def test_training_frame_matches_reference_distributions(spark, sf_dir):
    """Moments of the deterministic generator track training.py:17-29:
    amount lognormal(3,1) => median ~ e^3, merchant_risk uniform mean
    ~0.5, hour in [0,24), label rate in a plausible band."""
    df = training_frame_det(spark, sf_dir).cache()
    stats = df.agg(
        F.expr("percentile_approx(amount, 0.5)").alias("med_amount"),
        F.avg("merchant_risk").alias("mr"),
        F.min("hour").alias("h0"),
        F.max("hour").alias("h1"),
        F.avg("label").alias("rate"),
        F.min("num_items").alias("ni"),
    ).first()
    assert 15.0 < stats["med_amount"] < 27.0  # e^3 ~ 20.1
    assert 0.45 < stats["mr"] < 0.55
    assert stats["h0"] >= 0.0 and stats["h1"] <= 23.0
    assert 0.05 < stats["rate"] < 0.60
    assert stats["ni"] >= 1


def test_logit_score_threshold_consistency(spark, sf_dir):
    df = logit_score(spark, sf_dir)
    bad = df.filter(
        ((F.col("proba") >= 0.5) & (F.col("prediction") != 1))
        | ((F.col("proba") < 0.5) & (F.col("prediction") != 0))
    ).count()
    assert bad == 0


def test_salted_agg_two_exchanges(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.skew import (
        salted_value_by_type,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        count_exchanges,
    )

    df = salted_value_by_type(spark, sf_dir)
    # phase-1 (key, salt) exchange + phase-2 key exchange + final sort
    assert count_exchanges(df) <= 3


def test_multimodal_frames_shape(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        N_FRAMES,
        multimodal_frames,
    )

    df = multimodal_frames(spark, sf_dir)
    counts = df.groupBy("media_id").count().select("count").distinct().collect()
    assert {r["count"] for r in counts} == {N_FRAMES}


def test_registered_decoder_replaces_byte_fallback(spark):
    """The PACKAGED P6 decoder is the default image codec (real parse,
    header excluded from the features; non-PPM payloads fall back);
    register_decoder REPLACES it with a custom codec shipped by value
    into the Python workers via the closure snapshot; unregister
    restores the packaged default."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        media_features,
        register_decoder,
        unregister_decoder,
    )

    ppm = b"P6\n2 2\n255\n" + bytes([10, 20, 30] * 4)
    raw = b"\xff\x00\xff\x00"
    m = spark.createDataFrame(
        [(1, bytearray(ppm), "image"), (2, bytearray(raw), "image")],
        "media_id long, payload binary, media_type string",
    )

    # default path: the shipped P6 codec decodes image payloads --
    # 12 pixel bytes, header's 'P'/'6' never counted -- while raw
    # (non-PPM) image payloads byte-fall-back over the whole payload
    rows = {r["media_id"]: r for r in media_features(m).collect()}
    assert rows[1]["n_bytes"] == 12
    assert abs(rows[1]["mean_byte"] - 20.0) < 1e-9
    assert rows[1]["samples"] == [10, 20, 30, 10]
    assert rows[2]["n_bytes"] == 4
    assert abs(rows[2]["mean_byte"] - 127.5) < 1e-9

    # nested so cloudpickle ships it BY VALUE into the Python workers
    # (a test-module-level function would pickle by reference and fail
    # to import there -- exactly what register_decoder's closure
    # snapshot exists to handle for real codec adapters); recognizes a
    # made-up 'Z9' container so override vs default is distinguishable
    def _z9_decoder(payload: bytes) -> dict:
        if not payload.startswith(b"Z9"):
            raise NotImplementedError("not a Z9 payload")
        body = payload[2:]
        return {
            "n_bytes": len(body),
            "mean_byte": float(sum(body)) / len(body),
            "samples": [int(b) for b in body[:4]],
        }

    z9 = b"Z9" + bytes([7, 9])
    m2 = spark.createDataFrame(
        [(1, bytearray(ppm), "image"), (3, bytearray(z9), "image")],
        "media_id long, payload binary, media_type string",
    )
    register_decoder("image", _z9_decoder)
    try:
        over = {r["media_id"]: r for r in media_features(m2).collect()}
    finally:
        unregister_decoder("image")

    # override REPLACES (not chains): Z9 decodes through the custom
    # codec; the P6 payload now byte-falls-back over the whole container
    assert over[3]["n_bytes"] == 2
    assert abs(over[3]["mean_byte"] - 8.0) < 1e-9
    assert over[1]["n_bytes"] == len(ppm)

    # unregister restored the packaged default: P6 decodes again
    back = {r["media_id"]: r for r in media_features(m).collect()}
    assert back[1]["n_bytes"] == 12


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filter_types(filter_type):
    """encode_png -> png_image_decoder must reconstruct the exact pixel
    bytes under every scanline filter (None/Sub/Up/Average/Paeth)."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_png,
        png_image_decoder,
    )

    w, h = 5, 4
    pixels = bytes((7 * i + 3) % 256 for i in range(w * h * 3))
    payload = encode_png(w, h, pixels, color_type=2, filter_type=filter_type)
    feats = png_image_decoder(payload)
    assert feats["n_bytes"] == len(pixels)
    assert feats["mean_byte"] == float(sum(pixels)) / len(pixels)
    assert feats["samples"] == [pixels[0], pixels[1], pixels[2], pixels[3]]


@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
def test_png_color_types(color_type):
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        _PNG_CHANNELS,
        encode_png,
        png_image_decoder,
    )

    ch = _PNG_CHANNELS[color_type]
    w, h = 3, 3
    pixels = bytes((11 * i) % 256 for i in range(w * h * ch))
    feats = png_image_decoder(
        encode_png(w, h, pixels, color_type=color_type, filter_type=4)
    )
    assert feats["n_bytes"] == len(pixels)
    assert feats["mean_byte"] == float(sum(pixels)) / len(pixels)


def test_image_decoder_sniffs_png_ppm_and_falls_back(spark):
    """The default image codec dispatches by container signature: PNG
    and P6 both really decode (pixel bytes only), anything else takes
    the byte-feature fallback -- including a TRUNCATED png, whose
    decode failure must degrade, not error."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_png,
        media_features,
    )

    ppm = b"P6\n2 2\n255\n" + bytes([10, 20, 30] * 4)
    png_pix = bytes([1, 2, 3, 4, 5, 6])
    png = encode_png(2, 1, png_pix, color_type=2, filter_type=1)
    broken = png[: len(png) // 2]
    m = spark.createDataFrame(
        [
            (1, bytearray(ppm), "image"),
            (2, bytearray(png), "image"),
            (3, bytearray(broken), "image"),
        ],
        "media_id long, payload binary, media_type string",
    )
    rows = {r["media_id"]: r for r in media_features(m).collect()}
    assert rows[1]["n_bytes"] == 12  # P6 still decodes via sniffing
    assert rows[2]["n_bytes"] == 6
    assert rows[2]["samples"] == [1, 2, 3, 4]
    assert abs(rows[2]["mean_byte"] - sum(png_pix) / 6) < 1e-9
    assert rows[3]["n_bytes"] == len(broken)  # fallback over raw bytes


@pytest.mark.parametrize("bits", [8, 16])
def test_wav_roundtrip(bits):
    """encode_wav -> wav_audio_decoder: features run over the DATA
    section only (RIFF container excluded), at both PCM widths."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_wav,
        wav_audio_decoder,
    )

    frames = bytes((5 * i + 1) % 256 for i in range(32))
    payload = encode_wav(8000, 1, bits, frames)
    feats = wav_audio_decoder(payload)
    assert feats["n_bytes"] == len(frames)
    assert feats["mean_byte"] == float(sum(frames)) / len(frames)
    assert feats["samples"] == [frames[0], frames[1], frames[2], frames[3]]


def test_wav_decoder_is_default_for_audio(spark):
    """A RIFF payload in an 'audio' row decodes through the packaged
    WAV codec (data bytes only); raw audio bytes and a truncated WAV
    degrade to the byte-feature fallback."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_wav,
        media_features,
    )

    frames = bytes([9, 7, 5, 3] * 4)
    wav = encode_wav(8000, 1, 8, frames)
    raw = b"\x01\x02\x03\x04"
    m = spark.createDataFrame(
        [
            (1, bytearray(wav), "audio"),
            (2, bytearray(raw), "audio"),
            (3, bytearray(wav[: len(wav) // 2]), "audio"),
        ],
        "media_id long, payload binary, media_type string",
    )
    rows = {r["media_id"]: r for r in media_features(m).collect()}
    assert rows[1]["n_bytes"] == len(frames)
    assert rows[1]["samples"] == [9, 7, 5, 3]
    assert rows[2]["n_bytes"] == 4  # fallback over the raw payload
    assert rows[3]["n_bytes"] == len(wav) // 2  # truncated -> fallback


def test_threshold_sweep_invariants(spark, sf_dir):
    """Confusion counts must reconcile: tp+fn and fp+tn are constant
    across thresholds (the positive/negative populations), tp is
    non-increasing in the threshold, tn non-decreasing, and the 0.5 row
    agrees with logit_score's prediction counts."""
    from real_time_fraud_detection_system_spark.operators.mlqueries import (
        logit_score,
        threshold_sweep,
        training_frame_det,
    )

    rows = {r["thr_ppm"]: r for r in threshold_sweep(spark, sf_dir).collect()}
    assert len(rows) == 9
    pos = {r["tp"] + r["fn"] for r in rows.values()}
    neg = {r["fp"] + r["tn"] for r in rows.values()}
    assert len(pos) == 1 and len(neg) == 1
    n_pos = pos.pop()
    assert n_pos == training_frame_det(spark, sf_dir).filter("label = 1").count()
    tps = [rows[t]["tp"] for t in sorted(rows)]
    tns = [rows[t]["tn"] for t in sorted(rows)]
    assert tps == sorted(tps, reverse=True)
    assert tns == sorted(tns)
    n_pred_pos = logit_score(spark, sf_dir).filter("prediction = 1").count()
    assert rows[500_000]["tp"] + rows[500_000]["fp"] == n_pred_pos
