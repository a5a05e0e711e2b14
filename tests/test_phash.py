"""Perceptual-hash image dedup (round-11 verdict Next #4): the 60-cell
integer aHash over real P6 decodes must catch re-encoded and resized
duplicates, reject distinct images, and the registry query must emit
exactly the engineered (original, brightness-twin) pairs at Hamming 0."""

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.operators.multimodal import (
    PHASH_TWIN_OFFSET,
    dedup_phash,
    phash_fingerprints,
    ppm_pixels,
)

SF = "/root/testdata/sf0.001"


def _p6(width, height, pixels):
    assert len(pixels) == 3 * width * height
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(pixels)


def _base_pixels(npix):
    """A deterministic non-uniform pixel ramp (structure in every
    cell, so the fingerprint has both 0 and 1 bits)."""
    return [((37 * i) % 151 + (3 * i * i) % 41) % 200 for i in range(3 * npix)]


def _fp(spark, rows):
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    return {
        r["media_id"]: r["simhash"]
        for r in phash_fingerprints(media).collect()
    }


def test_phash_invariances_and_discrimination(spark):
    """Re-encoded (uniform brightness +5) and resized (pixel-doubled,
    npix divisible by 60 so grid spans align exactly) duplicates hash
    IDENTICALLY; a structurally different image lands far away in
    Hamming space."""
    npix = 120
    base = _base_pixels(npix)
    bright = [b + 5 for b in base]  # max 199+5 < 255: no clipping
    doubled = []
    for p in range(npix):  # each pixel repeated twice, RGB intact
        doubled.extend(base[3 * p : 3 * p + 3] * 2)
    distinct = [(211 * i + 17) % 256 for i in range(3 * npix)]
    fps = _fp(
        spark,
        [
            (1, _p6(npix, 1, base)),
            (2, _p6(npix, 1, bright)),
            (3, _p6(npix * 2, 1, doubled)),
            (4, _p6(npix, 1, distinct)),
        ],
    )
    assert fps[1] == fps[2]  # brightness-shift re-encode: caught
    assert fps[1] == fps[3]  # 2x resize: caught
    assert bin(fps[1] ^ fps[4]).count("1") > 3  # distinct: not paired


def test_phash_real_2d_image_and_row_major_grid(spark):
    """A real 2-D P6 (w x h) decodes through the same kernel: the
    grid runs over the row-major flattened sequence, so a (12 x 10)
    image and its (120 x 1) flattening hash identically."""
    w, h = 12, 10
    base = _base_pixels(w * h)
    fps = _fp(spark, [(1, _p6(w, h, base)), (2, _p6(w * h, 1, base))])
    assert fps[1] == fps[2]
    # and ppm_pixels round-trips the dims
    got_w, got_h, pix = ppm_pixels(_p6(w, h, base))
    assert (got_w, got_h) == (w, h) and list(pix) == base


def test_phash_undecodable_payload_is_skipped(spark):
    fps = _fp(spark, [(1, b"\x89PNG not a ppm"), (2, _p6(2, 1, [9] * 6))])
    assert set(fps) == {2}


def test_phash_truncated_pixel_section_is_skipped(spark):
    """A P6 whose header promises more pixels than the body holds
    (ADVICE r12): ppm_pixels must reject it as undecodable -- not
    hand a short buffer to the kernel, whose (npix, 3) reshape would
    kill the Spark task with a ValueError -- so the row takes the
    documented skip path."""
    import pytest

    good = _p6(4, 1, _base_pixels(4))
    truncated = good[:-5]  # 7 of the promised 12 pixel bytes
    with pytest.raises(NotImplementedError):
        ppm_pixels(truncated)
    fps = _fp(spark, [(1, truncated), (2, good)])
    assert set(fps) == {2}


def test_perceptual_queries_exclude_multibyte_text(spark, monkeypatch):
    """The ADVICE-r12 guard: the engines agree byte-for-char only on
    single-byte text, so a document with a multi-byte character must
    be EXCLUDED from the perceptual pair queries (no fingerprint, no
    twin pair) while its ASCII sibling still pairs with its twin."""
    import real_time_fraud_detection_system_spark.operators.multimodal as mm

    ascii_text = "the quick brown fox jumps over the lazy dog again"
    multi_text = "café " * 12  # 60 chars, 72 UTF-8 bytes
    rows = [
        (0, ascii_text, "en", "srcA", len(ascii_text)),
        (3, multi_text, "fr", "srcA", len(multi_text)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    monkeypatch.setattr(
        mm, "load_table", lambda s, d, n: df if n == "documents" else None
    )
    got = {(r["a_id"], r["b_id"]) for r in dedup_phash(spark, "unused").collect()}
    assert (0, 0 + PHASH_TWIN_OFFSET) in got
    assert not any(3 in (a % 10_000_000, b % 10_000_000) for a, b in got)


def test_dedup_phash_registry_catches_every_twin(spark):
    """The registry query: every image row with a decodable wrap must
    pair with its brightness-shifted twin at Hamming 0 (the aHash
    invariance proof run over the whole catalog), and every reported
    pair is symmetric-free (a_id < b_id) with hamming <= 3."""
    from real_time_fraud_detection_system_spark.catalog import load_table

    n_imgs = (
        load_table(spark, SF, "documents")
        .filter("doc_id % 3 = 0 AND length(text) >= 3")
        .count()
    )
    rows = dedup_phash(spark, SF).collect()
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in rows}
    twin_pairs = {
        (a, b): h
        for (a, b), h in pairs.items()
        if b == a + PHASH_TWIN_OFFSET
    }
    assert len(twin_pairs) == n_imgs
    assert set(twin_pairs.values()) == {0}
    assert all(a < b for a, b in pairs)
    assert all(h <= 3 for h in pairs.values())


def test_corpus_alphabet_is_single_byte():
    """Fixture assertion (ADVICE r12): every char-indexed DuckDB
    oracle (ascii(text[i]) over 1-based char positions) agrees with
    the byte-fingerprinting engine only on single-byte text. The
    perceptual queries now FILTER to single-byte rows structurally;
    this pins that the test corpora are all-ASCII so those filters
    stay output-neutral and the remaining char-indexed oracles
    (multimodal_features/frames fallback branches) are exact."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n_multi = con.execute(
            "SELECT count(*) FROM"
            f" read_parquet('/root/testdata/{sf}/documents.parquet')"
            " WHERE length(text) != octet_length(encode(text))"
        ).fetchone()[0]
        assert n_multi == 0, f"{sf}: {n_multi} multi-byte documents"


def _wav8(samples, rate=8000):
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_wav,
    )

    return encode_wav(rate, 1, 8, bytes(samples))


def test_audio_fp_dc_invariance_and_discrimination(spark):
    """A DC-shifted re-record (+7 on every sample, no clipping)
    hashes IDENTICALLY under the energy-envelope dHash (the offset
    term cancels in the cross-multiplied compare); a structurally
    different clip lands far away in Hamming space."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        audio_fingerprints,
    )

    n = 488
    base = [((13 * i) % 97 + (i * i) % 53) % 200 for i in range(n)]
    shifted = [b + 7 for b in base]
    distinct = [(151 * i + 31) % 256 for i in range(n)]
    media = spark.createDataFrame(
        [
            (1, _wav8(base)),
            (2, _wav8(shifted)),
            (3, _wav8(distinct)),
            (4, b"not a riff stream"),
        ],
        "media_id long, payload binary",
    )
    fps = {
        r["media_id"]: r["simhash"]
        for r in audio_fingerprints(media).collect()
    }
    assert set(fps) == {1, 2, 3}  # undecodable row 4 skipped
    assert fps[1] == fps[2]  # DC-offset re-record: caught
    assert bin(fps[1] ^ fps[3]).count("1") > 3  # distinct: not paired


def test_audio_fp_parses_the_real_container(spark):
    """The kernel must run the codec's chunk-walk (not fingerprint
    raw payload bytes): the same samples in containers with different
    sample rates (different header bytes) hash identically, and
    wav_samples round-trips the fmt fields."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        audio_fingerprints,
        wav_samples,
    )

    samples = [((29 * i) % 181) for i in range(200)]
    media = spark.createDataFrame(
        [(1, _wav8(samples, rate=8000)), (2, _wav8(samples, rate=44100))],
        "media_id long, payload binary",
    )
    fps = {
        r["media_id"]: r["simhash"]
        for r in audio_fingerprints(media).collect()
    }
    assert fps[1] == fps[2]
    rate, ch, bits, data = wav_samples(_wav8(samples, rate=44100))
    assert (rate, ch, bits) == (44100, 1, 8)
    assert list(data) == samples


def test_dedup_audio_fp_registry_catches_every_twin(spark):
    """Registry query: every audio row pairs with its DC-shifted twin
    at Hamming 0, pairs are symmetric-free, hamming <= 3 -- and the
    JVM-assembled WAV container parses as REAL PCM (spot-checked by
    decoding one assembled payload byte-for-byte)."""
    from real_time_fraud_detection_system_spark.catalog import load_table
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        AUDIO_TWIN_OFFSET,
        dedup_audio_fp,
        wav_samples,
    )

    docs = load_table(spark, SF, "documents")
    n_clips = docs.filter("doc_id % 3 = 1 AND length(text) >= 1").count()
    rows = dedup_audio_fp(spark, SF).collect()
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in rows}
    twin_pairs = {
        (a, b): h
        for (a, b), h in pairs.items()
        if b == a + AUDIO_TWIN_OFFSET
    }
    assert len(twin_pairs) == n_clips
    assert set(twin_pairs.values()) == {0}
    assert all(a < b for a, b in pairs)
    assert all(h <= 3 for h in pairs.values())

    one = docs.filter("doc_id % 3 = 1 AND length(text) >= 1").limit(1).collect()[0]
    import struct

    text_bytes = one["text"].encode()
    header = (
        b"RIFF" + struct.pack("<I", 36 + len(text_bytes)) + b"WAVEfmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(text_bytes))
    )
    rate, ch, bits, data = wav_samples(header + text_bytes)
    assert (rate, ch, bits) == (8000, 1, 8)
    assert data == text_bytes


def _y4m_clip(data, nframes=8, **kw):
    """Wrap a byte sequence as a Y4M mono clip of ``nframes``
    equal-size 1-row frames (the registry queries' wrap shape)."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_y4m,
    )

    fl = len(data) // nframes
    frames = [bytes(data[k * fl : (k + 1) * fl]) for k in range(nframes)]
    return encode_y4m(fl, 1, frames, **kw)


def test_y4m_codec_roundtrip_and_rejection():
    """The packaged Y4M codec is a REAL container parse: encode ->
    decode round-trips frames exactly for every supported colorspace,
    the spec-default colorspace applies when C is absent, and a bad
    magic / bad FRAME marker / truncated frame / unsupported
    colorspace / missing dimensions all take the NotImplementedError
    fallback path instead of returning garbage."""
    import pytest

    from real_time_fraud_detection_system_spark.operators.multimodal import (
        encode_y4m,
        y4m_frames,
    )

    frames = [bytes([(i * 7 + k) % 256 for i in range(24)])
              for k in range(3)]
    w, h, got = y4m_frames(encode_y4m(6, 4, frames))
    assert (w, h, got) == (6, 4, frames)
    # 420 (w*h*3/2 per frame) and 444 (3*w*h) plane sizes
    f420 = [bytes(range(6))]
    assert y4m_frames(encode_y4m(2, 2, f420, colorspace="420jpeg"))[2] == f420
    f444 = [bytes(range(12))]
    assert y4m_frames(encode_y4m(2, 2, f444, colorspace="444"))[2] == f444
    # spec default colorspace (420jpeg) when no C tag is present
    payload = b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(6)
    assert y4m_frames(payload)[2] == [bytes(6)]

    good = encode_y4m(6, 4, frames)
    for bad in (
        b"NOTY4M" + good[6:],                      # bad magic
        good.replace(b"FRAME\n", b"FRAMX\n", 1),   # bad FRAME marker
        good[:-5],                                 # truncated frame
        good.replace(b"Cmono", b"Cjpeg"),          # unsupported cspace
        b"YUV4MPEG2 Cmono\nFRAME\nxx",             # missing W/H
    ):
        with pytest.raises(NotImplementedError):
            y4m_frames(bad)


def test_y4m_decoder_features_sample_stream_only():
    """The default 'video' decoder features the concatenated FRAME
    bytes -- container header and FRAME markers excluded -- mirroring
    the pixels-not-container contract of the image/audio codecs."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        _DECODERS,
        encode_y4m,
        y4m_video_decoder,
    )

    assert _DECODERS["video"] is y4m_video_decoder
    frames = [bytes([10, 20, 30, 40]), bytes([50, 60, 70, 80])]
    feats = y4m_video_decoder(encode_y4m(4, 1, frames))
    data = b"".join(frames)
    assert feats["n_bytes"] == len(data)
    assert feats["mean_byte"] == sum(data) / len(data)
    assert feats["samples"] == [10, 20, 30, 40]


def test_video_fp_reencode_invariance(spark):
    """Container metadata never reaches the hash: the SAME frames
    re-encoded with a different frame rate and an application X-tag
    fingerprint identically at every position (the re-encode
    robustness the round-12 verdict asked the real decode to prove)."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        VIDEO_FRAMES,
        video_frame_hashes,
    )

    n = 960
    base = [((17 * i) % 113 + (i * i) % 67) % 200 for i in range(n)]
    media = spark.createDataFrame(
        [
            (1, _y4m_clip(base)),
            (2, _y4m_clip(base, fps=(30, 1), xtag="reencoded-copy")),
        ],
        "media_id long, payload binary",
    )
    sig = {}
    for r in video_frame_hashes(media).collect():
        sig.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_hash"]
    assert sig[1] == sig[2] and len(sig[1]) == VIDEO_FRAMES


def test_video_fp_twin_and_discrimination(spark):
    """Per-frame brightness invariance: a uniformly shifted clip
    matches its original at ALL frame positions; a distinct clip
    matches at none; a half-overwritten clip matches only on its
    untouched half (positional alignment is real, not global).
    Payloads are real Y4M containers; an unparseable payload yields
    no rows at all (the undecodable-row skip)."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        VIDEO_FRAMES,
        video_frame_hashes,
    )

    n = 960  # divisible by 8 frames x 12 cells
    base = [((17 * i) % 113 + (i * i) % 67) % 200 for i in range(n)]
    shifted = [b + 9 for b in base]
    distinct = [(173 * i + 11) % 256 for i in range(n)]
    half = list(distinct[: n // 2]) + list(base[n // 2 :])
    media = spark.createDataFrame(
        [(1, _y4m_clip(base)), (2, _y4m_clip(shifted)),
         (3, _y4m_clip(distinct)), (4, _y4m_clip(half)),
         (5, b"not a container at all")],
        "media_id long, payload binary",
    )
    fh = video_frame_hashes(media).collect()
    sig = {}
    for r in fh:
        sig.setdefault(r["media_id"], {})[r["frame_idx"]] = r["frame_hash"]
    assert all(len(sig[m]) == VIDEO_FRAMES for m in (1, 2, 3, 4))
    assert 5 not in sig  # undecodable payload: skipped, not hashed

    def n_match(a, b):
        return sum(sig[a][k] == sig[b][k] for k in range(VIDEO_FRAMES))

    assert n_match(1, 2) == VIDEO_FRAMES  # brightness twin: all match
    assert n_match(1, 3) <= 1  # distinct: (near-)no positions agree
    assert n_match(1, 4) == VIDEO_FRAMES // 2  # back half only


def test_video_fp_flat_frames_carry_no_signal(spark):
    """The scale guard: uniform (or empty) frame spans hash to 0 --
    the flat-frame fingerprint -- and dedup_video_fp excludes them
    from the positional join, so a corpus slice of near-empty clips
    cannot collapse into one quadratic (position, 0) bucket, and two
    unrelated flat clips are NOT reported as an 8/8 'match'."""
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        VIDEO_FRAMES,
        video_frame_hashes,
    )

    media = spark.createDataFrame(
        [(1, _y4m_clip(bytes([7] * 96))), (2, _y4m_clip(bytes([200] * 96))),
         (3, _y4m_clip(bytes([9] * 8)))],
        "media_id long, payload binary",
    )
    fh = video_frame_hashes(media).collect()
    assert len(fh) == 3 * VIDEO_FRAMES
    assert all(r["frame_hash"] == 0 for r in fh)
    # the registry query's join-side filter drops every one of them
    informative = video_frame_hashes(media).filter("frame_hash != 0")
    assert informative.count() == 0


def test_dedup_video_fp_registry_catches_every_twin(spark):
    """Registry query: every video row pairs with its
    brightness-shifted twin at n_match == 8; pairs symmetric-free
    with n_match within [VIDEO_MIN_MATCH, VIDEO_FRAMES]."""
    from real_time_fraud_detection_system_spark.catalog import load_table
    from real_time_fraud_detection_system_spark.operators.multimodal import (
        VIDEO_FRAMES,
        VIDEO_MIN_MATCH,
        VIDEO_TWIN_OFFSET,
        dedup_video_fp,
    )

    docs = load_table(spark, SF, "documents")
    n_clips = docs.filter(
        f"doc_id % 3 = 2 AND length(encode(text, 'UTF-8')) >= {VIDEO_FRAMES}"
        " AND length(text) = length(encode(text, 'UTF-8'))"
    ).count()
    rows = dedup_video_fp(spark, SF).collect()
    pairs = {(r["a_id"], r["b_id"]): r["n_match"] for r in rows}
    twin_pairs = {
        (a, b): m
        for (a, b), m in pairs.items()
        if b == a + VIDEO_TWIN_OFFSET
    }
    assert len(twin_pairs) == n_clips
    assert set(twin_pairs.values()) == {VIDEO_FRAMES}
    assert all(a < b for a, b in pairs)
    assert all(
        VIDEO_MIN_MATCH <= m <= VIDEO_FRAMES for m in pairs.values()
    )
