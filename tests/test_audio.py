"""Audio tier: the stdlib WAV container round-trips exactly, the
feature/envelope queries bill from genuinely decoded samples, and the
envelope's integer segment partition is exact."""

from __future__ import annotations

import numpy as np

from benchviz_spark.operators.multimodal import (
    AUDIO_SEGMENTS,
    decode_wav_raw,
    document_wav_payloads,
    encode_wav,
)


def test_wav_round_trip_exact():
    rng = np.random.default_rng(11)
    for n_frames, rate in [(256, 8000), (777, 11025), (1279, 11999)]:
        samples = rng.integers(0, 256, size=n_frames, dtype=np.uint8)
        f, r, c, got = decode_wav_raw(encode_wav(samples, rate))
        assert (f, r, c) == (n_frames, rate, 1)
        assert np.array_equal(got, samples)


def test_payload_geometry_rule(spark, sf_smoke_dir):
    """Every generated payload is a REAL parseable WAV whose frame
    count and sample rate follow the documented byte-length rule."""
    from benchviz_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke_dir, "documents")
    rows = document_wav_payloads(docs).collect()
    raw = {r.doc_id: (r.text or "").encode() for r in docs.select("doc_id", "text").collect()}
    assert rows
    for r in rows:
        n = max(len(raw[r.doc_id]), 1)
        f, rate, c, samples = decode_wav_raw(bytes(r.payload))
        assert (f, rate, c) == (256 + n % 1024, 8000 + n % 4000, 1)
        data = raw[r.doc_id] or b"\x00"
        assert bytes(samples[: min(f, n)]) == data[: min(f, n)]  # tiling rule


def test_envelope_partitions_every_frame_once(spark, sf_smoke_dir):
    """Segment energies must sum to the total amplitude sum — frame
    k -> segment k*S//F is a partition (no frame dropped or double
    counted), and the feature query's mean is the same integer mass."""
    from benchviz_spark.operators.multimodal import (
        multimodal_audio_envelope,
        multimodal_audio_features,
    )

    env = multimodal_audio_envelope(spark, sf_smoke_dir).collect()
    feats = {
        r.doc_id: (r.n_frames, r.mean_level)
        for r in multimodal_audio_features(spark, sf_smoke_dir).collect()
    }
    totals: dict[int, int] = {}
    segs: dict[int, set] = {}
    for r in env:
        totals[r.doc_id] = totals.get(r.doc_id, 0) + r.energy
        segs.setdefault(r.doc_id, set()).add(r.seg)
    assert set(totals) == set(feats)
    for doc_id, (n_frames, mean_level) in feats.items():
        assert segs[doc_id] == set(range(AUDIO_SEGMENTS))
        import math

        expect = math.floor(
            totals[doc_id] * 255.0 / 256.0 / n_frames * 10000.0 + 0.5
        ) / 10000.0
        assert mean_level == expect, doc_id


def test_audio_dhash_perceptual_properties():
    """The audio fingerprint must survive re-encoding exactly, stay
    inside the Hamming ball under a tiny level-preserving edit, and
    land far away for reversed content (every contour comparison
    flips)."""
    import numpy as np

    from benchviz_spark.operators.multimodal import (
        DHASH_HAMMING_MAX,
        audio_dhash56,
        decode_wav_raw,
        encode_wav,
    )

    rng = np.random.default_rng(23)
    # a wandering contour with wide margins between cell sums
    base = (128 + 100 * np.sin(np.linspace(0, 9, 1100))).astype(np.uint8)
    h0 = audio_dhash56(base)
    # re-encode round trip: decode(encode(x)) == x -> identical hash
    _f, _r, _c, decoded = decode_wav_raw(encode_wav(base, 8000))
    assert audio_dhash56(decoded) == h0
    # tiny edit: a short dropout in one cell moves few comparisons
    edited = base.copy()
    edited[400:410] = 0
    ham = bin(h0 ^ audio_dhash56(edited)).count("1")
    assert ham <= DHASH_HAMMING_MAX
    # reversed signal: the contour comparisons invert -> far away
    flipped = np.ascontiguousarray(base[::-1])
    assert bin(h0 ^ audio_dhash56(flipped)).count("1") > 2 * DHASH_HAMMING_MAX
    # unrelated noise: far away
    noise = rng.integers(0, 256, size=1100, dtype=np.uint8)
    assert bin(h0 ^ audio_dhash56(noise)).count("1") > 2 * DHASH_HAMMING_MAX
