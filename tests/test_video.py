"""Video tier: real APNG container codec and the per-frame perceptual
dedup built on it — properties the DuckDB oracle can't see (round-trip
pixel exactness, malformed-container taxonomy) plus planted temporal
and cross-video near-dups."""

from __future__ import annotations

import numpy as np
import pytest

from benchviz_spark.operators.multimodal import (
    VIDEO_FRAME_STRIDE,
    decode_apng,
    decode_png,
    encode_apng,
)


def test_apng_round_trip_exact_and_default_image():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (19, 23, 3)).astype(np.uint8) for _ in range(5)]
    data = encode_apng(frames, 17)
    out, delays = decode_apng(data)
    assert delays == [17] * 5
    assert all((a == b).all() for a, b in zip(frames, out))
    # spec compatibility: the container is ALSO a valid still PNG whose
    # default image is frame 0 (fdAT is an ancillary chunk to a plain
    # PNG reader)
    assert (decode_png(data) == frames[0]).all()


def test_apng_malformed_taxonomy():
    frames = [np.zeros((16, 16, 3), np.uint8), np.ones((16, 16, 3), np.uint8)]
    data = encode_apng(frames, 10)
    # cut into the last fdAT chunk's body/CRC (the trailing 16 bytes
    # are the fdAT CRC + IEND) so a chunk length overruns the stream
    with pytest.raises(ValueError, match="truncated"):
        decode_apng(data[:-17])
    flipped = bytearray(data)
    flipped[50] ^= 0xFF  # inside some chunk body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_apng(bytes(flipped))
    with pytest.raises(ValueError, match="signature"):
        decode_apng(b"RIFF" + data[4:])


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "vids")
    (
        spark.createDataFrame(
            [(i, t, "en", f"src{i}", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .coalesce(1)
        .write.parquet(f"{d}/documents.parquet")
    )
    return d


def test_temporal_self_similarity_on_still_video(spark, tmp_path):
    # a 97-byte document: the frame stride equals the content length,
    # so every frame carries IDENTICAL pixels — a "still" video whose
    # frames must all pair at Hamming 0 within the video
    from benchviz_spark.operators.dedup import dedup_video_frame_pairs

    still = ("x" * 96 + "y")  # n = 97 = VIDEO_FRAME_STRIDE
    assert len(still.encode()) == VIDEO_FRAME_STRIDE
    moving = " ".join(f"scene{i * 13 % 41}" for i in range(60))
    d = _write_docs(spark, tmp_path, [(1, still), (2, moving)])

    fp = dedup_video_frame_pairs(spark, d).collect()
    nf = 2 + 97 % 7  # generator rule: 6 frames
    within = {
        (r.left_frame, r.right_frame)
        for r in fp
        if r.left_id == 1 and r.right_id == 1
    }
    # all C(nf,2) ordered frame pairs of the still video, all at 0 bits
    assert within == {
        (a, b) for a in range(nf) for b in range(a + 1, nf)
    }
    assert all(r.hamming == 0 for r in fp if r.left_id == r.right_id == 1)


def test_cross_video_near_dup_detected(spark, tmp_path):
    # plant a re-encoded copy: same length, same bytes at every
    # position any frame's dHash grid samples, noise elsewhere ->
    # every frame pairs across the two videos
    from benchviz_spark.operators.dedup import dedup_video_near_dups
    from benchviz_spark.operators.multimodal import DHASH_GRID

    g = DHASH_GRID
    b_text = " ".join(f"clip{i:03d}" for i in range(140))
    n = len(b_text.encode())
    w, h = 16 + n % 32, 16 + (n // 32) % 32
    nf = 2 + n % 7
    sampled = {
        (((r * h // g) * w + (c * w // g)) * 3 + ch + t * VIDEO_FRAME_STRIDE) % n
        for r in range(g)
        for c in range(g)
        for ch in range(3)
        for t in range(nf)
    }
    c_text = "".join(
        ch if i in sampled or ch == " " else "q"
        for i, ch in enumerate(b_text)
    )
    assert len(c_text) == n and c_text != b_text
    filler = " ".join(f"other{i * 17 % 53}" for i in range(90))
    d = _write_docs(spark, tmp_path, [(1, b_text), (2, c_text), (3, filler)])

    nd = {
        (r.left_id, r.right_id): (r.n_frame_matches, r.min_hamming)
        for r in dedup_video_near_dups(spark, d).collect()
    }
    assert (1, 2) in nd
    matches, min_h = nd[(1, 2)]
    assert matches >= nf and min_h == 0  # every frame matches its twin
    assert not any(3 in k for k in nd)


def test_video_quarantine_taxonomy_and_good_rows(spark, sf_smoke_dir):
    from benchviz_spark.operators.multimodal import (
        VIDEO_CRCFLIP_MOD,
        VIDEO_TRUNCATE_MOD,
        multimodal_video_quarantine,
    )

    rows = {r.doc_id: r for r in multimodal_video_quarantine(spark, sf_smoke_dir).collect()}
    assert rows
    n_trunc = n_crc = 0
    for doc_id, r in rows.items():
        if doc_id % VIDEO_TRUNCATE_MOD == 0:
            assert r.status == "truncated" and r.n_frames is None
            n_trunc += 1
        elif doc_id % VIDEO_CRCFLIP_MOD == 0:
            assert r.status == "bad_crc" and r.n_frames is None
            n_crc += 1
        else:
            assert r.status == "ok" and r.n_frames is not None
    # both fault classes actually fired on the corpus
    assert n_trunc and n_crc
