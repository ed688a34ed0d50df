"""Perceptual-hash image dedup (VERDICT r9 #1): the dHash must be
invariant to re-encoding, robust to light crops, discriminative for
genuinely different content, and the Hamming-ball blocking must be
complete. Planted-image tests drive the REAL codec end to end —
pixels -> PNG bytes -> decode_png -> dhash56 — plus one end-to-end
run of the registered pair query over a planted parquet corpus."""

from __future__ import annotations

import numpy as np
import pytest

from benchviz_spark.operators.multimodal import (
    DHASH_BAND_BITS,
    DHASH_BANDS,
    DHASH_BITS,
    DHASH_HAMMING_MAX,
    decode_png,
    dhash56,
    encode_png,
)
from tests.test_multimodal import _png_with_filters


def _gradient(h: int, w: int) -> np.ndarray:
    """Smooth left-to-right luma ramp — the canonical dHash-friendly
    image (every grid comparison has a wide margin)."""
    row = np.linspace(0, 255, w, dtype=np.uint8)
    px = np.repeat(row[None, :], h, axis=0)
    return np.stack([px, px, px], axis=2)


def _noise(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_dhash_is_56_bit_nonnegative():
    for seed in range(5):
        v = dhash56(_noise(40, 40, seed))
        assert 0 <= v < (1 << DHASH_BITS)


def test_dhash_survives_reencode_identically():
    """Same pixels through two DIFFERENT encoders — our filter-0 writer
    and a hand-built stream using Sub/Up/Average/Paeth filters — must
    hash identically: the hash sees decoded pixels, not bytes."""
    arr = _noise(5, 7, 42)
    filtered = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert dhash56(decode_png(encode_png(arr))) == dhash56(decode_png(filtered))
    big = _noise(33, 50, 7)
    assert dhash56(decode_png(encode_png(big))) == dhash56(big)


def test_dhash_robust_to_light_crop_on_smooth_content():
    """Cropping an edge column/row of a smooth image barely moves the
    sampled grid, so the hash stays inside the pair query's Hamming
    ball — the near-dup a byte-level hash can never see."""
    base = _gradient(64, 64)
    h0 = dhash56(base)
    for crop in (base[:, 1:], base[:, :-2], base[1:, :], base[2:-2, 1:-1]):
        assert _ham(h0, dhash56(np.ascontiguousarray(crop))) <= DHASH_HAMMING_MAX


def test_dhash_discriminates_unrelated_and_flipped_content():
    """Independent noise images — and a horizontal flip, which reverses
    every luma comparison — must land far outside the Hamming ball."""
    a, b = _noise(48, 48, 1), _noise(48, 48, 2)
    assert _ham(dhash56(a), dhash56(b)) > 2 * DHASH_HAMMING_MAX
    flipped = np.ascontiguousarray(a[:, ::-1])
    assert _ham(dhash56(a), dhash56(flipped)) > 2 * DHASH_HAMMING_MAX


def test_band_blocking_is_complete_for_the_hamming_ball():
    """Pigeonhole, checked exhaustively at the boundary: flip ANY
    DHASH_HAMMING_MAX bits of a hash and at least one of the 4 band
    keys must be unchanged — the banded equi-join is a complete
    candidate generator, so the pair query is the EXACT ball."""
    rng = np.random.default_rng(3)
    mask = (1 << DHASH_BAND_BITS) - 1

    def bands(v: int) -> list[int]:
        return [(v >> (DHASH_BAND_BITS * i)) & mask for i in range(DHASH_BANDS)]

    for _ in range(200):
        h = int(rng.integers(0, 1 << 56))
        flips = rng.choice(DHASH_BITS, size=DHASH_HAMMING_MAX, replace=False)
        h2 = h
        for f in flips:
            h2 ^= 1 << int(f)
        assert any(x == y for x, y in zip(bands(h), bands(h2)))


def test_pair_query_detects_planted_duplicate_end_to_end(spark, tmp_path):
    """Byte-identical texts produce identical PNGs, so the registered
    pair query — real encode, real decode, hash, band join, verify —
    must surface exactly the planted pair at Hamming 0."""
    from benchviz_spark.operators.dedup import dedup_image_phash_pairs

    texts = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "the quick brown fox jumps over the lazy dog " * 8),  # planted dup
        (3, "completely different content about spark catalyst " * 9),
        (4, "yet another unrelated document body with numbers 12345 " * 7),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = dedup_image_phash_pairs(spark, str(tmp_path)).collect()
    assert [(r.left_id, r.right_id, r.hamming) for r in rows] == [(1, 2, 0)]


def test_fingerprints_match_local_reference(spark, sf_smoke_dir):
    """The distributed fingerprint scan equals a driver-local replay of
    encode -> decode -> dhash56 over the same documents."""
    from benchviz_spark.operators.dedup import dedup_image_dhash_fingerprints
    from benchviz_spark.operators.multimodal import document_png_payloads
    from benchviz_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke_dir, "documents")
    got = {
        r.doc_id: r.dh
        for r in dedup_image_dhash_fingerprints(spark, sf_smoke_dir).collect()
    }
    local = {
        r.doc_id: dhash56(decode_png(bytes(r.payload)))
        for r in document_png_payloads(docs).collect()
    }
    assert got == local and len(got) > 0
