"""Baseline-JPEG codec: roundtrip properties, the quarantine
taxonomy of its typed failure modes (VERDICT r11 #4), and reuse of
the banded-Hamming pair machinery over jpeg fingerprints."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from benchviz_spark.operators.multimodal import (
    JPEG_Q,
    _JPEG_BYTE_MAP,
    decode_jpeg,
    encode_jpeg_gray,
    jpeg_roundtrip_value,
)

SF_DIR = "/root/testdata/sf0.001"


def _tile(bv):
    return np.kron(
        np.asarray(bv, dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )


def test_closed_form_matches_real_codec_for_every_source_value():
    """jpeg_roundtrip_value (and therefore _jpeg_px_sql, its SQL twin)
    agrees with the REAL encode->decode pipeline for every mapped
    source byte — the foundation of the lossy-codec oracles."""
    vals = sorted(set(_JPEG_BYTE_MAP))
    for v in vals:
        px = _tile([[v]])
        dec = decode_jpeg(encode_jpeg_gray(px))
        assert dec.shape == (8, 8, 1)
        assert (dec == jpeg_roundtrip_value(v)).all(), v


def test_byte_map_kills_reconstruction_ties():
    """No mapped value reconstructs onto the half-integer grid the
    decoder's floor(x+0.5) could not replay against IDCT float noise."""
    import math

    for v in _JPEG_BYTE_MAP:
        k = math.floor(8.0 * (v - 128) / JPEG_Q + 0.5)
        assert k % 8 != 4, v


def test_general_image_roundtrip_within_quantizer_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))[:, :, 0]
    # flat Q=17 bounds per-coefficient error by Q/2; spatial error stays
    # well inside a couple of quantization steps
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2 * JPEG_Q


def test_decoder_skips_app_and_com_segments():
    """Real-world JPEGs lead with APPn/COM metadata; the marker walk
    must skip them by length (a JFIF APP0 here) and still decode."""
    base = encode_jpeg_gray(_tile([[100, 200]]))
    app0 = struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = struct.pack(">HH", 0xFFFE, 7) + b"hello"
    patched = base[:2] + app0 + com + base[2:]
    assert (decode_jpeg(patched) == decode_jpeg(base)).all()


@pytest.mark.parametrize(
    "mutate,needle",
    [
        (lambda d: b"PK" + d[2:], "not a JPEG signature"),
        (lambda d: d[: len(d) - 4], "truncated JPEG entropy stream"),
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2"), "unsupported progressive"),
        (
            # 16-bit quantizer: flip DQT precision nibble (and pad)
            lambda d: d.replace(
                struct.pack(">HH", 0xFFDB, 67) + b"\x00",
                struct.pack(">HH", 0xFFDB, 131) + b"\x10",
            ),
            "unsupported 16-bit JPEG quantizer",
        ),
        (
            # 4:2:0 subsampling: component H=2,V=2 in SOF0
            lambda d: d.replace(b"\x01\x11\x00", b"\x01\x22\x00", 1),
            "unsupported JPEG chroma subsampling",
        ),
        (
            # restart interval: inject a DRI segment before SOS
            lambda d: d.replace(
                b"\xff\xda", struct.pack(">HHH", 0xFFDD, 4, 8) + b"\xff\xda", 1
            ),
            "unsupported JPEG restart interval",
        ),
        (lambda d: d[:2] + b"\xff\xd9", "missing JPEG SOF/SOS"),
    ],
)
def test_quarantine_taxonomy(mutate, needle):
    """Every malformed/out-of-scope stream maps to a TYPED ValueError
    (never a crash, never silent wrong pixels) — the taxonomy a
    100-TB lake's quarantine column routes on, per-row."""
    base = encode_jpeg_gray(_tile([[100, 200], [50, 250]]))
    bad = mutate(base)
    assert bad != base
    with pytest.raises(ValueError, match=needle):
        decode_jpeg(bad)


def test_invalid_huffman_code_is_typed():
    """An entropy stream whose bits walk off the Huffman table (all-0
    bytes are not a prefix of any Annex K DC code beyond depth 16 —
    here: corrupt the scan body with 0x04 noise) raises the typed
    error instead of decoding garbage."""
    base = encode_jpeg_gray(_tile([[100, 200], [50, 250]]))
    sos_at = base.find(b"\xff\xda")
    scan_start = sos_at + 2 + struct.unpack(">H", base[sos_at + 2 : sos_at + 4])[0]
    bad = base[: scan_start] + b"\xff\x00" * 20 + base[-2:]
    with pytest.raises(
        ValueError,
        match="invalid JPEG Huffman code|JPEG AC coefficient overrun|"
        "truncated JPEG entropy stream|invalid JPEG AC symbol",
    ):
        decode_jpeg(bad)


def test_quarantine_is_per_row_in_the_decode_gate(spark):
    """mapInPandas gate over a mixed batch: one corrupted payload
    quarantines ITS row; every healthy row still decodes — the
    one-bad-file-does-not-kill-the-partition property, jpeg tier."""
    import pandas as pd

    from benchviz_spark.operators.multimodal import document_jpeg_payloads
    from benchviz_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    payloads = document_jpeg_payloads(docs)

    def gate(batches):
        for batch in batches:
            rows = {"doc_id": [], "status": []}
            for doc_id, p in zip(batch["doc_id"], batch["payload"]):
                data = bytes(p)
                if int(doc_id) % 3 == 0:  # deterministic injection
                    data = data[: len(data) - 10]
                rows["doc_id"].append(int(doc_id))
                try:
                    decode_jpeg(data)
                    rows["status"].append("ok")
                except ValueError as err:
                    rows["status"].append(str(err))
            yield pd.DataFrame(rows)

    out = {
        r.doc_id: r.status
        for r in payloads.mapInPandas(
            gate, schema="doc_id long, status string"
        ).collect()
    }
    assert len(out) == 20
    for doc_id, status in out.items():
        if doc_id % 3 == 0:
            assert status == "truncated JPEG entropy stream", (doc_id, status)
        else:
            assert status == "ok", (doc_id, status)


def test_banded_pairs_over_jpeg_hashes_equal_brute_force(spark):
    """_banded_hamming_pairs reuse: the jpeg fingerprint column drives
    the SAME exact-Hamming-ball pair generator as the PNG/audio tiers
    — verified against the quadratic truth on a small corpus."""
    from benchviz_spark.operators.dedup import _banded_hamming_pairs
    from benchviz_spark.operators.multimodal import (
        DHASH_HAMMING_MAX,
        document_jpeg_dhashes,
    )
    from benchviz_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    hashes = document_jpeg_dhashes(docs)
    rows = hashes.collect()
    truth = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            lo, hi = sorted((a.doc_id, b.doc_id))
            if bin(a.dh ^ b.dh).count("1") <= DHASH_HAMMING_MAX:
                truth.add((lo, hi))
    got = {
        (r.left_id, r.right_id)
        for r in _banded_hamming_pairs(hashes, "dh").collect()
    }
    assert got == truth
