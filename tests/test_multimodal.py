"""Multimodal codec + plumbing contracts: the real PNG/WAV codec
(round-trip exactness, every spec filter path, CRC rejection) and the
mapInPandas schema/batch behavior around it (the SQL oracle covers the
vector/binary queries)."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from benchviz_spark.operators.multimodal import (
    DECODE_SCHEMA,
    PNG_SIG,
    decode_features,
    decode_payload,
    decode_png,
    document_png_payloads,
    encode_png,
    multimodal_decode_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_decode_schema_and_rows(spark):
    out = multimodal_decode_features(spark, SF_DIR)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,width:int,height:int,"
        "channels:int,mean_luma:double>"
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert out.count() == docs.count()


def test_decode_deterministic(spark):
    a = multimodal_decode_features(spark, SF_DIR).collect()
    b = multimodal_decode_features(spark, SF_DIR).collect()
    assert a == b


def test_png_round_trip_exact():
    """encode_png -> decode_png must reproduce every pixel exactly for
    gray / RGB / RGBA across shapes (the writer emits real filter-0
    scanlines; the parser walks real chunks + CRCs + inflate)."""
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (5, 3), (17, 31)]:
        for c in (1, 3, 4):
            arr = rng.integers(0, 256, size=(*shape, c), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(arr)), arr)


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter filters[y] — exercises
    the parser's Sub/Up/Average/Paeth reconstruction paths, which the
    filter-0-only writer never emits."""
    h, w, c = arr.shape
    a32 = arr.astype(np.int32)
    rows = []
    for y in range(h):
        f = filters[y]
        line, prev = a32[y].reshape(-1), (a32[y - 1] if y else np.zeros_like(a32[0])).reshape(-1)
        enc = line.copy()
        for i in range(len(line)):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if f == 1:
                enc[i] = line[i] - left
            elif f == 2:
                enc[i] = line[i] - up
            elif f == 3:
                enc[i] = line[i] - ((left + up) >> 1)
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                enc[i] = line[i] - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
    raw = b"".join(rows)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    png = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(png), arr)


def test_png_bad_crc_rejected():
    data = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    data[40] ^= 0xFF  # corrupt inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decode_payload_wav_and_unknown():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            np.array([0, 16384, -16384, 0] * 100, dtype=np.int16).tobytes()
        )
    width, height, channels, luma = decode_payload(buf.getvalue())
    assert (width, height, channels) == (200, 1, 2)
    assert 0.0 < luma < 255.0
    with pytest.raises(ValueError, match="unsupported payload"):
        decode_payload(b"\x00\x01\x02 definitely not a container")


def test_decode_features_match_local_reference(spark):
    """The distributed generate+decode must agree with a local
    single-process replay row-by-row (no batch-boundary effects), and
    the luma must be the true pixel mean of the generated image."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    got = {
        r.doc_id: (r.width, r.height, r.channels, r.mean_luma)
        for r in decode_features(document_png_payloads(docs)).collect()
    }
    for row in docs.collect():
        data = row.text.encode("utf-8")
        n = len(data)
        w, h = 16 + n % 64, 16 + (n // 64) % 64
        need = w * h * 3
        reps = -(-need // max(n, 1))
        px = np.frombuffer(data * reps, np.uint8, need).reshape(h, w, 3)
        # same exact-integer-channel-sums + fixed-order combine +
        # half-up cut as decode_payload/_round4 (bit-identical contract)
        v = (
            0.299 * int(px[:, :, 0].sum(dtype=np.uint64))
            + 0.587 * int(px[:, :, 1].sum(dtype=np.uint64))
            + 0.114 * int(px[:, :, 2].sum(dtype=np.uint64))
        ) / (h * w)
        expect_luma = math.floor(v * 10000.0 + 0.5) / 10000.0
        assert got[row.doc_id] == (w, h, 3, expect_luma)


def test_decode_partition_count_preserved(spark):
    """The decode stage must never run NARROWER than the cluster: a
    few-split scan (the testdata parquet arrives as ONE row group) is
    spread to cluster parallelism before the Python stage, while an
    already-wide scan passes through with its partitioning preserved
    (spread()'s no-op guard — a production many-split scan must not be
    coalesced down to local core count)."""
    n = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    narrow = docs.repartition(min(4, n))
    assert (
        decode_features(document_png_payloads(narrow)).rdd.getNumPartitions()
        == n
    )
    wide = docs.repartition(n * 2)
    assert (
        decode_features(document_png_payloads(wide)).rdd.getNumPartitions()
        == n * 2
    )


def test_pca_top_component_matches_numpy(spark):
    """embedding_pca_top_component's distributed moment matrix must
    reproduce numpy's population covariance eigensolve on the collected
    vectors: same sign-fixed PC1 loadings, same explained-variance
    ratio."""
    from benchviz_spark.operators.multimodal import embedding_pca_top_component

    X = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    pc1 = vecs[:, -1]
    if pc1[int(np.argmax(np.abs(pc1)))] < 0:
        pc1 = -pc1
    ratio = vals[-1] / vals.sum()

    got = {
        r.dim: (r.pc1_loading, r.explained_var_ratio)
        for r in embedding_pca_top_component(spark, SF_DIR).collect()
    }
    assert len(got) == X.shape[1]
    for i in range(X.shape[1]):
        assert abs(got[i][0] - pc1[i]) < 1e-5, (i, got[i][0], pc1[i])
        assert abs(got[i][1] - ratio) < 1e-6


def test_payloads_survive_empty_text(spark):
    """An empty document must still encode to a valid decodable PNG
    (code-review finding: b'' * reps is b'' whatever the reps, so the
    old path crashed np.frombuffer on the first empty text)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "x")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.width, r.height, r.channels)
        for r in decode_features(document_png_payloads(docs)).collect()
    }
    assert got[1] == (17, 16, 3)  # b'\x00' fallback: n=1 drives the dims
    assert got[2] == (17, 16, 3)


def test_decode_png_truncated_stream_raises_valueerror():
    """Malformed payloads must stay on the documented ValueError
    surface — a truncated chunk previously leaked struct.error."""
    import pytest as _pytest

    from benchviz_spark.operators.multimodal import (
        document_png_payloads,
        decode_png,
    )

    full = None
    import numpy as np
    from benchviz_spark.operators.multimodal import encode_png

    full = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # cut after a chunk's 8-byte header but before its CRC: the parser
    # can read (length, tag) but not the promised body+CRC bytes
    with _pytest.raises(ValueError):
        decode_png(full[:-1])  # IEND's CRC is short one byte
    with _pytest.raises(ValueError):
        decode_png(full[:21])  # IHDR header readable, body cut


def test_png_roundtrip_property():
    """Property sweep: random pixel arrays across shapes, channel
    counts, and random per-row filter choices must decode back
    bit-exactly. Complements the deterministic per-filter test with
    adversarial value patterns (the filter recurrences wrap mod 256,
    so random bytes probe every carry path)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 9),
        w=st.integers(1, 9),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def roundtrip(h, w, c, seed, data):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        got = decode_png(_png_with_filters(arr, filters))
        assert got.shape == (h, w, c)
        assert (got == arr).all(), (filters, arr.tolist(), got.tolist())

    roundtrip()


def test_resize_half_matches_naive_pooling():
    """resize_half's vectorized block sum vs a four-loop reference, odd
    dims included (edge rows/cols must drop, floor semantics exact)."""
    import numpy as np

    from benchviz_spark.operators.multimodal import resize_half

    rng = np.random.default_rng(11)
    for h, w in [(16, 16), (17, 21), (2, 2), (3, 3), (33, 16)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = resize_half(arr)
        h2, w2 = h // 2, w // 2
        assert got.shape == (h2, w2, 3)
        for y in range(h2):
            for x in range(w2):
                for c in range(3):
                    s = (
                        int(arr[2 * y, 2 * x, c])
                        + int(arr[2 * y, 2 * x + 1, c])
                        + int(arr[2 * y + 1, 2 * x, c])
                        + int(arr[2 * y + 1, 2 * x + 1, c])
                    )
                    assert got[y, x, c] == s // 4, (y, x, c)


def test_embedding_integrity_planted_defects(spark, tmp_path):
    """The synthetic store is defect-free, so the oracle only proves
    zeros; planted defects prove each counter actually fires."""
    from benchviz_spark.operators.multimodal import (
        EMB_DIM,
        embedding_integrity_profile,
    )

    good = [0.0] * EMB_DIM
    good[0] = 1.0  # unit norm
    rows = [
        (1, good, 0),
        (2, [0.5] * EMB_DIM, 0),            # norm 4 -> unit violation
        (3, [0.0] * EMB_DIM, 0),            # zero vector (also violation)
        (4, [1.0] * (EMB_DIM - 1), 0),      # wrong dim
        (5, [float("nan")] + good[1:], 0),  # non-finite
        (6, [float("inf")] + good[1:], 0),  # non-finite
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "sf_emb")
    df.coalesce(1).write.parquet(sf + "/embeddings.parquet")
    row = embedding_integrity_profile(spark, sf).collect()[0]
    assert row.n_vecs == 6
    assert row.n_wrong_dim == 1
    assert row.n_nonfinite == 2
    assert row.n_zero == 1
    # violations: norm-4 vec, zero vec, wrong-dim (norm sqrt(63)), and
    # the two non-finite rows (NaN/Inf norms fail the tolerance too)
    assert row.n_unit_violations >= 3


def test_decode_quarantine_classifies_and_preserves_good_rows(spark, sf_smoke_dir):
    """The quarantine gate (fault-injected REAL bytes through the real
    parser): corrupted payloads land in their typed quarantine class
    with NULL geometry, good rows still decode, and the row set covers
    the whole corpus — one bad file never costs a partition."""
    from benchviz_spark.operators.multimodal import (
        CRCFLIP_MOD,
        TRUNCATE_MOD,
        multimodal_decode_quarantine,
    )
    from benchviz_spark.sources.tables import load_table

    rows = multimodal_decode_quarantine(spark, sf_smoke_dir).collect()
    n_docs = load_table(spark, sf_smoke_dir, "documents").count()
    assert len(rows) == n_docs
    statuses = {"ok": 0, "truncated": 0, "bad_crc": 0}
    for r in rows:
        statuses[r.status] += 1
        if r.doc_id % TRUNCATE_MOD == 0:
            assert r.status == "truncated" and r.width is None and r.height is None
        elif r.doc_id % CRCFLIP_MOD == 0:
            assert r.status == "bad_crc" and r.width is None
        else:
            assert r.status == "ok" and 16 <= r.width < 80 and 16 <= r.height < 80
    assert statuses["truncated"] > 0 and statuses["bad_crc"] > 0
    assert statuses["ok"] > statuses["truncated"] + statuses["bad_crc"]


def test_power_iteration_matches_numpy_twin(spark, sf_dir):
    """The closed-form power-iteration query must equal the SAME
     3-step unrolled iteration done in numpy on the full matrix —
    algorithm-level determinism, not just oracle parity — and its
    direction must correlate strongly with the true eigensolve."""
    import numpy as np

    from benchviz_spark.operators.multimodal import (
        embedding_pca_power_iteration,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True)
    w = C @ np.ones(X.shape[1])
    w2 = C @ w
    w3 = C @ w2
    v = w3 / np.linalg.norm(w3)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    rows = embedding_pca_power_iteration(spark, sf_dir).orderBy("dim").collect()
    got = np.array([r.pc1_loading for r in rows])
    assert np.allclose(got, np.round(v, 5), atol=2e-5)
    lam_est = np.linalg.norm(w3) / np.linalg.norm(w2)
    ratio = lam_est / np.trace(C)
    assert abs(rows[0].explained_var_ratio_est - ratio) < 1e-4
    # The Rayleigh norm-ratio estimate is spectrally bracketed:
    # lambda_min <= ||Cw||/||w|| <= lambda_max for any w. (The synthetic
    # embedding spectrum is nearly flat — lambda_2/lambda_1 ~ 1 — so a
    # 3-step iterate does NOT isolate the true eigenvector here; the
    # query's *_est columns claim the deterministic estimate, which the
    # asserts above pin exactly, not the converged eigensolve.)
    evals = np.linalg.eigvalsh(C)
    assert evals[0] - 1e-9 <= lam_est <= evals[-1] + 1e-9
