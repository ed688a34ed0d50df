"""Dedup operator properties that the DuckDB oracle can't see:
LSH recall vs the exact pair set, and SimHash fingerprint behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benchviz_spark.operators.dedup import (
    dedup_exact_documents,
    dedup_minhash_lsh_pairs,
    dedup_ngram_jaccard_pairs,
    dedup_simhash_fingerprints,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.left_id, r.right_id) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark):
    return _pairs(dedup_ngram_jaccard_pairs(spark, SF_DIR))


def test_exact_dedup_keeps_all_unique(spark):
    # the synthetic corpus has no byte-identical duplicates, so exact
    # dedup must be the identity on doc_ids
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    deduped = dedup_exact_documents(spark, SF_DIR)
    assert deduped.count() == docs.count()


def test_minhash_lsh_recall(spark, exact_pairs):
    """The planted near-dups sit at jaccard ~0.9+; with 8 bands x 4 rows
    the candidate probability there is >0.999, so LSH must recover
    (almost) every exact pair. Precision is exact by construction: LSH
    output is verified with the true Jaccard."""
    assert exact_pairs, "fixture corpus should contain planted near-dups"
    lsh_pairs = _pairs(dedup_minhash_lsh_pairs(spark, SF_DIR))
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"recall {recall}: {exact_pairs - lsh_pairs}"
    # verified pairs can't be false positives
    assert lsh_pairs <= exact_pairs | lsh_pairs  # sanity: sets comparable


def test_minhash_lsh_no_unverified_pairs(spark, exact_pairs):
    """Every emitted pair passed the exact >=0.5 verification, so the
    LSH result is a subset of the exact pair set."""
    lsh_pairs = _pairs(dedup_minhash_lsh_pairs(spark, SF_DIR))
    assert lsh_pairs <= exact_pairs


def test_simhash_deterministic(spark):
    a = {r.doc_id: r.simhash for r in dedup_simhash_fingerprints(spark, SF_DIR).collect()}
    b = {r.doc_id: r.simhash for r in dedup_simhash_fingerprints(spark, SF_DIR).collect()}
    assert a == b


def test_simhash_near_dups_are_close(spark, exact_pairs):
    """Near-identical documents must have small hamming distance; a
    random unrelated pair sits near 32 bits. Use <=16 as the dividing
    line (standard simhash near-dup threshold region)."""
    sig = {r.doc_id: r.simhash for r in dedup_simhash_fingerprints(spark, SF_DIR).collect()}

    def hamming(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    for left, right in exact_pairs:
        assert hamming(sig[left], sig[right]) <= 16, (left, right)


def test_jaccard_df_cap_trades_recall_not_precision(spark, exact_pairs):
    """The large-corpus posting-list cap drops ultra-common shingles
    from CANDIDATE GENERATION only. Every emitted pair must still carry
    its true (exact-path) Jaccard — the cap may shrink the pair set,
    never corrupt a surviving pair — and a cap far above any sf0.001
    document frequency must change nothing at all."""
    from benchviz_spark.operators.dedup import dedup_ngram_jaccard_pairs

    exact = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup_ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    tight = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup_ngram_jaccard_pairs(spark, SF_DIR, df_cap=2).collect()
    }
    assert set(tight) <= set(exact)
    for pair, j in tight.items():
        assert j == exact[pair]
    loose = {
        (r.left_id, r.right_id): r.jaccard
        for r in dedup_ngram_jaccard_pairs(spark, SF_DIR, df_cap=10_000).collect()
    }
    assert loose == exact


def test_incremental_bloom_gates_the_exact_join(spark):
    """dedup_incremental_new_docs' scale claim: the Bloom bitset must
    route most incoming rows around the exact anti join (the maybe-set
    is dup-rate-sized, far smaller than the batch), and the final
    result must be EXACTLY the plain anti join — the bloom prunes,
    never decides."""
    from benchviz_spark.operators.dedup import (
        _incremental_probed,
        dedup_incremental_new_docs,
    )

    seen, probed = _incremental_probed(spark, SF_DIR)
    n_incoming = probed.count()
    n_maybe = probed.filter("maybe_seen").count()
    assert n_incoming > 0
    # sf0.001 has at most a handful of true cross-source prefix dups;
    # with k=3 probes into 64Ki bits the FP rate is ~1e-4, so the
    # maybe-set must stay a small fraction of the batch.
    assert n_maybe <= max(10, n_incoming // 4), (n_maybe, n_incoming)

    got = {r.doc_id for r in dedup_incremental_new_docs(spark, SF_DIR).collect()}
    plain = {
        r.doc_id
        for r in probed.select("doc_id", "p").join(seen, "p", "left_anti").collect()
    }
    assert got == plain


def test_levenshtein_simhash_widening_shrinks_blocks(spark):
    """The 100-TB knob on dedup_levenshtein_pairs: widening the block
    key with a simhash prefix must (1) strictly shrink the candidate
    workload sum(block^2) — each bit splits blocks, never merges them —
    while (2) every emitted pair remains an exact-path pair with the
    identical distance (candidate pruning trades recall only, never
    precision), and (3) recall over the planted near-dups stays high
    (near-identical prefixes agree on high simhash bits w.h.p.)."""
    from benchviz_spark.operators.dedup import (
        _lev_blocked,
        dedup_levenshtein_pairs,
    )

    def block_work(bits: int) -> int:
        d, cols = _lev_blocked(spark, SF_DIR, bits)
        sizes = d.groupBy(*cols).count().collect()
        return sum(r["count"] ** 2 for r in sizes)

    work_exact, work_widened = block_work(0), block_work(8)
    assert work_widened < work_exact

    exact = {
        (r.left_id, r.right_id): r.edit_distance
        for r in dedup_levenshtein_pairs(spark, SF_DIR).collect()
    }
    widened = {
        (r.left_id, r.right_id): r.edit_distance
        for r in dedup_levenshtein_pairs(
            spark, SF_DIR, simhash_prefix_bits=8
        ).collect()
    }
    assert set(widened) <= set(exact)
    for pair, dist in widened.items():
        assert dist == exact[pair]
    if exact:
        recall = len(widened) / len(exact)
        assert recall >= 0.5, f"recall {recall}: {set(exact) - set(widened)}"


def test_minhash_identical_flood_is_one_bucket(spark, tmp_path):
    """Pins the documented bucket-occupancy boundary of LSH banding
    (minhash_candidates docstring): a planted flood of byte-identical
    documents shares every minhash, lands in ONE bucket per band, and
    the candidate expansion is exactly the flood's full pair set —
    quadratic in flood size BY DESIGN, because byte-identical mass is
    the exact tier's job (fingerprint dedup runs before LSH in the
    curation stack; dedup_exact_documents collapses the flood to one
    representative). The test makes the boundary visible rather than
    capping it: a cap would silently drop real candidates."""
    from benchviz_spark.operators.dedup import (
        dedup_exact_documents,
        minhash_candidates,
    )

    n = 40
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text, "en", f"src{i % 3}", len(text)) for i in range(n)]
    flood_dir = str(tmp_path / "flood")
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.parquet(f"{flood_dir}/documents.parquet")
    )

    cand = minhash_candidates(spark, flood_dir).collect()
    # every ordered pair of the flood is a candidate: n*(n-1)/2
    assert len(cand) == n * (n - 1) // 2
    assert all(r.left_id < r.right_id for r in cand)

    # and the exact tier collapses the same flood to ONE representative,
    # which is why production LSH never sees it
    reps = dedup_exact_documents(spark, flood_dir)
    assert reps.count() == 1


def test_min_label_components_empty_pair_graph(spark):
    # ADVICE r10: an EMPTY edge list (common for perceptual-hash
    # Hamming balls at small SF) must yield all-singleton clusters,
    # not int(None) from a NULL label sum.
    from benchviz_spark.operators.dedup import min_label_components

    docs = spark.createDataFrame([(1,), (2,), (7,)], "doc_id long")
    pairs = spark.createDataFrame([], "left_id long, right_id long")
    out = min_label_components(spark, pairs, docs).collect()
    assert {(r.doc_id, r.cluster_id) for r in out} == {(1, 1), (2, 2), (7, 7)}


def test_multimodal_cluster_merges_text_and_image_chains(spark, tmp_path):
    # VERDICT r10 #2 done-criterion: a chain A~B (text near-dup) +
    # B~C (image near-dup, text-DISSIMILAR) must collapse into ONE
    # unified cluster even though no single modality sees it whole.
    from benchviz_spark.operators.dedup import (
        dedup_image_phash_pairs,
        dedup_multimodal_clusters,
        dedup_ngram_jaccard_pairs,
    )
    from benchviz_spark.operators.multimodal import DHASH_GRID

    g = DHASH_GRID
    b_text = " ".join(f"word{i:03d}" for i in range(150))
    n = len(b_text.encode())
    w, h = 16 + n % 64, 16 + (n // 64) % 64
    # byte positions the dHash grid actually samples (payload tiles
    # text bytes: pixel p, channel ch -> byte (p*3+ch) % n)
    sampled = {
        (((r * h // g) * w + (c * w // g)) * 3 + ch) % n
        for r in range(g)
        for c in range(g)
        for ch in range(3)
    }
    # C: same length, same bytes at every sampled position, 'z' at all
    # other letter positions -> identical dHash (Hamming 0), near-zero
    # 3-gram Jaccard
    c_text = "".join(
        ch if i in sampled or ch == " " else "z"
        for i, ch in enumerate(b_text)
    )
    assert len(c_text) == n
    a_text = b_text + " word900 word901 word902"  # text near-dup of B

    rows = [
        (1, a_text),
        (2, b_text),
        (3, c_text),
        # long, differently-sized fillers: short same-length texts can
        # collide in a 56-bit perceptual ball by chance
        (4, " ".join(f"volcano{i * 7 % 113}" for i in range(120))),
        (5, " ".join(f"starship{i * 11 % 97}" for i in range(180))),
    ]
    mm_dir = str(tmp_path / "mm")
    (
        spark.createDataFrame(
            [(i, t, "en", f"src{i}", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .coalesce(1)
        .write.parquet(f"{mm_dir}/documents.parquet")
    )

    tp = _pairs(dedup_ngram_jaccard_pairs(spark, mm_dir))
    ip = _pairs(dedup_image_phash_pairs(spark, mm_dir))
    assert (1, 2) in tp and (2, 3) not in tp  # text sees A~B only
    assert (2, 3) in ip  # image sees B~C (identical sampled lumas)

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup_multimodal_clusters(spark, mm_dir).collect()
    }
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[4] == 4 and clusters[5] == 5


def test_segment_dedup_reconciliation(spark, sf_dir):
    """Span-dedup bookkeeping must reconcile ACROSS queries: the total
    segments dropped in the per-doc reconstruction equals the sum of
    (occurrences - 1) over all repeated spans, and kept token counts
    never exceed the original segment budget."""
    from pyspark.sql import functions as F

    from benchviz_spark.operators.dedup import (
        SEG_K,
        curation_segment_dedup_corpus,
        dedup_segment_spans,
    )

    spans = dedup_segment_spans(spark, sf_dir)
    corpus = curation_segment_dedup_corpus(spark, sf_dir)
    dropped_from_spans = spans.agg(
        F.sum(F.col("n_occurrences") - 1)
    ).first()[0]
    agg = corpus.agg(
        F.sum("n_dropped").alias("nd"),
        F.sum("n_kept").alias("nk"),
        F.sum("n_segments").alias("ns"),
        F.max(F.col("n_tokens_kept") - F.col("n_kept") * SEG_K).alias("over"),
    ).first()
    assert spans.count() > 0  # the planted near-dups must surface
    assert agg.nd == dropped_from_spans
    assert agg.nk + agg.nd == agg.ns
    assert agg.over <= 0  # a kept segment carries at most SEG_K tokens
