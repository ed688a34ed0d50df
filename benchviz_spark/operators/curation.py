"""End-to-end corpus curation: the composed training-data pipeline.

Single flagship query chaining the pipeline stages every other module
provides individually — the shape a real pretraining data job has:

    documents
      -> drop the eval split            (decontam's capped EVAL_MOD carve)
      -> drop contaminated documents    (decontam_eval_overlap >= THRESHOLD)
      -> quality gate                   (minimum length)
      -> exact dedup, keep lowest id    (dedup_exact fingerprint)
      -> deterministic train/val/test   (sampling.hash_bucket)

The reference has no analogue (it is a benchmark-log visualizer); this
exists because composability IS the engine claim — each stage is the
already-oracle-checked operator, and this query proves they compose
into one Catalyst plan without materialization barriers between stages.

Scale design: the composition adds NOTHING beyond its parts — Catalyst
fuses the eval-carve, the length gate, and the fingerprint projection
into the one scan; the only exchanges are the two the component
operators already own (the contamination aggregation's hash shuffle and
the dedup window's fingerprint shuffle), and the flagged-id anti-join
stays broadcast-sized because contaminated-doc count is bounded by the
eval suite, not the corpus. A 100-TB run therefore costs: one corpus
scan + one shingle-hash aggregation + one 32-byte-key window shuffle —
paid ONCE per session even with multiple consumers, via the
``curated_documents`` persist point below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.caching import memo_put, register_cache, scratch_persist
from benchviz_spark.operators.decontam import (
    NGRAM,
    THRESHOLD,
    _NGRAM_CONCAT,
    _corpus_sql,
    _eval_sql,
    decontam_eval_overlap,
    eval_split,
)
from benchviz_spark.operators.dedup import _JACCARD_ORACLE, _norm_text, jaccard_of
from benchviz_spark.operators.sampling import (
    TRAIN_UPTO,
    VAL_UPTO,
    _bucket_sql,
    hash_bucket,
)
from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

MIN_CHARS = 100  # quality gate: drop fragments below this length


_CURATION_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {NGRAM - 2}, 1)),
               i -> {_NGRAM_CONCAT}
             )) AS s
      FROM tok WHERE len(t) >= {NGRAM}
    ),
    ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_eval_sql()}),
    posting AS (
      SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g
      FROM sh WHERE {_corpus_sql()}
    ),
    flagged AS (
      SELECT doc_id
      FROM (
        SELECT p.doc_id, p.n_shingles, count(*) AS n_contaminated
        FROM posting p JOIN ev USING (g)
        GROUP BY 1, 2
      )
      WHERE round(n_contaminated::DOUBLE / n_shingles, 6) >= {THRESHOLD}
    ),
    gated AS (
      SELECT doc_id, lang, source, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents
      WHERE {_corpus_sql()}
        AND n_chars >= {MIN_CHARS}
        AND doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    deduped AS (
      SELECT doc_id, lang, source, n_chars
      FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, {_bucket_sql('split:')} AS bucket FROM deduped)
    """


# One persisted curated relation per (Spark application, sf_dir):
# both registered curation queries consume curated_documents(), so a
# job that materializes the corpus AND its recipe card pays the chain
# (corpus scan + shingle-hash aggregation + dedup window shuffle)
# once, not once per consumer (VERDICT r7 #2). Boundedness of the
# memo: one entry per (applicationId, sf_dir) — a handful of test SFs
# in pytest sessions, exactly one in a production job — and the
# persisted blocks themselves are MEMORY_AND_DISK, so Spark evicts to
# disk under pressure rather than OOMing the executors.
_CURATED_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus relation (doc_id, lang, source, n_chars,
    split) — THE documented persist point of the curation stack. First
    call per (session, sf_dir) builds the one-plan chain below and
    ``persist``s it; subsequent consumers (the mixture report, a
    sequence-packing job, an export writer) read the cached blocks
    instead of re-running the shingle-hash aggregation and the dedup
    window shuffle. The persist is lazy: a single-consumer job that
    runs only ``curation_pipeline`` materializes the chain exactly once
    either way."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CURATED_CACHE.get(key)
    if cached is not None:
        return cached
    from pyspark import StorageLevel

    df = _build_curated(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return memo_put(_CURATED_CACHE, key, df)


@query(
    "curation_pipeline",
    oracle=_CURATION_ORACLE
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation chain as one DataFrame: eval carve-out ->
    contamination filter -> length gate -> exact dedup (lowest surviving
    doc_id wins) -> split assignment. Every document that remains after
    curation, with its final train/val/test split. Served from the
    shared ``curated_documents`` persist point, so running this and the
    mixture report in one session executes the chain once."""
    return curated_documents(spark, sf_dir)


def _build_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual one-plan curation chain (see module docstring).

    The dedup winner is chosen among *gated survivors* (not raw docs):
    a duplicate group whose lowest member was itself removed for
    contamination keeps its next-lowest member — matching what a staged
    pipeline materializing between steps would produce."""
    flagged = (
        decontam_eval_overlap(spark, sf_dir)
        .filter(F.col("contamination") >= THRESHOLD)
        .select("doc_id")
    )
    gated = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (~eval_split(F.col("doc_id"))) & (F.col("n_chars") >= MIN_CHARS)
        )
        .join(flagged, "doc_id", "left_anti")
        .withColumn("fp", F.md5(_norm_text(F.col("text"))))
    )
    rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    deduped = gated.withColumn("rn", rn).filter(F.col("rn") == 1)
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return (
        deduped.withColumn("bucket", hash_bucket(F.col("doc_id"), "split:"))
        .withColumn("split", split)
        .select("doc_id", "lang", "source", "n_chars", "split")
    )


@query(
    "curation_mixture_report",
    oracle=f"""
    WITH cur AS ({_CURATION_ORACLE})
    SELECT lang, source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM cur GROUP BY 1, 2, 3
    """,
)
def curation_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-recipe card for the curated corpus: per (lang, source,
    split) document counts and character volume — the table every
    pretraining run records beside its mixture weights, computed over
    the SAME one-plan curation chain (eval carve -> decontam -> quality
    gate -> exact dedup -> split).

    Scale: adds exactly one map-side-combined aggregation over a
    (langs x sources x 3)-cell group space — run after the pipeline in
    the same session it reads the ``curated_documents`` persisted
    blocks, so the report costs the aggregation alone, not a second
    execution of the curation chain."""
    return (
        curated_documents(spark, sf_dir)
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "curation_split_leakage",
    oracle=f"""
    WITH pairs AS ({_JACCARD_ORACLE}),
    cur AS ({_CURATION_ORACLE})
    SELECT a.split AS split_a, b.split AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaking
    FROM pairs p
    JOIN cur a ON a.doc_id = p.left_id
    JOIN cur b ON b.doc_id = p.right_id
    GROUP BY 1, 2
    """,
)
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit: near-duplicate pairs (3-gram Jaccard
    >= 0.5, the oracle-proven pair detector) where BOTH members survive
    curation, grouped by their (split_a, split_b) assignment. Exact
    dedup inside the curation chain removes byte-identical twins, but
    NEAR-duplicates survive it by design — and a near-dup pair
    straddling train/val is eval leakage that silently inflates
    held-out metrics. A curation run publishes this table beside the
    recipe card; off-diagonal rows are the alarm (the fix: assign
    splits by near-dup CLUSTER, not per document).

    Scale: composes two already-bounded stacks — the prefix-filtered
    pair detector (pair-count-sized output, read from dedup's shared
    ``_PAIRS_CACHE`` persist point so a session that also built the
    near-dup clusters pays the pair join once, not twice) inner-joined
    twice against the persisted curated relation on doc_id. No new
    corpus-scaled shuffle: the pair side is duplicate-rate-sized, so
    AQE broadcasts it against the curated relation at any realistic
    dup rate."""
    # Construct the curated relation and the pair detector concurrently:
    # both run eager materialization jobs during construction (the
    # decontam gate's checkpointed shingle pass; the pair chain's
    # materialized shingle store) that otherwise serialize (guide §2.6,
    # the decontam_flag_matrix pattern).
    from benchviz_spark.concurrency import subtree_pool
    from benchviz_spark.operators.dedup import dedup_ngram_jaccard_pairs

    with subtree_pool(2) as pool:
        f_cur = pool.submit(
            lambda: curated_documents(spark, sf_dir).select("doc_id", "split")
        )
        f_pairs = pool.submit(dedup_ngram_jaccard_pairs, spark, sf_dir)
        assignment, pairs = f_cur.result(), f_pairs.result()
    return leakage_over(spark, sf_dir, assignment, pairs=pairs)


def leakage_over(
    spark: SparkSession,
    sf_dir: str,
    assignment: DataFrame,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The leakage aggregation over an arbitrary (doc_id, split)
    assignment — shared by the registered audit above (per-doc splits,
    the motivating alarm) and the corpus export sink (cluster splits,
    where the off-diagonal is zero by construction and leakage.json
    makes that guarantee artifact-visible). ``pairs`` defaults to the
    text near-dup relation; the multimodal export passes the unified
    three-modality pair graph so its zero-leak artifact covers every
    evidence channel."""
    from benchviz_spark.operators.dedup import dedup_ngram_jaccard_pairs

    if pairs is None:
        pairs = dedup_ngram_jaccard_pairs(spark, sf_dir)
    pairs = pairs.select("left_id", "right_id")
    a = assignment.select(
        F.col("doc_id").alias("left_id"), F.col("split").alias("split_a")
    )
    b = assignment.select(
        F.col("doc_id").alias("right_id"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "left_id")
        .join(b, "right_id")
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("split_a") != F.col("split_b")).cast("long"))
            .cast("long")
            .alias("n_leaking"),
        )
    )


def _cluster_splits_oracle() -> str:
    from benchviz_spark.operators.dedup import _CLUSTER_ORACLE

    return f"""
    WITH cur AS ({_CURATION_ORACLE}),
    clusters AS ({_CLUSTER_ORACLE})
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT c.doc_id, c.lang, c.source, c.n_chars,
             {_bucket_sql('csplit:', 'cl.cluster_id')} AS bucket
      FROM cur c JOIN clusters cl ON cl.doc_id = c.doc_id
    )
    """


@query("curation_cluster_splits", oracle=_cluster_splits_oracle())
def curation_cluster_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIX the split-leakage audit motivates: train/val/test
    assigned by near-dup CLUSTER id instead of per document, so every
    member of a near-duplicate cluster lands in the same split and
    cross-split leakage is ZERO by construction (a J >= 0.5 pair is an
    edge, edges stay within a connected component, and the whole
    component shares one hash bucket —
    tests/test_events.py pins the audit at zero off-diagonal pairs
    over this assignment). Same output shape as curation_pipeline;
    the split column is the only difference, and it remains a pure
    key function — stable under RERUNS (no RNG, engine-replayable).
    Known trade-off of cluster-keyed splitting: cluster_id is the min
    doc_id reachable in the near-dup graph, so an APPENDED document
    that bridges two existing clusters merges them and reassigns the
    absorbed side's documents to the merged cluster's split; appends
    that don't merge clusters leave prior assignments unchanged.

    Scale: the persisted curated relation joined once against the
    persisted clusters relation — both already materialized by their
    own stacks — plus the same narrow md5-bucket projection; no new
    corpus-scale shuffle beyond the doc_id equi-join."""
    from benchviz_spark.concurrency import subtree_pool
    from benchviz_spark.operators.dedup import dedup_duplicate_clusters

    # Concurrent construction (guide §2.6): the curated chain's eager
    # gate materialization and the cluster builder's component-loop
    # actions are independent until the join below.
    with subtree_pool(2) as pool:
        f_cur = pool.submit(
            lambda: curated_documents(spark, sf_dir).drop("split")
        )
        f_cl = pool.submit(dedup_duplicate_clusters, spark, sf_dir)
        cur, clusters = f_cur.result(), f_cl.result()
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return (
        cur.join(clusters, "doc_id")
        .withColumn("bucket", hash_bucket(F.col("cluster_id"), "csplit:"))
        .withColumn("split", split)
        .select("doc_id", "lang", "source", "n_chars", "split")
    )


# ---------------------------------------------------------------------------
# Multimodal curation: the flagship chain gated on all three modalities.
# ---------------------------------------------------------------------------
_MM_CURATED_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})


def _multimodal_curation_oracle() -> str:
    """Nested-CTE replay: the text curation chain (``_CURATION_ORACLE``)
    joined to the unified text+image+audio cluster recursion, one
    representative kept per cluster, split keyed on the cluster id.
    The multimodal cluster oracle keeps its own WITH RECURSIVE scoped
    inside the CTE body — the same composition pattern
    ``curation_split_leakage`` proved."""
    from benchviz_spark.operators.dedup import _multimodal_clusters_oracle

    return f"""
    WITH cur AS ({_CURATION_ORACLE}),
    mmc AS ({_multimodal_clusters_oracle()}),
    kept AS (
      SELECT c.doc_id, c.lang, c.source, c.n_chars, m.cluster_id,
             row_number() OVER (PARTITION BY m.cluster_id
                                ORDER BY c.doc_id) AS rn
      FROM cur c JOIN mmc m ON m.doc_id = c.doc_id
    )
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, {_bucket_sql('mmsplit:', 'cluster_id')} AS bucket
          FROM kept WHERE rn = 1)
    """


def curated_multimodal_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The multimodal-curated corpus relation — the persist point the
    multimodal pipeline, its mixture report, and the corpus export all
    drain (same memo contract as ``curated_documents``)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _MM_CURATED_CACHE.get(key)
    if cached is not None:
        return cached
    from pyspark import StorageLevel

    df = _build_curated_multimodal(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return memo_put(_MM_CURATED_CACHE, key, df)


def _build_curated_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from benchviz_spark.concurrency import subtree_pool
    from benchviz_spark.operators.dedup import dedup_multimodal_clusters

    # Concurrent construction (guide §2.6): the curated chain's eager
    # gate materialization and the unified cluster builder's pair
    # checkpoints + component-loop actions are independent until the
    # join below.
    with subtree_pool(2) as pool:
        f_cur = pool.submit(
            lambda: curated_documents(spark, sf_dir).drop("split")
        )
        f_cl = pool.submit(dedup_multimodal_clusters, spark, sf_dir)
        cur, clusters = f_cur.result(), f_cl.result()
    rn = F.row_number().over(W.partitionBy("cluster_id").orderBy("doc_id"))
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return (
        cur.join(clusters, "doc_id")
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .withColumn("bucket", hash_bucket(F.col("cluster_id"), "mmsplit:"))
        .withColumn("split", split)
        .select("doc_id", "lang", "source", "n_chars", "split")
    )


@query("curation_pipeline_multimodal", oracle=_multimodal_curation_oracle())
def curation_pipeline_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The flagship curation chain gated on ALL THREE modalities
    (VERDICT r10 #3): eval carve -> decontam -> length gate -> exact
    dedup -> ONE representative per unified text/image/audio near-dup
    cluster (lowest surviving doc_id — the same winner rule as the
    exact stage, applied among prior-stage survivors) -> split keyed
    on the cluster id. A document that survives text curation but is a
    re-encoded image or recording of a kept document is dropped here —
    the keep-rule a multimodal training corpus actually needs.

    Because at most one member of ANY near-dup pair survives, the
    exported train/val/test boundary is leakage-free by construction
    in every modality — stronger than cluster-consistent splitting,
    which keeps whole clusters and relies on co-assignment.

    Scale: the persisted curated relation equi-joined on 8-byte
    doc_ids against the persisted unified clusters (each built once
    per session by its own stack), one cluster-keyed window (partition
    size = cluster size, never corpus), and the same narrow md5-bucket
    projection. No new corpus-scale shuffle."""
    return curated_multimodal_documents(spark, sf_dir)


@query(
    "curation_mixture_report_multimodal",
    oracle=f"""
    WITH mm AS ({_multimodal_curation_oracle()})
    SELECT lang, source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM mm GROUP BY 1, 2, 3
    """,
)
def curation_mixture_report_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The recipe card over the MULTIMODAL-curated corpus — identical
    aggregation to ``curation_mixture_report``, reading the multimodal
    persist point, so a multimodal run's published mixture reflects
    the cross-modal keep-rule (one map-side-combined aggregation into
    a (langs x sources x 3)-cell space)."""
    return (
        curated_multimodal_documents(spark, sf_dir)
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Shard manifest: the deterministic file-layout plan of a corpus export.
# ---------------------------------------------------------------------------
N_SHARDS = 16


@query(
    "curation_shard_manifest",
    oracle=f"""
    WITH cur AS ({_CURATION_ORACLE}),
    sh AS (
      SELECT split,
             {_bucket_sql('shard:', n_buckets=N_SHARDS)} AS shard,
             doc_id, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS ck
      FROM cur
    )
    SELECT split, CAST(shard AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(sum(ck) AS BIGINT) AS docs_checksum
    FROM sh GROUP BY 1, 2
    """,
)
def curation_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard plan of the curated corpus: every surviving
    document is assigned to one of {N_SHARDS} shards per split by a
    salted md5 bucket (the same pure-function assignment the split
    stage uses, so re-runs and incremental appends land docs in the
    same shard with zero coordination), and the manifest row per
    (split, shard) carries the doc count, char payload, id range, and
    an order-independent content checksum (integer sum of 32-bit
    md5(doc_id) prefixes — exact in int64 up to ~2^31 docs/shard).
    This is the artifact a training loader validates shards against
    before streaming them — the catalog side of corpus_export.

    Scale design: one narrow projection over the shared curated
    persist point (no text bodies; the chain cost is paid once per
    session by ``curated_documents``), then a single map-side-combined
    aggregation into a fixed 3 x {N_SHARDS}-row space. The checksum is
    an integer SUM, so it partial-aggregates and is independent of
    row order and partitioning — the property that makes it usable as
    a cross-run shard-integrity probe at any scale."""
    cur = curated_documents(spark, sf_dir)
    ck = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        cur.select(
            "split",
            hash_bucket(F.col("doc_id"), "shard:", N_SHARDS).alias("shard"),
            "doc_id",
            "n_chars",
            ck.alias("ck"),
        )
        .groupBy("split", "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
            F.sum("ck").cast("long").alias("docs_checksum"),
        )
        .select(
            "split",
            F.col("shard").cast("int").alias("shard"),
            "n_docs",
            "total_chars",
            "min_doc",
            "max_doc",
            "docs_checksum",
        )
    )


@query(
    "curation_training_order",
    oracle=f"""
    WITH cur AS ({_CURATION_ORACLE}),
    tr AS (
      SELECT doc_id,
             {_bucket_sql('shard:', n_buckets=N_SHARDS)} AS shard,
             md5('order:' || doc_id::VARCHAR) AS ok
      FROM cur WHERE split = 'train'
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY shard ORDER BY ok, doc_id
           ) AS BIGINT) AS position
    FROM tr
    """,
)
def curation_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order as (shard, position): every
    train-split document lands in the same shard the manifest assigns
    it, and within a shard documents are ordered by a salted md5 sort
    key — the two-level pseudo-random shuffle a data loader actually
    consumes (read shards in parallel, stream each in stored order),
    reproducible across re-runs and engines with zero coordination or
    stored RNG state.

    Scale design: a GLOBAL pseudo-random order would be one
    unpartitioned sort of the corpus — the exact shape the plan sweep
    bans. The two-level factorization replaces it with a window
    PARTITIONED by shard (parallelism = shard count; a production
    export raises {N_SHARDS} to thousands, this constant is the
    demo-sized value), ordering only within shards, which is also what
    preserves loader-side streaming: position is dense per shard, so
    byte-ranges and resumption offsets stay per-file. Reads the shared
    curated persist point; one shuffle on the shard key."""
    cur = curated_documents(spark, sf_dir)
    tr = cur.filter(F.col("split") == "train").select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "shard:", N_SHARDS).alias("shard"),
        F.md5(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))).alias(
            "ok"
        ),
    )
    w = W.partitionBy("shard").orderBy("ok", "doc_id")
    return tr.select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("position"),
    )


# ---------------------------------------------------------------------------
# Corpus datasheet (Gebru et al. 2021, "Datasheets for Datasets"): the
# one-artifact summary a dataset release ships — volume, composition,
# length distribution, duplication, split shares — in tidy long form.
# ---------------------------------------------------------------------------
_DS_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


@query(
    "curation_corpus_datasheet",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split({_DS_NORM}, ' ')) AS n_toks,
             md5({_DS_NORM}) AS fp,
             {_bucket_sql('split:')} AS bucket
      FROM documents
    ),
    vol AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
             CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
             CAST(sum(n_chars) AS DOUBLE) AS total_chars,
             CAST(sum(n_toks) AS DOUBLE) AS total_tokens,
             round(avg(n_chars), 6) AS mean_chars,
             round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
             round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
             round(quantile_cont(n_chars, 0.99), 6) AS p99_chars,
             round(1.0 - count(DISTINCT fp) / count(*), 6) AS exact_dup_rate
      FROM base
    ),
    srcs AS (SELECT source, CAST(count(*) AS DOUBLE) AS c FROM base GROUP BY source),
    srcstats AS (
      SELECT round(sum((c / t) * (c / t)), 6) AS hhi,
             round(max(c) / max(t), 6) AS top_share
      FROM srcs CROSS JOIN (SELECT sum(c) AS t FROM srcs)
    )
    SELECT section, metric, value FROM (
      SELECT 'volume' AS section, 'n_docs' AS metric, n_docs AS value FROM vol
      UNION ALL SELECT 'volume', 'n_sources', n_sources FROM vol
      UNION ALL SELECT 'volume', 'n_langs', n_langs FROM vol
      UNION ALL SELECT 'volume', 'total_chars', total_chars FROM vol
      UNION ALL SELECT 'volume', 'total_tokens', total_tokens FROM vol
      UNION ALL SELECT 'length', 'mean_chars', mean_chars FROM vol
      UNION ALL SELECT 'length', 'p50_chars', p50_chars FROM vol
      UNION ALL SELECT 'length', 'p90_chars', p90_chars FROM vol
      UNION ALL SELECT 'length', 'p99_chars', p99_chars FROM vol
      UNION ALL SELECT 'duplication', 'exact_dup_rate', exact_dup_rate FROM vol
      UNION ALL SELECT 'source', 'hhi', hhi FROM srcstats
      UNION ALL SELECT 'source', 'top_share', top_share FROM srcstats
      UNION ALL
      SELECT 'language', lang,
             round(count(*) / (SELECT count(*)::DOUBLE FROM base), 6)
      FROM base GROUP BY lang
      UNION ALL
      SELECT 'split',
             CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                  WHEN bucket < {VAL_UPTO} THEN 'val'
                  ELSE 'test' END,
             round(count(*) / (SELECT count(*)::DOUBLE FROM base), 6)
      FROM base GROUP BY 2
    )
    """,
)
def curation_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release datasheet in tidy (section, metric, value) form:
    corpus volume (docs/sources/langs/chars/whitespace tokens), length
    distribution (mean + exact interpolated p50/p90/p99), exact
    duplication rate, source concentration (Herfindahl index + top
    share), per-language shares, and hash-split shares — the numbers a
    "Datasheets for Datasets" release card publishes, as ONE query any
    run can regenerate and diff against the previous release.

    Scale: one narrow per-doc projection feeds four bounded
    aggregations (a 1-row profile, a sources-bounded concentration
    table, a langs-bounded share table, a 3-row split table) unioned
    into ~25 rows. The exact percentiles are the one genuinely
    corpus-ranked piece — Spark's ``percentile`` runs as a two-stage
    distributed rank, and a 100-TB deployment would swap in
    ``percentile_approx`` (one pass, mergeable sketch) at the cost of
    leaving this oracle — the same exact-vs-sketch twin trade the
    analytics module documents on its quantile queries."""
    docs = load_table(spark, sf_dir, "documents")
    norm = _norm_text(F.col("text"))
    base = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split(norm, " ")).alias("n_toks"),
        F.md5(norm).alias("fp"),
        hash_bucket(F.col("doc_id"), "split:").alias("bucket"),
    )
    vol = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.count_distinct(F.col("source")).cast("double").alias("n_sources"),
        F.count_distinct(F.col("lang")).cast("double").alias("n_langs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.sum("n_toks").cast("double").alias("total_tokens"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.round(F.expr("percentile(n_chars, 0.5D)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9D)"), 6).alias("p90_chars"),
        F.round(F.expr("percentile(n_chars, 0.99D)"), 6).alias("p99_chars"),
        F.round(
            1.0 - F.count_distinct(F.col("fp")) / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )

    def _vrow(section: str, metric: str, col: str):
        return vol.select(
            F.lit(section).alias("section"),
            F.lit(metric).alias("metric"),
            F.col(col).alias("value"),
        )

    srcs = base.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("c"))
    srcstats = srcs.crossJoin(F.broadcast(srcs.agg(F.sum("c").alias("t")))).agg(
        F.round(F.sum((F.col("c") / F.col("t")) * (F.col("c") / F.col("t"))), 6).alias(
            "hhi"
        ),
        F.round(F.max("c") / F.first("t"), 6).alias("top_share"),
    )
    n_total = vol.select(F.col("n_docs").alias("nt"))
    langs = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(n_total))
        .select(
            F.lit("language").alias("section"),
            F.col("lang").alias("metric"),
            F.round(F.col("c") / F.col("nt"), 6).alias("value"),
        )
    )
    split_name = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    splits = (
        base.groupBy(split_name.alias("metric"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(n_total))
        .select(
            F.lit("split").alias("section"),
            "metric",
            F.round(F.col("c") / F.col("nt"), 6).alias("value"),
        )
    )
    rows = [
        _vrow("volume", "n_docs", "n_docs"),
        _vrow("volume", "n_sources", "n_sources"),
        _vrow("volume", "n_langs", "n_langs"),
        _vrow("volume", "total_chars", "total_chars"),
        _vrow("volume", "total_tokens", "total_tokens"),
        _vrow("length", "mean_chars", "mean_chars"),
        _vrow("length", "p50_chars", "p50_chars"),
        _vrow("length", "p90_chars", "p90_chars"),
        _vrow("length", "p99_chars", "p99_chars"),
        _vrow("duplication", "exact_dup_rate", "exact_dup_rate"),
        srcstats.select(
            F.lit("source").alias("section"),
            F.lit("hhi").alias("metric"),
            F.col("hhi").alias("value"),
        ),
        srcstats.select(
            F.lit("source").alias("section"),
            F.lit("top_share").alias("metric"),
            F.col("top_share").alias("value"),
        ),
        langs,
        splits,
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Release-over-release drift: PSI of the corpus composition between the
# previous snapshot and the current one.
# ---------------------------------------------------------------------------
DRIFT_MOD = 5  # previous snapshot = doc_id % DRIFT_MOD != 0 (~80% carve).
#                Self-contained stand-in for reading last release's
#                manifest — swapping in a real previous-snapshot table
#                changes one predicate (the decontam eval-carve pattern).
DRIFT_LEN_BUCKET = 100  # n_chars bucket width for the length dimension
DRIFT_LEN_MAX_BUCKET = 9


@query(
    "curation_corpus_drift",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, lang,
             least({DRIFT_LEN_MAX_BUCKET}, n_chars // {DRIFT_LEN_BUCKET}) AS len_b
      FROM documents
    ),
    cat AS (
      SELECT 'source' AS dimension, source AS cat,
             CASE WHEN doc_id % {DRIFT_MOD} <> 0 THEN 1 ELSE 0 END AS is_old
      FROM d
      UNION ALL
      SELECT 'lang', lang, CASE WHEN doc_id % {DRIFT_MOD} <> 0 THEN 1 ELSE 0 END
      FROM d
      UNION ALL
      SELECT 'length_bucket', CAST(len_b AS VARCHAR),
             CASE WHEN doc_id % {DRIFT_MOD} <> 0 THEN 1 ELSE 0 END
      FROM d
    ),
    counts AS (
      SELECT dimension, cat, sum(is_old) AS o, count(*) AS n
      FROM cat GROUP BY 1, 2
    ),
    tot AS (
      SELECT dimension, sum(o) AS ot, sum(n) AS nt, count(*) AS k
      FROM counts GROUP BY 1
    ),
    terms AS (
      SELECT c.dimension,
             (c.o + 1.0) / (t.ot + t.k) AS po,
             (c.n + 1.0) / (t.nt + t.k) AS pn,
             t.ot, t.nt, t.k
      FROM counts c JOIN tot t USING (dimension)
    )
    SELECT dimension,
           round(sum((pn - po) * ln(pn / po)), 6) AS psi,
           CAST(max(k) AS BIGINT)  AS n_categories,
           CAST(max(ot) AS BIGINT) AS n_old,
           CAST(max(nt) AS BIGINT) AS n_new
    FROM terms GROUP BY dimension
    """,
)
def curation_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition drift between the previous corpus snapshot and the
    current one: Laplace-smoothed Population Stability Index of the
    source, language, and length-bucket distributions (psi < 0.1
    stable, > 0.25 drifted — the release gate a dataset CI runs before
    a new snapshot ships, next to the datasheet diff). The previous
    snapshot is the deterministic doc_id % {DRIFT_MOD} != 0 carve so
    the operator is self-contained and oracle-checkable; a production
    run points the "old" side at last release's manifest instead.

    Scale: one narrow projection fans each doc into its three
    dimension categories (3x corpus rows, map-side combined
    immediately); everything after the (dimension, category) count —
    totals, smoothing, PSI terms — runs on a categories-bounded
    relation. Three rows out."""
    docs = load_table(spark, sf_dir, "documents")
    is_old = F.when(F.col("doc_id") % DRIFT_MOD != 0, 1).otherwise(0)
    len_b = F.least(
        F.lit(DRIFT_LEN_MAX_BUCKET),
        F.floor(F.col("n_chars") / DRIFT_LEN_BUCKET),
    )
    base = docs.select(
        "source", "lang", len_b.alias("len_b"), is_old.alias("is_old")
    )
    cat = (
        base.select(
            F.lit("source").alias("dimension"),
            F.col("source").alias("cat"),
            "is_old",
        )
        .unionByName(
            base.select(
                F.lit("lang").alias("dimension"),
                F.col("lang").alias("cat"),
                "is_old",
            )
        )
        .unionByName(
            base.select(
                F.lit("length_bucket").alias("dimension"),
                F.col("len_b").cast("string").alias("cat"),
                "is_old",
            )
        )
    )
    counts = cat.groupBy("dimension", "cat").agg(
        F.sum("is_old").alias("o"), F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("dimension").agg(
        F.sum("o").alias("ot"), F.sum("n").alias("nt"), F.count(F.lit(1)).alias("k")
    )
    terms = counts.join(F.broadcast(tot), "dimension").select(
        "dimension",
        ((F.col("o") + 1.0) / (F.col("ot") + F.col("k"))).alias("po"),
        ((F.col("n") + 1.0) / (F.col("nt") + F.col("k"))).alias("pn"),
        "ot",
        "nt",
        "k",
    )
    return terms.groupBy("dimension").agg(
        F.round(
            F.sum((F.col("pn") - F.col("po")) * F.log(F.col("pn") / F.col("po"))), 6
        ).alias("psi"),
        F.max("k").cast("long").alias("n_categories"),
        F.max("ot").cast("long").alias("n_old"),
        F.max("nt").cast("long").alias("n_new"),
    )


# ---------------------------------------------------------------------------
# Quality-stratified mixture: corpus quartiles by model score — the
# lever behind "N epochs of the top quality bucket, 1 of the rest".
# ---------------------------------------------------------------------------
def _quality_tiers_oracle() -> str:
    # Direct imports of this module (tests) bypass registry._load_all's
    # module ordering — make sure the classifier oracle is registered.
    import benchviz_spark.operators.quality  # noqa: F401
    from benchviz_spark.registry import _ORACLES

    return f"""
    WITH sc AS ({_ORACLES['quality_hashed_classifier_score']}),
    d AS (
      SELECT sc.doc_id, sc.quality_score, docs.source, docs.n_chars
      FROM sc JOIN documents docs USING (doc_id)
    ),
    cuts AS (
      SELECT round(quantile_cont(quality_score, 0.25), 6) AS c1,
             round(quantile_cont(quality_score, 0.50), 6) AS c2,
             round(quantile_cont(quality_score, 0.75), 6) AS c3
      FROM d
    ),
    tiers AS (
      SELECT CASE WHEN quality_score <= c1 THEN 'q1'
                  WHEN quality_score <= c2 THEN 'q2'
                  WHEN quality_score <= c3 THEN 'q3'
                  ELSE 'q4' END AS tier,
             source, quality_score, n_chars
      FROM d CROSS JOIN cuts
    )
    SELECT tier, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           round(avg(quality_score), 6) AS avg_score
    FROM tiers GROUP BY tier, source
    """


@query("curation_quality_tiers", oracle=_quality_tiers_oracle())
def curation_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quartiled by the model quality score, crossed with
    source: per (tier, source) doc count, char volume, and mean score.
    The table behind quality-stratified mixtures ("repeat the q4
    bucket three epochs, q1 once" — the quality-curriculum lever
    documented for modern pretraining runs) and the audit of WHERE
    each source's mass sits on the quality axis. Quartile cuts are
    exact interpolated percentiles rounded to 6 (both engines), so
    tier assignment is engine-stable; scores were already rounded by
    the classifier.

    Scale: score is the classifier's zero-shuffle per-row fold; the
    cuts are one 3-value distributed-rank reduction broadcast back as
    a 1-row literal; assignment is a CASE projection and the output
    aggregation is (4 x sources)-bounded. The one corpus-ranked piece
    is the percentile — at 100 TB swap in percentile_approx exactly as
    the datasheet documents."""
    from benchviz_spark.operators.quality import quality_hashed_classifier_score

    sc = quality_hashed_classifier_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    d = sc.join(docs, "doc_id")
    cuts = d.agg(
        F.round(F.expr("percentile(quality_score, 0.25D)"), 6).alias("c1"),
        F.round(F.expr("percentile(quality_score, 0.50D)"), 6).alias("c2"),
        F.round(F.expr("percentile(quality_score, 0.75D)"), 6).alias("c3"),
    )
    tier = (
        F.when(F.col("quality_score") <= F.col("c1"), "q1")
        .when(F.col("quality_score") <= F.col("c2"), "q2")
        .when(F.col("quality_score") <= F.col("c3"), "q3")
        .otherwise("q4")
    )
    return (
        d.crossJoin(F.broadcast(cuts))
        .select(tier.alias("tier"), "source", "quality_score", "n_chars")
        .groupBy("tier", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.round(F.avg("quality_score"), 6).alias("avg_score"),
        )
    )


def _curriculum_oracle() -> str:
    import benchviz_spark.operators.quality  # noqa: F401
    from benchviz_spark.registry import _ORACLES

    return f"""
    WITH cur AS ({_CURATION_ORACLE}),
    sc AS ({_ORACLES['quality_hashed_classifier_score']}),
    tr AS (
      SELECT cur.doc_id,
             {_bucket_sql('shard:', 'cur.doc_id', n_buckets=N_SHARDS)} AS shard,
             sc.quality_score
      FROM cur JOIN sc ON cur.doc_id = sc.doc_id
      WHERE cur.split = 'train'
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, quality_score,
           CAST(row_number() OVER (
             PARTITION BY shard ORDER BY quality_score, doc_id
           ) AS BIGINT) AS position
    FROM tr
    """


@query("curation_curriculum_order", oracle=_curriculum_oracle())
def curation_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-annealed curriculum order for the train split: within
    each shard, documents are positioned by ascending model quality
    score (doc_id tiebreak), so a loader streaming shards front to
    back finishes every epoch on its highest-quality data — the
    quality-annealing curriculum, as the deterministic sibling of
    curation_training_order's uniform shuffle (same shard assignment,
    same dense per-shard positions, only the order key differs; both
    reconcile against curation_shard_manifest).

    Scale: identical plan shape to the uniform order — the window is
    PARTITIONED by shard, never global — plus the classifier's
    zero-shuffle score fold and one doc_id equi-join between the two
    persisted/narrow chains. Scores were rounded to 6 by the
    classifier, so the order is engine-exact."""
    from benchviz_spark.operators.quality import quality_hashed_classifier_score

    cur = curated_documents(spark, sf_dir)
    sc = quality_hashed_classifier_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    tr = (
        cur.filter(F.col("split") == "train")
        .select(
            "doc_id", hash_bucket(F.col("doc_id"), "shard:", N_SHARDS).alias("shard")
        )
        .join(sc, "doc_id")
    )
    w = W.partitionBy("shard").orderBy("quality_score", "doc_id")
    return tr.select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        "quality_score",
        F.row_number().over(w).cast("long").alias("position"),
    )


# ---------------------------------------------------------------------------
# Incremental curation: admit ONE new crawl batch against the standing
# corpus (VERDICT r11 #7). A 100-TB lake does not re-curate the world
# per crawl — the curated corpus is the durable artifact and each
# ingest computes only the DELTA that may append to it.
# ---------------------------------------------------------------------------


def _admission_gate_ctes(within_batch_rn: bool) -> str:
    """The CTE chain shared by the incremental-admission oracles: the
    hygiene gates (eval carve + length + contamination — identical SQL
    to ``_CURATION_ORACLE``'s, under g-prefixed CTE names so they
    coexist with the minhash chain's trigram ``sh``), epoch from the
    ``_INCR_SEEN_RE`` source convention, first-ingested-wins exact
    dedup vs the epoch-0 survivors, and the MinHash-LSH +
    exact-Jaccard near-dup tier against them (``_minhash_ctes``
    replayed verbatim), ending at ``b3`` — the batch docs admitted
    versus the STANDING corpus. ``within_batch_rn`` adds the
    lowest-doc_id-wins exact dedup WITHIN the batch (the full
    incremental semantics); the streaming admission gate is a
    per-document decision, so its oracle omits it."""
    from benchviz_spark.operators.dedup import _INCR_SEEN_RE, _minhash_ctes

    if within_batch_rn:
        b2 = """b2 AS (
      SELECT doc_id, lang, source, n_chars FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
        WHERE epoch = 1
          -- NOT EXISTS, not NOT IN: with any NULL fp in old_curated,
          -- NOT IN returns NULL for every probe row (dropping the
          -- whole batch) while the Spark path's left_anti keeps
          -- non-matching rows; NOT EXISTS has exactly the anti-join
          -- semantics on both engines (ADVICE r12).
          AND NOT EXISTS (
            SELECT 1 FROM old_curated oc WHERE oc.fp = gated.fp
          )
      ) WHERE rn = 1
    )"""
    else:
        b2 = """b2 AS (
      SELECT doc_id, lang, source, n_chars
      FROM gated
      WHERE epoch = 1
        AND NOT EXISTS (
          SELECT 1 FROM old_curated oc WHERE oc.fp = gated.fp
        )
    )"""

    return f"""
    gtok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
      FROM documents
    ),
    gsh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {NGRAM - 2}, 1)),
               i -> {_NGRAM_CONCAT}
             )) AS s
      FROM gtok WHERE len(t) >= {NGRAM}
    ),
    gev AS (SELECT DISTINCT unnest(s) AS g FROM gsh WHERE {_eval_sql()}),
    gposting AS (
      SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g
      FROM gsh WHERE {_corpus_sql()}
    ),
    gflagged AS (
      SELECT doc_id
      FROM (
        SELECT p.doc_id, p.n_shingles, count(*) AS n_contaminated
        FROM gposting p JOIN gev USING (g)
        GROUP BY 1, 2
      )
      WHERE round(n_contaminated::DOUBLE / n_shingles, 6) >= {THRESHOLD}
    ),
    gated AS (
      -- NULL-source rows get epoch NULL (not 1): the Spark path's
      -- rlike / NOT rlike filter pair excludes them from BOTH epochs,
      -- and a bare CASE..ELSE would lump them into the batch (ADVICE
      -- r12). NULL never equals 0 or 1 below, so the engines agree
      -- by construction even on a NULL-bearing corpus.
      SELECT doc_id, lang, source, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             CASE WHEN regexp_matches(source, '{_INCR_SEEN_RE}') THEN 0
                  WHEN NOT regexp_matches(source, '{_INCR_SEEN_RE}') THEN 1
             END AS epoch
      FROM documents
      WHERE {_corpus_sql()}
        AND n_chars >= {MIN_CHARS}
        AND doc_id NOT IN (SELECT doc_id FROM gflagged)
    ),
    old_curated AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated WHERE epoch = 0
      ) WHERE rn = 1
    ),
    {b2},
    {_minhash_ctes()},
    drop_vs_old AS (
      SELECT DISTINCT c.new_id AS doc_id
      FROM (
        SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
        FROM bands nb
        JOIN b2 ON b2.doc_id = nb.doc_id
        JOIN bands ob ON nb.band = ob.band AND nb.bucket = ob.bucket
        JOIN old_curated oc ON oc.doc_id = ob.doc_id
      ) c
      JOIN sh x ON x.doc_id = c.new_id
      JOIN sh y ON y.doc_id = c.old_id
      WHERE round(len(list_intersect(x.s, y.s))::DOUBLE
              / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 6)
            >= 0.5
    ),
    b3 AS (
      SELECT * FROM b2
      WHERE doc_id NOT IN (SELECT doc_id FROM drop_vs_old)
    )"""


def _incremental_oracle() -> str:
    """DuckDB replay of the whole incremental admission over old∪new:
    the shared gate chain (``_admission_gate_ctes`` with the
    within-batch lowest-doc_id-wins exact tier), then min-label
    connected components over the verified within-batch pair graph
    (the ``_CLUSTER_ORACLE`` recursive-CTE formulation restricted to
    batch survivors). Integer/md5 arithmetic end to end — the same
    cross-engine-exact argument as the minhash oracle."""
    return f"""
    WITH RECURSIVE
    {_admission_gate_ctes(within_batch_rn=True)},
    pairs_nn AS (
      SELECT c.left_id, c.right_id
      FROM (
        SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
        FROM bands a
        JOIN b3 la ON la.doc_id = a.doc_id
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.doc_id < b.doc_id
        JOIN b3 lb ON lb.doc_id = b.doc_id
      ) c
      JOIN sh x ON x.doc_id = c.left_id
      JOIN sh y ON y.doc_id = c.right_id
      WHERE round(len(list_intersect(x.s, y.s))::DOUBLE
              / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))), 6)
            >= 0.5
    ),
    edges AS (
      SELECT left_id AS src, right_id AS dst FROM pairs_nn
      UNION ALL
      SELECT right_id, left_id FROM pairs_nn
    ),
    reach AS (
      SELECT doc_id AS a, doc_id AS b FROM b3
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT b3.doc_id, b3.lang, b3.source, b3.n_chars,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, {_bucket_sql('split:')} AS bucket FROM b3) b3
    JOIN comp ON comp.doc_id = b3.doc_id
    WHERE comp.cluster_id = b3.doc_id
    """


def _admission_delta_oracle() -> str:
    """DuckDB replay of the PER-DOCUMENT admission decision against the
    standing corpus: the shared gate chain WITHOUT the within-batch
    tiers (no lowest-doc_id-wins exact dedup, no within-batch
    components) — each batch document is admitted or dropped purely on
    its own content versus the frozen standing index, which is exactly
    the decision a stateless streaming gate can make per arriving
    document. Split assignment is the standard per-row hash."""
    return f"""
    WITH
    {_admission_gate_ctes(within_batch_rn=False)}
    SELECT doc_id, lang, source, n_chars,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT *, {_bucket_sql('split:')} AS bucket FROM b3)
    """


def incremental_base_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STANDING corpus of the incremental scenario: the curation
    gates + exact dedup + split assignment applied to the epoch-0
    sources only (``_INCR_SEEN_RE``, the same seen/incoming convention
    ``dedup_incremental_new_docs`` established). This is what a prior
    run already materialized on disk; ``curation_incremental_batch``
    admits the next crawl against it."""
    from benchviz_spark.operators.dedup import _INCR_SEEN_RE

    gated = _incremental_gated(spark, sf_dir).filter(
        F.col("source").rlike(_INCR_SEEN_RE)
    )
    rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    deduped = gated.withColumn("rn", rn).filter(F.col("rn") == 1)
    return _with_split(deduped).select(
        "doc_id", "lang", "source", "n_chars", "split"
    )


def _incremental_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hygiene-gated documents (both epochs) with fingerprints — the
    shared prefix of the base corpus and the batch admission. Identical
    gates to ``_build_curated``; kept separate so the incremental
    scenario never perturbs the full-corpus persist point."""
    from benchviz_spark.sources.tables import spread

    flagged = (
        decontam_eval_overlap(spark, sf_dir)
        .filter(F.col("contamination") >= THRESHOLD)
        .select("doc_id")
    )
    # spread(): the md5(normalized text) fingerprint projection is the
    # heavy per-row work here and would otherwise run on the one-split
    # local scan as a single task (no-op on a many-split scan)
    return (
        spread(spark, load_table(spark, sf_dir, "documents"))
        .filter(
            (~eval_split(F.col("doc_id"))) & (F.col("n_chars") >= MIN_CHARS)
        )
        .join(flagged, "doc_id", "left_anti")
        .withColumn("fp", F.md5(_norm_text(F.col("text"))))
    )


def _with_split(df: DataFrame) -> DataFrame:
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return df.withColumn(
        "bucket", hash_bucket(F.col("doc_id"), "split:")
    ).withColumn("split", split)


@query("curation_incremental_batch", oracle=_incremental_oracle())
def curation_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPEND DELTA of one incremental ingest: documents of the
    incoming batch (sources beyond ``_INCR_SEEN_RE``) that survive
    (1) the standing hygiene gates (eval carve, length, contamination),
    (2) exact dedup with FIRST-INGESTED-WINS — a batch doc sharing a
    fingerprint with any standing-corpus survivor is dropped no matter
    whose doc_id is lower (the standing corpus is immutable; this is
    what distinguishes incremental admission from a rebuild), then
    lowest-doc_id-wins among batch-only fingerprint groups,
    (3) near-dup admission against the standing corpus — MinHash band
    collision (``band_buckets``) verified by exact shingle Jaccard
    >= 0.5, first-ingested-wins again, and
    (4) within-batch near-dup dedup — min-label connected components
    (``min_label_components``) over the verified batch-batch pair
    graph, cluster minimum survives.
    Survivors get the standard deterministic split assignment. The
    full admission — gates, both dedup tiers, components, splits — is
    replayed cross-engine by ``_incremental_oracle``.

    Scale design (the reason this exists, VERDICT r11 #7): every
    corpus-sized structure here is the STANDING INDEX a production
    lake materializes once — the curated corpus's fingerprint set
    enters as the fixed ~8 KiB Bloom bitset (only bloom-positive batch
    rows reach the exact anti join, so that shuffle is sized by the
    batch dup rate), and the corpus band-posting table is the durable
    LSH index an ingest equi-joins against (bucketed-on-(band, bucket)
    parquet — no longer just a claim: ``build_admission_index`` below
    materializes it and ``curation_incremental_batch_indexed`` consumes
    it, fixed-batch corpus-x10 ingest ratio x1.01 vs this in-session
    rebuild's x1.56, incremental_admission_10x.json). The
    per-ingest moving state is batch-sized: batch bands, batch
    shingle sets for verification, and a pair graph sized by the
    batch's duplicate rate. The min-label loop iterates over
    batch-batch edges only — never the standing corpus."""
    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
        min_label_components,
    )
    from benchviz_spark.operators.relational_ext import (
        bloom_bitmap,
        bloom_might_contain,
    )

    # The gated lake feeds both epochs (standing + batch), and each
    # later tier re-reads its slice several times — without the
    # persists below, Catalyst expands every consumer into its own
    # copy of the gate chain (the committed before-plan carried 302
    # Exchange nodes for this query). Persist the five columns the
    # tiers read (text never leaves the scan stage — guide §2.3);
    # bench.py's per-row clear_caches() unpersists them all.
    gated = _admit_scratch(
        spark,
        f"{sf_dir}|insess|gated",
        _incremental_gated(spark, sf_dir).select(
            "doc_id", "lang", "source", "n_chars", "fp"
        ),
    )
    old_gated = gated.filter(F.col("source").rlike(_INCR_SEEN_RE))
    rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    old_curated = _admit_scratch(
        spark,
        f"{sf_dir}|insess|old_curated",
        old_gated.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "fp"),
    )
    batch = gated.filter(~F.col("source").rlike(_INCR_SEEN_RE))

    # (2) exact tier: bloom-gated anti join against standing fps, then
    # lowest-id-wins within the batch
    bitmap = bloom_bitmap(
        old_curated.select(F.xxhash64("fp").alias("pk")), "pk"
    )
    probed = batch.crossJoin(F.broadcast(bitmap)).withColumn(
        "maybe_seen", bloom_might_contain(F.xxhash64("fp"))
    )
    old_fps = old_curated.select("fp")
    new_vs_old = probed.filter(~F.col("maybe_seen")).unionByName(
        probed.filter(F.col("maybe_seen")).join(old_fps, "fp", "left_anti")
    )
    b2 = _admit_scratch(
        spark,
        f"{sf_dir}|insess|b2",
        new_vs_old.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars"),
    )

    # (3) near-dup tier vs the standing corpus: band collisions
    # verified by exact shingle Jaccard, batch loser dropped. ONE
    # lake-wide n=3 shingle pass (spread, persisted) feeds BOTH the
    # band postings and the verification shingle store below — r15:
    # band_buckets and hashed_shingled_documents each re-ran the
    # normalize+split+shingle chain over the same documents.
    from benchviz_spark.operators.dedup import shingled_documents
    from benchviz_spark.sources.tables import spread

    sh3 = _admit_scratch(
        spark,
        f"{sf_dir}|insess|sh3",
        spread(spark, shingled_documents(spark, sf_dir)),
    )
    bands = _admit_scratch(
        spark, f"{sf_dir}|insess|bands", band_buckets(spark, sf_dir, sh=sh3)
    )
    new_b = bands.join(b2.select("doc_id"), "doc_id", "left_semi")
    old_b = bands.join(old_curated.select("doc_id"), "doc_id", "left_semi")
    cand_old = (
        new_b.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        .join(
            old_b.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    # four consumers below (both vs-standing sides + both within-batch
    # sides): the hashed form is projected once from the persisted
    # shingle pass above (identical expressions to
    # hashed_shingled_documents) and persisted itself
    sh = _admit_scratch(
        spark,
        f"{sf_dir}|insess|sh",
        sh3.select(
            "doc_id",
            F.array_distinct(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
            ).alias("hs"),
        ),
    )
    left = sh.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("sa"))
    right = sh.select(F.col("doc_id").alias("old_id"), F.col("hs").alias("sb"))
    jac = jaccard_of("sa", "sb")
    drop_vs_old = (
        cand_old.join(left, "new_id")
        .join(right, "old_id")
        .filter(jac >= 0.5)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    b3 = _admit_scratch(
        spark, f"{sf_dir}|insess|b3", b2.join(drop_vs_old, "doc_id", "left_anti")
    )

    # (4) within-batch near-dups: verified pair graph -> components,
    # cluster minimum survives
    b3_b = bands.join(b3.select("doc_id"), "doc_id", "left_semi")
    cand_nn = (
        b3_b.select(F.col("doc_id").alias("left_id"), "band", "bucket")
        .join(
            b3_b.select(F.col("doc_id").alias("right_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    lshj = sh.select(F.col("doc_id").alias("left_id"), F.col("hs").alias("sa"))
    rshj = sh.select(F.col("doc_id").alias("right_id"), F.col("hs").alias("sb"))
    pairs_nn = (
        cand_nn.join(lshj, "left_id")
        .join(rshj, "right_id")
        .filter(jac >= 0.5)
        .select("left_id", "right_id")
    )
    comp = min_label_components(spark, pairs_nn, b3.select("doc_id"))
    minima = comp.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    delta = b3.join(minima, "doc_id", "left_semi")
    return _with_split(delta).select(
        "doc_id", "lang", "source", "n_chars", "split"
    )


# ---------------------------------------------------------------------------
# Durable standing-corpus admission index (VERDICT r13 #2). The
# in-session ``curation_incremental_batch`` rebuilds every
# corpus-sized structure per ingest — measured as the x1.61 residual
# of the fixed-batch 10x probe (incremental_admission_10x.json). This
# is the index a production lake materializes ONCE per standing-corpus
# epoch, after which every ingest's cost is sized by the batch alone:
#
#   {prefix}_eval_grams  distinct eval-split n-grams (decontam's
#                        standing asset; broadcast side of the batch
#                        contamination join)
#   {prefix}_fps         standing curated (doc_id, fp), bucketed by fp
#                        (exact-tier anti-join side: only the bloom-
#                        positive batch rows shuffle, the corpus side
#                        is read co-located)
#   {prefix}_bands       standing curated (doc_id, band, bucket),
#                        bucketed by (band, bucket) (LSH posting list:
#                        the batch's bands shuffle to it, the corpus
#                        postings never move)
#   {prefix}_shingles    standing curated (doc_id, hs), bucketed by
#                        doc_id (exact-Jaccard verification side, read
#                        only for band-colliding old_ids)
#   {prefix}_bloom       the ~8 KiB bloom bitset over standing fps,
#                        one row, broadcast per ingest
#
# Bucketing follows serving/lake.py's proven saveAsTable pattern
# (Spark honors bucket metadata only through the catalog).
# ---------------------------------------------------------------------------

_ADMISSION_PARTS = ("eval_grams", "fps", "bands", "shingles", "bloom")

# (applicationId, prefix) -> {"sf_dir": ..., "names": ...}: the epoch
# index is a deterministic function of (sf_dir, prefix), so a session's
# second builder call (three registered queries consume the default
# index) returns the standing tables instead of re-materializing them.
# Registered with the session cache registry: bench.py's clear_caches()
# still forces a cold build per timed row, and a build for the SAME
# prefix over a DIFFERENT sf_dir replaces the entry (the catalog tables
# were just overwritten, so the old memo must die with them).
_INDEX_MEMO: dict = register_cache({})

# Query-internal materialization points of the admission paths (r15
# optimization): the gated batch, the exact-tier survivors, and the
# batch band/shingle relations are each consumed by SEVERAL downstream
# joins, and without a persist Catalyst expands every consumer into its
# own copy of the whole gate chain (the committed before-plan shows the
# batch documents scan 20x in one query). All are BATCH-sized (the
# docstrings' scale argument), persisted MEMORY_AND_DISK inside the
# timed query, and enrolled here so bench.py's per-row clear_caches()
# unpersists them — nothing survives into the next timed row.
_ADMIT_SCRATCH: dict = register_cache({})


def _admit_scratch(spark: SparkSession, tag: str, df: DataFrame) -> DataFrame:
    return scratch_persist(
        _ADMIT_SCRATCH, (spark.sparkContext.applicationId, tag), df
    )


def admission_index_names(prefix: str = "admission") -> dict[str, str]:
    return {part: f"{prefix}_{part}" for part in _ADMISSION_PARTS}


def build_admission_index(
    spark: SparkSession,
    sf_dir: str,
    prefix: str = "admission",
    n_buckets: int = 8,
) -> dict[str, str]:
    """Materialize the standing-corpus admission index (one-time cost,
    amortized over every subsequent ingest). ``n_buckets`` sizes the
    bucketed tables; at 100 TB it tracks the cluster's target
    partition count (thousands), here it matches the test fleet.

    r16 build shape (guide §2.6 / §1.2): ONE spread+persisted tokenize
    pass computes both shingle widths for every table, and the five
    writes are submitted dependency-ordered from a small thread pool —
    eval_grams ∥ fps first, then bands ∥ shingles ∥ bloom the moment
    fps lands (overlapping the eval_grams tail; no wait-all barriers,
    no second tokenize pass, no count() between phases). Expressions
    are identical per width, so every table is byte-for-byte what the
    serial build wrote."""
    import shutil
    from urllib.parse import urlparse

    from benchviz_spark.concurrency import subtree_pool

    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
    )
    from benchviz_spark.operators.relational_ext import bloom_bitmap
    from benchviz_spark.sources.tables import spread

    names = admission_index_names(prefix)
    memo_key = (spark.sparkContext.applicationId, prefix)
    hit = _INDEX_MEMO.get(memo_key)
    if hit is not None and hit["sf_dir"] == sf_dir:
        return hit["names"]
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")

    # ONE spread+persisted tokenize pass over (standing ∪ eval-carve)
    # documents computing BOTH shingle widths feeds EVERY index table
    # (r16, guide §1.2 "fewer passes"; extends r15's shingle-once: the
    # r15 build still tokenized the lake twice — once at n=NGRAM for
    # the eval/fps phase, once at n=3 for the bands/shingles phase
    # behind a count() barrier). The n=4 and n=3 shingle expressions
    # are the per-width `_shingles` trees verbatim over one token
    # split, so every consumer sees byte-identical arrays; the posting
    # side is pre-filtered to standing sources exactly as before
    # (contamination is a per-document aggregate, so flags for the
    # docs fps actually gates are identical whether or not
    # incoming-source docs are scored alongside them).
    from benchviz_spark.operators.dedup import _norm_text, _shingles

    pre = docs.filter(
        F.col("source").rlike(_INCR_SEEN_RE) | eval_split(F.col("doc_id"))
    )
    toks = F.split(_norm_text(F.col("text")), " ")
    sh_all = spread(
        spark,
        pre.select(
            "doc_id",
            _shingles(toks, NGRAM).alias("s4"),
            _shingles(toks, 3).alias("s3"),
        ),
    ).persist()
    sh_all.count()
    ev = (
        sh_all.filter(eval_split(F.col("doc_id")))
        .filter(F.size("s4") > 0)
        .select(F.explode("s4").alias("g"))
        .distinct()
    )

    def build_eval_grams() -> None:
        # Decontam's standing asset: the eval suite is a fixed
        # lake-wide carve (eval_split over doc_id), independent of
        # which sources have been ingested, so its gram set is
        # index-time state.
        spark.sparkContext.setJobDescription(
            f"admission index: {names['eval_grams']}"
        )
        ev.write.mode("overwrite").saveAsTable(names["eval_grams"])

    def build_fps() -> None:
        # Standing curated survivors: identical gates + exact dedup to
        # incremental_base_corpus (lowest doc_id per fingerprint wins;
        # the contamination flags replay _incremental_gated's exactly —
        # same eval gram set, same per-doc aggregate, same THRESHOLD —
        # over the persisted shingle pass, pinned by the shared golden
        # oracle and test_curation's indexed/in-session equivalence).
        spark.sparkContext.setJobDescription(f"admission index: {names['fps']}")
        flagged = (
            sh_all.filter(~eval_split(F.col("doc_id")))
            .filter(F.size("s4") > 0)
            .select(
                "doc_id",
                F.size("s4").cast("long").alias("n_shingles"),
                F.explode("s4").alias("g"),
            )
            .join(F.broadcast(ev), "g")
            .groupBy("doc_id", "n_shingles")
            .agg(F.count("*").alias("n_contaminated"))
            .filter(
                F.round(F.col("n_contaminated") / F.col("n_shingles"), 6)
                >= THRESHOLD
            )
            .select("doc_id")
        )
        standing_gated = (
            docs.filter(
                F.col("source").rlike(_INCR_SEEN_RE)
                & (~eval_split(F.col("doc_id")))
                & (F.col("n_chars") >= MIN_CHARS)
            )
            .join(flagged, "doc_id", "left_anti")
            .withColumn("fp", F.md5(_norm_text(F.col("text"))))
        )
        rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        curated = (
            standing_gated.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("doc_id", "fp")
        )
        curated.write.mode("overwrite").bucketBy(n_buckets, "fp").saveAsTable(
            names["fps"]
        )

    def build_bands(sh3: DataFrame) -> None:
        spark.sparkContext.setJobDescription(f"admission index: {names['bands']}")
        band_buckets(spark, sf_dir, sh=sh3).write.mode("overwrite").bucketBy(
            n_buckets, "band", "bucket"
        ).saveAsTable(names["bands"])

    def build_shingles(sh3: DataFrame) -> None:
        # hashed_shingled_documents' exact projection, over the shared
        # shingle pass
        spark.sparkContext.setJobDescription(
            f"admission index: {names['shingles']}"
        )
        sh3.select(
            "doc_id",
            F.array_distinct(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
            ).alias("hs"),
        ).write.mode("overwrite").bucketBy(n_buckets, "doc_id").saveAsTable(
            names["shingles"]
        )

    def build_bloom() -> None:
        spark.sparkContext.setJobDescription(f"admission index: {names['bloom']}")
        bloom_bitmap(
            spark.table(names["fps"]).select(F.xxhash64("fp").alias("pk")), "pk"
        ).write.mode("overwrite").saveAsTable(names["bloom"])

    # Dependency-ordered submissions instead of the r15 two-phase
    # barriers ([ev ∥ fps] wait-all, sh3 count, [bands ∥ shingles ∥
    # bloom] wait-all): the bands/shingles/bloom writes depend only on
    # fps, so they start the moment fps lands — overlapping with the
    # eval_grams tail — and the second tokenize pass + its count()
    # barrier are gone entirely (bands/shingles read the combined pass
    # semi-joined to the survivors).
    with subtree_pool(3) as pool:
        f_ev = pool.submit(build_eval_grams)
        f_fps = pool.submit(build_fps)
        f_fps.result()
        curated_ids = spark.table(names["fps"]).select("doc_id")
        sh3 = sh_all.join(curated_ids, "doc_id", "left_semi").select(
            "doc_id", F.col("s3").alias("shingles")
        )
        for fut in [
            pool.submit(build_bands, sh3),
            pool.submit(build_shingles, sh3),
            pool.submit(build_bloom),
            f_ev,
        ]:
            fut.result()
    sh_all.unpersist()
    spark.sparkContext.setJobDescription(None)
    memo_put(_INDEX_MEMO, memo_key, {"sf_dir": sf_dir, "names": names})
    return names


def _indexed_admit_vs_standing(
    spark: SparkSession,
    sf_dir: str,
    prefix: str = "admission",
    within_batch_rn: bool = True,
    docs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Steps (1)-(3) of index-mediated admission — hygiene gates, exact
    tier vs the standing fingerprints, near-dup tier vs the standing
    band postings — shared by the full incremental consume and the
    per-document admission delta. Returns (b3, bands_batch, sh_batch)
    so the full path can run its within-batch step (4) on the same
    batch-sized relations. ``within_batch_rn=False`` skips the
    lowest-doc_id-wins exact dedup WITHIN the batch: the per-document
    decision the streaming gate mirrors. ``docs`` overrides the table
    scan with an already-materialized documents relation — the
    foreachBatch admission sink hands each MICRO-BATCH through here,
    so one decision function serves batch, drain, and production
    stream."""
    from benchviz_spark.operators.dedup import (
        _INCR_SEEN_RE,
        band_buckets,
        shingled_documents,
    )
    from benchviz_spark.operators.relational_ext import bloom_might_contain

    from benchviz_spark.sources.tables import spread

    names = admission_index_names(prefix)
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    # spread() the batch once for every probe-side chain below: the
    # gate shingles, the band buckets and the hashed shingle store all
    # run heavy per-row work directly on this relation, and a one-split
    # local scan would serialize each of them onto a single task (the
    # build side already spreads its sh3 pass for the same reason).
    # No-op on a many-split production micro-batch.
    batch_docs = spread(
        spark, docs.filter(~F.col("source").rlike(_INCR_SEEN_RE))
    )

    # (1) hygiene gates, batch-sized: eval carve + length are scan
    # filters; contamination joins the batch's grams against the
    # broadcast standing eval-gram set (same rounding as
    # decontam_eval_overlap so the flag boundary is bit-identical).
    ev = spark.table(names["eval_grams"])
    sh4 = shingled_documents(spark, sf_dir, n=NGRAM, docs=batch_docs).filter(
        F.size("shingles") > 0
    )
    flagged = (
        sh4.select(
            "doc_id",
            F.size("shingles").cast("long").alias("n_shingles"),
            F.explode("shingles").alias("g"),
        )
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
        .filter(
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6)
            >= THRESHOLD
        )
        .select("doc_id")
    )
    batch = (
        batch_docs.filter(
            (~eval_split(F.col("doc_id"))) & (F.col("n_chars") >= MIN_CHARS)
        )
        .join(flagged, "doc_id", "left_anti")
        .withColumn("fp", F.md5(_norm_text(F.col("text"))))
    )
    # The gated batch feeds both bloom-probe arms (and through them
    # every later tier): project to the five columns the tiers read
    # (guide §2.3 — text never crosses another exchange) and persist,
    # so the gate chain executes once per query instead of once per
    # consumer copy.
    tag = f"{sf_dir}|{prefix}|{within_batch_rn}|{docs is not None}"
    batch = _admit_scratch(
        spark, f"{tag}|batch",
        batch.select("doc_id", "lang", "source", "n_chars", "fp"),
    )

    # (2) exact tier: broadcast the PERSISTED bloom bitset; only
    # bloom-positive rows reach the anti join against the fp-bucketed
    # index (corpus side co-located, batch side shuffles).
    bitmap = spark.table(names["bloom"])
    probed = batch.crossJoin(F.broadcast(bitmap)).withColumn(
        "maybe_seen", bloom_might_contain(F.xxhash64("fp"))
    )
    old_fps = spark.table(names["fps"]).select("fp")
    new_vs_old = probed.filter(~F.col("maybe_seen")).unionByName(
        probed.filter(F.col("maybe_seen")).join(old_fps, "fp", "left_anti")
    )
    if within_batch_rn:
        rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        new_vs_old = new_vs_old.withColumn("rn", rn).filter(F.col("rn") == 1)
    # b2 feeds the near-dup semi join AND the final anti join (and the
    # full path's within-batch tier on top) — persist the batch-sized
    # survivor set once.
    b2 = _admit_scratch(
        spark, f"{tag}|b2",
        new_vs_old.select("doc_id", "lang", "source", "n_chars"),
    )

    # (3) near-dup tier vs the standing corpus: batch bands (batch-
    # sized minhash) equi-join the (band, bucket)-bucketed postings;
    # candidates verify by exact Jaccard against the doc_id-bucketed
    # shingle store — only band-colliding old_ids are ever read.
    # Both relations are re-read by the full path's within-batch tier;
    # persisted batch-sized, cleared per bench row. ONE n=3 batch
    # shingle pass (persisted) feeds both the minhash bands and the
    # hashed verification shingles — r15: each previously re-ran the
    # normalize+split+shingle chain over the batch.
    sh3_batch = _admit_scratch(
        spark,
        f"{tag}|sh3",
        shingled_documents(spark, sf_dir, docs=batch_docs),
    )
    bands_batch = _admit_scratch(
        spark, f"{tag}|bands", band_buckets(spark, sf_dir, sh=sh3_batch)
    )
    new_b = bands_batch.join(b2.select("doc_id"), "doc_id", "left_semi")
    old_b = spark.table(names["bands"])
    cand_old = (
        new_b.select(F.col("doc_id").alias("new_id"), "band", "bucket")
        .join(
            old_b.select(F.col("doc_id").alias("old_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    sh_batch = _admit_scratch(
        spark,
        f"{tag}|sh",
        sh3_batch.select(
            "doc_id",
            F.array_distinct(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
            ).alias("hs"),
        ),
    )
    left = sh_batch.select(F.col("doc_id").alias("new_id"), F.col("hs").alias("sa"))
    right = spark.table(names["shingles"]).select(
        F.col("doc_id").alias("old_id"), F.col("hs").alias("sb")
    )
    jac = jaccard_of("sa", "sb")
    drop_vs_old = (
        cand_old.join(left, "new_id")
        .join(right, "old_id")
        .filter(jac >= 0.5)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    b3 = b2.join(drop_vs_old, "doc_id", "left_anti")
    return b3, bands_batch, sh_batch


def admission_delta_indexed(
    spark: SparkSession, sf_dir: str, prefix: str = "admission"
) -> DataFrame:
    """The PER-DOCUMENT admission delta against the durable index:
    every batch document admitted or dropped on its own content versus
    the frozen standing corpus — no within-batch tiers. This is the
    decision surface a streaming ingest gate evaluates per arriving
    document (streaming/windows.py stream_dedup_admission is the
    stream twin; both hash against ``_admission_delta_oracle``), and
    the batch form of 'the epoch index is the single admission source
    of truth'."""
    b3, _, _ = _indexed_admit_vs_standing(
        spark, sf_dir, prefix, within_batch_rn=False
    )
    return _with_split(b3).select(
        "doc_id", "lang", "source", "n_chars", "split"
    )


def incremental_batch_indexed(
    spark: SparkSession, sf_dir: str, prefix: str = "admission"
) -> DataFrame:
    """``curation_incremental_batch`` consuming the DURABLE index
    instead of rebuilding the standing side in-session: identical
    admission semantics (same gates, same two dedup tiers, same
    within-batch components, same splits — equivalence pinned in
    tests/test_curation.py and by the shared golden oracle), but every
    per-ingest relation is batch-sized. The only corpus-sized reads
    are the bucketed index tables, which join WITHOUT moving: the
    batch side shuffles to the index's bucketing, the corpus side is
    scanned in place."""
    from benchviz_spark.operators.dedup import min_label_components

    b3, bands_batch, sh_batch = _indexed_admit_vs_standing(
        spark, sf_dir, prefix, within_batch_rn=True
    )
    # b3 is consumed three times below (band semi join, component
    # universe, final survivor semi join) — persist the batch-sized
    # survivor set so the vs-standing tiers run once.
    b3 = _admit_scratch(spark, f"{sf_dir}|{prefix}|b3full", b3)
    jac = jaccard_of("sa", "sb")

    # (4) within-batch near-dups: unchanged from the in-session path —
    # it was always batch-sized.
    b3_b = bands_batch.join(b3.select("doc_id"), "doc_id", "left_semi")
    cand_nn = (
        b3_b.select(F.col("doc_id").alias("left_id"), "band", "bucket")
        .join(
            b3_b.select(F.col("doc_id").alias("right_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    lshj = sh_batch.select(F.col("doc_id").alias("left_id"), F.col("hs").alias("sa"))
    rshj = sh_batch.select(F.col("doc_id").alias("right_id"), F.col("hs").alias("sb"))
    pairs_nn = (
        cand_nn.join(lshj, "left_id")
        .join(rshj, "right_id")
        .filter(jac >= 0.5)
        .select("left_id", "right_id")
    )
    comp = min_label_components(spark, pairs_nn, b3.select("doc_id"))
    minima = comp.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    delta = b3.join(minima, "doc_id", "left_semi")
    return _with_split(delta).select(
        "doc_id", "lang", "source", "n_chars", "split"
    )


@query("curation_incremental_batch_indexed", oracle=_incremental_oracle())
def curation_incremental_batch_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental admission THROUGH the durable index: build the
    standing-corpus index (the one-time epoch cost), then admit the
    batch against it. Shares ``curation_incremental_batch``'s golden
    oracle — the driver hash-checks that index-mediated admission
    reproduces the in-session delta byte-for-byte. The scale story
    (build once, ingest many) is measured separately by
    scripts/incremental_admission_probe.py's indexed mode, where the
    build is excluded and the fixed-batch corpus-x10 ratio must land
    ~1.0 (vs x1.61 for the in-session rebuild)."""
    build_admission_index(spark, sf_dir)
    return incremental_batch_indexed(spark, sf_dir)


@query("curation_admission_delta", oracle=_admission_delta_oracle())
def curation_admission_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document admission against the durable index: batch
    documents admitted or dropped purely on their own content versus
    the standing corpus (no within-batch tiers). The batch twin of
    streaming/windows.py's ``stream_dedup_admission`` — both hash
    against the same oracle, making the epoch index the single
    admission source of truth across batch and stream (VERDICT r14
    #5). Output is ordered-insensitive: the driver sorts."""
    build_admission_index(spark, sf_dir)
    return admission_delta_indexed(spark, sf_dir)
