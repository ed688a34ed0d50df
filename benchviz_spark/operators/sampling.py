"""Deterministic sampling / dataset-split operators over ``documents``.

Training-data-pipeline tier: reproducible train/val/test splits and
per-stratum downsampling. The reference has no analogue (it is a
benchmark-log visualizer); these exist for the engine's 100-TB
LLM-pipeline brief.

Scale design — why hash buckets and not ``df.sample``/``sampleBy``:

- ``sample()`` draws from a per-partition RNG: the selected set changes
  whenever partitioning, row order, or cluster layout changes. A
  training split must be a PURE FUNCTION of the record key so that (a)
  re-runs, backfills, and incremental appends land every document in
  the same split forever, and (b) two pipelines (or two engines — see
  the DuckDB oracles) agree on the split without coordination.
- ``bucket = int(md5(salt || key)[:8], 16) % 100`` is that pure
  function. md5 here is a spreading hash, not crypto; the 8-hex-digit
  prefix (32 bits) is uniform and cheap, and both Spark (``conv``) and
  DuckDB (``::BIGINT`` on a 0x literal) can decode it — which is what
  makes the operator oracle-checkable cross-engine.
- Everything is a narrow per-row projection: no shuffle, no sample
  pre-scan, no driver-side state. At 100 TB the split adds zero stages
  to whatever reads it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

# train/val/test cut points on the 0..99 bucket line
TRAIN_UPTO = 80
VAL_UPTO = 90

# per-language keep-rate (percent) for the stratified downsample:
# overrepresented strata are cut hard, scarce ones kept whole — the
# usual language-rebalancing move before pretraining.
STRATUM_RATES = {"en": 25, "de": 60, "fr": 60, "es": 60, "zh": 100}
_DEFAULT_RATE = 50


def hash_bucket(key: Column, salt: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt || key)."""
    hexpfx = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.pmod(F.conv(hexpfx, 16, 10).cast("bigint"), F.lit(n_buckets))


def _bucket_sql(salt: str, key_expr: str = "doc_id", n_buckets: int = 100) -> str:
    """The DuckDB spelling of hash_bucket, for oracles."""
    return (
        f"(('0x' || substr(md5('{salt}' || {key_expr}::VARCHAR), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


@query(
    "sample_split_documents",
    oracle=f"""
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < {TRAIN_UPTO} THEN 'train'
                WHEN bucket < {VAL_UPTO} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang, {_bucket_sql('split:')} AS bucket
      FROM documents
    )
    """,
)
def sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's train/val/test assignment (80/10/10). Pure
    projection of the key — stable under reruns, appends, and
    repartitioning, and identical across engines (the oracle recomputes
    it independently in DuckDB)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "split:")
    split = (
        F.when(F.col("bucket") < TRAIN_UPTO, "train")
        .when(F.col("bucket") < VAL_UPTO, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).withColumn(
        "split", split
    )


@query(
    "sample_stratified_documents",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source, {_bucket_sql('strat:')} AS bucket
      FROM documents
    )
    WHERE bucket < CASE lang
      {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATUM_RATES.items()))}
      ELSE {_DEFAULT_RATE} END
    """,
)
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (sampleBy semantics, but a
    pure key function instead of an RNG): language x keeps
    STRATUM_RATES[x] percent of its documents, chosen by hash bucket so
    the kept set is reproducible. The rate lookup is a CASE expression
    — no join, no per-stratum pass, one narrow scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), "strat:")
    rate = F.lit(_DEFAULT_RATE)
    for lang_val, pct in sorted(STRATUM_RATES.items()):
        rate = F.when(F.col("lang") == lang_val, pct).otherwise(rate)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (the multilingual-pretraining
# rebalancing scheme: keep probability proportional to c^alpha with
# alpha < 1, so large sources are down-weighted relative to their raw
# share). alpha = 1/2 deliberately: sqrt is exactly specified by IEEE
# 754 (pow is not), so Spark and DuckDB compute bit-identical weights.
# ---------------------------------------------------------------------------
TEMP_ALPHA_DESC = "alpha=0.5 (sqrt)"
TEMP_KEEP_SHARE = 0.5  # rebalanced corpus targets half the raw corpus


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    tot AS (SELECT sum(sqrt(n_docs)) AS z, sum(n_docs) AS n FROM c),
    rates AS (
      SELECT source, n_docs,
             round(sqrt(n_docs) / z, 6) AS mix_weight,
             least(100, CAST(floor(round(
               100 * {TEMP_KEEP_SHARE} * n * (sqrt(n_docs) / z) / n_docs, 6))
               AS BIGINT)) AS rate_pct
      FROM c CROSS JOIN tot
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           r.mix_weight, r.rate_pct,
           CAST(count(*) FILTER (
             WHERE {_bucket_sql('temp:')} < r.rate_pct) AS BIGINT) AS n_kept
    FROM rates r JOIN documents d ON d.source = r.source
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature-rebalanced keep rates and realized kept
    counts: weight_s = sqrt(c_s)/sum(sqrt(c)), keep rate =
    min(1, N_target * weight_s / c_s) quantized to integer percent, and
    the kept set chosen by the same pure md5 bucket as every sampler
    here — reproducible across engines, reruns, and appends.

    Scale: the per-source count table is tiny (sources, not documents),
    so the rate computation is a broadcast-sized cross join; the kept
    filter is the usual narrow bucket projection. The integer-percent
    quantization (after round-6) exists so the keep decision is stable
    cross-engine: sqrt is IEEE-exact in both engines, and the only
    float summation (sum of a handful of sqrt values) is rounded to 6
    decimals before the floor."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = c.agg(
        F.sum(F.sqrt("n_docs")).alias("z"), F.sum("n_docs").alias("n")
    )
    rates = c.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.sqrt("n_docs") / F.col("z"), 6).alias("mix_weight"),
        F.least(
            F.lit(100),
            F.floor(
                F.round(
                    100
                    * TEMP_KEEP_SHARE
                    * F.col("n")
                    * (F.sqrt("n_docs") / F.col("z"))
                    / F.col("n_docs"),
                    6,
                )
            ),
        )
        .cast("long")
        .alias("rate_pct"),
    )
    kept = (
        docs.select("doc_id", "source")
        .join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "mix_weight", "rate_pct")
        .agg(
            F.sum(
                (hash_bucket(F.col("doc_id"), "temp:") < F.col("rate_pct")).cast(
                    "long"
                )
            ).alias("n_kept")
        )
    )
    return kept.select(
        "source", F.col("n_docs").cast("long"), "mix_weight", "rate_pct", "n_kept"
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Fixed-size per-stratum sample: deterministic "reservoir" via hash
# ordering (k smallest md5 values win — a pure function of the key, so
# the sample is stable under reruns/appends/engines like every sampler
# here, unlike a true streaming reservoir whose result depends on
# arrival order).
# ---------------------------------------------------------------------------
RESERVOIR_K = 20


@query(
    "sample_reservoir_per_source",
    oracle=f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('res:' || doc_id::VARCHAR), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {RESERVOIR_K}
    """,
)
def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly K documents per source (fewer if the source is smaller),
    chosen as the K smallest md5('res:' || doc_id) values — the
    deterministic equivalent of per-stratum reservoir sampling. Because
    the order key is a pure function of doc_id, appending data can only
    displace winners by genuinely hashing lower, never reshuffle them.

    Scale: one shuffle on source; the rank window sorts within each
    source partition. A skewed giant source would use the same
    two-stage top-K as the zipf rank (per-bucket top-K then merge K
    winners) — K-bounded state either way."""
    docs = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string")))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(order_key, F.col("doc_id"))
    )
    return (
        docs.select("doc_id", "source", rk.alias("rk"))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis): one pass,
# K-bounded state, deterministic.
# ---------------------------------------------------------------------------
ES_K = 50


@query(
    "sample_weighted_reservoir_es",
    oracle=f"""
    SELECT doc_id, source, w,
           round(k, 6) AS sample_key
    FROM (
      SELECT doc_id, source, CAST(length(text) AS BIGINT) AS w,
             exp(ln((('0x' || substr(md5('es:' || doc_id::VARCHAR), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0) / length(text)) AS k
      FROM documents
    )
    ORDER BY k DESC, doc_id
    LIMIT {ES_K}
    """,
)
def sample_weighted_reservoir_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} documents under the Efraimidis-Spirakis weighted
    reservoir scheme: each doc gets key u^(1/w) (u = md5-derived
    uniform, w = text length) and the K largest keys win — a sample
    WITHOUT replacement where inclusion probability tracks weight,
    from ONE pass. The md5 uniform replaces the RNG, so the sample is
    a pure function of doc_id: reruns, engine changes, and appends
    agree on every key (the same determinism contract as every
    sampler in this module).

    Scale: the classic streaming form keeps a K-item heap; the Spark
    lowering is a global top-K, which Catalyst executes as
    TakeOrdered — per-partition K winners, then a K*partitions driver
    merge — so state is K-bounded everywhere, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("es:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = F.length("text").cast("long")
    key = F.exp(F.log(u) / F.length("text"))
    return (
        docs.select(
            "doc_id",
            "source",
            w.alias("w"),
            key.alias("k"),
        )
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(ES_K)
        .select("doc_id", "source", "w", F.round("k", 6).alias("sample_key"))
    )


# ---------------------------------------------------------------------------
# Exact-k per-stratum sampling: fixed-SIZE samples (eval sets, human
# review batches, per-language probes) where the rate-based stratified
# sampler's binomial count variance is unacceptable.
# ---------------------------------------------------------------------------
EXACT_K = 50


@query(
    "sample_stratified_exact_k",
    oracle=f"""
    SELECT doc_id, lang, pick FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('exk:' || doc_id::VARCHAR), doc_id
             ) AS BIGINT) AS pick
      FROM documents
    ) WHERE pick <= {EXACT_K}
    """,
)
def sample_stratified_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY min(k, stratum size) documents per language, chosen by
    md5 key order — deterministic (same set on every rerun, append, or
    repartition) and engine-agreed (the oracle replays the same hash
    order in DuckDB). The rate-based ``sample_stratified_documents``
    gives each stratum a binomially-noisy COUNT; this gives a fixed
    one.

    Scale: the rank-filter window rides Spark's WindowGroupLimit
    rank-pushdown — each input partition pre-truncates to its local
    top-k per stratum BEFORE the exchange, so the shuffle carries at
    most k * n_partitions rows per language, not the corpus (asserted
    in tests/test_plans.py). The md5 sort key is uniform, so per-lang
    order is skew-free even when the lang column itself is skewed."""
    docs = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.lit("exk:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy(order_key, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang")
        .withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= EXACT_K)
    )


# ---------------------------------------------------------------------------
# Quality-ranked selection: keep each source's best-K documents.
# ---------------------------------------------------------------------------
QUALITY_TOP_K = 20


@query(
    "sample_quality_topk_per_source",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, source,
             len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
               AS n_tokens,
             len(list_distinct(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')))
               AS n_distinct
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(n_distinct::DOUBLE / n_tokens, 6) AS distinct_ratio,
             CAST(n_tokens AS BIGINT) AS n_tokens
      FROM feat WHERE n_tokens >= 20
    )
    SELECT source, doc_id, distinct_ratio, n_tokens, pick FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY distinct_ratio DESC, doc_id) AS BIGINT) AS pick
      FROM scored
    ) WHERE pick <= {QUALITY_TOP_K}
    """,
)
def sample_quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each source's top-{QUALITY_TOP_K} documents by lexical diversity
    (distinct-token ratio, the text_quality_scores feature), minimum 20
    tokens — best-of-K selection, the curation move between "keep
    everything above a gate" (stream_quality_gopher_gate) and "sample
    at a rate" (sample_temperature_mix): when a mixture recipe wants a
    FIXED budget of the best examples per source, this is the query
    that fills it.

    Scale: same WindowGroupLimit shape as sample_stratified_exact_k —
    the rank filter pre-truncates each input partition to its local
    top-K per source before the exchange, so the shuffle carries at
    most K * n_partitions rows per source, not the corpus. The ratio
    rounds to 6 places on both engines before ranking and ties break
    by doc_id, so the selection is engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " ")
    n_tokens = F.size(t)
    ratio = F.round(
        F.size(F.array_distinct(t)).cast("double") / n_tokens, 6
    )
    scored = (
        docs.select(
            "doc_id",
            "source",
            ratio.alias("distinct_ratio"),
            n_tokens.cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= 20)
    )
    w = W.partitionBy("source").orderBy(
        F.col("distinct_ratio").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= QUALITY_TOP_K)
        .select("source", "doc_id", "distinct_ratio", "n_tokens", "pick")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): score every raw
# document by how target-like its hashed-n-gram feature distribution
# is, then Gumbel-top-K sample proportionally to the importance weight.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 64  # hashed unigram feature space (paper uses 10k; 64 keeps
#                    the oracle replay readable — the plan is bucket-count
#                    independent: the lr table is always a tiny broadcast)
DSIR_TARGET_SOURCES = ("src1", "src2", "src3")  # the "target domain" slice
DSIR_K = 80  # resampled corpus size


# Shared CTE chain: tokenize -> hashed-bucket counts for both
# distributions -> log-ratio table -> per-(doc, source) weight. Used by
# the batch resampler below AND the streamed admission gate
# (streaming/queries.py stream_dsir_gate), so batch == stream == oracle
# is a single SQL definition of the score.
_DSIR_SCORE_CTES = f"""
    tok AS (
      SELECT doc_id, source,
             {_bucket_sql('dsir:', 'term', DSIR_BUCKETS)} AS b
      FROM (
        SELECT doc_id, source,
               unnest(string_split(
                 lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '
               )) AS term
        FROM documents
      )
    ),
    raw AS (SELECT b, count(*) AS rc FROM tok GROUP BY b),
    tgt AS (
      SELECT b, count(*) AS tc FROM tok
      WHERE source IN {DSIR_TARGET_SOURCES} GROUP BY b
    ),
    tot AS (
      SELECT (SELECT sum(rc) FROM raw) AS rn,
             (SELECT sum(tc) FROM tgt) AS tn
    ),
    lr AS (
      SELECT raw.b,
             ln((coalesce(tgt.tc, 0) + 0.5) / (tot.tn + 0.5 * {DSIR_BUCKETS}))
           - ln((raw.rc + 0.5) / (tot.rn + 0.5 * {DSIR_BUCKETS})) AS lr
      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
    ),
    dw AS (
      SELECT tok.doc_id, tok.source, sum(lr.lr) AS logw
      FROM tok JOIN lr USING (b)
      GROUP BY 1, 2
    )"""


@query(
    "sample_importance_dsir",
    oracle=f"""
    WITH {_DSIR_SCORE_CTES},
    keyed AS (
      SELECT doc_id, source, logw,
             logw - ln(-ln(
               (('0x' || substr(md5('dsirg:' || doc_id::VARCHAR), 1, 8))::BIGINT
                + 0.5) / 4294967296.0
             )) AS sk
      FROM dw
    )
    SELECT doc_id, source,
           round(logw, 6) AS log_weight,
           round(sk, 6) AS sample_key
    FROM keyed
    ORDER BY sk DESC, doc_id
    LIMIT {DSIR_K}
    """,
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: estimate target and raw unigram
    distributions over a HASHED feature space (hash-bucketed tokens,
    the paper's hashed n-gram estimator), weight every raw document by
    its log likelihood-ratio sum, and draw a K-document sample with
    probability proportional to exp(weight) via the Gumbel-top-K
    trick — the md5-derived uniform replaces the RNG, so the sample is
    a pure function of doc_id (this module's determinism contract) and
    replays exactly in DuckDB.

    Scale design: the learned artifact is the {DSIR_BUCKETS}-row
    log-ratio table — two map-side-combinable bucket aggregations
    (target slice + full corpus) reduced to a broadcast that never
    grows with the corpus (at 10k buckets it is still ~80 KB). Scoring
    is then one broadcast join on the token stream and one partial-agg
    sum per doc_id — a single shuffle keyed by doc_id. Selection is
    Gumbel-top-K, which Catalyst plans as TakeOrdered: per-partition
    K winners, a K*partitions driver merge, never a global sort. No
    RNG, no driver-side model state, no second pass."""
    docs = load_table(spark, sf_dir, "documents")
    from benchviz_spark.operators.dedup import _norm_text

    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("term"),
    ).select(
        "doc_id", "source", hash_bucket(F.col("term"), "dsir:", DSIR_BUCKETS).alias("b")
    )
    # Both distributions from ONE tokenize pass: the target count is a
    # conditional sum inside the same bucket aggregation, so the
    # estimator costs one corpus scan + one 64-key shuffle, not two
    # scans per distribution. Totals reduce the 64-row result again —
    # off the corpus path entirely.
    is_tgt = F.col("source").isin(list(DSIR_TARGET_SOURCES))
    bt = tok.groupBy("b").agg(
        F.count("*").alias("rc"),
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("tc"),
    )
    nb = float(DSIR_BUCKETS)
    lr = bt.crossJoin(
        F.broadcast(bt.agg(F.sum("rc").alias("rn"), F.sum("tc").alias("tn")))
    ).select(
        "b",
        (
            F.log((F.col("tc") + 0.5) / (F.col("tn") + 0.5 * nb))
            - F.log((F.col("rc") + 0.5) / (F.col("rn") + 0.5 * nb))
        ).alias("lr"),
    )
    # source rides the doc_id grouping key (functionally dependent on
    # it) instead of a second corpus-sized join back to documents.
    dw = (
        tok.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("logw"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsirg:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = dw.select(
        "doc_id",
        "source",
        "logw",
        (F.col("logw") - F.log(-F.log(u))).alias("sk"),
    )
    return (
        keyed.orderBy(F.col("sk").desc(), "doc_id")
        .limit(DSIR_K)
        .select(
            "doc_id",
            "source",
            F.round("logw", 6).alias("log_weight"),
            F.round("sk", 6).alias("sample_key"),
        )
    )


def dsir_log_ratio_rows(spark: SparkSession, sf_dir: str) -> list[float]:
    """The FROZEN DSIR model: the dense {DSIR_BUCKETS}-entry log-ratio
    array, trained batch-side (one tokenize pass, identical math to the
    resampler above) and collected driver-side — bounded by the bucket
    count, never the corpus. Buckets no token hashed to take the
    all-smoothing value ln(rn + 0.5*B) - ln(tn + 0.5*B) (rc = tc = 0 in
    the estimator), so the array is total: a stream token can never
    miss. This is the artifact a streaming admission gate ships to
    executors as a literal (streaming/windows.py stream_dsir_gate)."""
    from benchviz_spark.operators.dedup import _norm_text

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(_norm_text(F.col("text")), " ")).alias("term"),
    ).select("source", hash_bucket(F.col("term"), "dsir:", DSIR_BUCKETS).alias("b"))
    is_tgt = F.col("source").isin(list(DSIR_TARGET_SOURCES))
    bt = tok.groupBy("b").agg(
        F.count("*").alias("rc"),
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("tc"),
    )
    rows = bt.collect()  # <= DSIR_BUCKETS rows
    rn = float(sum(r.rc for r in rows))
    tn = float(sum(r.tc for r in rows))
    import math

    half = 0.5 * DSIR_BUCKETS
    fill = math.log(0.5 / (tn + half)) - math.log(0.5 / (rn + half))
    out = [fill] * DSIR_BUCKETS
    for r in rows:
        out[int(r.b)] = math.log((r.tc + 0.5) / (tn + half)) - math.log(
            (r.rc + 0.5) / (rn + half)
        )
    return out
