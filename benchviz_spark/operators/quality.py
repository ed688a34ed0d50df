"""Data-quality / profiling operators over ``documents`` (training-data
pipeline tier, alongside dedup/text_analysis/sampling).

The reference has no analogue (it is a benchmark-log visualizer); these
are the remaining table-stakes ops of a pretraining data pipeline: PII
redaction, column profiling, length-distribution histograms, and
weighted source mixing.

Scale design:

- Everything here is a narrow per-row projection or a single map-side-
  combined aggregation — no joins, no windows, no Python. Redaction
  regexes and histogram bucketing run inside whole-stage codegen.
- ``profile_documents_columns`` computes every per-column metric in ONE
  corpus pass (a single aggregate row, unpivoted with ``stack``) rather
  than one scan per profiled column.
- ``sample_weighted_mix`` reuses the pure-function md5 bucket from
  :mod:`benchviz_spark.operators.sampling`: the kept set is a
  deterministic function of (doc_id, source weight), so re-runs and
  incremental appends mix identically with zero coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchviz_spark.operators.dedup import _norm_text
from benchviz_spark.operators.sampling import _bucket_sql, hash_bucket
from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

# Conservative patterns that parse identically under Java regex (Spark)
# and RE2 (DuckDB) — the cross-engine oracle is also a regex-dialect
# compatibility check.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def redact_text(col: F.Column) -> F.Column:
    """Emails, then IPv4s, then phone-shaped numbers replaced by typed
    placeholder tokens (ordering matters: an IPv4 must not be half-eaten
    by the phone pattern)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


@query(
    "quality_redact_pii",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)  AS n_ips,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def quality_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII hit counts + an md5 of the redacted text (the
    full redacted body stays distributed; the hash makes the transform
    value-checkable without shipping bodies through the compare)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redact_text(F.col("text"))).alias("redacted_md5"),
    )


@query(
    "quality_profile_documents",
    oracle="""
    SELECT 'lang' AS column_name,
           count(*) - count(lang)              AS n_nulls,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct,
           min(lang)                            AS min_value,
           max(lang)                            AS max_value
    FROM documents
    UNION ALL
    SELECT 'source', count(*) - count(source),
           CAST(count(DISTINCT source) AS BIGINT),
           min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*) - count(n_chars),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           min(n_chars)::VARCHAR, max(n_chars)::VARCHAR
    FROM documents
    """,
)
def quality_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null count / distinct count / min / max) for the
    catalogable columns, in ONE corpus pass: a single aggregate row of
    3 x 4 metrics, unpivoted to (column_name, metrics) rows with stack.
    The naive per-column formulation scans the table once per column —
    at 100 TB the difference between one job and three."""
    docs = load_table(spark, sf_dir, "documents")
    row = docs.agg(
        *[
            m
            for c in ("lang", "source", "n_chars")
            for m in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
                F.countDistinct(c).alias(f"{c}_distinct"),
                F.min(c).cast("string").alias(f"{c}_min"),
                F.max(c).cast("string").alias(f"{c}_max"),
            )
        ]
    )
    stack = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max"
        for c in ("lang", "source", "n_chars")
    )
    return row.selectExpr(
        f"stack(3, {stack}) AS (column_name, n_nulls, n_distinct, min_value, max_value)"
    )


HIST_BIN_WIDTH = 100


@query(
    "quality_length_histogram",
    oracle=f"""
    SELECT (n_chars // {HIST_BIN_WIDTH}) * {HIST_BIN_WIDTH} AS bin_lo,
           count(*)     AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY 1
    """,
)
def quality_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in fixed-width bins — the standard
    pre-filter diagnostic before length cutoffs. One map-side-combined
    aggregation; output is histogram-sized, not corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    bin_lo = (F.floor(F.col("n_chars") / HIST_BIN_WIDTH) * HIST_BIN_WIDTH).alias(
        "bin_lo"
    )
    return docs.groupBy(bin_lo).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# Weighted mixing: keep-rate (percent) per source, derived from the
# source's numeric suffix so both engines compute it from the data
# itself (a real pipeline would join a weights table; a deterministic
# formula keeps the oracle self-contained).
_MIX_SALT = "mix-v1"


def _mix_rate_sql(src: str = "source") -> str:
    return f"(20 + 4 * (regexp_extract({src}, '\\d+$')::BIGINT % 20))"


@query(
    "sample_weighted_mix",
    oracle=f"""
    SELECT source,
           CAST({_mix_rate_sql()} AS BIGINT) AS rate_pct,
           count(*) FILTER (
             WHERE {_bucket_sql(_MIX_SALT)} < {_mix_rate_sql()}
           ) AS n_kept,
           count(*) AS n_total
    FROM documents
    GROUP BY source
    """,
)
def sample_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted mixing (the 'data recipe' step of pretraining
    set construction): each source keeps rate_pct% of its documents,
    selected by the same pure md5-bucket function the split/stratified
    samplers use — deterministic across re-runs, engines, and
    partitioning. The per-row keep decision is a narrow projection; the
    per-source report is one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        20 + 4 * (F.regexp_extract("source", r"\d+$", 0).cast("bigint") % 20)
    ).alias("rate_pct")
    kept = (hash_bucket(F.col("doc_id"), _MIX_SALT) < F.col("rate_pct")).cast("long")
    return (
        docs.select("doc_id", "source", rate)
        .groupBy("source", "rate_pct")
        .agg(
            F.sum(kept).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@query(
    "quality_repetition_metrics",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(t) AS n_words,
             round(len(list_distinct(t))::DOUBLE / len(t), 6) AS distinct_word_ratio,
             CASE WHEN len(t) >= 2
                  THEN round(1.0 - len(list_distinct(list_transform(
                         range(1, len(t)), i -> t[i] || ' ' || t[i+1]
                       )))::DOUBLE / (len(t) - 1), 6)
                  ELSE 0.0 END AS dup_2gram_frac,
             t
      FROM tok
    ),
    freq AS (
      SELECT doc_id, w, count(*) AS wc
      FROM (SELECT doc_id, unnest(t) AS w FROM base)
      GROUP BY 1, 2
    ),
    tops AS (SELECT doc_id, max(wc) AS max_wc FROM freq GROUP BY 1)
    SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words, b.distinct_word_ratio,
           round(t.max_wc::DOUBLE / b.n_words, 6) AS top_word_frac, b.dup_2gram_frac
    FROM base b JOIN tops t USING (doc_id)
    """,
)
def quality_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters per document: distinct-word
    ratio, most-frequent-word share, and duplicated-2-gram fraction —
    the signals that catch boilerplate and degenerate repetition.

    Scale design: the ratio columns are pure narrow array math inside
    the scan projection (``array_distinct`` / ``zip_with`` over shifted
    slices — no free column refs inside lambdas, see dedup._shingles).
    Only the top-word share needs per-word frequencies; that path is
    explode + two-level hash aggregation, and because a document's
    exploded words stay in one partition, map-side combine collapses the
    shuffle to one row per distinct (doc, word) — the wire carries the
    vocabulary of each document, never its token stream."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(_norm_text(F.col("text")), " ")
    sz = F.size(t)
    g2 = F.zip_with(
        F.slice(t, 1, sz - 1),
        F.slice(t, 2, sz - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    # Metrics land in a projection BELOW the explode: a single select
    # mixing explode(t) with these expressions plans as
    # Generate -> Project, recomputing every array expression once per
    # TOKEN row (O(len^2) per doc, verified in explain). Two selects
    # keep them per-document.
    narrow = docs.select(
        "doc_id",
        sz.cast("long").alias("n_words"),
        F.round(F.size(F.array_distinct(t)) / sz, 6).alias("distinct_word_ratio"),
        F.when(
            sz >= 2,
            F.round(F.lit(1.0) - F.size(F.array_distinct(g2)) / (sz - 1), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
        t.alias("t"),
    )
    base = narrow.select(
        "doc_id",
        "n_words",
        "distinct_word_ratio",
        "dup_2gram_frac",
        F.explode("t").alias("w"),
    )
    return (
        base.groupBy("doc_id", "n_words", "distinct_word_ratio", "dup_2gram_frac", "w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .groupBy("doc_id", "n_words", "distinct_word_ratio", "dup_2gram_frac")
        .agg(F.max("wc").alias("max_wc"))
        .select(
            "doc_id",
            "n_words",
            "distinct_word_ratio",
            F.round(F.col("max_wc") / F.col("n_words"), 6).alias("top_word_frac"),
            "dup_2gram_frac",
        )
    )


# ---------------------------------------------------------------------------
# Order-independent table fingerprints: cross-system integrity checks.
# ---------------------------------------------------------------------------
@query(
    "quality_table_fingerprints",
    oracle="""
    WITH rows_h AS (
      SELECT 'orders' AS tbl,
             md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                           CAST(o_orderdate AS VARCHAR))) AS h
      FROM orders
      UNION ALL
      SELECT 'customer',
             md5(concat_ws('|', c_custkey, c_nationkey, c_mktsegment))
      FROM customer
    )
    SELECT tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(CAST(concat('0x', substr(h, 1, 15)) AS BIGINT)
                         AS DECIMAL(38, 0))) AS VARCHAR) AS checksum,
           min(h) AS min_hash,
           max(h) AS max_hash
    FROM rows_h GROUP BY tbl
    """,
)
def quality_table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprint per table: row-level md5
    over a canonical key projection, combined with a commutative SUM
    (first 15 hex chars as a 60-bit int, accumulated in decimal(38,0))
    plus min/max hashes. Two systems that disagree on ANY row disagree
    on the checksum with overwhelming probability — the
    replication/migration integrity check (e.g. validating this engine
    against the system it replaces) without moving or sorting data.

    Scale: embarrassingly parallel — hash at scan speed, combine
    map-side; the shuffle carries one partial (count, sum, min, max)
    per table per partition. Only stable-rendering columns (ints,
    strings, dates) enter the canonical string: float formatting is
    engine-specific, which is WHY the fingerprint projection is typed,
    not SELECT *. The checksum is emitted as a string because the
    driver's canonicalizer hashes scalars, not 128-bit decimals."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def fp(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
        h = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
        return df.select(F.lit(tbl).alias("tbl"), h.alias("h"))

    rows_h = fp(orders, "orders",
                ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]).union(
        fp(cust, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    )
    h60 = F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")
    return rows_h.groupBy("tbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(h60).cast("string").alias("checksum"),
        F.min("h").alias("min_hash"),
        F.max("h").alias("max_hash"),
    )


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality rules (Rae et al. 2021, §A1.1 of the
# Gopher paper; the same family C4/RefinedWeb/Dolma filters use).
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
# the Gopher stop-word probe set (distinct-presence count, not tf)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_GNORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_GSTOPS = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"


@query(
    "quality_gopher_rules",
    oracle=f"""
    SELECT doc_id, n_words,
           round(mean_word_len, 6)  AS mean_word_len,
           round(symbol_ratio, 6)   AS symbol_ratio,
           round(alpha_word_frac, 6) AS alpha_word_frac,
           n_stopwords,
           CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AND mean_word_len BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN}
            AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
            AND alpha_word_frac >= {GOPHER_MIN_ALPHA_FRAC}
            AND n_stopwords >= {GOPHER_MIN_STOPWORDS} AS INT) AS passes
    FROM (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_words,
             len(replace(norm, ' ', ''))::DOUBLE / len(t) AS mean_word_len,
             ((len(norm) - len(replace(norm, '#', '')))
              + (len(norm) - len(replace(norm, '...', ''))) / 3)::DOUBLE
               / len(t) AS symbol_ratio,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
               / len(t) AS alpha_word_frac,
             CAST(len(list_intersect(list_distinct(t), {_GSTOPS})) AS BIGINT)
               AS n_stopwords
      FROM (SELECT doc_id, {_GNORM} AS norm,
                   string_split({_GNORM}, ' ') AS t
            FROM documents)
    )
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher heuristic quality gate, per document: word
    count bounds, mean word length bounds, symbol-to-word ratio ('#'
    and '...'), alphabetic-word fraction, and a distinct-stop-word
    presence count, plus the combined pass flag. This is the standard
    cheap pre-filter a pretraining pipeline runs before any model-based
    scoring — and the rule thresholds are the Gopher paper's own.

    Scale: one narrow scan-side projection per document — every rule is
    a Catalyst string/array expression (no UDF, no shuffle, no join),
    so the gate runs at parquet scan speed and composes with any
    downstream operator. The stop-word probe uses array_intersect
    against an 8-element literal array: distinct-presence, not term
    frequency, exactly as the paper specifies."""
    return gopher_projection(load_table(spark, sf_dir, "documents"))


def gopher_projection(docs: DataFrame) -> DataFrame:
    """The Gopher-rule columns as a pure projection of any (doc_id,
    text) frame — batch or streaming (stateless, so the streaming twin
    ``stream_quality_gopher_gate`` applies it verbatim to a document
    stream and drains in append mode)."""
    norm = _norm_text(F.col("text"))
    toks = F.split(norm, " ")
    n_words = F.size(toks)
    nw_d = n_words.cast("double")
    mean_wlen = F.length(F.regexp_replace(norm, " ", "")).cast("double") / nw_d
    n_hash = F.length(norm) - F.length(F.regexp_replace(norm, "#", ""))
    n_ellipsis = F.length(norm) - F.length(F.replace(norm, F.lit("...")))
    symbol_ratio = (n_hash + n_ellipsis / 3).cast("double") / nw_d
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / nw_d
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    ).cast("long")
    passes = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wlen.between(GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
        passes.cast("int").alias("passes"),
    )


# ---------------------------------------------------------------------------
# Character-level Shannon entropy: the classic cheap gibberish detector
# (base64 blobs / key dumps score high, repeated-char spam scores low,
# natural language sits in a narrow band).
# ---------------------------------------------------------------------------
@query(
    "quality_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             unnest(regexp_extract_all(
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '.')) AS c
      FROM documents
    ),
    cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT)                        AS n_chars,
           CAST(count(*) AS BIGINT)                      AS n_distinct_chars,
           round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy_nats
    FROM cc GROUP BY 1
    """,
)
def quality_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy over the whitespace-normalized
    text, computed from counts as ln(N) - sum(c*ln c)/N (one log per
    DISTINCT char, and numerically identical across engines after
    round-6, unlike the -sum(p ln p) form whose summation order
    differs).

    Scale: the char explode is pipelined inside the scan stage and the
    (doc_id, char) pre-aggregation map-side-combines to at most
    |alphabet| rows per document before the shuffle — the same shape
    (and cost bound) as the shingle pipelines, with a far smaller key
    space. No UDF, no join."""
    docs = load_table(spark, sf_dir, "documents")
    cc = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(_norm_text(F.col("text")), F.lit("."), 0)
            ).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cc.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.round(
            F.log(F.sum("n")) - F.sum(F.col("n") * F.log("n")) / F.sum("n"), 6
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring via the hashing trick: the fasttext-style
# linear classifier shape (token -> hashed feature bucket -> weight ->
# sigmoid of the mean activation), with deterministic pseudo-weights so
# both engines replay the exact same model.
# ---------------------------------------------------------------------------
HASH_FEAT_BUCKETS = 256


def _feat_weight_sql(tok_expr: str) -> str:
    """DuckDB spelling of the token -> bucket -> weight lookup."""
    bucket = (
        f"(('0x' || substr(md5({tok_expr}), 1, 8))::BIGINT"
        f" % {HASH_FEAT_BUCKETS})"
    )
    return (
        f"((('0x' || substr(md5('w=' || CAST({bucket} AS VARCHAR)), 1, 8))"
        f"::BIGINT % 2001) - 1000) / 1000.0"
    )


@query(
    "quality_hashed_classifier_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    act AS (
      SELECT doc_id,
             list_sum(list_transform(toks, tok -> {_feat_weight_sql('tok')}))
               / len(toks) AS raw
      FROM t
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-raw)), 6) AS quality_score,
           round(1.0 / (1.0 + exp(-raw)), 6) >= 0.5 AS keep
    FROM act
    """,
)
def quality_hashed_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score from a HASHING-TRICK linear model:
    each token maps to one of {HASH_FEAT_BUCKETS} feature buckets by a
    salted md5 hash, each bucket carries a deterministic pseudo-weight
    in [-1, 1] (derived from md5 of the bucket id — a stand-in for
    trained fasttext/logistic weights, chosen so the oracle can replay
    the identical model), and the document score is the sigmoid of the
    mean activation. The keep flag thresholds at 0.5 — the shape of
    every model-based quality filter (CCNet/Gopher wiki-classifier
    stage) with the training left out.

    Scale design: ZERO shuffles and zero Python — the whole
    token->bucket->weight->mean chain is one Catalyst higher-order
    ``aggregate`` over the in-row token array (the lambda touches only
    its element variable, so nothing re-evaluates per element — the
    ``_shingles`` discipline), and the sigmoid is a per-row
    projection. A trained-weights deployment swaps the md5-derived
    weight expression for a {HASH_FEAT_BUCKETS}-entry broadcast map
    lookup; the plan shape is unchanged. Per-row sums fold
    sequentially over the same list order in both engines, and the
    score is rounded to 6 before hashing."""
    return classifier_projection(load_table(spark, sf_dir, "documents"))


def classifier_projection(docs: DataFrame) -> DataFrame:
    """The pure classifier projection over any (doc_id, text) relation
    — shared by the batch query above and the streaming admission gate
    (streaming/windows.py stream_classifier_gate), so stream == batch
    == oracle is a single definition."""
    toks = F.split(_norm_text(F.col("text")), " ")
    withtoks = docs.select("doc_id", toks.alias("toks"))

    def weight(tok: F.Column) -> F.Column:
        bucket = F.pmod(
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint"),
            F.lit(HASH_FEAT_BUCKETS),
        )
        wh = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w="), bucket.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        return (F.pmod(wh, F.lit(2001)) - 1000) / F.lit(1000.0)

    raw = F.aggregate(
        "toks", F.lit(0.0), lambda acc, tok: acc + weight(tok)
    ) / F.size("toks")
    score = 1.0 / (1.0 + F.exp(-F.col("raw")))
    return (
        withtoks.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.round(score, 6).alias("quality_score"),
            # Threshold the ROUNDED score (same rounding the published
            # quality_score column carries) so keep == (quality_score
            # >= 0.5) holds row-for-row — a raw score in
            # [0.4999995, 0.5) must not publish the contradictory pair
            # (0.5, false). The oracle rounds identically.
            (F.round(score, 6) >= 0.5).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity release audit over quasi-identifier combinations.
# ---------------------------------------------------------------------------
K_ANON = 5  # release gate: every quasi-identifier combo needs >= K members
K_ANON_LEN_BUCKET = 100  # n_chars bucket width in the quasi-identifier


@query(
    "quality_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // {K_ANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY lang, source, len_bucket
    HAVING count(*) < {K_ANON}
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier combinations (lang x source x length bucket)
    with fewer than {K_ANON} members — the k-anonymity audit a dataset
    release runs beside PII redaction: a document whose metadata combo
    is near-unique is re-identifiable even after its text is scrubbed,
    so these groups are the release blocker list (suppress, generalize
    the bucket, or drop). Complements quality_redact_pii (content
    privacy) with structural privacy.

    Scale: one map-side-combinable aggregation on a bounded key space
    (langs x sources x buckets); the HAVING filter keeps only the
    violating combos, which shrink as the corpus grows — at 100 TB
    this is among the cheapest queries in the registry."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / K_ANON_LEN_BUCKET)
            .cast("long")
            .alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") < K_ANON)
    )
