"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline tier: token statistics, corpus term/document
frequency, TF-IDF, heuristic language ID, quality scoring, and document
fingerprinting. Everything is native Catalyst (split/explode/groupBy/
higher-order array functions) — a deliberately relational formulation so
every operator has a DuckDB oracle and stays inside whole-stage codegen.

Scale design:

- Tokenization is a narrow projection; only the explode-based term
  aggregations shuffle, and they shuffle (term, count) partials after
  map-side combine — never document bodies.
- TF-IDF is two hash aggregations plus one broadcast join of the
  (vocabulary-sized) document-frequency table against per-doc term
  counts. Vocabulary << corpus at any scale, so the broadcast is safe
  where broadcasting `customer` was not.
- Fingerprints are md5 of normalized text: 32-byte shuffle keys for any
  downstream dedup/sharding, computed scan-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.caching import memo_put, register_cache
from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

# Tiny per-language marker lexicons for the heuristic language ID.
# Deterministic and mirrored verbatim in the oracle SQL.
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")  # argmax tie-break order


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")


_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


# ---------------------------------------------------------------------------
# Per-document token statistics.
# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(t) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
           round(length(norm)::DOUBLE / len(t), 4) AS chars_per_token
    FROM (
      SELECT doc_id, {_NORM_SQL} AS norm, string_split({_NORM_SQL}, ' ') AS t
      FROM documents
    )
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — the unit everything downstream
    (quality filters, dedup shingles, BPE budgeting) keys on."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    t = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        F.round(F.length(norm).cast("double") / F.size(t), 4).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (token-count budgeting without a real BPE
# vocab: words / digit runs / single punctuation, the GPT-2 pre-token
# shape).
# ---------------------------------------------------------------------------
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "text_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(toks) AS BIGINT)                    AS n_bpe_tokens,
           CAST(len(list_filter(toks, t -> t ~ '^[a-z]+$')) AS BIGINT) AS n_word_tokens,
           CAST(len(list_filter(toks, t -> t ~ '^[0-9]+$')) AS BIGINT) AS n_number_tokens
    FROM (
      SELECT doc_id, {_NORM_SQL} AS norm,
             regexp_extract_all({_NORM_SQL}, '{_BPE_RE}') AS toks
      FROM documents
    )
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting with a BPE-style pre-tokenizer regex alongside
    the whitespace count — the estimate an LLM-data pipeline uses to
    budget training tokens before running a real tokenizer. Narrow
    projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    toks = F.regexp_extract_all(norm, F.lit(_BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(F.split(norm, " ")).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
        .cast("long")
        .alias("n_word_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_number_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus term/document frequency (explode -> two-level aggregation).
# ---------------------------------------------------------------------------
@query(
    "text_term_frequency",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    )
    SELECT term,
           count(*)                 AS tf,
           count(DISTINCT doc_id)   AS df
    FROM tok GROUP BY term
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global term frequency + document frequency in one aggregation.
    Map-side combine means only (term, partial-count) crosses the wire."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )


# ---------------------------------------------------------------------------
# TF-IDF: relational formulation (two aggs + one broadcast join).
# ---------------------------------------------------------------------------
@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. The document-frequency join
    carries NO broadcast hint: word vocabulary grows with the corpus
    (Heaps' law) and a forced broadcast of it is a 100-TB OOM — AQE
    broadcasts it on its own while it is actually small, and it degrades
    gracefully to a shuffle join on the term key otherwise. The n_docs
    scalar (1 row) keeps its explicit broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# Heuristic language ID: marker-lexicon hit counts, argmax with a fixed
# tie order. (An n-gram model is the production path; the relational
# skeleton — score per language, argmax — is identical.)
# ---------------------------------------------------------------------------
def _lang_oracle() -> str:
    hit_cols = ",\n             ".join(
        f"len(list_intersect(t, {list(_LANG_MARKERS[lang])!r})) AS hits_{lang}"
        for lang in _LANG_ORDER
    )
    # greatest-hits argmax with fixed tie order en>es>de>fr>zh
    cases = " ".join(
        f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}'" for lang in _LANG_ORDER
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lang AS labeled_lang,
             list_distinct(string_split({_NORM_SQL}, ' ')) AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, labeled_lang,
             {hit_cols}
      FROM tok
    ),
    best AS (
      SELECT *, greatest(hits_en, hits_es, hits_de, hits_fr, hits_zh) AS best FROM hits
    )
    SELECT doc_id, labeled_lang,
           CASE {cases} ELSE 'und' END AS predicted_lang
    FROM best
    """


@query("text_language_id", oracle=_lang_oracle())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.array_distinct(_tokens(F.col("text")))
    hits = {
        lang: F.size(
            F.array_intersect(t, F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]]))
        )
        for lang in _LANG_ORDER
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in reversed(_LANG_ORDER):  # build CASE so earlier langs win ties
        pred = F.when((hits[lang] == best) & (best > 0), lang).otherwise(pred)
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Quality scoring: cheap shape features + a composite score.
# ---------------------------------------------------------------------------
@query(
    "text_quality_scores",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             length(text) AS n_chars_raw,
             len(string_split({_NORM_SQL}, ' ')) AS n_tokens,
             len(list_distinct(string_split({_NORM_SQL}, ' '))) AS n_distinct,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_punct::DOUBLE / n_chars_raw, 6)   AS punct_ratio,
           round(n_distinct::DOUBLE / n_tokens, 6)   AS distinct_ratio,
           CASE WHEN n_tokens >= 20 AND n_distinct::DOUBLE / n_tokens >= 0.2
                THEN 1 ELSE 0 END                    AS passes_quality
    FROM feat
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / lexical-diversity features with a binary
    keep-gate — the shape of every corpus-cleaning filter. One narrow
    projection; no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    t = _tokens(F.col("text"))
    n_tokens = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    distinct_ratio = n_distinct.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.when((n_tokens >= 20) & (distinct_ratio >= 0.2), 1)
        .otherwise(0)
        .cast("int")
        .alias("passes_quality"),
    )


# ---------------------------------------------------------------------------
# Document chunking via Python UDTF (the §2.10 table-function surface):
# one input row -> N context-window chunks.
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 64


def _chunk_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkText:
        def eval(self, text, max_tokens):
            if not text:
                return
            toks = text.split(" ")
            for i in range(0, len(toks), max_tokens):
                chunk = toks[i : i + max_tokens]
                yield i // max_tokens, " ".join(chunk), len(chunk)

    return ChunkText


@query(
    "text_chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             string_split({_NORM_SQL}, ' ') AS t
      FROM documents
    ),
    idx AS (
      SELECT doc_id, t,
             unnest(range(0, ((len(t) - 1) // {CHUNK_TOKENS}) + 1)) AS c
      FROM tok WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(c AS INT) AS chunk_idx,
           array_to_string(
             t[c * {CHUNK_TOKENS} + 1 : least((c + 1) * {CHUNK_TOKENS}, len(t))],
             ' '
           ) AS chunk,
           CAST(least((c + 1) * {CHUNK_TOKENS}, len(t)) - c * {CHUNK_TOKENS} AS INT)
             AS n_tokens
    FROM idx
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the split every LLM training pipeline
    applies before tokenization — as a Python UDTF (one doc row in, one
    row per chunk out, LATERAL-joined). Chunks carry (doc_id, index,
    token count) so downstream dedup/packing keeps provenance.
    tests/test_text_chunks.py proves chunks reassemble the document
    exactly and respect the size bound; the DuckDB oracle recomputes
    the identical chunking relationally (list slices over
    generate_series), making the UDTF value-checkable cross-engine."""
    spark.udtf.register("chunk_text", _chunk_udtf())
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    docs.select("doc_id", norm.alias("norm")).createOrReplaceTempView("docs_chunk_v")
    return spark.sql(
        f"""
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM docs_chunk_v, LATERAL chunk_text(norm, {CHUNK_TOKENS}) c
        """
    )


# ---------------------------------------------------------------------------
# Rolling (polynomial) hash fingerprint — order-sensitive, computable
# incrementally, the hash family behind rsync/rabin chunking.
# ---------------------------------------------------------------------------
_ROLL_P = (1 << 31) - 1  # Mersenne prime modulus: acc*B + h < 2^39 << int64
_ROLL_B = 131


@query(
    "text_rolling_hash",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split({_NORM_SQL}, ' '),
                 t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % {_ROLL_P})),
             (a, b) -> (a * {_ROLL_B} + b) % {_ROLL_P}) AS rolling_hash
    FROM documents
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: fold over tokens with
    h = (h * B + tokhash(token)) mod p, as a Catalyst ``aggregate`` —
    unlike md5-of-text this extends incrementally (append tokens =
    resume the fold), which is what chunk-level dedup builds on.

    The per-token hash is the 32-bit md5 prefix (the same cross-engine
    device as sampling.hash_bucket) rather than xxhash64, exactly so
    the whole fold is reproducible outside Spark: DuckDB replays it
    with list_reduce and the seed prepended (its 2-arg fold has no
    initial-accumulator slot), and tests/test_text_rolling.py pins a
    pure-Python hashlib reference. All arithmetic stays < 2^39, exact
    in int64 on every engine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def tok_hash(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(_ROLL_P),
        )

    rolled = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * _ROLL_B + tok_hash(t), F.lit(_ROLL_P)),
    )
    return docs.select("doc_id", rolled.alias("rolling_hash"))


# ---------------------------------------------------------------------------
# Document fingerprints: content hash + shard key.
# ---------------------------------------------------------------------------
@query(
    "text_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM_SQL})               AS fingerprint,
           substr(md5({_NORM_SQL}), 1, 4) AS shard_key
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed identity: md5 of normalized text, plus a 4-hex
    shard prefix (65k shards) — the partition key a 100-TB pipeline
    writes dedup state under."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    fp = F.md5(norm)
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 4).alias("shard_key")
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-then-chunk assignment of documents to
# fixed-capacity training sequences.
# ---------------------------------------------------------------------------
SEQ_CAPACITY = 2048  # tokens per training sequence
N_PACK_SHARDS = 32  # independent packing streams (per-partition at scale)


@query(
    "text_pack_sequences",
    oracle=f"""
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_offset / {SEQ_CAPACITY}.0) AS BIGINT) AS seq_id,
           CAST(start_offset AS BIGINT) AS start_offset
    FROM (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_offset
      FROM (
        SELECT doc_id, doc_id % {N_PACK_SHARDS} AS shard,
               CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
        FROM documents
      )
    )
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM training-data packing: documents are concatenated per shard
    (in doc_id order) into one token stream that is then cut into
    SEQ_CAPACITY-token sequences; each document is assigned the
    sequence its first token lands in. This is the standard
    concat-then-chunk scheme (documents straddle cut points; the
    training loader splits them), chosen over greedy bin-packing
    because it needs no sequential packer state: the whole assignment
    is one running-sum window.

    Scale: sharding by doc_id % N gives each stream bounded size and
    makes the single window shuffle N-way parallel; at 100 TB you raise
    N to the cluster's write parallelism and the plan is unchanged. The
    assignment is deterministic (pure function of doc_id order), so
    re-runs produce identical packings — same property the sampling
    splits guarantee."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(N_PACK_SHARDS)).alias("shard"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SEQ_CAPACITY)
        .cast("long")
        .alias("seq_id"),
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    )


# ---------------------------------------------------------------------------
# Unigram LM scoring: the classic language-model quality filter.
# ---------------------------------------------------------------------------
@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    gf AS (SELECT term, count(*) AS cf FROM tok GROUP BY 1),
    tot AS (SELECT count(*) AS n_total FROM tok)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * -ln(cf::DOUBLE / n_total)) / sum(tf), 6) AS avg_nll
    FROM tf JOIN gf USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own unigram distribution — the standard cheap LM quality signal
    (high avg_nll = rare-token soup; very low = degenerate repetition).

    Scale design mirrors TF-IDF exactly: per-doc and global term counts
    are two map-side-combined aggregations over one exploded token
    relation (Catalyst reuses the exchange); the vocabulary join carries
    NO broadcast hint (Heaps' law growth — AQE decides), while the
    1-row token-total keeps its explicit broadcast. The weighted NLL sum
    is a third map-side-combined aggregation, so the wire never carries
    token streams, only (doc, term) partials."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    gf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tot = tok.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tf.join(gf, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * -F.log(F.col("cf").cast("double") / F.col("n_total"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_nll"),
        )
        .select("doc_id", "n_tokens", "avg_nll")
    )


# ---------------------------------------------------------------------------
# Bigram LM scoring: context-sensitive upgrade of the unigram filter.
# ---------------------------------------------------------------------------
@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    bigl AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
               i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
      FROM tok WHERE len(t) >= 2
    ),
    big AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bigl),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
    uc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(-ln(c12::DOUBLE / c1)) / count(*), 6) AS avg_nll
    FROM big JOIN bc USING (w1, w2) JOIN uc USING (w1)
    GROUP BY 1
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus
    MLE bigram model p(w2|w1) = c(w1,w2)/c(w1,·) — the
    context-sensitive sibling of ``text_unigram_logprob`` (a document
    can look unigram-normal while its word ORDER is gibberish; this
    catches that). No smoothing needed: every scored bigram
    contributed to the counts, so probabilities are never zero.

    Scale: the bigram count table grows with observed pairs (bounded
    by corpus, far below vocab^2) and joins the exploded bigram stream
    on (w1, w2) — an ordinary shuffle join map-side-combined on both
    aggregation legs; no broadcast hint (bigram vocabulary grows with
    the corpus — same rule as the unigram/tfidf vocabulary joins)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    big = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    nll = -F.log(F.col("c12").cast("double") / F.col("c1"))
    return (
        big.join(bc, ["w1", "w2"]).join(uc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum(nll) / F.count(F.lit(1)), 6).alias("avg_nll"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge-pair statistics: the counting step tokenizer training runs.
# ---------------------------------------------------------------------------
BPE_PAIR_TOP_K = 50

# Corpus word-frequency table (w, wc) — the relation every BPE merge
# iteration re-reads (and the single-round pair count starts from), so
# it is the thing to persist: memoized per (application, sf_dir), same
# pattern as curation.curated_documents. After the first materialization
# the corpus is never re-scanned by a BPE consumer; everything
# downstream is vocab-bounded, corpus-independent work.
_WORD_COUNTS_CACHE: dict[tuple[str, str], DataFrame] = register_cache({})


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _WORD_COUNTS_CACHE.get(key)
    if cached is not None:
        return cached
    from benchviz_spark.sources.tables import spread

    # spread(): the normalize+split+explode chain below is the heavy
    # per-row work of every BPE consumer and would otherwise run on the
    # one-split local scan as a single task up to the groupBy exchange
    # (no-op on a many-split production scan — guide §2.5).
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    df = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    return memo_put(_WORD_COUNTS_CACHE, key, df)


@query(
    "text_bpe_merge_pairs",
    oracle=f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
      ) GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS symbol_pair,
             wc
      FROM words WHERE length(w) >= 2
    )
    SELECT symbol_pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY symbol_pair
    ORDER BY n_occurrences DESC, symbol_pair
    LIMIT {BPE_PAIR_TOP_K}
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K adjacent symbol-pair frequencies across the corpus — the
    exact statistic one BPE training iteration maximizes (the highest
    count is the next merge). ``text_bpe_token_counts`` budgets tokens
    with a fixed pre-tokenizer; this is the counting kernel you'd run
    to LEARN the vocabulary on the corpus itself.

    Scale design: the naive shape explodes one row per character pair
    per corpus position (100 TB of text -> ~100 T rows). Instead the
    corpus first collapses to its WORD FREQUENCY table (vocab-sized —
    this is precisely how production BPE trainers count, over word
    counts, never raw text), and only vocabulary words explode into
    (pair, word_count) rows: the big explode is bounded by
    vocab x avg_word_len, independent of corpus row count. Both
    aggregations are partial-agg (map-side combined) hash aggregates,
    and the final top-K lowers to TakeOrdered — no global sort. At a
    real 100-TB run the word-count table is also what every later merge
    iteration re-reads, so it is the thing to persist — served here
    from the shared ``_word_counts`` persist point that the iterated
    trainer (``text_bpe_merges_iter3``) re-reads each merge round."""
    words = _word_counts(spark, sf_dir).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("symbol_pair"),
        "wc",
    )
    return (
        pairs.groupBy("symbol_pair")
        .agg(F.sum("wc").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "symbol_pair")
        .limit(BPE_PAIR_TOP_K)
    )


# ---------------------------------------------------------------------------
# Iterated BPE training: apply the top merge and recount, 3 rounds.
# ---------------------------------------------------------------------------
BPE_ITER_ROUNDS = 3

# Symbol-sequence encoding shared by both engines: a word's symbol list
# is one string — single-space padded, symbols joined by DOUBLE spaces
# (" h  e  l  l  o "). One BPE merge of pair (a, b) is then the LITERAL
# leftmost-non-overlapping replace of " a  b " with " ab ": each match
# consumes one boundary space per side and the replacement restores it,
# so back-to-back occurrences ("a b a b") both merge while overlapping
# ones ("a a a" under (a,a)) merge greedily left-to-right — exactly the
# reference BPE application rule, and `replace` has identical
# leftmost-non-overlap semantics in Spark and DuckDB (no regex, no
# lookaround, so the oracle replays it verbatim).


def _bpe_symbol_strings(words: DataFrame) -> DataFrame:
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    return words.select(
        "w",
        F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" ")).alias("s"),
        "wc",
    )


def _bpe_pair_counts(wdf: DataFrame) -> DataFrame:
    arr = F.split(F.trim(F.col("s")), "  ")
    return (
        wdf.select(arr.alias("arr"), "wc")
        .filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("arr", 1, F.size("arr") - 1),
                    F.slice("arr", 2, F.size("arr") - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                )
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
    )


def _bpe_oracle() -> str:
    rounds = []
    for i in range(1, BPE_ITER_ROUNDS + 1):
        rounds.append(f"""
    p{i} AS (
      SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
        SELECT unnest(list_transform(range(1, len(arr)),
                 j -> arr[j] || ' ' || arr[j+1])) AS pair, wc
        FROM (SELECT string_split(trim(s), '  ') AS arr, wc FROM w{i-1})
      ) GROUP BY pair
    ),
    b{i} AS (SELECT pair, n FROM p{i} ORDER BY n DESC, pair LIMIT 1),
    w{i} AS (
      SELECT replace(s, ' ' || string_split(pair, ' ')[1] || '  '
                          || string_split(pair, ' ')[2] || ' ',
                        ' ' || replace(pair, ' ', '') || ' ') AS s, wc
      FROM w{i-1}, b{i}
    )""")
    legs = "\n UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, pair AS symbol_pair,"
        f" replace(pair, ' ', '') AS merged_symbol, n AS n_occurrences"
        f" FROM b{i}"
        for i in range(1, BPE_ITER_ROUNDS + 1)
    )
    return f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
      ) GROUP BY w HAVING length(w) >= 1
    ),
    w0 AS (
      SELECT ' ' || array_to_string(list_transform(range(1, length(w)+1),
               i -> w[i]), '  ') || ' ' AS s, wc
      FROM words
    ),{",".join(rounds)}
    SELECT * FROM ({legs}) ORDER BY merge_rank
    """


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the BPE_ITER_ROUNDS-round training chain. Returns (one 1-row
    argmax DataFrame per round, the word symbol-string table with ALL
    learned merges applied — (w, s, wc), the trained segmenter state
    the tokenizer query consumes). Every round's argmax is lazily
    localCheckpoint'ed: it feeds its own output leg, the next round's
    merge application, and transitively every later round, so the
    checkpoint makes all branches share one computed RDD (the
    kmeans_train iterative-DataFrame pattern; eager=False so building
    the plan triggers no job)."""
    wdf = _bpe_symbol_strings(_word_counts(spark, sf_dir))
    bests = []
    for _ in range(BPE_ITER_ROUNDS):
        best = (
            _bpe_pair_counts(wdf)
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        bests.append(best)
        a = F.element_at(F.split(F.col("pair"), " "), 1)
        b = F.element_at(F.split(F.col("pair"), " "), 2)
        pat = F.concat(F.lit(" "), a, F.lit("  "), b, F.lit(" "))
        rep = F.concat(F.lit(" "), a, b, F.lit(" "))
        wdf = wdf.crossJoin(F.broadcast(best.select("pair"))).select(
            "w", F.replace(F.col("s"), pat, rep).alias("s"), "wc"
        )
    return bests, wdf


@query(f"text_bpe_merges_iter{BPE_ITER_ROUNDS}", oracle=_bpe_oracle())
def text_bpe_merges_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {BPE_ITER_ROUNDS} learned BPE merges — iterated
    training, not just one round's statistic: each round counts
    adjacent symbol pairs over the word-frequency table, takes the
    argmax (ties broken lexicographically on the pair — deterministic
    and engine-replayable), APPLIES that merge to every word's symbol
    sequence, and recounts. ``text_bpe_merge_pairs`` is the counting
    kernel; this is the training loop around it, the same
    replay-the-iteration proof ``similarity_ann_ivf_topk_iter2`` gives
    for k-means. Output: (merge_rank, symbol_pair, merged_symbol,
    n_occurrences) — the tokenizer's merge list prefix.

    Fully declarative iteration: the per-round argmax is a 1-row
    relation crossJoin(broadcast)-spread into the merge application
    (no driver collect), and the merge itself is a literal string
    replace over the double-space symbol encoding (see block comment
    above) that DuckDB replays verbatim — the oracle is the SAME
    chain as nested CTEs.

    Scale: the ONLY corpus-scaled work is the word-count table, read
    from the shared ``_word_counts`` persist point (one corpus scan
    per session, shared with ``text_bpe_merge_pairs``); every round
    after that is vocab x avg_word_len bounded — explode, map-side-
    combined hash aggregate, TakeOrdered(1) — independent of corpus
    row count, which is precisely why production BPE trainers count
    over word frequencies and never raw text."""
    bests, _ = _bpe_train(spark, sf_dir)
    legs = [
        best.select(
            F.lit(r).cast("long").alias("merge_rank"),
            F.col("pair").alias("symbol_pair"),
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                "merged_symbol"
            ),
            F.col("n").alias("n_occurrences"),
        )
        for r, best in enumerate(bests, start=1)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("merge_rank")


def _bpe_trained_wn_cte() -> str:
    """The WITH-body prefix replaying the training chain down to the
    per-word trained token count ``wn(w, n_sym)`` — shared by the
    tokenizer oracle and the token-budget oracle."""
    rounds = []
    for i in range(1, BPE_ITER_ROUNDS + 1):
        rounds.append(f"""
    p{i} AS (
      SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
        SELECT unnest(list_transform(range(1, len(arr)),
                 j -> arr[j] || ' ' || arr[j+1])) AS pair, wc
        FROM (SELECT string_split(trim(s), '  ') AS arr, wc FROM w{i-1})
      ) GROUP BY pair
    ),
    b{i} AS (SELECT pair FROM p{i} ORDER BY n DESC, pair LIMIT 1),
    w{i} AS (
      SELECT w, replace(s, ' ' || string_split(pair, ' ')[1] || '  '
                             || string_split(pair, ' ')[2] || ' ',
                           ' ' || replace(pair, ' ', '') || ' ') AS s, wc
      FROM w{i-1}, b{i}
    )""")
    last = f"w{BPE_ITER_ROUNDS}"
    return f"""
    words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
      ) GROUP BY w HAVING length(w) >= 1
    ),
    w0 AS (
      SELECT w, ' ' || array_to_string(list_transform(range(1, length(w)+1),
               i -> w[i]), '  ') || ' ' AS s, wc
      FROM words
    ),{",".join(rounds)},
    wn AS (
      SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym
      FROM {last}
    )"""


def _bpe_tokenize_oracle() -> str:
    return f"""
    WITH {_bpe_trained_wn_cte()},
    tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)   AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_tokens
    FROM tok JOIN wn USING (w)
    GROUP BY doc_id
    """


@query("text_bpe_tokenize_docs", oracle=_bpe_tokenize_oracle())
def text_bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INFERENCE side of the trained tokenizer: apply the
    BPE_ITER_ROUNDS learned merges and count each document's tokens
    under the resulting segmentation — (doc_id, n_words, n_tokens).
    This is the number a training pipeline actually bills by (the
    token budget under the learned vocab, vs text_bpe_token_counts'
    fixed pre-tokenizer estimate), and together with the trainer it
    closes the loop: learn merges on the corpus, tokenize the corpus
    with them.

    Scale: merge application happens on the VOCABULARY (the word
    symbol-string table from the shared training chain — vocab-sized,
    corpus-independent), never on raw text; the corpus is touched by
    exactly two bounded passes — the shared ``_word_counts`` persist
    point and one explode of doc words joined to the per-word token
    counts on the word key (vocab-sized build side, the same
    no-broadcast-hint rule as TF-IDF's document-frequency join: AQE
    broadcasts it while genuinely small). The DuckDB oracle replays
    the training CTE chain and the same join."""
    _, trained = _bpe_train(spark, sf_dir)
    wn = trained.select(
        "w", F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("n_sym")
    )
    from benchviz_spark.sources.tables import spread

    # spread(): the corpus-side tokenize+explode would otherwise run as
    # ONE task on the single-split local scan (guide §2.5; no-op on a
    # many-split production scan)
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
    return (
        tok.join(wn, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget mixture planning: epochs per source to fill a budget.
# ---------------------------------------------------------------------------
TOKEN_BUDGET_SHARE = 0.5  # plan a run of half the corpus's trained tokens


def _token_budget_oracle() -> str:
    return f"""
    WITH {_bpe_trained_wn_cte()},
    tok AS (
      SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents
    ),
    per_source AS (
      SELECT source, CAST(sum(n_sym) AS BIGINT) AS n_tokens
      FROM tok JOIN wn USING (w)
      GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS k
      FROM per_source
    )
    SELECT source, n_tokens,
           round(n_tokens::DOUBLE / t, 6)                    AS token_share,
           round(1.0 / k, 6)                                 AS target_share,
           round({TOKEN_BUDGET_SHARE} * t / k / n_tokens, 6) AS epochs
    FROM per_source, tot
    """


@query("curation_token_budget", oracle=_token_budget_oracle())
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe planning: given a token budget (TOKEN_BUDGET_SHARE
    of the corpus's tokens under the LEARNED tokenizer) and a uniform
    target mixture across sources, how many EPOCHS of each source does
    the run consume? epochs < 1 means the source is subsampled,
    epochs > 1 means it must repeat to hit its share — the
    oversampling signal a mixture designer acts on before launching a
    run (the per-source twin of the doc-count-based
    ``sample_temperature_mix``, but denominated in trained tokens,
    which is what the budget is actually billed in).

    Scale: the per-source token table composes the same two bounded
    passes as ``text_bpe_tokenize_docs`` (shared ``_word_counts``
    persist point + one exploded-words join on the word key), then
    everything downstream is sources-sized: a 1-row total
    crossJoin(broadcast)-spread into ratios. Float discipline: shares
    and epochs are double divisions of exact int64 token counts,
    rounded to 6 places on both engines."""
    _, trained = _bpe_train(spark, sf_dir)
    wn = trained.select(
        "w", F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("n_sym")
    )
    from benchviz_spark.sources.tables import spread

    # spread(): same one-split-scan fix as text_bpe_tokenize_docs
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = docs.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
    per_source = (
        tok.join(wn, "w")
        .groupBy("source")
        .agg(F.sum("n_sym").cast("long").alias("n_tokens"))
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias(
            "token_share"
        ),
        F.round(F.lit(1.0) / F.col("k"), 6).alias("target_share"),
        F.round(
            F.lit(TOKEN_BUDGET_SHARE) * F.col("t") / F.col("k") / F.col("n_tokens"),
            6,
        ).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Sequence packing under the TRAINED tokenizer: the billed-token twin
# of text_pack_sequences (VERDICT r9 #4).
# ---------------------------------------------------------------------------
def _pack_trained_oracle() -> str:
    return f"""
    WITH {_bpe_trained_wn_cte()},
    tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents
    ),
    dc AS (
      SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_tokens
      FROM tok JOIN wn USING (w)
      GROUP BY doc_id
    ),
    run AS (
      SELECT doc_id, doc_id % {N_PACK_SHARDS} AS shard, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY doc_id % {N_PACK_SHARDS} ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_offset
      FROM dc
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start_offset / {SEQ_CAPACITY}.0) AS BIGINT) AS seq_id,
           CAST(start_offset AS BIGINT) AS start_offset
    FROM run
    """


@query("text_pack_sequences_trained", oracle=_pack_trained_oracle())
def text_pack_sequences_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_pack_sequences`` denominated in the tokens a run is
    actually billed in: the concat-then-chunk packing window runs over
    ``text_bpe_tokenize_docs``' per-document counts under the LEARNED
    merges instead of the fixed pre-tokenizer estimate — the same
    upgrade ``curation_token_budget`` made over ``sample_weighted_mix``.
    A document with no in-vocabulary words has nothing to pack and is
    absent, exactly as in the tokenizer query.

    Scale: composes two already-bounded shapes — the tokenizer's
    vocab-sized merge application + word-key join (one corpus explode),
    then the N_PACK_SHARDS-parallel running-sum window over doc-sized
    rows. Nothing new shuffles: the window reuses the packing plan the
    pre-tokenizer variant already carries at 100 TB."""
    counts = text_bpe_tokenize_docs(spark, sf_dir).select("doc_id", "n_tokens")
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = counts.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(N_PACK_SHARDS)).alias("shard"),
        "n_tokens",
    )
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SEQ_CAPACITY)
        .cast("long")
        .alias("seq_id"),
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    )


# ---------------------------------------------------------------------------
# Boilerplate phrase mining: global word-n-gram document frequency.
# ---------------------------------------------------------------------------
BOILERPLATE_N = 8
BOILERPLATE_TOP_K = 20


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(w) - {BOILERPLATE_N - 1}, 0) + 1),
               i -> array_to_string(w[i:i + {BOILERPLATE_N - 1}], ' ')
             )) AS ngram
      FROM t
    )
    SELECT ngram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT)               AS n_occurrences
    FROM g
    GROUP BY ngram
    ORDER BY n_docs DESC, n_occurrences DESC, ngram
    LIMIT {BOILERPLATE_TOP_K}
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K word-{BOILERPLATE_N}-grams by DOCUMENT frequency — the
    C4/RefinedWeb-style boilerplate detector: phrases that recur across
    many documents are templates/navigation/license banners, and the
    cleaning pass strips them before training. (This corpus has no
    newlines, so the unit is the word n-gram rather than the line —
    the operator shape is identical.)

    Scale: one scan emits each document's sliding n-grams (linear in
    corpus tokens); the aggregate partial-combines map-side so the
    shuffle carries one (ngram, doc-partial) row per distinct gram per
    task, and the final top-K lowers to TakeOrdered. Ties break on
    (n_docs, n_occurrences, ngram) so both engines cut the same
    prefix. At 100 TB the gram key would be hashed to int64 for
    shuffle width with the phrase re-derived from a winners-only
    second pass; the string key keeps this single-pass and the plan
    shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    n = BOILERPLATE_N
    grams = (
        docs.select("doc_id", _tokens(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""
                    CASE WHEN size(w) >= {n}
                         THEN transform(sequence(1, size(w) - {n - 1}),
                                        i -> array_join(slice(w, i, {n}), ' '))
                         ELSE cast(array() as array<string>) END
                    """
                )
            ).alias("ngram"),
        )
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "ngram")
        .limit(BOILERPLATE_TOP_K)
    )


# ---------------------------------------------------------------------------
# First-owner n-gram novelty: how much of a document is text the corpus
# has never produced before it — the growth-ordered complement of the
# pairwise dedup tier (dedup asks "whom do I copy"; novelty asks "how
# much of me is new at my arrival point").
# ---------------------------------------------------------------------------
NOVELTY_N = 3


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - {NOVELTY_N - 2}, 1)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             )) AS s
      FROM tok WHERE len(t) >= {NOVELTY_N}
    ),
    g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
    owner AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
    SELECT g.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (o.first_doc = g.doc_id) AS BIGINT) AS n_novel,
           round(count(*) FILTER (o.first_doc = g.doc_id)::DOUBLE
                 / count(*), 6) AS novelty
    FROM g JOIN owner o USING (gram)
    GROUP BY 1
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document (with >= {NOVELTY_N} tokens): its distinct
    {NOVELTY_N}-gram count, how many of those grams it is the FIRST
    owner of (by doc_id order), and the novelty ratio. Boilerplate
    re-posts score ~0; genuinely new text scores ~1 — the standard
    curation signal for "does ingesting this source add anything".

    Scale: two map-side-combined aggregations over one exploded
    shingle relation — (gram -> min owner) then the per-doc ratio —
    joined on the gram hash. No broadcast hint on the gram join (the
    gram vocabulary grows with the corpus: same rule as the
    unigram/tfidf vocabulary joins); min() makes the first-owner
    reduction associative, so partial aggregation bounds the wire at
    one row per (partition, gram). Shingles hash to int64 before the
    shuffle — 8-byte keys, never gram strings (the dedup-tier rule)."""
    from benchviz_spark.operators.dedup import hashed_shingled_documents

    # materialize=True: the exploded gram relation feeds BOTH the
    # first-owner aggregation and the join probe side — without the
    # checkpoint the whole normalize+shingle+hash chain runs twice
    # (the same two-consumer rule as the dedup pair detectors)
    sh = hashed_shingled_documents(
        spark, sf_dir, NOVELTY_N, materialize=True
    ).filter(F.size("hs") > 0)
    g = sh.select("doc_id", F.explode("hs").alias("h"))
    owner = g.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
    return (
        g.join(owner, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(novel / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


@query(
    "quality_language_consistency",
    oracle=f"""
    WITH lid AS ({_lang_oracle()})
    SELECT labeled_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(predicted_lang <> labeled_lang AND predicted_lang <> 'und'
                AS INT) AS is_mismatch
    FROM lid GROUP BY 1, 2
    """,
)
def quality_language_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (labeled, predicted) language confusion matrix over the
    corpus — the label-noise report a pipeline checks before trusting
    the ``lang`` column for stratified sampling or per-language
    filtering. ``is_mismatch`` marks confident disagreements
    (prediction differs AND is not 'und'); 'und' rows are coverage
    gaps, not noise.

    Scale: the language-id projection is scan-side (fixed marker-array
    intersections, no UDF) and the confusion matrix is one map-side-
    combined aggregation over a <=36-cell group space — output size is
    alphabet-bounded, independent of corpus size."""
    lid = text_language_id(spark, sf_dir)
    mism = (
        (F.col("predicted_lang") != F.col("labeled_lang"))
        & (F.col("predicted_lang") != "und")
    )
    return (
        lid.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("is_mismatch", mism.cast("int"))
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: how big a vocab covers X% of token mass.
# ---------------------------------------------------------------------------
COVERAGE_TARGETS = (90, 95, 99)  # percent of total token occurrences
# contiguous tf-DESC range buckets for the two-stage tier cumsum (the
# stats_zipf_fit rank pattern): the ~sqrt(2N) tier table never passes
# through one task
VOCAB_TIER_BUCKETS = 32


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
    tiers AS (
      SELECT tf, count(*) AS n_terms, tf * count(*) AS tokens
      FROM tf GROUP BY tf
    ),
    cum AS (
      SELECT tf, n_terms, tokens,
             coalesce(sum(tokens) OVER (ORDER BY tf DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before,
             coalesce(sum(n_terms) OVER (ORDER BY tf DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS terms_before,
             sum(tokens) OVER () AS total
      FROM tiers
    )
    SELECT coverage_pct, vocab_size, covered_tokens, total_tokens FROM (
      SELECT t.coverage_pct,
             CAST(cum.terms_before
                  + (tgt.tokens_needed - cum.tok_before + cum.tf - 1) // cum.tf
               AS BIGINT) AS vocab_size,
             CAST(cum.tok_before
                  + ((tgt.tokens_needed - cum.tok_before + cum.tf - 1) // cum.tf)
                    * cum.tf AS BIGINT) AS covered_tokens,
             CAST(cum.total AS BIGINT) AS total_tokens
      FROM cum
      CROSS JOIN (VALUES {", ".join(f"({t})" for t in COVERAGE_TARGETS)})
        t(coverage_pct)
      CROSS JOIN LATERAL (
        SELECT (cum.total * t.coverage_pct + 99) // 100 AS tokens_needed
      ) tgt
      WHERE cum.tok_before < tgt.tokens_needed
        AND cum.tok_before + cum.tokens >= tgt.tokens_needed
    )
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each coverage target in {COVERAGE_TARGETS}%: the smallest
    frequency-ordered vocabulary (ties arbitrary within a frequency
    tier — any k same-frequency terms cover k*tf tokens, so the SIZE is
    tie-free) that covers that share of total token occurrences, plus
    the exact token mass covered. The tokenizer-sizing table: "how many
    word types until 99% of running text is in-vocabulary".

    Scale: the vocabulary itself is never globally ranked (the
    stats_zipf_fit lesson). Everything reduces through the
    COUNT-OF-COUNTS table — (tf, n_terms) tiers, at most ~sqrt(2N)
    rows for N total tokens since distinct counts sum to N. That is
    still ~1e7 rows at 100-TB token mass, so the cumsum over it is NOT
    a single unpartitioned window (VERDICT r14 #4): it reuses
    stats_zipf_fit's two-stage distributed pattern — range-partition
    the tiers on tf DESC (checkpoint-pinned: repartitionByRange
    re-samples boundaries per action otherwise), collect only the
    per-bucket (tokens, n_terms) SUBTOTALS to the driver, turn them
    into cumulative bucket offsets, and run the running sum WITHIN
    each bucket, partitioned by bucket id. The grand total falls out
    of the same bounded collect. All arithmetic is integer (ceil via
    (a+b-1) div b; targets as integer percents), so both engines agree
    exactly — no float boundary anywhere."""
    from benchviz_spark.sources.tables import spread

    # spread(): same one-split-scan fix as text_bpe_tokenize_docs
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    tiers = tf.groupBy("tf").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.col("tf") * F.count(F.lit(1))).alias("tokens"),
    )
    parted = (
        tiers.repartitionByRange(VOCAB_TIER_BUCKETS, F.col("tf").desc())
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotals = {
        r["pid"]: (r["tok"], r["terms"])
        for r in parted.groupBy("pid")
        .agg(F.sum("tokens").alias("tok"), F.sum("n_terms").alias("terms"))
        .collect()
    }
    offsets, tok_acc, term_acc = [], 0, 0
    for pid in sorted(subtotals):
        offsets.append((pid, tok_acc, term_acc))
        tok_acc += subtotals[pid][0]
        term_acc += subtotals[pid][1]
    off_df = spark.createDataFrame(
        offsets, "pid int, tok_offset long, terms_offset long"
    )
    w_prev = W.partitionBy("pid").orderBy(F.col("tf").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = parted.join(F.broadcast(off_df), "pid").select(
        "tf",
        "n_terms",
        "tokens",
        (
            F.coalesce(F.sum("tokens").over(w_prev), F.lit(0))
            + F.col("tok_offset")
        ).alias("tok_before"),
        (
            F.coalesce(F.sum("n_terms").over(w_prev), F.lit(0))
            + F.col("terms_offset")
        ).alias("terms_before"),
        F.lit(tok_acc).cast("long").alias("total"),
    )
    targets = spark.range(1).select(
        F.explode(F.lit(list(COVERAGE_TARGETS))).alias("coverage_pct")
    )
    need = F.expr("(total * coverage_pct + 99) div 100")
    k = F.expr("(tokens_needed - tok_before + tf - 1) div tf")
    return (
        cum.crossJoin(F.broadcast(targets))
        .withColumn("tokens_needed", need)
        .filter(
            (F.col("tok_before") < F.col("tokens_needed"))
            & (F.col("tok_before") + F.col("tokens") >= F.col("tokens_needed"))
        )
        .select(
            F.col("coverage_pct").cast("long").alias("coverage_pct"),
            (F.col("terms_before") + k).cast("long").alias("vocab_size"),
            (F.col("tok_before") + k * F.col("tf"))
            .cast("long")
            .alias("covered_tokens"),
            F.col("total").cast("long").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 retrieval: top-k documents for a fixed query set — the lexical
# ranking primitive of a RAG / search layer over the corpus, one level
# up from TF-IDF (length-normalized saturation tf, Robertson idf).
# ---------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5
BM25_QUERIES = {
    "hash_join_tuning": ("hash", "join", "merge"),
    "scan_filter_pushdown": ("scan", "filter", "table"),
    "stream_windowing": ("stream", "window", "batch"),
}


def _bm25_oracle() -> str:
    values = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in BM25_QUERIES.items() for t in terms
    )
    return f"""
    WITH qt AS (SELECT * FROM (VALUES {values}) AS v(query_id, term)),
    tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
    tf AS (
      SELECT tok.doc_id, tok.term, count(*) AS tf
      FROM tok JOIN (SELECT DISTINCT term FROM qt) q USING (term)
      GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT qt.query_id, tf.doc_id,
             round(sum(
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                    + {BM25_B} * dl.dl / stats.avgdl))
             ), 6) AS score
      FROM tf
      JOIN qt USING (term)
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
             ) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {BM25_TOPK}
    """


@query("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOPK} documents per query for a fixed keyword query
    set under Okapi BM25 (k1={BM25_K1}, b={BM25_B}, Robertson idf
    ln(1 + (N - df + .5)/(df + .5))) — lexical retrieval over the
    corpus, the search-side sibling of ``similarity_exact_topk``'s
    dense retrieval. Ranking ties break on ROUNDED score then doc_id
    so both engines cut identical top-k sets.

    Scale design: the inverted-index probe shape — the token stream is
    semi-joined to the (broadcast, constant-size) query-term list
    BEFORE any per-term aggregation, so tf/df/scoring touch only
    postings of queried terms (query-result-sized, not corpus-sized);
    the only corpus-sized aggregations are the per-doc length count
    and its 1-row avgdl reduction, both map-side combinable. The df
    relation is query-term-bounded (broadcast), and the final top-k
    lowers to a per-query WindowGroupLimit, never a global sort."""
    from benchviz_spark.sources.tables import spread

    # spread(): same one-split-scan fix as text_bpe_tokenize_docs
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    qt = spark.createDataFrame(
        [(q, t) for q, terms in BM25_QUERIES.items() for t in terms],
        "query_id string, term string",
    )
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        tok.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_score = (
        F.log(
            1
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "score", "rank")
    )


@query(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH {_bpe_trained_wn_cte()},
    tok AS (
      SELECT lang, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents
    ),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT)         AS n_words,
             CAST(sum(n_sym) AS BIGINT)       AS n_tokens,
             CAST(sum(length(w)) AS BIGINT)   AS n_chars
      FROM tok JOIN wn USING (w)
      GROUP BY lang
    )
    SELECT lang, n_words, n_tokens,
           round(n_tokens::DOUBLE / n_words, 6) AS fertility,
           round(n_chars::DOUBLE / n_tokens, 6) AS chars_per_token
    FROM agg
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility under the TRAINED BPE merges:
    tokens-per-word and chars-per-token by lang. THE multilingual
    tokenizer-efficiency audit — a language whose fertility runs high
    is under-served by the learned vocab (its text costs more tokens
    per word), which silently skews any token-denominated mixture or
    budget; this query is what a pipeline alarms on before committing
    a vocab, and pairs with curation_token_budget (which plans in
    trained tokens) and sample_temperature_mix (which rebalances by
    doc counts).

    Scale: identical shape to text_bpe_tokenize_docs — merge
    application on the vocab-sized word table, one corpus explode
    joined to it on the word key (AQE-broadcast build side), then a
    languages-bounded final aggregation instead of a per-doc one."""
    _, trained = _bpe_train(spark, sf_dir)
    wn = trained.select(
        "w", F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("n_sym")
    )
    from benchviz_spark.sources.tables import spread

    # spread(): same one-split-scan fix as text_bpe_tokenize_docs
    docs = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = docs.select("lang", F.explode(_tokens(F.col("text"))).alias("w"))
    agg = (
        tok.join(wn, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
        )
    )
    return agg.select(
        "lang",
        "n_words",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "chars_per_token"
        ),
    )
