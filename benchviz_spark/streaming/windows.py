"""Streaming window aggregations over the ``events`` stream (SURVEY
§2.9): the batch window specs from operators/events.py run under
``readStream`` with watermarks. Batch/stream parity is the test —
each streaming query's availableNow output must equal its
oracle-checked batch twin.

Late data: the 1-hour watermark bounds state; in availableNow test
runs nothing is late, so parity with batch is exact. ``complete`` vs
``append`` mode: the aggregations here use append mode + watermark —
the production configuration, where a window emits once it can no
longer receive late rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream. The file carries TIMESTAMP(NANOS);
    like the batch loader (tables.py:_load_events) the conversion
    branches on the dtype Spark actually loads: 4.x reads it natively as
    timestamp_ntz (cast to session-TZ timestamp), 3.x needs the
    legacy-long workaround (ns BIGINT -> integer-divide to µs). The
    stream targets the table through a glob path + directory basePath,
    not ``sf_dir`` + ``pathGlobFilter`` — rationale and the basePath
    force-override caveat in read_documents_stream."""
    table = f"{sf_dir}/events.parquet"
    try:
        batch_schema = spark.read.parquet(table).schema
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        batch_schema = spark.read.parquet(table).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/[e]vents.parquet")
    )
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp":
        return stream
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_tumbling_hourly (same spec + watermark)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_session_stats: native session_window
    state merging under a watermark."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "n_events",
            "total_value",
        )
    )


def stream_sliding_hourly_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_sliding_hourly_halfhour: 1-hour windows
    sliding every 30 minutes (each event lands in 2 windows, fanned out
    scan-side), watermark-bounded state."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "avg_value",
        )
    )


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on event_id with bounded state:
    dropDuplicatesWithinWatermark keeps only ids seen inside the
    watermark horizon, so state is O(events per hour), not O(all
    history) — the streaming twin of exact dedup. Parity with batch
    dropDuplicates is tested (the finite test input has no late data)."""
    events = read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def stream_stream_purchase_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's
    views within the preceding hour. Both sides are watermarked; the
    time-range condition bounds each side's join state to one hour of
    events — without it a stream-stream join would buffer both streams
    forever. Batch twin: events_purchase_view_pairs (oracle-checked);
    parity is tested."""
    events = read_events_stream(spark, sf_dir)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "purchase_id",
        "view_id",
        "user_id",
        F.unix_timestamp("p_ts").alias("purchase_ts_s"),
        F.unix_timestamp("v_ts").alias("view_ts_s"),
    )


DRAIN_STATE_PARTITIONS = 8


def run_to_memory(df: DataFrame, name: str, mode: str = "append"):
    """Drain an availableNow streaming query into an in-memory table;
    returns after termination (test/gate harness helper).

    Two harness-only choices, both invisible to results (the drained
    rows hash-match the same oracles either way):

    - State partitions: the state-store instance count is fixed by
      spark.sql.shuffle.partitions at first checkpoint, and each
      instance pays per-batch open/commit/maintenance cost. That is a
      THROUGHPUT knob — production streams size it to sustained input
      rate — but a finite gate drain of one file pays 32 stores' fixed
      cost for 10k rows: measured 5-10 s/drain at 32 vs ~2.4 s at 8,
      identical output. The drain pins 8 and restores the session conf.
    - Checkpoint on tmpfs when the host has /dev/shm: the WAL/state
      commits are fsync-heavy, and a throwaway drain checkpoint has no
      durability requirement; tmpfs removes the disk-sync jitter that
      made drain timings swing 2-12 s between bench runs.

    NOT THREAD-SAFE: the partition pin mutates the session-global
    spark.sql.shuffle.partitions for the drain's duration (Spark has
    no per-writer override for the state-store instance count). Every
    caller today — the correctness gate, bench.py, pytest — plans
    queries single-threaded, so nothing else can pick up the
    temporary value; a future parallel harness (pytest-xdist, a
    concurrent gate) must either serialize drains or accept planning
    concurrent queries with DRAIN_STATE_PARTITIONS partitions.
    """
    import os
    import shutil
    import tempfile

    spark = df.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(DRAIN_STATE_PARTITIONS))
    ckpt_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix="drain_ckpt_", dir=ckpt_root)
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        query.awaitTermination()
        return query
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(ckpt, ignore_errors=True)


def streaming_batch_parity(
    spark: SparkSession, batch_df: DataFrame, stream_df: DataFrame, name: str
) -> tuple[int, int]:
    """Run the streaming query to completion and return (n_mismatched,
    n_batch_rows) against the batch result — 0 mismatches = parity.

    complete mode on purpose: with append + watermark, windows
    overlapping the final hour of a finite input are held in state
    forever (the watermark can never pass them), so an availableNow
    drain would under-emit the tail. Production streams use append;
    parity against a finite batch needs every window."""
    run_to_memory(stream_df, name, mode="complete")
    streamed = spark.table(name)
    missing = batch_df.exceptAll(streamed).count()
    extra = streamed.exceptAll(batch_df).count()
    return missing + extra, batch_df.count()



def stream_enriched_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched against the
    static customer dimension, rolled up per (segment, type). The
    static side is re-resolved each micro-batch (so a dimension refresh
    is picked up without restarting the stream) and joins broadcast
    while small — the standard streaming enrichment topology. Batch
    twin: events_enriched_user_segment (oracle-checked); parity tested
    in complete mode."""
    from benchviz_spark.sources.tables import load_table

    events = read_events_stream(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(customer, events.user_id == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a stream — the arriving-corpus shape a
    continuously-ingesting curation pipeline sees. Schema from the
    batch footer (never inferred on the stream). The stream targets the
    table through a glob path (the file source's documented path
    semantics), so it resolves whether the table is a single parquet
    file (the driver's testdata layout) or a directory of part files (a
    production layout) — no reliance on ``pathGlobFilter`` leaf-name
    filtering against a sibling-table directory listing. The
    single-char class keeps the path a glob: for a NON-glob path the
    file-stream source force-overrides the ``basePath`` option with the
    path itself, which errors when the path is a file ("Option
    'basePath' must be a directory")."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/[d]ocuments.parquet")
    )


def stream_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of quality_gopher_rules: the same pure projection
    applied to the document stream. Stateless — no watermark, no state
    store; every arriving micro-batch emits its gate rows immediately,
    which is exactly how a streaming corpus-hygiene stage deploys."""
    from benchviz_spark.operators.quality import gopher_projection

    return gopher_projection(read_documents_stream(spark, sf_dir))


def stream_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of dedup_image_dhash_fingerprints: arriving
    documents are PNG-encoded and perceptually hashed by the REAL
    codec inside the same Arrow-batched ``mapInPandas`` stages the
    batch path uses — the admission-control front of an image-lake
    dedup pipeline (hash on ingest, then probe the persisted band
    index). Stateless, so each micro-batch emits its fingerprints
    immediately and the drain runs in append mode; proves the codec +
    Pandas-UDF plumbing composes with Structured Streaming, not just
    with batch scans."""
    from benchviz_spark.operators.multimodal import document_dhashes

    return document_dhashes(
        # stateless repartition: a single-file micro-batch arrives as one
        # partition and would serialize the compute-heavy stage onto one
        # core (same sizing move as stream_dedup_admission)
        read_documents_stream(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def stream_video_frame_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of dedup_video_fingerprints: arriving documents
    are APNG-encoded and every FRAME perceptually hashed by the real
    container parser inside the same Arrow-batched ``mapInPandas``
    stages the batch path uses — the admission-control front of a
    video-lake dedup pipeline. Stateless (one input row fans out to
    its nf fingerprint rows immediately), so the drain runs in append
    mode; proves the multi-row-per-input mapInPandas shape composes
    with Structured Streaming."""
    from benchviz_spark.operators.multimodal import document_frame_dhashes

    return document_frame_dhashes(
        # stateless repartition: a single-file micro-batch arrives as one
        # partition and would serialize the compute-heavy stage onto one
        # core (same sizing move as stream_dedup_admission)
        read_documents_stream(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def stream_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of quality_hashed_classifier_score: the
    hashing-trick linear model scoring every arriving document — the
    model-based admission filter of a streaming ingest (score on
    arrival, quarantine below threshold). Stateless pure projection
    (the model is a deterministic function of the token stream), so
    each micro-batch emits its scores immediately and the drain runs
    in append mode against the SAME oracle as the batch query."""
    from benchviz_spark.operators.quality import classifier_projection

    return classifier_projection(
        # stateless repartition: a single-file micro-batch arrives as one
        # partition and would serialize the compute-heavy stage onto one
        # core (same sizing move as stream_dedup_admission)
        read_documents_stream(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of sample_importance_dsir's SCORING stage: the
    frozen hashed-n-gram log-ratio model (trained batch-side, shipped
    as a DSIR_BUCKETS-entry array literal) scores every arriving
    document — the distribution-matching admission filter of a
    streaming ingest (keep/boost target-like documents on arrival).
    Completes the streamed admission-control quartet: rules (gopher),
    perceptual (image/video hashes), model-based (classifier), and
    distribution-matching (this). Stateless per-row fold over the
    token array — no explode, no aggregation state — so each
    micro-batch emits immediately in append mode, and the per-doc sum
    matches the batch groupBy to 1e-13 (both round to 6)."""
    from benchviz_spark.operators.dedup import _norm_text
    from benchviz_spark.operators.sampling import (
        DSIR_BUCKETS,
        dsir_log_ratio_rows,
        hash_bucket,
    )

    lrs = dsir_log_ratio_rows(spark, sf_dir)
    arr = F.array(*[F.lit(float(v)) for v in lrs])
    toks = F.split(_norm_text(F.col("text")), " ")
    logw = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(arr, (hash_bucket(t, "dsir:", DSIR_BUCKETS) + 1).cast("int")),
    )
    return (
        read_documents_stream(spark, sf_dir)
        .select("doc_id", "source", "text")
        # stateless repartition before the per-row token fold (same
        # sizing move as stream_dedup_admission)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "source", F.round(logw, 6).alias("log_weight"))
    )


def stream_decontam_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of decontam_eval_overlap: arriving documents
    checked against the FROZEN eval-shingle blocklist — the
    contamination admission filter of a streaming ingest (an eval
    question pasted into an arriving page is caught before it ever
    lands in the lake). The blocklist is built batch-side from the
    eval carve (structurally bounded at EVAL_CAP/EVAL_MOD documents'
    shingles — the decontam module's broadcast argument) and shipped
    to executors as a Spark broadcast variable; each micro-batch then
    needs only a stateless per-row set probe inside mapInPandas, so
    the drain runs append-mode. Counting happens Python-side; the
    contamination ratio itself is computed by Catalyst F.round after
    the UDF so rounding semantics (HALF_UP) match the batch query and
    the DuckDB oracle exactly (Python's round() is banker's and WOULD
    drift on 7-digit-exact ratios like 1/128)."""
    from benchviz_spark.operators.decontam import NGRAM, eval_split
    from benchviz_spark.operators.dedup import _norm_text, _shingles

    from pyspark.sql import functions as F

    ev_rows = (
        sw_shingled_eval(spark, sf_dir, NGRAM)
        .select(F.explode("shingles").alias("g"))
        .distinct()
        .collect()
    )  # eval-carve bounded (MBs at any corpus scale), the frozen blocklist
    bc = spark.sparkContext.broadcast(frozenset(r.g for r in ev_rows))

    toks = F.split(_norm_text(F.col("text")), " ")
    stream = (
        read_documents_stream(spark, sf_dir)
        .filter(~eval_split(F.col("doc_id")))
        # stateless repartition before the shingle projection + Python
        # probe (same sizing move as stream_dedup_admission)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", _shingles(toks, NGRAM).alias("shingles"))
    )

    def probe(batches):
        import pandas as pd

        ev = bc.value
        for pdf in batches:
            n_sh, n_cont = _seg_member_counts(pdf["shingles"], ev)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_shingles": n_sh,
                    "n_contaminated": n_cont,
                }
            )
            yield out[(out["n_shingles"] > 0) & (out["n_contaminated"] > 0)]

    counted = stream.mapInPandas(
        probe, "doc_id long, n_shingles long, n_contaminated long"
    )
    return counted.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
            "contamination"
        ),
    )


def _seg_member_counts(col, member):
    """(lens, hit_counts) per row of a pandas column of string lists,
    computed over the FLATTENED batch: one vectorized isin over every
    shingle in the micro-batch plus a cumsum-difference per segment,
    instead of a Python membership loop per document (r15: the per-doc
    ``sum(1 for g in shs if g in ev)`` loops were the micro-batch's
    compute wall). Exact: set membership on identical Python strings."""
    import numpy as np
    import pandas as pd

    lens = np.fromiter((len(v) for v in col), dtype=np.int64, count=len(col))
    if int(lens.sum()) == 0:
        return lens, np.zeros(len(col), dtype=np.int64)
    flat = [g for v in col for g in v]
    hits = pd.Series(flat, dtype=object).isin(member).to_numpy(dtype=np.int64)
    c = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(hits)])
    ends = np.cumsum(lens)
    return lens, c[ends] - c[ends - lens]


def _band_keys_vec(col, params, p, n_bands, rows_per_band):
    """Per-row MinHash band-key lists for a pandas column of shingle
    lists — the stream twin of the batch ``band_buckets`` formula,
    vectorized over the flattened micro-batch: one md5 per UNIQUE
    shingle (documents share vocabulary), all 32 affine hashes as one
    (32, total) int64 matrix op (operands stay < 2^62, exact), and
    per-document minima via minimum.reduceat over the segment starts.
    Replaces a pure-Python md5+min loop per document measured as the
    dominant cost of the streamed admission probe. Bit-identical keys:
    same md5 base, same affine family, same decimal join."""
    import hashlib

    import numpy as np

    a_arr = np.array([a for a, _ in params], dtype=np.int64).reshape(-1, 1)
    b_arr = np.array([b for _, b in params], dtype=np.int64).reshape(-1, 1)
    lens = np.fromiter((len(v) for v in col), dtype=np.int64, count=len(col))
    out = [[] for _ in range(len(lens))]
    if int(lens.sum()) == 0:
        return out
    flat = [s for v in col for s in v]
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    ubase = np.fromiter(
        (
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % p
            for s in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    bases = ubase[inv]
    vals = (a_arr * bases[None, :] + b_arr) % p
    ends = np.cumsum(lens)
    nonzero = np.nonzero(lens)[0]
    starts = (ends - lens)[nonzero]
    mins = np.minimum.reduceat(vals, starts, axis=1)
    for j, i in enumerate(nonzero):
        m = mins[:, j]
        out[i] = [
            "_".join(
                str(int(m[bi * rows_per_band + r]))
                for r in range(rows_per_band)
            )
            for bi in range(n_bands)
        ]
    return out


def sw_shingled_eval(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Eval-carve documents shingled batch-side (the static side of the
    streamed decontamination gate)."""
    from benchviz_spark.operators.decontam import eval_split
    from benchviz_spark.operators.dedup import shingled_documents

    return shingled_documents(spark, sf_dir, n=n).filter(
        eval_split(F.col("doc_id"))
    )


def stream_dedup_admission(
    spark: SparkSession, sf_dir: str, prefix: str = "admission"
) -> DataFrame:
    """Streaming twin of curation.admission_delta_indexed: arriving
    documents admitted or dropped per-document against the DURABLE
    standing-corpus admission index (curation.build_admission_index) —
    the persisted (band, bucket) postings, fingerprint store, Bloom
    bitset, and eval-gram blocklist become the single admission source
    of truth across batch and stream (VERDICT r14 #5).

    Shape, tier by tier:
    - hygiene: eval carve + length are stateless scan filters; the
      contamination count probes the frozen eval-gram set inside
      mapInPandas (the stream_decontam_gate pattern), and the ratio
      flag is computed by Catalyst F.round so the HALF_UP boundary is
      bit-identical to the batch gate. The division lives inside a
      when(n_shingles > 0) branch — ANSI mode raises on /0 and a guard
      conjunct does not protect a sibling conjunct.
    - minhash: the same mapInPandas pass computes each document's
      N_BANDS bucket strings with the batch formula verbatim (md5-based
      base, the module's _HASH_PARAMS affine family, decimal-joined
      band keys) — pure per-row integer arithmetic, so stream keys
      equal batch keys equal the DuckDB oracle's.
    - exact tier: the persisted ~8 KiB Bloom bitset ships as a literal
      map column (collected once at plan time — it IS a constant of the
      standing epoch); only bloom-positive rows reach the stream-static
      LEFT ANTI join against the fp-bucketed index.
    - near-dup tier: posexplode_outer the bucket keys (outer: a
      shingle-less document has no bands and must stay admitted), then
      stream-static equi-join the (band, bucket)-bucketed postings and
      the doc_id-bucketed shingle store — the corpus side never moves —
      and verify by exact Jaccard. left_outer joins keep
      candidate-less rows alive for the final verdict.
    - verdict: groupBy(doc) agg any(verified) — a per-arriving-doc
      aggregation, drained in complete mode by the registered gate
      (each doc_id arrives exactly once, so complete == the admitted
      set; a production deployment emits per-micro-batch updates).

    Candidate pairs are NOT pre-deduped across bands (the batch path's
    .distinct() before verification): the any()-verdict makes
    duplicate candidates harmless, and dropping the distinct keeps the
    pre-aggregation pipeline stateless."""
    from benchviz_spark.operators.curation import (
        MIN_CHARS,
        _with_split,
        admission_index_names,
    )
    from benchviz_spark.operators.decontam import NGRAM as DECONTAM_NGRAM
    from benchviz_spark.operators.decontam import THRESHOLD, eval_split
    from benchviz_spark.operators.dedup import (
        _HASH_PARAMS,
        _INCR_SEEN_RE,
        _MERSENNE31,
        N_BANDS,
        ROWS_PER_BAND,
        _norm_text,
        _shingles,
        jaccard_of,
    )
    from benchviz_spark.operators.relational_ext import bloom_might_contain

    names = admission_index_names(prefix)

    # Frozen standing state, all index-epoch constants: the eval-gram
    # blocklist (eval-carve bounded, broadcast) and the one-row bloom
    # bitset (literalized — the stream plan carries it like any other
    # constant of the epoch).
    ev_set = frozenset(
        r.g for r in spark.table(names["eval_grams"]).collect()
    )
    bc = spark.sparkContext.broadcast(ev_set)
    bloom_map = spark.table(names["bloom"]).collect()[0]["bloom"]
    # Build the literal map in ONE py4j call: r15 already collapsed the
    # ~2048 per-entry literal Columns (~6 s of py4j) into two array
    # literals, but F.lit over a 1024-element Python list still
    # serialized element-by-element — profiled at ~1 s of the ~2.1 s
    # steady-state plan build (scripts/opt_profile_stream_admission.py).
    # A SQL literal string parses JVM-side in milliseconds and
    # constant-folds to the identical map<int,bigint>.
    bloom_keys = [int(k) for k in sorted(bloom_map)]
    bloom_vals = [int(bloom_map[k]) for k in sorted(bloom_map)]
    bloom_lit = F.expr(
        "map_from_arrays(array({}), array({}))".format(
            ",".join(str(k) for k in bloom_keys),
            ",".join(f"{v}L" for v in bloom_vals),
        )
    )

    params = list(_HASH_PARAMS)
    p = _MERSENNE31
    n_bands, rows_per_band = N_BANDS, ROWS_PER_BAND

    toks = F.split(_norm_text(F.col("text")), " ")
    # Stateless repartition to cluster parallelism BEFORE the heavy
    # projection: the shingling expressions and the per-shingle md5
    # loop inside probe() below are the micro-batch's compute wall,
    # and a single-file micro-batch (the test layout) arrives as ONE
    # partition — serializing all of it onto one core. Exchanging the
    # batch-sized rows once per micro-batch is the standard sizing
    # move for a compute-bound stream stage; the per-document verdict
    # is partitioning-independent (pure projections + a final groupBy).
    stream = (
        read_documents_stream(spark, sf_dir)
        .filter(~F.col("source").rlike(_INCR_SEEN_RE))
        .filter(
            (~eval_split(F.col("doc_id"))) & (F.col("n_chars") >= MIN_CHARS)
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.md5(_norm_text(F.col("text"))).alias("fp"),
            _shingles(toks, DECONTAM_NGRAM).alias("g4"),
            _shingles(toks, 3).alias("g3"),
            F.array_distinct(
                F.transform(_shingles(toks, 3), lambda s: F.xxhash64(s))
            ).alias("hs"),
        )
    )

    def probe(batches):
        import pandas as pd

        ev = bc.value

        for pdf in batches:
            n_sh, n_cont = _seg_member_counts(pdf["g4"], ev)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "source": pdf["source"],
                    "n_chars": pdf["n_chars"],
                    "fp": pdf["fp"],
                    "hs": pdf["hs"],
                    "n_shingles": n_sh,
                    "n_contaminated": n_cont,
                    "buckets": _band_keys_vec(
                        pdf["g3"], params, p, n_bands, rows_per_band
                    ),
                }
            )

    probed = stream.mapInPandas(
        probe,
        "doc_id long, lang string, source string, n_chars long, fp string,"
        " hs array<long>, n_shingles long, n_contaminated long,"
        " buckets array<string>",
    )

    contaminated = F.when(
        F.col("n_shingles") > 0,
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6)
        >= THRESHOLD,
    ).otherwise(F.lit(False))
    clean = probed.filter(~contaminated).withColumn("bloom", bloom_lit)

    maybe_seen = bloom_might_contain(F.xxhash64("fp"))
    flagged = clean.withColumn("maybe_seen", maybe_seen).drop("bloom")
    old_fps = spark.table(names["fps"]).select("fp")
    new_vs_old = flagged.filter(~F.col("maybe_seen")).unionByName(
        flagged.filter(F.col("maybe_seen")).join(old_fps, "fp", "left_anti")
    )

    exploded = new_vs_old.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "hs",
        F.posexplode_outer("buckets").alias("band", "bucket"),
    )
    old_b = spark.table(names["bands"]).select(
        F.col("doc_id").alias("old_id"), "band", "bucket"
    )
    old_sh = spark.table(names["shingles"]).select(
        F.col("doc_id").alias("old_id"), F.col("hs").alias("sb")
    )
    cand = exploded.join(old_b, ["band", "bucket"], "left_outer").join(
        old_sh, "old_id", "left_outer"
    )
    jac = jaccard_of("hs", "sb")
    verified = F.coalesce(jac >= 0.5, F.lit(False))
    admitted = (
        cand.groupBy("doc_id", "lang", "source", "n_chars")
        .agg(F.max(verified).alias("dropped"))
        .filter(~F.col("dropped"))
        .drop("dropped")
    )
    return _with_split(admitted).select(
        "doc_id", "lang", "source", "n_chars", "split"
    )
