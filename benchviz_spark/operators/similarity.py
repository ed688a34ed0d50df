"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Training-data-pipeline tier: exact brute-force cosine top-k as the
correctness baseline, and a random-hyperplane LSH approximate
nearest-neighbor path as the scale variant. No reference analogue (the
reference visualizes benchmark logs); these exist for the engine's
100-TB LLM-pipeline brief, over the driver's ``embeddings.parquet``.

Scale design:

- The exact top-k broadcasts the (small) query set against the full
  corpus: the corpus never shuffles, each partition scores its rows and
  a per-query row_number window takes k. Dot products are Catalyst
  ``zip_with``/``aggregate`` higher-order expressions — whole-stage
  codegen, no Python, no UDF.
- The ANN path buckets vectors by sign-bit signatures against T tables
  of B random hyperplanes. Candidates = same (table, bucket) as a
  query; only candidates get exact re-ranking. At n=500 the parameters
  (12 tables x 5 bits) are tuned for recall on near-orthogonal random
  vectors; at 1e9+ rows you'd raise B toward log2(n) and keep T for
  recall — the plan shape (signature project -> bucket groupBy ->
  candidate join -> re-rank) is unchanged.
- Cosines are computed in double and rounded to 6 places BEFORE
  ranking, with vec_id tie-breaks, so Spark and the DuckDB oracle order
  identically despite summation-order float noise.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

N_QUERIES = 10  # query set = vec_id < 10
TOP_K = 10

# LSH layout: T tables x B sign bits per table.
N_TABLES = 12
N_BITS = 5
_DIM = 64

# Deterministic hyperplanes, baked into the plan as literals (2-4 KB).
_HYPERPLANES = np.random.RandomState(7).standard_normal((N_TABLES, N_BITS, _DIM))


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """sum_i a_i*b_i as a codegen'd fold — stays JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


# ---------------------------------------------------------------------------
# Exact brute-force cosine top-k (the correctness baseline).
# ---------------------------------------------------------------------------
@query(
    "similarity_exact_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings WHERE vec_id >= {N_QUERIES}
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(
               list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(ce, x -> x::DOUBLE * x::DOUBLE)))),
               6) AS cosine
      FROM q CROSS JOIN c
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
             ) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def similarity_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors for each of the first 10 vectors. The
    query side is broadcast; the corpus is scanned once, never
    shuffled until the k-row-per-query window."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qe")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("ce")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN: bucket, candidate-join, exact re-rank.
# ---------------------------------------------------------------------------
def _bucket_structs() -> Column:
    """array<struct<table,bucket>>: for each table, the B sign bits of
    the row's embedding against that table's hyperplanes, packed into an
    int. Pure Catalyst — 60 dot products per row.

    The hyperplane tensor enters the plan as ONE nested array literal
    and the per-table/per-bit loops are higher-order functions, not an
    unrolled Python loop over 3,840 scalar literals: the unrolled form
    produced an expression tree so large it fell out of whole-stage
    codegen and evaluated interpreted (measured 6x slower on the sf0.1
    bench, plus seconds of Janino compile time). Bit packing is a
    zip_with against a power-of-two weight vector folded with
    aggregate — the same deterministic left-to-right fold as before, so
    bucket ids are bit-identical to the unrolled version (asserted when
    this change landed)."""
    planes = F.lit(np.asarray(_HYPERPLANES).tolist())  # array<array<array<double>>>
    weights = F.lit([float(1 << j) for j in range(N_BITS)])
    emb_d = _as_double(F.col("embedding"))
    return F.transform(
        planes,
        lambda tbl, t: F.struct(
            t.cast("int").alias("table"),
            F.aggregate(
                F.zip_with(
                    tbl,
                    weights,
                    lambda p, w: F.when(_dot(emb_d, p) > 0, w).otherwise(F.lit(0.0)),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("int")
            .alias("bucket"),
        ),
    )


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings -> (vec_id, table, bucket), N_TABLES rows per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.explode(_bucket_structs()).alias("tb")
    ).select("vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantize into cells, probe nearest
# cells only.
# ---------------------------------------------------------------------------
N_CELLS_MOD = 31  # centroids = vectors with vec_id % 31 == 3 (~n/31 cells)
N_PROBE = 3


def ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell_id): every vector assigned to its nearest centroid.

    Centroids are a deterministic corpus sample (the 0-iteration k-means
    variant — production IVF would Lloyd-iterate the same assignment
    plan a few times; the dataflow below IS one Lloyd E-step). The
    centroid set is tiny and broadcast; assignment is a 1-vs-k fan-out
    + row_number, never a corpus shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.pmod(F.col("vec_id"), F.lit(N_CELLS_MOD)) == 3).select(
        F.col("vec_id").alias("cell_id"), _as_double("embedding").alias("cvec")
    )
    scored = emb.select("vec_id", _as_double("embedding").alias("v")).join(
        F.broadcast(cents)
    )
    w = W.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cell_id")
    )
    return (
        scored.select(
            "vec_id", "cell_id", _cosine(F.col("v"), F.col("cvec")).alias("cos")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )


@query("similarity_ann_ivf_topk")  # no SQL oracle: IVF probing isn't SQL; recall
def similarity_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via IVF: queries probe their N_PROBE nearest cells and
    re-rank only vectors in those cells. At 1e9+ vectors the cell count
    grows ~sqrt(n) and the probed fraction shrinks accordingly; the plan
    (assign -> probe -> candidate equi-join on cell -> exact re-rank)
    is scale-invariant. Recall pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.pmod(F.col("vec_id"), F.lit(N_CELLS_MOD)) == 3).select(
        F.col("vec_id").alias("cell_id"), _as_double("embedding").alias("cvec")
    )
    cells = ivf_cells(spark, sf_dir)

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe")
    )
    # probe list: top-N_PROBE cells per query
    probe_w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cell_id"))
    probes = (
        queries.join(F.broadcast(cents))
        .select("query_id", "cell_id", _cosine(F.col("qe"), F.col("cvec")).alias("cos"))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "cell_id")
    )
    cand = (
        cells.filter(F.col("vec_id") >= N_QUERIES)
        .withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(probes), "cell_id")
        .select("query_id", "neighbor_id")
    )
    qe = emb.select(F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe"))
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("ce")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("cosine")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Lloyd-iterated k-means training for IVF centroids (iterative
# algorithm on DataFrames).
# ---------------------------------------------------------------------------
def kmeans_train(
    spark: SparkSession, sf_dir: str, n_iter: int = 3
) -> tuple[DataFrame, list[float]]:
    """k-means over the embedding corpus: the seed centroids are the
    same deterministic sample ivf_cells uses; each Lloyd iteration is
    (assign to nearest centroid) -> (mean per cell), both as DataFrame
    ops. Returns (centroids(cell_id, cvec), inertia_per_iteration).

    Iterative-algorithm mechanics on Spark: each iteration's centroid
    table is collapsed to a LOCAL list (k x dim floats — tiny) and
    re-broadcast, which truncates the lineage so the plan does not grow
    with iterations (the classic iterative-DataFrame trap). The corpus
    is never collected.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cents_rows = [
        (int(r.vec_id), list(r.v))
        for r in emb.filter(F.pmod(F.col("vec_id"), F.lit(N_CELLS_MOD)) == 3).collect()
    ]
    inertia_hist: list[float] = []
    cents_df = None
    for _ in range(n_iter):
        cents_df = spark.createDataFrame(cents_rows, "cell_id long, cvec array<double>")
        # E-step: nearest centroid by squared euclidean distance
        dist2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        assigned = (
            emb.join(F.broadcast(cents_df))
            .select("vec_id", "v", "cell_id", dist2.alias("d2"))
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("vec_id").orderBy(F.col("d2"), F.col("cell_id"))
                ),
            )
            .filter(F.col("rn") == 1)
        )
        inertia_hist.append(assigned.agg(F.sum("d2")).collect()[0][0])
        # M-step: per-cell mean, element-wise via posexplode + avg
        means = (
            assigned.select("cell_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cell_id", F.transform(F.col("pm"), lambda s: s.m).alias("cvec")
            )
        )
        cents_rows = [(int(r.cell_id), list(r.cvec)) for r in means.collect()]
    return cents_df, inertia_hist


# ---------------------------------------------------------------------------
# Grouped-map (applyInPandas) surface: per-group numpy computation.
# ---------------------------------------------------------------------------
@query("similarity_label_centroid_dist")  # rows-only; pytest checks vs native math
def similarity_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid distances via ``applyInPandas``: each label
    group arrives as one Arrow-backed pandas frame, numpy computes the
    group centroid and every member's euclidean distance to it. The
    grouped-map surface is for per-group model-ish math that Catalyst
    can't express (here it could — tests pin it against the native
    formulation — but the point is the contract: one shuffle on the
    group key, Python sees whole groups, output schema is declared)."""
    import pandas as pd  # noqa: F401 (Arrow path)

    emb = load_table(spark, sf_dir, "embeddings")

    def centroid_dist(pdf):
        import numpy as np
        import pandas as pd

        mat = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
        centroid = mat.mean(axis=0)
        dist = np.sqrt(((mat - centroid) ** 2).sum(axis=1))
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].astype("int64"),
                "label": pdf["label"].astype("int32"),
                "dist_to_centroid": dist.round(6),
            }
        )

    return emb.groupBy("label").applyInPandas(
        centroid_dist, schema="vec_id long, label int, dist_to_centroid double"
    )


@query("similarity_ann_lsh_topk")  # no SQL oracle: LSH bucketing isn't SQL; recall
def similarity_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via sign-LSH: queries and corpus are bucketed by the
    same hyperplanes; candidate pairs share at least one (table, bucket);
    candidates are re-ranked by exact cosine. The full query x corpus
    product is never formed — the candidate join is an equi-join on
    (table, bucket) that Catalyst executes as a hash join. Recall vs
    ``similarity_exact_topk`` is pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    buckets = lsh_buckets(spark, sf_dir)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cb = buckets.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "table", "bucket"
    )
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qe = emb.select(F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe"))
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("ce")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id", "neighbor_id", _cosine(F.col("qe"), F.col("ce")).alias("cosine")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
