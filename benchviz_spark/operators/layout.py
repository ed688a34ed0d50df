"""Z-order (Morton) clustering for multi-dimensional data skipping.

A 100-TB events table is queried along TWO axes at once — "this user,
this week" — but a lake sorted by either axis alone only prunes that
one axis: user-sorted files each span the whole time range, time-sorted
files span every user. Interleaving the bits of both keys into a single
Morton value and range-partitioning the write on it gives every file a
bounded min/max rectangle in BOTH dimensions, so parquet row-group
min/max stats prune two-dimensional predicates. This is the layout
trick Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``.

Interleaving RAW key bits degenerates when the dimensions occupy
unequal dynamic ranges (the axis with higher varying bits dominates the
sort and the other axis loses all locality — at test SF the hour axis
varies only in its low ~7 bits while user ids vary in their top bits,
so a raw interleave collapses to a plain user sort). So, as production
z-order implementations do, each dimension is first NORMALIZED to a
``ZBITS``-bit bucket from its global min/max — one tiny min/max
aggregate (2 rows of state, broadcast back) — and the buckets are
interleaved. All-integer math, so the whole transform (normalization
included) is oracle-checkable bit-for-bit against DuckDB.

Scale: the min/max pass is a map-side-combined scalar aggregate (any
table-format column stats could supply it for free); the z projection
is 32 shift/mask terms fused by whole-stage codegen — no UDF, no
Python; the companion writer adds the single range-partition shuffle
any clustered rewrite needs. Locality (per-file two-axis bounding
boxes shrink vs a one-axis sort) is asserted in tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benchviz_spark.registry import query
from benchviz_spark.sources.tables import load_table

ZBITS = 8  # buckets per dimension; 2*ZBITS total z bits


def _interleave_sql(x: str, y: str, spark_dialect: bool) -> str:
    """Morton interleave of two ZBITS-bit integer SQL expressions;
    ``x`` occupies the odd (higher) bit positions. The same term list
    renders to Spark (shiftleft/shiftright functions) and DuckDB
    (<< / >> operators), so both engines evaluate the identical bit
    recipe."""
    terms = []
    for i in range(ZBITS):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def _bucket_sql(v: str, vmin: str, vmax: str, spark_dialect: bool) -> str:
    """Equal-width bucket id in [0, 2^ZBITS) from global min/max —
    integer arithmetic only, so both engines agree exactly."""
    div = "div" if spark_dialect else "//"
    return f"((({v}) - {vmin}) * {1 << ZBITS} {div} ({vmax} - {vmin} + 1))"


_HOUR_SPARK = "cast(floor(unix_timestamp(ts) / 3600) as bigint)"
_HOUR_DUCK = "CAST(floor(epoch(ts) / 3600) AS BIGINT)"


def _zorder_oracle() -> str:
    ux = _bucket_sql("user_id", "umin", "umax", spark_dialect=False)
    hy = _bucket_sql("hr", "hmin", "hmax", spark_dialect=False)
    return f"""
    WITH e AS (SELECT event_id, user_id, {_HOUR_DUCK} AS hr FROM events),
    b AS (SELECT min(user_id) AS umin, max(user_id) AS umax,
                 min(hr) AS hmin, max(hr) AS hmax FROM e)
    SELECT event_id,
           CAST({ux} AS BIGINT) AS ux,
           CAST({hy} AS BIGINT) AS hy,
           CAST({_interleave_sql(ux, hy, spark_dialect=False)} AS BIGINT)
             AS zval
    FROM e CROSS JOIN b
    """


@query("layout_zorder_events", oracle=_zorder_oracle())
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value for every event over min/max-normalized
    (user_id, hour-of-epoch) buckets — the clustering key a
    two-dimensional events lake sorts by. The bounds aggregate is one
    broadcast row; everything else is scan-side bit arithmetic."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr(_HOUR_SPARK).alias("hr")
    )
    bounds = events.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("hr").alias("hmin"),
        F.max("hr").alias("hmax"),
    )
    ux = _bucket_sql("user_id", "umin", "umax", spark_dialect=True)
    hy = _bucket_sql("hr", "hmin", "hmax", spark_dialect=True)
    return events.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        F.expr(ux).cast("long").alias("ux"),
        F.expr(hy).cast("long").alias("hy"),
        F.expr(_interleave_sql(ux, hy, spark_dialect=True))
        .cast("long")
        .alias("zval"),
    )


def write_zorder_lake(df: DataFrame, path: str, n_files: int = 64) -> None:
    """Cluster ``df`` (must carry ``zval``) into ``n_files`` z-ordered
    parquet files: range-partition on zval (one shuffle — the
    unavoidable cost of any clustered rewrite), sort within each
    partition, write. Each output file then covers a contiguous z
    range = a bounded rectangle in (user, hour) space, which is what
    row-group min/max pruning needs."""
    (
        df.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
