"""Z-order layout assertions: the Morton clustering actually buys
two-dimensional locality (bounded per-chunk rectangles in BOTH
dimensions), which is the property parquet min/max pruning needs;
value-level parity of the bit recipe is covered by the DuckDB oracle
in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from benchviz_spark.operators.layout import (
    layout_zorder_events,
    write_zorder_lake,
)

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 16


def _chunk_spans(df, order_col):
    """Sort by ``order_col``, slice into N_CHUNKS equal chunks (files,
    morally), and return the mean per-chunk (max-min) span of each
    dimension — the size of the bounding box min/max stats would
    record for that file."""
    from pyspark.sql.window import Window as W

    n = df.count()
    ranked = df.withColumn(
        "chunk",
        F.least(
            F.lit(N_CHUNKS - 1),
            (
                (F.row_number().over(W.orderBy(order_col, "event_id")) - 1)
                * N_CHUNKS
                / n
            ).cast("int"),
        ),
    )
    spans = (
        ranked.groupBy("chunk")
        .agg(
            (F.max("ux") - F.min("ux")).alias("ux_span"),
            (F.max("hy") - F.min("hy")).alias("hy_span"),
        )
        .agg(F.avg("ux_span").alias("ux"), F.avg("hy_span").alias("hy"))
        .first()
    )
    return spans["ux"], spans["hy"]


def test_zorder_bounds_both_dimensions(spark):
    """Chunks of the z-sorted table must bound BOTH dimensions well:
    each one-axis sort leaves the other axis unsorted, so its chunks
    span ~the full range of the other dimension. Z-order must shrink
    the WORSE of the two normalized spans by at least 2x vs either
    single-axis layout."""
    zdf = layout_zorder_events(spark, SF_DIR).cache()
    try:
        full_ux = zdf.agg(F.max("ux") - F.min("ux")).first()[0] or 1
        full_hy = zdf.agg(F.max("hy") - F.min("hy")).first()[0] or 1

        def worst(order_col):
            ux, hy = _chunk_spans(zdf, order_col)
            return max(ux / full_ux, hy / full_hy)

        worst_z = worst("zval")
        worst_user = worst("ux")
        worst_time = worst("hy")
        assert worst_z < worst_user / 2, (worst_z, worst_user)
        assert worst_z < worst_time / 2, (worst_z, worst_time)
    finally:
        zdf.unpersist()


def test_zorder_write_clusters_files(spark, tmp_path):
    """The writer's range partitioning must give files DISJOINT z
    ranges (each file = one contiguous clustering interval)."""
    zdf = layout_zorder_events(spark, SF_DIR)
    out = str(tmp_path / "zlake")
    write_zorder_lake(zdf, out, n_files=8)
    files = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(files) >= 2
    for a, b in zip(files, files[1:]):
        assert a["hi"] <= b["lo"], (a, b)
