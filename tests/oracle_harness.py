"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL side-by-side
on the same parquet tables, then compares row count, column names, and
values (columns sorted by name, rows sorted, floats compared to a tight
tolerance). Catching a mismatch here means catching it before the
driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from benchviz_spark.sources.tables import TABLE_NAMES

FLOAT_ATOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object and len(s) and not s.isna().all():
            first = s.dropna().iloc[0]
            if hasattr(first, "isoformat") and not isinstance(first, str):
                s = s.map(lambda v: None if v is None else v.isoformat())
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("float64") if s.isna().any() else s.astype("int64")
        out[col] = s
    canon = pd.DataFrame(out)
    if len(canon):
        canon = canon.sort_values(by=list(canon.columns), na_position="last").reset_index(
            drop=True
        )
    return canon


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    spark_cols = sorted(c.lower() for c in spark_pdf.columns)
    oracle_cols = sorted(c.lower() for c in oracle_pdf.columns)
    assert spark_cols == oracle_cols, (
        f"{name}: columns {spark_cols} (spark) != {oracle_cols} (oracle)"
    )
    spark_pdf = spark_pdf.rename(columns=str.lower)
    oracle_pdf = oracle_pdf.rename(columns=str.lower)

    a = _canonicalize(spark_pdf)
    b = _canonicalize(oracle_pdf)
    for col in a.columns:
        sa, sb = a[col], b[col]
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            va = sa.astype("float64").to_numpy()
            vb = sb.astype("float64").to_numpy()
            both_nan = np.isnan(va) & np.isnan(vb)
            close = np.isclose(va, vb, rtol=0.0, atol=FLOAT_ATOL) | both_nan
            assert close.all(), (
                f"{name}.{col}: {int((~close).sum())} float mismatches; "
                f"max |diff| = {np.nanmax(np.abs(va - vb)):.3e}; "
                f"sample spark={va[~close][:3]} oracle={vb[~close][:3]}"
            )
        else:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} mismatches; "
                f"sample spark={sa[~eq].head(3).tolist()} "
                f"oracle={sb[~eq].head(3).tolist()}"
            )


def run_pair(spark, con, query_fn, oracle: str, sf_dir: str, name: str) -> None:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(oracle).fetchdf()
    compare_frames(spark_pdf, oracle_pdf, name)


def run_partial_pair(
    spark, con, query_fn, partial_oracle: str, sf_dir: str, name: str
) -> list[str]:
    """Partial-oracle compare: the oracle replays only the query's
    deterministic columns; the Spark frame is PROJECTED to those
    columns before the full rows+schema+values check (row count still
    compares the complete result — projection drops no rows). Returns
    the masked (non-replayed) column names for the parity record."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(partial_oracle).fetchdf()
    oracle_cols = {c.lower() for c in oracle_pdf.columns}
    keep = [c for c in spark_pdf.columns if c.lower() in oracle_cols]
    masked = sorted(c for c in spark_pdf.columns if c.lower() not in oracle_cols)
    assert keep and masked, (
        f"{name}: a partial oracle must replay a strict, non-empty "
        f"column subset (replayed={keep}, masked={masked})"
    )
    compare_frames(spark_pdf[keep], oracle_pdf, name)
    return masked
