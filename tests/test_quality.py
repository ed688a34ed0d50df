"""Quality-operator properties the corpus can't exercise (the synthetic
documents contain no PII, so the registered oracle proves pass-through
equivalence; planted strings prove the redaction itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from benchviz_spark.operators.quality import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    redact_text,
)

SF_DIR = "/root/testdata/sf0.001"


def test_redaction_on_planted_pii(spark):
    rows = [
        ("mail me at alice.smith+test@example-corp.io today", "<EMAIL>"),
        ("server at 192.168.001.42 responded", "<IP>"),
        ("call +123 456-7890 or 555 123 4567", "<PHONE>"),
        ("no pii here at all", None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r.red for r in df.select(redact_text(F.col("text")).alias("red")).collect()]
    for (_, token), red in zip(rows, got):
        if token is None:
            assert "<" not in red
        else:
            assert token in red, red
    # redaction removes every match of its own patterns
    import re

    for red in got:
        assert not re.search(EMAIL_RE, red)
        assert not re.search(IPV4_RE, red)


def test_phone_does_not_eat_ip(spark):
    """Ordering: the IPv4 must be replaced as an IP, not half-matched
    by the phone pattern."""
    df = spark.createDataFrame([("ping 10.0.0.1 now",)], "text string")
    red = df.select(redact_text(F.col("text")).alias("r")).collect()[0].r
    assert red == "ping <IP> now"


def test_weighted_mix_rates_are_honored(spark):
    """Kept fraction per source must track its declared rate_pct (the
    md5 bucket is uniform; at 25 docs/source allow wide slack but the
    ordering tiny-rate < big-rate must hold in aggregate)."""
    from benchviz_spark.operators.quality import sample_weighted_mix

    rows = sample_weighted_mix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total
    low = [r for r in rows if r.rate_pct <= 40]
    high = [r for r in rows if r.rate_pct >= 80]
    if low and high:
        frac = lambda rs: sum(r.n_kept for r in rs) / sum(r.n_total for r in rs)  # noqa: E731
        assert frac(low) < frac(high)


def test_profile_one_pass(spark):
    """The profile must be a single aggregation over a single scan —
    one row per profiled column, no per-column jobs."""
    from benchviz_spark.operators.quality import quality_profile_documents

    df = quality_profile_documents(spark, SF_DIR)
    rows = {r.column_name: r for r in df.collect()}
    assert set(rows) == {"lang", "source", "n_chars"}
    assert rows["lang"].n_nulls == 0
    assert rows["lang"].n_distinct >= 2
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") == 1, plan  # single scan
