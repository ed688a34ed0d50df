"""Targeted event-stream operator tests on synthetic frames.

Covers corner cases the sf-scaled parquet can't exercise — notably
same-second SCD-2 re-signups, where the (user_id, valid_from_s) join
key is ambiguous and only an exact version identifier keeps facts from
double-counting (round-5 advisor finding, events.py SCD-2 block).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from benchviz_spark.operators.events import events_scd2_tier_intervals
from benchviz_spark.registry import all_oracles
from tests.oracle_harness import run_pair

UTC = dt.timezone.utc
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def samesec_dir(spark, tmp_path_factory) -> str:
    """events table with same-second and same-timestamp re-signups:

    - user 1: two signups 0.2 s apart inside one second (tiers 5 then
      7), then purchases — the (user_id, valid_from_s) key collides
      across the two versions, so a truncated-key join would credit
      each purchase to BOTH.
    - user 2: two signups at the EXACT same timestamp (zero-width first
      interval) — facts must all land on the later version.
    - user 3: three same-second signups where the first two share a
      tier, so their projected output rows merge (both sides group by
      the projected columns).
    """
    rows = [
        # user 1
        (1, _t(10.1), 1, "signup", 0.0, '{"k": 5}'),
        (2, _t(10.3), 1, "signup", 0.0, '{"k": 7}'),
        (3, _t(10.2), 1, "purchase", 11.0, "{}"),
        (4, _t(20.0), 1, "purchase", 13.0, "{}"),
        # user 2
        (5, _t(30.5), 2, "signup", 0.0, '{"k": 1}'),
        (6, _t(30.5), 2, "signup", 0.0, '{"k": 2}'),
        (7, _t(30.5), 2, "purchase", 7.0, "{}"),
        (8, _t(40.0), 2, "purchase", 9.0, "{}"),
        # user 3
        (9, _t(50.1), 3, "signup", 0.0, '{"k": 3}'),
        (10, _t(50.2), 3, "signup", 0.0, '{"k": 3}'),
        (11, _t(50.3), 3, "signup", 0.0, '{"k": 9}'),
        (12, _t(60.0), 3, "purchase", 5.0, "{}"),
        # noise the filters must drop
        (13, _t(15.0), 1, "view", 0.0, "{}"),
    ]
    path = tmp_path_factory.mktemp("scd2") / "events.parquet"
    spark.createDataFrame(rows, schema=EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(path)
    )
    return str(path.parent)


def test_scd2_same_second_no_double_count(spark, samesec_dir):
    out = {
        (r["user_id"], r["tier"], r["valid_from_s"], r["valid_to_s"]): (
            r["n_purchases"],
            r["purchase_value"],
        )
        for r in events_scd2_tier_intervals(spark, samesec_dir).collect()
    }
    total_purchases = sum(n for n, _ in out.values())
    assert total_purchases == 5, out  # 13 events, 5 purchases — no dup
    # user 1: purchase at 10.2 belongs to the tier-5 version (signup
    # 10.1), purchase at 20.0 to tier-7; both versions share
    # valid_from_s = 10's second.
    s10 = int(_t(10.1).timestamp())
    assert out[(1, 5, s10, s10)] == (1, 11.0)
    assert out[(1, 7, s10, 253402300800)] == (1, 13.0)
    # user 2: zero-width tier-1 version keeps zero facts; both
    # purchases (one at the exact signup ts) land on tier 2.
    s30 = int(_t(30.5).timestamp())
    assert out[(2, 1, s30, s30)] == (0, 0.0)
    assert out[(2, 2, s30, 253402300800)] == (2, 16.0)
    # user 3: the two tier-3 versions project identically and merge.
    s50 = int(_t(50.1).timestamp())
    assert out[(3, 3, s50, s50)] == (0, 0.0)
    assert out[(3, 9, s50, 253402300800)] == (1, 5.0)
    assert len(out) == 6


def test_scd2_same_second_matches_oracle(spark, samesec_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{samesec_dir}/events.parquet/*.parquet')"
    )
    run_pair(
        spark,
        con,
        events_scd2_tier_intervals,
        all_oracles()["events_scd2_tier_intervals"],
        samesec_dir,
        "events_scd2_tier_intervals[same-second]",
    )


def test_psi_detects_planted_drift(spark, tmp_path):
    """stats_value_psi semantics on a planted corpus (the oracle proves
    cross-engine parity, not that PSI measures drift): a type whose
    value distribution is identical in both halves of the time range
    scores ~0; a type that jumps buckets between halves scores far
    above the 0.25 'drifted' rule of thumb."""
    from benchviz_spark.operators.analytics import stats_value_psi

    rows = []
    eid = 0
    for day in range(30):
        half2 = day >= 15
        for i in range(20):
            rows.append(
                (eid, _t(day * 86_400 + i * 60), 1, "stable", 25.0, "{}")
            )
            eid += 1
            drift_val = 475.0 if half2 else 25.0
            rows.append(
                (eid, _t(day * 86_400 + i * 60 + 1), 2, "drift", drift_val, "{}")
            )
            eid += 1
    d = str(tmp_path / "planted")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    got = {r.event_type: r for r in stats_value_psi(spark, d).collect()}
    assert abs(got["stable"].psi) < 0.01, got["stable"]
    assert got["drift"].psi > 1.0, got["drift"]
    # halves are balanced by construction
    assert got["drift"].ref_events == got["drift"].cur_events == 300
