"""Driver-contract guards: the exact artifacts the grading driver
consumes must keep their shapes — __spark_entry__'s three functions and
bench.py's one-line JSON output."""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_spark_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # the majority of the surface is oracle-checked
    assert len(osql) / len(qs) > 0.8
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in osql.values())


def test_entry_runs_flagship_at_smoke_sf(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    # stable schema: the driver smoke-checks columns across rounds
    assert df.columns[0] == "l_returnflag"


def test_bench_emits_single_json_line(tmp_path):
    """bench.py at sf0.001 (keep CI fast): stdout must be exactly one
    parseable JSON object, small enough to survive the driver's ~2.2 KB
    stdout-tail capture, with the full per-query map in a file. The
    timings go to a scratch dir so the smoke never churns the committed
    .benchmarks files."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_DIR=str(tmp_path),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        # r15: the three durable-admission queries each pay a cold
        # index build under bench's clear_caches discipline, so the
        # full-registry smoke at 4 CPUs runs ~8 min; 560 s left no
        # headroom on a loaded host.
        timeout=900,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    # the driver keeps only the stdout tail; the line must fit whole
    assert len(lines[0]) < 2000, len(lines[0])
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float))
    assert payload["n_queries"] >= 60
    assert payload["n_failed"] == 0, out.stderr[-2000:]
    assert 0 < len(payload["queries"]) <= 10  # top-10 slowest only
    # the full map landed in the committed timings file
    with open(os.path.join(REPO, payload["timings_file"])) as fh:
        full = json.load(fh)
    assert len(full["queries"]) == payload["n_queries"]


def test_bench_regression_guard():
    from bench import find_regressions

    old = {"a": 1.0, "b": 0.1, "c": 2.0, "d": None, "gone": 1.0, "j": 1.2}
    new = {"a": 2.5, "b": 0.3, "c": 2.2, "d": 1.0, "fresh": 5.0, "j": 2.0}
    # a: 2.5x and +1.5s -> flagged; b: 3x but only +0.2s (under the
    # no-history 1.0s floor); j: 1.7x but +0.8s sits in the measured
    # local[32] jitter band (under the no-history floor); c: within
    # factor; d/gone/fresh: no baseline pair
    assert find_regressions(new, old) == ["a x2.5"]

    # With committed history the floor tightens to the query's own
    # variance: a steady 0.5s query regressing to 1.4s (x2.8, +0.9s)
    # is now caught even though it sits under the 1.0s global max...
    hist = {"b": [0.1, 0.11, 0.1, 0.09], "s": [0.5, 0.52, 0.48, 0.5]}
    assert find_regressions({"s": 1.4}, {"s": 0.5}, hist) == ["s x2.8"]
    # ...while small absolute wobble stays ignored via the floor's
    # 0.25s lower clamp (b: x3 but only +0.2s).
    assert find_regressions(new, old, hist) == ["a x2.5"]

    # Load-aware guards (VERDICT r10 task 5): a run under co-tenant
    # load never flags — identical code at loadavg 7.3 produced five
    # phantom flags in r10 and each cost an adjudication.
    assert find_regressions(new, old, hist, loadavg_1m=7.3) == []
    assert find_regressions(new, old, hist, loadavg_1m=1.2) == ["a x2.5"]
    # And a flag must beat the committed history's MEDIAN by the factor
    # too: one fluke-fast committed row (prev=1.0 in a history that
    # typically runs 2.0s) can't manufacture a flag against a normal
    # 2.6s re-run...
    infl = {"a": [2.0, 2.1, 2.0, 2.05, 1.0]}
    assert find_regressions({"a": 2.6}, {"a": 1.0}, infl) == []
    # ...but a genuine regression beats the typical time and still flags.
    assert find_regressions({"a": 3.5}, {"a": 1.0}, infl) == ["a x3.5"]


def test_bench_reproduce_before_flag():
    """VERDICT r11 #3: the r11 driver run at loadavg 3.75 (just under
    the 4.0 suppression bound) published 8 phantom flags that each cost
    a hand adjudication. A provisional flag must now REPRODUCE in a
    cold same-session re-time before it is published."""
    from bench import confirm_regressions, find_regressions

    # Synthetic steady history + one injected slow row: the first
    # measurement provisionally flags...
    hist = {"q": [2.0, 2.05, 1.95, 2.0, 2.1]}
    old = {"q": 2.0}
    provisional = find_regressions({"q": 6.6}, old, hist, loadavg_1m=3.75)
    assert provisional == ["q x3.3"]
    # ...a healthy re-time (landing back on the history median — the
    # exact shape of all 8 r11 phantom flags) exonerates it: on
    # identical code, regressions come out empty at any loadavg <= 5.
    assert confirm_regressions(provisional, {"q": 2.05}, old, hist) == []
    # A reproducing slowdown stays flagged, at the REPRODUCED ratio.
    assert confirm_regressions(provisional, {"q": 6.2}, old, hist) == ["q x3.1"]
    # A failed re-time cannot exonerate: the flag survives.
    assert confirm_regressions(provisional, {"q": None}, old, hist) == ["q x3.3"]
    # Borderline re-time under the factor -> exonerated.
    assert confirm_regressions(provisional, {"q": 2.9}, old, hist) == []


def test_bench_loaded_retime_cannot_confirm():
    """VERDICT r12 #6: the r12 run's 8 'reproduced' flags all re-timed
    during a sustained loadavg-6.75 session and every one measured back
    at baseline once the host was quiet (threshold A/B in
    .benchmarks/bisect_broadcast_r13.json). A re-time executed above
    LOADAVG_FLAG_MAX is recorded in the adjudication trail but can no
    longer CONFIRM a flag — and per ADVICE r13 it cannot EXONERATE a
    reproduced slowdown either: the flag survives at its provisional
    ratio, marked (retime-loaded), exactly like a failed re-time."""
    from bench import LOADAVG_FLAG_MAX, confirm_regressions, find_regressions

    hist = {"q": [2.0, 2.05, 1.95, 2.0, 2.1]}
    old = {"q": 2.0}
    provisional = find_regressions({"q": 6.6}, old, hist, loadavg_1m=3.0)
    assert provisional == ["q x3.3"]
    # Reproducing re-time under a LOADED host -> kept provisional,
    # annotated: co-tenant load is never a one-way flag-killing path.
    loaded = {"q": LOADAVG_FLAG_MAX + 2.75}
    assert confirm_regressions(provisional, {"q": 6.2}, old, hist, loaded) == [
        "q x3.3 (retime-loaded)"
    ]
    # A FAST re-time under load still exonerates: load only inflates,
    # so a healthy wall under pressure is genuine evidence of health.
    assert confirm_regressions(provisional, {"q": 2.05}, old, hist, loaded) == []
    # Same reproducing re-time on a quiet host -> still flagged.
    quiet = {"q": 0.4}
    assert (
        confirm_regressions(provisional, {"q": 6.2}, old, hist, quiet)
        == ["q x3.1"]
    )
    # Missing load measurement (no /proc/loadavg) -> behaves as before.
    assert (
        confirm_regressions(provisional, {"q": 6.2}, old, hist, {})
        == ["q x3.1"]
    )
    # A FAILED re-time keeps the flag regardless of load: load cannot
    # exonerate what was never re-measured.
    assert (
        confirm_regressions(provisional, {"q": None}, old, hist, loaded)
        == ["q x3.3"]
    )


def test_overlap_pool_width_is_capped():
    """The §2.6 subtree-construction pools are bounded at TWO in-flight
    subtrees by default (r16 A/B: nested full-width pools thrashed the
    32-way scheduler — dedup_multimodal_clusters 20.1 s full vs 8.9 s
    capped), with the env override as the per-host probe lever."""
    import os

    from benchviz_spark.concurrency import overlap_workers

    assert os.environ.get("SPARK_GRAFT_OVERLAP_WORKERS") is None
    assert overlap_workers(1) == 1
    assert overlap_workers(2) == 2
    assert overlap_workers(3) == 2
    assert overlap_workers(4) == 2
    os.environ["SPARK_GRAFT_OVERLAP_WORKERS"] = "1"
    try:
        assert overlap_workers(4) == 1
        os.environ["SPARK_GRAFT_OVERLAP_WORKERS"] = "3"
        assert overlap_workers(4) == 3
    finally:
        del os.environ["SPARK_GRAFT_OVERLAP_WORKERS"]


def test_bench_steal_gate():
    """VERDICT r15 #7: hypervisor steal is the co-tenant signal loadavg
    cannot see (the r15 493 s spike run read loadavg 5.0 but ~8% steal
    share). A run above STEAL_FLAG_MAX_SHARE never flags, and a re-time
    under such steal cannot CONFIRM a flag (it can still exonerate —
    steal only ever inflates a wall)."""
    from bench import (
        STEAL_FLAG_MAX_SHARE,
        _steal_share,
        confirm_regressions,
        find_regressions,
    )

    hist = {"q": [2.0, 2.05, 1.95, 2.0, 2.1]}
    old = {"q": 2.0}
    # A genuinely regressing row flags on a quiet run...
    assert find_regressions({"q": 6.6}, old, hist, 1.2, 0.01) == ["q x3.3"]
    # ...but not when the run's steal share exceeds the bound.
    assert find_regressions({"q": 6.6}, old, hist, 1.2, 0.08) == []
    # Missing steal measurement behaves as before.
    assert find_regressions({"q": 6.6}, old, hist, 1.2, None) == ["q x3.3"]

    provisional = ["q x3.3"]
    stolen = {"q": STEAL_FLAG_MAX_SHARE * 2}
    # Reproducing re-time under steal -> kept provisional, annotated.
    assert confirm_regressions(
        provisional, {"q": 6.2}, old, hist, {}, stolen
    ) == ["q x3.3 (retime-stolen)"]
    # A FAST re-time under steal still exonerates.
    assert confirm_regressions(provisional, {"q": 2.05}, old, hist, {}, stolen) == []
    # Quiet re-time -> confirmed at the reproduced ratio.
    assert confirm_regressions(
        provisional, {"q": 6.2}, old, hist, {}, {"q": 0.0}
    ) == ["q x3.1"]

    # _steal_share arithmetic + degenerate windows.
    assert _steal_share((100, 1000), (150, 2000)) == 0.05
    assert _steal_share(None, (150, 2000)) is None
    assert _steal_share((100, 1000), (100, 1000)) is None


def test_driver_window_is_fully_oracle_backed():
    """The grading driver records correctness for only the FIRST 50
    entries of queries(). Guard the ordering contract: every window
    slot must carry a full oracle, except the small DECLARED list of
    estimator queries (_WINDOW_ROWS_ONLY) whose replayable columns
    carry a partial oracle instead — the honest rows VERDICT r11 #1
    asked the driver to see. Families must appear inside the window
    unless their newest driver evidence is at most one round old
    (re-proving round-fresh rows would waste scarce window slots)."""
    import glob
    import json

    from benchviz_spark.registry import (
        _WINDOW_ROWS_ONLY,
        all_oracles,
        all_partial_oracles,
        all_queries,
    )

    names = list(all_queries())
    oracles = all_oracles()
    partials = all_partial_oracles()
    window = names[:50]
    # rows-only slots stay the declared exception, never the norm
    assert len(_WINDOW_ROWS_ONLY) <= 5
    for n in _WINDOW_ROWS_ONLY:
        assert n in partials, f"{n}: rows-only slot without a partial oracle"
    bad = [n for n in window if n not in oracles and n not in _WINDOW_ROWS_ONLY]
    assert not bad, bad

    # Newest driver round each query has evidence in, from the
    # committed CORRECTNESS artifacts the grading driver emits.
    evidence: dict[str, int] = {}
    latest_round = 0
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(path.split("_r")[1].split(".")[0])
        latest_round = max(latest_round, rnd)
        for q in json.load(open(path)):
            evidence[q] = max(evidence.get(q, 0), rnd)

    for family in (
        "dedup_",
        "similarity_",
        "text_",
        "events_",
        "multimodal_",
        "skew_",
        "sample_",
        "bench_log_pipeline",
        "asof_",
        "compare_",
    ):
        in_window = any(n.startswith(family) for n in window)
        fresh = any(
            evidence.get(n, 0) >= latest_round - 1
            for n in names
            if n.startswith(family)
        )
        assert in_window or fresh, family
    # displaced queries stay registered (local parity still covers them)
    assert len(names) >= 85


def test_approx_stats_tracks_exact_twin(spark):
    """approx_stats_orders (unregistered: sketches can't hash-match a
    cross-engine oracle) must stay within a tight error envelope of its
    registered exact twin."""
    from benchviz_spark.operators.relational import (
        approx_stats_orders,
        stats_orders_exact,
    )

    sf = "/root/testdata/sf0.01"
    approx = approx_stats_orders(spark, sf).collect()[0]
    exact = stats_orders_exact(spark, sf).collect()[0]
    # HLL++ default rsd is 5%; allow 3 sigma.
    assert abs(approx.approx_customers - exact.n_customers) / exact.n_customers < 0.15
    for col in ("price_p50", "price_p95", "price_p99"):
        assert abs(approx[col] - exact[col]) / exact[col] < 0.05, col


def test_all_query_outputs_are_scalar_typed(spark):
    """The driver's rows-only canonicalizer hashes result cells with
    pandas; array/map/struct cells raise 'unhashable type' and void the
    check (round-1 approx_stats_orders regression). Every registered
    query must therefore resolve to a schema of scalar columns only —
    complex intermediates are fine, the RESULT frame is the contract."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from benchviz_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in sorted(all_queries().items()):
        for f in fn(spark, sf).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# Serving byte-parity: property test of the Go float rendering
# (reference file_generator_test.go:75-93 golden round-trip, generalized
# across generated doubles — SURVEY §2.1 S4).
# ---------------------------------------------------------------------------
def _go_marshal_float(v: float) -> str:
    """Reference oracle: Go json.Marshal's float rendering inside its
    positional window (1e-6 <= |v| < 1e21) — strconv's shortest
    round-trip digits in 'f' form. Python's repr produces the same
    shortest digits, so expanding it positionally IS the Go string."""
    from decimal import Decimal

    out = format(Decimal(repr(v)), "f")
    if "." in out:
        out = out.rstrip("0").rstrip(".")
    return out


GO_NUMBER_EDGES = [
    0.0,
    -0.0,  # Go keeps the sign bit: '-0', not '0'
    4.0,  # integral: no trailing '.0'
    1e7,  # integral but JVM-scientific: '1.0E7' -> '10000000'
    1e-6,  # bottom of Go's positional window
    1.5e-5,  # JVM-scientific small: '1.5E-5' -> '0.000015'
    0.1 + 0.2,  # 17-digit round-trip classic (0.30000000000000004)
    7.000000000000001,
    12345678.9,
    9999999.5,  # just above the JVM positional threshold
    3.945243088014081e16,  # exact int has 17 digits, shortest has 16
    4.495070928150767e16,  # Java 17 toString emits an excess digit
    2.0**53 - 1,
    2.0**53,
    2.0**63,  # ANSI long-cast overflow territory
    1e20,
    -123.456,
    -1.5e-5,
]


def test_go_number_rendering_property(spark):
    """Property check of the PRODUCTION Go-number rendering (the staged
    ``with_go_number`` path per_test_json actually executes; the
    single-expression ``_go_number`` is pinned equal to it by
    test_bench_ingest.py::test_go_number_staged_equals_reference)
    against the Go oracle: exact byte parity for |v| < 2^53 (the
    documented parity bound — benchmark metrics never approach it),
    and everywhere in the positional window a positional,
    exactly-round-tripping rendering."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from benchviz_spark.serving.json_sink import with_go_number
    from pyspark.sql import functions as F

    def check(vals: list[float]) -> None:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = with_go_number(df, F.col("v"), "s").select("v", "s").collect()
        for r in rows:
            assert "e" not in r.s.lower(), (r.v, r.s)
            assert float(r.s) == r.v, (r.v, r.s)  # exact round-trip
            if abs(r.v) < 2.0**53:
                assert r.s == _go_marshal_float(r.v), (r.v, r.s)

    check(GO_NUMBER_EDGES)

    magnitude = st.one_of(
        st.floats(
            min_value=1e-6,
            max_value=1e21,
            exclude_max=True,
            allow_nan=False,
            allow_infinity=False,
        ),
        st.integers(min_value=0, max_value=2**53 - 1).map(float),
        st.integers(min_value=2**53, max_value=2**63 + 2**13).map(float),
    )
    window = st.tuples(magnitude, st.booleans()).map(
        lambda t: -t[0] if t[1] else t[0]
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(window, min_size=1, max_size=100))
    def run(vals):
        check(vals)

    run()
