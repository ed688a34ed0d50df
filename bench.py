"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE compact JSON line on stdout (the driver captures only
the last ~2.2 KB of stdout, so the full per-query map goes to a file):

    {"metric": "total_wall_sec", "value": N, "unit": "sec", "sf": 0.1,
     "n_queries": 89, "n_failed": 0, "queries": {<top-10 slowest>},
     "timings_file": ".benchmarks/bench_sf0.1.json",
     "regressions": ["name x1.8", ...]}

The complete ``{name: sec}`` map is written to
``.benchmarks/bench_sf{sf}.json`` and committed, so round-over-round
timing diffs live in git history. Before overwriting, the previous
committed timings are loaded and any query slower than
REGRESSION_FACTOR x its previous time (above a small absolute floor) is
named in ``regressions``.

Each query is forced with a ``noop``-format write, which fully evaluates
every output column on the executors without materializing rows on the
driver — ``count()`` would let Catalyst prune deterministic projections,
under-measuring projection-only queries.

All Spark chatter goes to stderr; a query failure records null for that
query and continues (one bad query must not blank the whole round's
bench data).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchviz_spark.caching import clear_caches  # noqa: E402
from benchviz_spark.registry import all_queries  # noqa: E402
from benchviz_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Overridable so harnesses (the contract test's bench smoke) can write
# to a scratch dir instead of churning the committed timings files.
BENCH_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_DIR", os.path.join(REPO, ".benchmarks")
)

# A query is a regression when it is this factor slower than its
# previously committed time AND the slowdown exceeds an absolute floor
# (sub-second queries jitter too much for a pure ratio test).
# Floor history: 0.4 s flagged two phantom x1.7s in round 4
# (text_unigram_logprob, window_price_quartiles — both reversed to
# faster-than-ever in round 5's clean back-to-back double run, while
# neither file had changed); scheduler/GC jitter on local[32] swings
# sub-2 s queries by ~0.8 s. A single global floor above that band
# (1.0 s) left every sub-second query unguarded (a real 0.5->1.4 s
# x2.8 would hide), so the floor is now PER QUERY: the committed
# timings file keeps each query's last HISTORY_KEEP runs, and once
# enough points exist the floor is 6x the median absolute deviation
# (~4 sigma under normal noise, so steady queries get a tight floor
# and jittery ones keep a wide one), clamped to
# [REGRESSION_FLOOR_MIN_SEC, REGRESSION_FLOOR_MAX_SEC]. Until a query
# has history, the old global max applies.
REGRESSION_FACTOR = 1.5
REGRESSION_FLOOR_MIN_SEC = 0.25
REGRESSION_FLOOR_MAX_SEC = 1.0
HISTORY_KEEP = 5
# Co-tenant load poisons whole sessions (VERDICT r10: all five flags at
# recorded loadavg 7.32 re-measured at baseline under loadavg<1, code
# untouched). Two guards: (1) a run whose 1-min loadavg exceeds this
# bound never flags — its rows are recorded but adjudicating them wastes
# a judge round every time; (2) a flag must also beat the MEDIAN of the
# committed history by the same factor, so one fluke-fast committed row
# can't manufacture flags against later normal runs. (The verdict
# suggested the history MIN, but min <= prev always — prev joins the
# history every run — so a min test is implied by the prev test and
# catches nothing; the median is the robust form of the same intent.)
LOADAVG_FLAG_MAX = 4.0
# Hypervisor steal is the co-tenant pressure loadavg cannot see (r15:
# a 493 s run with 3-9x spikes on arbitrary rows recorded loadavg 5.0
# but ~8% steal share; the quiet 364 s run read ~1.3%). A run whose
# steal/busy share over the timed window exceeds this bound never
# flags, and a RE-TIME under such steal cannot confirm a flag (it can
# still exonerate: steal only ever inflates a wall, so a fast-under-
# steal second run is genuine evidence of health) — the same
# asymmetric logic as the loadavg gate (VERDICT r15 #7).
STEAL_FLAG_MAX_SHARE = 0.05


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _floor_sec(hist: list[float]) -> float:
    """Per-query absolute regression floor from observed run-to-run
    variance (median absolute deviation over the committed history)."""
    if len(hist) < 3:
        return REGRESSION_FLOOR_MAX_SEC
    med = _median(hist)
    mad = _median([abs(x - med) for x in hist])
    return min(max(6 * mad, REGRESSION_FLOOR_MIN_SEC), REGRESSION_FLOOR_MAX_SEC)


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _timings_path(sf: float) -> str:
    return os.path.join(BENCH_DIR, f"bench_sf{sf:g}.json")


def _is_regression(
    sec: float | None,
    prev: float | None,
    hist: list[float],
) -> bool:
    """One query's regression predicate: ≥REGRESSION_FACTOR slower than
    its previous committed time, slowdown above the variance-derived
    absolute floor (see ``_floor_sec``), AND beating the committed
    history's median by the same factor (one fluke-fast committed row
    can't manufacture a flag)."""
    if sec is None or prev is None or prev <= 0:
        return False
    floor = _floor_sec(hist)
    typical = _median(hist + [prev])
    return (
        sec > prev * REGRESSION_FACTOR
        and sec - prev > floor
        and sec > typical * REGRESSION_FACTOR
    )


def find_regressions(
    new: dict[str, float | None],
    old: dict[str, float | None],
    history: dict[str, list[float]] | None = None,
    loadavg_1m: float | None = None,
    steal_share: float | None = None,
) -> list[str]:
    """PROVISIONAL regression flags (see ``_is_regression``). A run
    under co-tenant load (1-min loadavg > LOADAVG_FLAG_MAX) never flags
    — load drift, not code, dominates such runs (VERDICT r10) — and
    neither does a run under hypervisor steal above
    STEAL_FLAG_MAX_SHARE (VERDICT r15 #7: steal is the co-tenant
    signal loadavg cannot see). Runs under both bounds still reproduce
    each provisional flag before publishing it
    (``confirm_regressions``): the r11 judge re-adjudicated 8 phantom
    flags from a 3.75-loadavg run by hand, and a same-session cold
    re-time answers that question mechanically."""
    if loadavg_1m is not None and loadavg_1m > LOADAVG_FLAG_MAX:
        return []
    if steal_share is not None and steal_share > STEAL_FLAG_MAX_SHARE:
        return []
    history = history or {}
    out = []
    for name, sec in new.items():
        prev = old.get(name)
        hist = [h for h in history.get(name, []) if h is not None]
        if _is_regression(sec, prev, hist):
            out.append(f"{name} x{sec / prev:.1f}")
    return sorted(out)


def confirm_regressions(
    provisional: list[str],
    retimes: dict[str, float | None],
    old: dict[str, float | None],
    history: dict[str, list[float]] | None = None,
    retime_loads: dict[str, float | None] | None = None,
    retime_steals: dict[str, float | None] | None = None,
) -> list[str]:
    """Keep only the provisional flags whose cold same-session RE-TIME
    also satisfies the regression predicate. A transiently-loaded first
    measurement exonerates itself (the second execution lands back on
    the history median — the exact adjudication r10/r11 judges ran by
    hand); a genuine code regression reproduces and stays flagged, with
    the reproduced ratio published. A failed re-time (None) keeps the
    flag — it cannot exonerate.

    A re-time that itself ran above LOADAVG_FLAG_MAX cannot CONFIRM
    either (VERDICT r12 #6: the r12 run's 8 "reproduced" flags all
    re-timed during a 15-min loadavg-6.75 session and every one later
    measured at baseline under low load, threshold A/B'd —
    .benchmarks/bisect_broadcast_r13.json). But a loaded re-time is
    equally uninformative in the other direction (ADVICE r13): it
    cannot EXONERATE a reproduced slowdown either, so such a flag
    stays in the published list at its PROVISIONAL ratio, annotated
    ``(retime-loaded)`` — like a failed re-time, not like a healthy
    one. Only a loaded re-time that comes back FAST exonerates: load
    only ever inflates a wall, so a fast-under-load second run is
    genuine evidence of health. The per-flag load (max of the 1-min
    average sampled before and after the re-time, covering mid-run
    load arrival) is committed beside the re-time in the adjudication
    trail so every kept/dropped decision is auditable."""
    history = history or {}
    retime_loads = retime_loads or {}
    retime_steals = retime_steals or {}
    out = []
    for label in provisional:
        name = label.rsplit(" x", 1)[0]
        prev = old.get(name)
        re_sec = retimes.get(name)
        hist = [h for h in history.get(name, []) if h is not None]
        if re_sec is None:
            out.append(label)
        elif _is_regression(re_sec, prev, hist):
            load = retime_loads.get(name)
            steal = retime_steals.get(name)
            if load is not None and load > LOADAVG_FLAG_MAX:
                # reproduced, but under co-tenant load: keep the
                # provisional flag, explicitly marked unadjudicated
                out.append(f"{label} (retime-loaded)")
            elif steal is not None and steal > STEAL_FLAG_MAX_SHARE:
                # reproduced, but under hypervisor steal: same
                # asymmetry — steal cannot exonerate a slow re-time
                out.append(f"{label} (retime-stolen)")
            else:
                out.append(f"{name} x{re_sec / prev:.1f}")
    return sorted(out)


def _user_hz() -> float:
    """Jiffies per second for /proc/stat conversion (ADVICE r15: the
    kernel's USER_HZ is 100 on mainstream Linux but the /proc contract
    does not guarantee it — ask libc, fall back to 100)."""
    try:
        return float(os.sysconf("SC_CLK_TCK")) or 100.0
    except (OSError, ValueError, AttributeError):
        return 100.0


def _cpu_jiffies() -> tuple[int, int] | None:
    """(steal, busy) jiffies from /proc/stat — co-tenant pressure on a
    shared hypervisor shows up as STEAL time, which loadavg inside the
    guest cannot see (r15: a 493 s run with 3-9x spikes on arbitrary
    rows recorded 1-min loadavg 5.0 but 305 cpu-sec of steal; the
    steal share is the honest noise indicator for a committed row)."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        user, nice, system = int(f[1]), int(f[2]), int(f[3])
        irq, softirq, steal = int(f[6]), int(f[7]), int(f[8])
        return steal, user + nice + system + irq + softirq + steal
    except (OSError, IndexError, ValueError):
        return None


def _steal_share(
    j0: tuple[int, int] | None, j1: tuple[int, int] | None
) -> float | None:
    """Steal/busy share over a (start, end) jiffies window; None when
    either sample is missing or nothing ran in between."""
    if not j0 or not j1 or j1[1] <= j0[1]:
        return None
    return (j1[0] - j0[0]) / (j1[1] - j0[1])


def main() -> None:
    spark = get_spark("benchviz_bench")
    queries = all_queries()
    sf = _sf_from_dir(SF_DIR)
    jiffies0 = _cpu_jiffies()
    # Warm the JVM/parquet footers so the first timed query isn't paying
    # session startup.
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    names = sorted(queries)
    # SPARK_GRAFT_BENCH_SLICE="i/k" times only every k-th query starting
    # at i — lets long runs (e.g. the 10x scale corpus) split across
    # invocations that each fit a wall-clock budget. Slices write to a
    # suffixed timings file and skip the regression guard (a partial
    # map must never overwrite the committed full baseline).
    slice_spec = os.environ.get("SPARK_GRAFT_BENCH_SLICE")
    if slice_spec:
        idx, k = (int(x) for x in slice_spec.split("/"))
        names = names[idx::k]

    timings: dict[str, float | None] = {}
    total = 0.0
    # ~245 queries share one JVM: broadcast/shuffle refs from earlier
    # queries pile up until a driver GC lets the ContextCleaner release
    # them, and r15 measured late-alphabet queries paying 5-10x their
    # isolated time under that debt. The GC is UNTIMED (before the
    # timer starts) and is the same cold-row discipline as
    # clear_caches(): each timing is about the query, not about the N
    # queries before it. r16 defaults the cadence to EVERY row — the
    # r15 every-15 cadence still let heavy rows inherit up to ~1.6x of
    # in-sequence debt vs their isolated medians (e.g.
    # curation_mixture_report_multimodal 15.7 s in-sequence vs 8.5-10 s
    # isolated with identical code) — tunable via
    # SPARK_GRAFT_BENCH_GC_EVERY for cadence A/Bs.
    gc_every = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "1")))
    for i, name in enumerate(names):
        if i and i % gc_every == 0:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        # Every committed row is a COLD standalone run (ADVICE r9): the
        # session memo caches (pair relation, clusters, curated corpus,
        # BPE word counts, sketch state) are cleared before EACH query,
        # so a row never silently times a cached read of a relation an
        # alphabetically-earlier query happened to warm — rows are
        # order-independent and comparable across sessions and scale
        # tiers. The marginal-cost story the persist points exist for
        # stays measured (and labeled as such) in the sf3x probe
        # records' chain-order notes.
        clear_caches()
        t0 = time.perf_counter()
        try:
            # noop write fully evaluates every output column without
            # collecting rows; count() would prune deterministic
            # projections and under-measure projection-only queries.
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = elapsed
            total += elapsed
        except Exception as exc:  # noqa: BLE001 - record and continue
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = None

    path = _timings_path(sf)
    if slice_spec:
        path += f".slice{slice_spec.replace('/', 'of')}"
    previous: dict[str, float | None] = {}
    history: dict[str, list[float]] = {}
    if not slice_spec and os.path.exists(path):
        try:
            with open(path) as fh:
                committed = json.load(fh)
            previous = committed.get("queries", {})
            history = committed.get("history", {})
        except (OSError, json.JSONDecodeError):
            pass
    try:
        # record host load with the timings: co-tenant drift inflates
        # whole sessions by >1.1x (BASELINE.md), and a regression list
        # is only interpretable next to the load it ran under — flags
        # are suppressed outright above LOADAVG_FLAG_MAX
        with open("/proc/loadavg") as lf:
            loadavg = [float(x) for x in lf.read().split()[:3]]
    except OSError:
        loadavg = None
    jiffies_run_end = _cpu_jiffies()
    provisional = find_regressions(
        timings,
        previous,
        history,
        loadavg[0] if loadavg else None,
        _steal_share(jiffies0, jiffies_run_end),
    )
    # Reproduce-before-flag: cold-re-time each provisionally flagged
    # query in this same session and publish only the flags that
    # reproduce. Bounded work — at most len(provisional) extra query
    # runs, only on runs that would otherwise burn a judge round on
    # hand adjudication.
    retimes: dict[str, float | None] = {}
    retime_loads: dict[str, float | None] = {}
    retime_steals: dict[str, float | None] = {}
    for label in provisional:
        name = label.rsplit(" x", 1)[0]
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        clear_caches()
        # loadavg AT the re-time, not the run's start: the r12 session
        # started at 1-min load 2.99 (under the bound) but ran 15-min
        # load 6.75 throughout, so its re-times confirmed under exactly
        # the co-tenant pressure the whole-run gate exists for. Sampled
        # BEFORE and AFTER, gated on the max (ADVICE r13): the stale
        # 1-min average at start misses load arriving mid-re-time, and
        # the post-run average covers the measured interval itself.
        def _load_1m() -> float | None:
            try:
                with open("/proc/loadavg") as lf:
                    return float(lf.read().split()[0])
            except OSError:
                return None

        load_before = _load_1m()
        j_before = _cpu_jiffies()
        t0 = time.perf_counter()
        try:
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            retimes[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 - a failed re-time keeps the flag
            print(f"bench: retime {name} FAILED: {exc}", file=sys.stderr)
            retimes[name] = None
        load_after = _load_1m()
        # steal sampled over the re-time window itself: a flag that
        # reproduces only under hypervisor steal stays unadjudicated
        retime_steals[name] = _steal_share(j_before, _cpu_jiffies())
        samples = [x for x in (load_before, load_after) if x is not None]
        retime_loads[name] = max(samples) if samples else None
    regressions = confirm_regressions(
        provisional, retimes, previous, history, retime_loads, retime_steals
    )

    new_history = {
        name: ([h for h in history.get(name, []) if h is not None] + [sec])[
            -HISTORY_KEEP:
        ]
        for name, sec in timings.items()
        if sec is not None
    }
    os.makedirs(BENCH_DIR, exist_ok=True)
    from benchviz_spark.operators.similarity import active_knn_profile

    jiffies1 = _cpu_jiffies()
    steal = None
    if jiffies0 and jiffies1:
        hz = _user_hz()
        steal = {
            "steal_cpu_sec": round((jiffies1[0] - jiffies0[0]) / hz, 1),
            "busy_cpu_sec": round((jiffies1[1] - jiffies0[1]) / hz, 1),
        }
    record = {
        "sf": sf,
        "total_sec": round(total, 3),
        "loadavg": loadavg,
        # hypervisor steal over the run (None outside Linux guests):
        # co-tenant pressure that loadavg cannot see — see _cpu_jiffies
        "cpu_steal": steal,
        # which k-NN recall profile produced the knn rows (ADVICE r13:
        # records must be self-describing — the profile changes both
        # the Spark plan and the oracle). Import-time frozen value, not
        # a live env re-read (ADVICE r14): the plans were built with it.
        "knn_profile": active_knn_profile(),
        "queries": timings,
        "history": new_history,
    }
    if retimes:
        # the adjudication trail: what provisionally flagged and what
        # its cold same-session re-time measured
        record["provisional_regressions"] = provisional
        record["retime_loadavg_1m"] = retime_loads
        record["retime_steal_share"] = retime_steals
        record["retimes"] = retimes
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")

    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v is not None),
            key=lambda kv: kv[1],
            reverse=True,
        )[:10]
    )
    failed = sum(1 for v in timings.values() if v is None)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": failed,
                "queries": slowest,
                "timings_file": os.path.relpath(path, REPO),
                "regressions": regressions[:8],
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
