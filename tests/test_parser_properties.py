"""Property-based ingest-parser tests (hypothesis): for arbitrary
benchmark-log lines, the distributed Catalyst parser must agree with a
direct Python implementation of the reference's observable semantics
(file_generator.go:72-105):

- keep iff len>=9, starts with 'Benchmark', and no 'FAIL' anywhere
- test name = trim(split(line, TAB)[0])
- four regex extracts; absent metric -> 0 (Go zero values)
- MB/s regex demands >= 2 digit chars ('5 MB/s' no, '5.5'/'55' yes)

One Spark job per hypothesis example would take minutes, so each
example IS a batch of lines: hypothesis generates a list, one DataFrame
round-trip checks the whole list.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from benchviz_spark.sources.bench_logs import parse_bench_lines

NAME = st.text(
    alphabet="ABCDEFabcdef0123456789_-", min_size=0, max_size=20
).map(lambda s: "Benchmark" + s)
JUNK = st.sampled_from(
    ["PASS", "ok  \t pkg \t 1.2s", "", "--- FAIL: BenchmarkX", "Benchmar", "random text"]
)


def _metric_field(unit: str, number: st.SearchStrategy) -> st.SearchStrategy:
    return st.one_of(st.none(), number.map(lambda n: f"{n} {unit}"))


LINE = st.builds(
    lambda name, n_iter, ns, allocs, b, mbps, fail: (
        "\t".join(
            [name]
            + ([str(n_iter)] if n_iter is not None else [])
            + [f for f in (ns, b, allocs, mbps) if f is not None]
            + (["FAIL"] if fail else [])
        )
    ),
    name=st.one_of(NAME, JUNK),
    n_iter=st.one_of(st.none(), st.integers(0, 10**6)),
    ns=_metric_field("ns/op", st.integers(0, 10**12)),
    b=_metric_field("B/op", st.integers(0, 10**9)),
    allocs=_metric_field("allocs/op", st.integers(0, 10**6)),
    mbps=_metric_field(
        "MB/s",
        st.one_of(
            st.integers(0, 10**4),
            st.floats(0, 10**4, allow_nan=False).map(lambda f: round(f, 2)),
        ),
    ),
    fail=st.booleans(),
)

_PATTERNS = {
    "ns_per_op": r"([0-9]+) ns/op",
    "allocs_per_op": r"([0-9]+) allocs/op",
    "bytes_per_op": r"([0-9]+) B/op",
    "mb_per_s": r"([0-9]+\.?[0-9]+) MB/s",
}


def _reference_parse(line: str):
    """The reference semantics, directly in Python."""
    if not (len(line) >= 9 and line[:9] == "Benchmark" and not re.search("FAIL", line)):
        return None
    name = line.split("\t")[0].strip(" ")
    out = {"test_name": name}
    for col, pat in _PATTERNS.items():
        m = re.search(pat, line)
        if m:
            out[col] = float(m.group(1)) if col == "mb_per_s" else int(m.group(1))
        else:
            out[col] = 0.0 if col == "mb_per_s" else 0
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(LINE, min_size=1, max_size=60))
def test_parser_matches_reference_semantics(spark, lines):
    df = spark.createDataFrame(
        [("file:///x01-01-2015y/cockroach/sql/t.test.stdout", "sql", i, l)
         for i, l in enumerate(lines)],
        "source_file string, package string, line_pos int, line string",
    )
    parsed = {
        r.line_pos: (r.test_name, r.ns_per_op, r.allocs_per_op, r.bytes_per_op, r.mb_per_s)
        for r in parse_bench_lines(df).select(
            "line_pos", "test_name", "ns_per_op", "allocs_per_op", "bytes_per_op",
            "mb_per_s",
        ).collect()
    }
    for i, line in enumerate(lines):
        expected = _reference_parse(line)
        if expected is None:
            assert i not in parsed, (line, parsed.get(i))
        else:
            assert i in parsed, line
            name, ns, al, by, mb = parsed[i]
            assert name == expected["test_name"], line
            assert ns == expected["ns_per_op"], line
            assert al == expected["allocs_per_op"], line
            assert by == expected["bytes_per_op"], line
            assert abs(mb - expected["mb_per_s"]) < 1e-9, line
