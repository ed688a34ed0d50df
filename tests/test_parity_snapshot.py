"""PARITY_LOCAL.json staleness guard (VERDICT r3 #3).

The committed parity snapshot is the persisted oracle evidence for
every registered query. Round 3 shipped 15 new operators whose rows
never made it into the snapshot; this test pins the snapshot's key set
to the live registry so that adding (or renaming) a query without
re-running ``scripts/parity_snapshot.py`` fails CI-style instead of
silently aging the evidence. It also asserts the recorded state is
green: a committed snapshot full of failures is not evidence.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "PARITY_LOCAL.json")


def _load():
    with open(SNAPSHOT) as fh:
        return json.load(fh)


def test_snapshot_keys_match_registry():
    from benchviz_spark.registry import all_queries

    snap = set(_load()["queries"])
    reg = set(all_queries())
    missing = sorted(reg - snap)
    extra = sorted(snap - reg)
    assert not missing, f"queries with no parity evidence (re-run scripts/parity_snapshot.py): {missing}"
    assert not extra, f"stale snapshot rows for unregistered queries: {extra}"


def test_snapshot_is_green():
    from benchviz_spark.registry import all_oracles, all_partial_oracles

    oracles = set(all_oracles())
    partials = set(all_partial_oracles())
    for name, entry in _load()["queries"].items():
        if name in oracles:
            assert entry["values_match"] is True, (name, entry["err"])
        elif name in partials:
            # partial-oracle rows: green over the replayed columns, and
            # the declared mask names the estimator columns it excludes
            assert entry["values_match"] is True, (name, entry["err"])
            assert entry.get("masked_cols"), name
        else:
            assert entry["err"] == "no_oracle", (name, entry["err"])
            assert entry["spark_rows"] is not None and entry["spark_rows"] >= 0, name
