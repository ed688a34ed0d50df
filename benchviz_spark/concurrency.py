"""Bounded construction-overlap pools (guide §2.6).

Several composition queries build independent detector/curation
subtrees whose CONSTRUCTION runs eager materialization jobs (shingle
checkpoints, decoded-hash checkpoints, epoch-index writes). Submitting
those from a small thread pool lets one subtree's small-stage jobs
back-fill executors freed by another's stragglers instead of
serializing cluster-underfilling jobs (guide §2.6).

Every pool in the repo is created through ``subtree_pool`` so the
overlap width is bounded in ONE place:

- ``SPARK_GRAFT_OVERLAP_WORKERS`` caps the width globally (0/unset =
  no cap beyond the call site's own subtree count; 1 = fully serial).
  This is the A/B lever — r15's driver run measured the widest overlap
  queries INVERTING on 32 cores (curation_mixture_report_multimodal
  scaling ratio 0.41: faster on 8 cores than 32), so the width must be
  measurable per host rather than assumed.
- Nested pools (the multimodal curation chain constructs the unified
  cluster builder, which constructs three detectors) multiply the
  number of concurrently-submitting threads; call sites pass their
  own subtree count and the cap applies at every level.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor


def overlap_workers(n_subtrees: int) -> int:
    """Effective pool width for ``n_subtrees`` independent subtrees."""
    cap = int(os.environ.get("SPARK_GRAFT_OVERLAP_WORKERS", "0") or 0)
    if cap > 0:
        return max(1, min(n_subtrees, cap))
    return max(1, n_subtrees)


def subtree_pool(n_subtrees: int) -> ThreadPoolExecutor:
    """A bounded pool for overlapping independent subtree construction."""
    return ThreadPoolExecutor(max_workers=overlap_workers(n_subtrees))
