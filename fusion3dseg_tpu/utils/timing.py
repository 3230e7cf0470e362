"""Stage timing + TPU profiling as a first-class metrics module.

The reference's only observability is ad-hoc perf_counter prints scattered
through entry points (SURVEY.md §5). This module centralizes: named wall-time
spans, a session-level registry printable as a summary or JSON, and optional
jax.profiler trace capture around any span.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class Metrics:
    """Process-wide span registry."""

    def __init__(self):
        self.spans: List[Dict] = []

    @contextlib.contextmanager
    def span(self, name: str, verbose: bool = False, **attrs):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.spans.append({"name": name, "seconds": dt, **attrs})
            if verbose:
                print(f"[{name}] {dt:.3f}s")

    def total(self, name: str) -> float:
        return sum(s["seconds"] for s in self.spans if s["name"] == name)

    def summary(self) -> str:
        agg: Dict[str, float] = {}
        for s in self.spans:
            agg[s["name"]] = agg.get(s["name"], 0.0) + s["seconds"]
        return "\n".join(f"{k:32s} {v:9.3f}s" for k, v in agg.items())

    def dump_json(self, path) -> None:
        with open(path, "w") as fp:
            json.dump(self.spans, fp, indent=2)


METRICS = Metrics()


@contextlib.contextmanager
def span(name: str, verbose: bool = False, **attrs):
    with METRICS.span(name, verbose=verbose, **attrs):
        yield


@contextlib.contextmanager
def tpu_trace(logdir: Optional[str]):
    """Capture a jax.profiler trace around the block when logdir is set."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    """Sync a pytree of device arrays (for honest span timing).

    jax.block_until_ready does NOT actually block on the axon TPU platform
    (docs/DESIGN.md), so this forces a one-element host transfer per leaf —
    the only reliable sync there, and harmless elsewhere.
    """
    import jax
    import numpy as np

    jax.block_until_ready(tree)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[-1:])
    return tree
