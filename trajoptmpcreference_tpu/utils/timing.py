"""Wall-clock timing with a correct device-completion barrier.

``jax.block_until_ready`` does not wait for remote execution on the axon
TPU backend — only a host transfer does.  time_fn syncs by fetching a
scalar reduction of the first array leaf, which is correct on every
backend.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0]).astype(jnp.float32))


def time_fn(fn: Callable, *args, reps: int = 3,
            warmup: int = 1) -> Tuple[float, object]:
    """Return (best wall seconds, last result); compiles on the first call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
