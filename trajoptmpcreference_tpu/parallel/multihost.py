"""Multi-host orchestration helpers.

The reference has no distributed story (SURVEY.md §2.8); on TPU pods the
scale path is: ``initialize()`` per process -> one global Mesh over all
chips -> ``shard_solve`` / ``sharded_pcg`` exactly as on one host (shard_map
only sees named mesh axes; XLA routes batch collectives over ICI within a
slice and DCN across slices).

Single-host runs (including the CI CPU mesh) work unchanged: initialize()
is a no-op when no coordinator is configured.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process (so the same driver script runs everywhere)."""
    coordinator_address = coordinator_address or os.environ.get(
        "TMR_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return                      # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(axis_names: Sequence[str] = ("batch",),
                horizon_axis: int = 1) -> Mesh:
    """Mesh over every chip in the job (all hosts).

    With two axis names the horizon axis gets ``horizon_axis`` chips
    (kept within one host so PCG halo ppermutes ride ICI) and the batch
    axis takes the rest.
    """
    devs = np.asarray(jax.devices())
    if len(axis_names) == 1:
        return Mesh(devs, tuple(axis_names))
    n = len(devs)
    if n % horizon_axis:
        raise ValueError(f"{n} devices not divisible by horizon={horizon_axis}")
    return Mesh(devs.reshape(n // horizon_axis, horizon_axis),
                tuple(axis_names))


def process_local_batch(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this process should feed
    (jax.make_array_from_single_device_arrays-style data loading)."""
    p = jax.process_index()
    np_ = jax.process_count()
    if global_batch % np_:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{np_} processes")
    per = global_batch // np_
    return slice(p * per, (p + 1) * per)
