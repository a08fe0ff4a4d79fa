"""Distributed execution layer: scenario batching and horizon sharding.

The reference has no distributed story at all (SURVEY.md §2.8 — its only
parallelism is a multiprocessing.Pool over independent experiment configs,
ref: examples/test_multiple.py:123-131).  This package supplies the
TPU-native scale axes:

  * batch (DP analogue): vmap over scenarios inside one program;
    shard_map over the 'batch' mesh axis across chips;
  * horizon (TP/SP analogue): block-tridiagonal PCG sharded over the
    'horizon' mesh axis with ppermute halo exchange and psum reductions.
"""

from trajoptmpcreference_tpu.parallel.batch import (
    batch_solve,
    make_mesh,
    shard_solve,
)
from trajoptmpcreference_tpu.parallel.horizon import (
    sharded_btd_matvec,
    sharded_pcg,
    sharded_schur_solve,
)
from trajoptmpcreference_tpu.parallel.multihost import (
    global_mesh,
    initialize,
    process_local_batch,
)

__all__ = [
    "batch_solve",
    "make_mesh",
    "shard_solve",
    "sharded_btd_matvec",
    "sharded_pcg",
    "sharded_schur_solve",
    "global_mesh",
    "initialize",
    "process_local_batch",
]
