"""2-process ``jax.distributed`` smoke test of the multi-host helpers
(SURVEY.md §2.8; the reference has no distributed story, so this is a
TPU-native obligation, not parity).

Each process owns half the devices of a global 2x(P*L/2)... mesh and feeds
its process-local slice of a globally-batched flagship solve
(``multihost.initialize`` -> ``global_mesh`` -> ``parallel.shard_solve``
with ``jax.make_array_from_process_local_data``).  Process 0 checks the
globally-gathered controls against a single-process vmap oracle.

Run (CPU, two processes, 4 virtual devices each):
    python analysis/multihost_smoke.py            # spawns both ranks
    python analysis/multihost_smoke.py --rank 0   # or by hand, 2 shells
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
COORD = "127.0.0.1:12421"
NPROC = 2
LOCAL_DEVICES = 4


def worker(rank: int) -> None:
    sys.path.insert(0, os.path.join(HERE, ".."))

    import jax

    # sitecustomize imports jax at interpreter start, so env-var defaults
    # are already latched; pin the live config instead (see tests/conftest)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    import jax.numpy as jnp
    import numpy as np

    from trajoptmpcreference_tpu.parallel import multihost
    from trajoptmpcreference_tpu.parallel import shard_solve

    multihost.initialize(coordinator_address=COORD, num_processes=NPROC,
                         process_id=rank)
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.device_count() == NPROC * LOCAL_DEVICES

    mesh = multihost.global_mesh(("batch",))

    from __graft_entry__ import _flagship
    plant, cost, solver = _flagship(N=8, max_iter=2)
    nx, nu = plant.nx, plant.nu
    B = 16
    rng = np.random.default_rng(0)           # same seed every process
    x0s_np = 0.1 * rng.standard_normal((B, nx, 8)).astype(np.float32)
    u0s_np = np.zeros((B, nu, 7), np.float32)

    sl = multihost.process_local_batch(B)
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("batch"))
    x0s = jax.make_array_from_process_local_data(sharding, x0s_np[sl])
    u0s = jax.make_array_from_process_local_data(sharding, u0s_np[sl])
    # per-scenario cost params, sharded over batch like the states
    cps_np = jax.tree_util.tree_map(
        lambda a: np.broadcast_to(np.asarray(a, np.float32)[None],
                                  (B,) + np.shape(a)).copy(),
        cost.default_params)
    cps = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, a[sl]),
        cps_np)

    res = jax.jit(shard_solve(solver, mesh))(x0s, u0s, cps)
    U = np.asarray(jax.experimental.multihost_utils.process_allgather(
        res.U, tiled=True))
    # local single-device oracle over the full batch
    res_ref = jax.jit(jax.vmap(solver.solve))(
        jnp.asarray(x0s_np), jnp.asarray(u0s_np))
    err = float(np.max(np.abs(U - np.asarray(res_ref.U))))
    if rank == 0:
        assert err < 1e-5, err
        print(f"multihost_smoke OK: {NPROC} processes x {LOCAL_DEVICES} "
              f"devices, B={B} sharded solve matches vmap oracle "
              f"(max |dU| = {err:.2e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is not None:
        worker(args.rank)
        return
    procs = [subprocess.Popen([sys.executable, __file__, "--rank", str(r)])
             for r in range(NPROC)]
    codes = [p.wait() for p in procs]
    assert all(c == 0 for c in codes), codes
    print("multihost_smoke: all ranks exited 0")


if __name__ == "__main__":
    main()
