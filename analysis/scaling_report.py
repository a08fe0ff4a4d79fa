"""Weak-scaling harness: batched flagship solves over a growing device
mesh (1/2/4/8), reporting solves/s and parallel efficiency (BASELINE.json
asks for >= 80% at 1 chip / 1 host / >= 2 hosts).

On real TPU hardware the same script reports the true curve; under the
CI's virtual CPU mesh (xla_force_host_platform_device_count) every
"device" shares the same physical cores, so the printed efficiency there
validates the HARNESS and the sharding (no replicated compute, no
cross-device serialization), not chip-level scaling.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python analysis/scaling_report.py
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def single_device_rate(B):
    """Run the SAME total batch unsharded on ONE device that owns ALL host
    cores (a fresh process without the virtual-device split).  Host-core
    contention is then identical between this control and the P-device
    sharded run, so the ratio isolates the sharding machinery's overhead
    from oversubscription — the corrected-efficiency denominator."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""))
    env["SCALE_SINGLE_B"] = str(B)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["solves_per_s"]
    raise RuntimeError(out.stdout + out.stderr)


def single_main(B):
    import jax
    import jax.numpy as jnp

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)
    from __graft_entry__ import _flagship

    N = int(os.environ.get("SCALE_N", "16"))
    reps = int(os.environ.get("SCALE_REPS", "3"))
    plant, cost, solver = _flagship(N=N, max_iter=4)
    nx, nu = plant.nx, plant.nu
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx, N)), dtype)
    u0s = jnp.zeros((B, nu, N - 1), dtype)
    cps = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape),
        cost.default_params)
    fn = jax.jit(jax.vmap(solver.solve))
    res = fn(x0s, u0s, cps)
    float(jnp.sum(res.U))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = fn(x0s, u0s, cps)
        float(jnp.sum(res.U))
        times.append(time.perf_counter() - t0)
    print(json.dumps({"batch": B, "solves_per_s": round(B / min(times), 2)}))


def main():
    import jax
    import jax.numpy as jnp

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)

    from __graft_entry__ import _flagship
    from trajoptmpcreference_tpu.parallel import make_mesh, shard_solve

    per_dev = int(os.environ.get("SCALE_B_PER_DEV", "8"))
    N = int(os.environ.get("SCALE_N", "16"))
    reps = int(os.environ.get("SCALE_REPS", "3"))
    plant, cost, solver = _flagship(N=N, max_iter=4)
    nx, nu = plant.nx, plant.nu
    dtype = jnp.float32

    ndev = len(jax.devices())
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= ndev]
    rows = []
    base_rate = None
    for P in sizes:
        B = per_dev * P
        mesh = make_mesh((P,), ("batch",), devices=jax.devices()[:P])
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx, N)), dtype)
        u0s = jnp.zeros((B, nu, N - 1), dtype)
        cps = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (B,) + a.shape),
            cost.default_params)
        fn = jax.jit(shard_solve(solver, mesh))
        res = fn(x0s, u0s, cps)
        jax.block_until_ready(res.U)
        float(jnp.sum(res.U))           # remote-TPU completion barrier
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn(x0s, u0s, cps)
            float(jnp.sum(res.U))
            times.append(time.perf_counter() - t0)
        rate = B / min(times)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * P)
        rows.append({"devices": P, "batch": B,
                     "solves_per_s": round(rate, 2),
                     "weak_efficiency": round(eff, 4)})
        print(json.dumps(rows[-1]))

    # corrected efficiency: same total batch, unsharded, one device owning
    # every host core — the equally-oversubscribed control that separates
    # sharding overhead from host-core contention (only meaningful under a
    # virtual CPU mesh; on real chips the raw column IS the chip curve)
    backend0 = jax.default_backend()
    if backend0 != "tpu" and os.environ.get("SCALE_CORRECTED", "1") == "1":
        for r in rows:
            ctrl = single_device_rate(r["batch"])
            r["unsharded_allcores_solves_per_s"] = ctrl
            r["corrected_efficiency"] = round(r["solves_per_s"] / ctrl, 4)
            print(json.dumps({k: r[k] for k in
                              ("devices", "unsharded_allcores_solves_per_s",
                               "corrected_efficiency")}))

    backend = jax.default_backend()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"scaling_report_{backend}.md")
    with open(out, "w") as f:
        f.write(f"# Weak scaling ({backend}), flagship 6-DoF N={N} solve, "
                f"{per_dev} scenarios/device\n\n")
        if backend != "tpu":
            f.write(f"CAVEAT: virtual CPU devices share "
                    f"{os.cpu_count()} physical cores; the efficiency "
                    "ceiling past that point is host-compute "
                    "oversubscription, not sharding overhead — this "
                    "validates the harness + sharding (no replicated "
                    "compute), not chip scaling (see module "
                    "docstring).\n\n")
        cor = "corrected_efficiency" in rows[0]
        if cor:
            f.write("Corrected efficiency = sharded rate / rate of the "
                    "SAME total batch unsharded on one device owning all "
                    "host cores (the equally-oversubscribed control).  A "
                    "single XLA-CPU device under-parallelizes the vmapped "
                    "solver across host cores, while P virtual devices "
                    "run P concurrent executables, so this ratio measures "
                    "the sharding machinery's parallelization gain NET of "
                    "its overhead: >= 100% at every P means the shard_map "
                    "partition + dispatch adds no measurable overhead on "
                    "this host, and the raw column's decline is host-core "
                    "oversubscription — demonstrated rather than "
                    "asserted.\n\n")
        f.write("| devices | batch | solves/s | weak efficiency |"
                + (" unsharded all-cores solves/s | corrected efficiency |"
                   if cor else "") + "\n"
                + "|---|---|---|---|" + ("---|---|" if cor else "") + "\n")
        for r in rows:
            line = (f"| {r['devices']} | {r['batch']} | "
                    f"{r['solves_per_s']} | {r['weak_efficiency']:.1%} |")
            if cor:
                line += (f" {r['unsharded_allcores_solves_per_s']} | "
                         f"{r['corrected_efficiency']:.1%} |")
            f.write(line + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    if os.environ.get("SCALE_SINGLE_B"):
        single_main(int(os.environ["SCALE_SINGLE_B"]))
    else:
        main()
