"""CLI for the native codegen layer — the analogue of the reference's
GRiD scripts (ref: GRiD/generateGRiD.py:80-94, GRiD/printGRiD.py:27-47,
GRiD/printReferenceValues.py:17-80):

  python -m trajoptmpcreference_tpu.native arm6           # 6-link serial arm
  python -m trajoptmpcreference_tpu.native path/to.urdf   # any URDF
  python -m trajoptmpcreference_tpu.native arm3 --emit out.cpp  # dump C++

Generates the robot-specialized C++ (codegen.generate_cpp), compiles it
with g++ (codegen.build — the nvcc step's analogue, ref: printGRiD.py:27-36),
runs every exported algorithm on fixed-seed random inputs (seed 1337, the
reference's CUDA smoke-test seed, ref: printGRiD.cu:10), prints the values,
and cross-checks each against the JAX implementation the way
printReferenceValues.py pairs with printGRiD.cu across the language
boundary (tolerance 1e-10, ref: GRiD/util/util.py:59-69).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _robot(spec: str):
    from trajoptmpcreference_tpu.models.urdf import parse_urdf, serial_arm
    if spec.startswith("arm") and spec[3:].isdigit():
        return serial_arm(int(spec[3:]))
    return parse_urdf(spec)


def _p(name, arr):
    with np.printoptions(precision=6, suppress=True, linewidth=100):
        print(f"{name} =\n{np.asarray(arr)}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m trajoptmpcreference_tpu.native",
        description=__doc__.splitlines()[0])
    ap.add_argument("robot", help="'armN' for an N-link serial arm, or a "
                                  "URDF path")
    ap.add_argument("--emit", metavar="FILE",
                    help="write the generated C++ to FILE and exit "
                         "(the generateGRiD.py analogue)")
    ap.add_argument("--seed", type=int, default=1337,
                    help="input seed (default: the reference's 1337)")
    ap.add_argument("--tol", type=float, default=1e-10,
                    help="cross-check tolerance (default 1e-10, the "
                         "reference's printErr bar)")
    args = ap.parse_args(argv)

    robot = _robot(args.robot)
    n = robot.n
    print(f"robot: {robot.name} (n = {n})")

    from trajoptmpcreference_tpu.native.codegen import build, generate_cpp
    if args.emit:
        with open(args.emit, "w") as f:
            f.write(generate_cpp(robot))
        print(f"wrote {args.emit}")
        return 0

    so = build(robot)
    print(f"compiled: {so}")

    from trajoptmpcreference_tpu.native.lib import NativeDynamics
    native = NativeDynamics(robot)

    rng = np.random.default_rng(args.seed)
    q = rng.standard_normal(n)
    qd = rng.standard_normal(n)
    u = rng.standard_normal(n)
    qdd = rng.standard_normal(n)
    _p("q", q)
    _p("qd", qd)
    _p("u", u)
    _p("qdd", qdd)

    # native outputs (the printGRiD.cu print set: eePos/ID/Minv/FD/dID/dFD,
    # plus the generalized layer's ABA/CRBA/IDSVA)
    outs = {
        "ee_pos": native.ee_pos(q),
        "ee_jacobian": native.ee_jacobian(q),
        "rnea (ID)": native.rnea(q, qd, qdd),
        "crba (H)": native.crba(q),
        "minv": native.minv(q),
        "fd (qdd)": native.fd(q, qd, u),
        "aba (qdd)": native.aba(q, qd, u),
        "rnea_grad (dID)": native.rnea_grad(q, qd, qdd),
        "idsva dtau_dq": native.idsva(q, qd, qdd)[0],
        "idsva dtau_dqd": native.idsva(q, qd, qdd)[1],
        "fd_grad (dFD)": native.fd_grad(q, qd, u),
    }
    for name, val in outs.items():
        _p(name, val)

    # cross-check vs the JAX implementation (printReferenceValues analogue)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from trajoptmpcreference_tpu.ops.kinematics import make_kinematics
    from trajoptmpcreference_tpu.ops.rbd import make_rbd
    rbd = make_rbd(robot)
    kin = make_kinematics(robot)
    qj, qdj, uj, qddj = (jnp.asarray(a) for a in (q, qd, u, qdd))
    refs = {
        "ee_pos": kin.ee_pos_xyz(qj),
        "ee_jacobian": kin.jacobian(qj)[: min(3, n)],
        "rnea (ID)": rbd.rnea(qj, qdj, qddj)[0],
        "crba (H)": rbd.crba(qj),
        "minv": rbd.minv(qj),
        "fd (qdd)": rbd.fd(qj, qdj, uj),
        "aba (qdd)": rbd.aba(qj, qdj, uj),
        "rnea_grad (dID)": rbd.rnea_grad(qj, qdj, qddj),
        "idsva dtau_dq": rbd.idsva(qj, qdj, qddj)[0],
        "idsva dtau_dqd": rbd.idsva(qj, qdj, qddj)[1],
        "fd_grad (dFD)": rbd.fd_grad(qj, qdj, uj),
    }
    loose = {"minv", "fd (qdd)", "fd_grad (dFD)", "ee_jacobian"}  # a linear
    # solve / finite difference sits between the two implementations
    fails = 0
    for name, val in outs.items():
        ref = np.asarray(refs[name])
        tol = max(args.tol, 1e-7) if name in loose else args.tol
        err = float(np.max(np.abs(np.asarray(val) - ref)))
        ok = err <= tol
        fails += (not ok)
        print(f"check {name}: max |native - jax| = {err:.2e} "
              f"{'OK' if ok else f'FAIL (tol {tol:g})'}")
    print("ALL CHECKS PASSED" if fails == 0 else f"{fails} CHECKS FAILED")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
