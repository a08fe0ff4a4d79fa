"""Regenerate golden SQP trajectories by running the reference implementation.

Usage:  python tests/golden/generate.py [/path/to/reference]

Runs VCA-EPFL/TrajoptMPCReference (expected at /root/reference) on the
2-link arm task-space problem under several solver configurations and saves
(x, u, exit codes) per config as .npz.  The committed .npz files are the
golden fixtures for tests/test_sqp_parity.py; this script only needs to be
re-run if the configs change.

Config notes:
  * expected_reduction_min = -100 matches the reference's own working driver
    (ref: examples/twolinks.py:87) — the default 0.05 makes the reference
    exit almost immediately on this problem.
  * Our UrdfCost must be built with ref_compat=True to match these goldens
    (the reference's dJdq has a sign error; see costs.py docstring).
"""

import sys
import time

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, REF)

from TrajoptPlant import URDFPlant  # noqa: E402
from TrajoptCost import UrdfCost  # noqa: E402
from TrajoptConstraint import TrajoptConstraint  # noqa: E402
from TrajoptMPCReference import TrajoptMPCReference, SQPSolverMethods  # noqa: E402

N, DT = 10, 0.1
QD = np.diag([1.0, 1.0, 1.0, 1.0])
QF = np.diag([100.0] * 4)
R = 0.1 * np.eye(2)
XG = np.array([0.5, 1.5, 0.0, 0.0])
OPTS = {"expected_reduction_min_SQP_DDP": -100, "overloading": False}


def fresh(links=2, integrator_type=0):
    plant = URDFPlant(integrator_type=integrator_type, options={
        "path_to_urdf": f"{REF}/models/arm{links}.urdf",
        "gravity": -9.81, "overloading": False})
    if links == 2:
        cost = UrdfCost(plant, QD, QF, R, XG, overloading=False)
    else:
        # the reference's threelinks.py:26-39 config: Q = I4, QF = 100 I4,
        # R = 0.1 I_n, xg = [-1, 1.5, 0, 0]
        cost = UrdfCost(plant, np.eye(4), 100.0 * np.eye(4),
                        0.1 * np.eye(links), np.array([-1.0, 1.5, 0.0, 0.0]),
                        overloading=False)
    return plant, cost


def run(name, method, constraints=None, links=2, integrator_type=0):
    plant, cost = fresh(links, integrator_type)
    nq = plant.get_num_pos()
    nu = plant.get_num_cntrl()
    solver = TrajoptMPCReference(plant, cost, constraints)
    x = np.zeros((2 * nq, N))
    u = np.zeros((nu, N - 1))
    t = time.time()
    x, u, exit_sqp, exit_soft, outer_iters, iters = solver.SQP(
        x, u, N, DT, method, options=dict(OPTS))
    dtired = time.time() - t
    print(f"{name}: {dtired:.1f}s exit=({exit_sqp},{exit_soft}) "
          f"outer={outer_iters} iters={iters}")
    np.savez(f"{sys.path[0] if __name__ == '__main__' else '.'}/x_{name}.npz"
             if False else f"tests/golden/{name}.npz",
             x=x, u=u, exit_sqp=exit_sqp, exit_soft=exit_soft,
             outer_iters=outer_iters, iters=iters, wall_s=dtired)


def torque_limits(mode, nu=2):
    c = TrajoptConstraint(nu, nu, nu, N)
    c.set_torque_limits([7.0], [-7.0], mode, options={"overloading": False})
    return c


def tight_torque_limits(mode):
    c = TrajoptConstraint(2, 2, 2, N)
    c.set_torque_limits([0.2], [-0.2], mode, options={"overloading": False})
    return c


if __name__ == "__main__":
    run("arm2_N", SQPSolverMethods.N)
    run("arm2_S", SQPSolverMethods.S)
    run("arm2_PCG_SS", SQPSolverMethods.PCG_SS)
    try:
        run("arm2_S_AL", SQPSolverMethods.S,
            tight_torque_limits("AUGMENTED_LAGRANGIAN"))
    except ValueError as e:
        # the reference's soft-constraint value crashes for nu >= 2
        # (ref: TrajoptConstraint.py:76-81) — the committed proof is
        # golden/arm2_S_AL_traceback.txt
        print("arm2_S_AL: reference crash (expected):", e)
    run("arm2_S_active_set", SQPSolverMethods.S, tight_torque_limits("ACTIVE_SET"))
    # arm3 (the reference's threelinks.py:39-78 config: +/-7 ACTIVE_SET).
    # The reference CANNOT run it: UrdfCost.delta_x reshapes
    # [ee_pos (3 incl. theta); J qd (2)] = 5 values into (2*n,) = 6
    # (ref: TrajoptCost.py:434) — the task-space cost is 2-link-only in
    # the snapshot, so threelinks.py as committed crashes.  The executed
    # traceback is saved as the impossibility proof (the same pattern as
    # arm2_S_AL_traceback.txt).
    try:
        run("arm3_S", SQPSolverMethods.S, links=3)
    except ValueError:
        import traceback
        with open("tests/golden/arm3_traceback.txt", "w") as f:
            f.write("$ python tests/golden/generate.py  # arm3_S config\n"
                    "# (reference threelinks.py:39-78 semantics; proof the\n"
                    "#  snapshot cannot run ANY arm3 task-space solve)\n\n")
            traceback.print_exc(file=f)
        print("arm3_S: reference crash (UrdfCost.delta_x is 2-link-only, "
              "ref: TrajoptCost.py:434) — traceback saved")
    # non-euler integrator: midpoint (type 2 — rk3/rk4 carry known B-term
    # bugs in the reference, ref: TrajoptPlant.py:189-265, so midpoint is
    # the clean non-euler parity point)
    run("arm2_S_midpoint", SQPSolverMethods.S, integrator_type=2)
