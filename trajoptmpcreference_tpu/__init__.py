"""trajoptmpcreference_tpu — a TPU-native trajectory-optimization / MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
VCA-EPFL/TrajoptMPCReference (see SURVEY.md): URDF-driven rigid-body dynamics
(RNEA, analytic M^-1, ABA, CRBA, IDSVA, end-effector kinematics and their
analytical gradients), explicit integrators with exact gradient composition,
quadratic / task-space costs, box constraints (active-set, full-set,
quadratic-penalty, augmented-Lagrangian), SQP with dense-KKT / Schur /
preconditioned-conjugate-gradient linear solvers, iLQR, and a receding-horizon
MPC loop — all pure functions, jit-specialized per robot, vmappable over
scenario batches and shardable over TPU meshes.

Reference parity citations appear in docstrings as ``ref: <file>:<lines>``
pointing into the reference checkout (not copied; re-derived TPU-first).
"""

__version__ = "0.1.0"

from trajoptmpcreference_tpu.models.robot import RobotModel
from trajoptmpcreference_tpu.models.urdf import parse_urdf, serial_arm
from trajoptmpcreference_tpu.models.plants import (
    Plant,
    URDFPlant,
    DoubleIntegratorPlant,
    PendulumPlant,
    CartPolePlant,
)
from trajoptmpcreference_tpu.solvers.costs import (
    ArmCost,
    Cost,
    NumericalCost,
    QuadraticCost,
    UrdfCost,
)
from trajoptmpcreference_tpu.solvers.constraints import ConstraintSet
from trajoptmpcreference_tpu.solvers.sqp import (
    SQPOptions,
    SQPResult,
    SQPSolver,
    make_sqp,
)
from trajoptmpcreference_tpu.solvers.ilqr import ILQRResult, ILQRSolver, make_ilqr
from trajoptmpcreference_tpu.solvers.methods import MPCSolverMethods, SQPSolverMethods
from trajoptmpcreference_tpu.solvers.mpc import (
    MPCController,
    MPCResult,
    make_mpc,
    run_scheduled,
)

__all__ = [
    "RobotModel",
    "parse_urdf",
    "serial_arm",
    "Plant",
    "URDFPlant",
    "DoubleIntegratorPlant",
    "PendulumPlant",
    "CartPolePlant",
    "ArmCost",
    "Cost",
    "NumericalCost",
    "QuadraticCost",
    "UrdfCost",
    "ConstraintSet",
    "SQPOptions",
    "SQPResult",
    "SQPSolver",
    "make_sqp",
    "SQPSolverMethods",
    "MPCSolverMethods",
    "ILQRResult",
    "ILQRSolver",
    "make_ilqr",
    "MPCController",
    "MPCResult",
    "make_mpc",
    "run_scheduled",
]
