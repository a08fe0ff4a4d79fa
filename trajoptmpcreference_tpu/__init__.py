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
from trajoptmpcreference_tpu.models.urdf import parse_urdf
from trajoptmpcreference_tpu.models.plants import (
    Plant,
    URDFPlant,
    DoubleIntegratorPlant,
    PendulumPlant,
    CartPolePlant,
)

__all__ = [
    "RobotModel",
    "parse_urdf",
    "Plant",
    "URDFPlant",
    "DoubleIntegratorPlant",
    "PendulumPlant",
    "CartPolePlant",
]
