"""Plant layer: dynamics + integrator as pure functions.

The reference's class hierarchy (ref: TrajoptPlant.py:10-332) becomes a
frozen ``Plant`` bundle of single-sample functions that the solvers close
over.  Restores the canonical analytic plants the reference snapshot dropped
(DoubleIntegrator / Pendulum / CartPole, still exported by the reference's
``__init__.py:1`` — see SURVEY.md) alongside the URDF plant.

All functions are vmappable and dtype-polymorphic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from trajoptmpcreference_tpu.models.robot import RobotModel
from trajoptmpcreference_tpu.models.urdf import parse_urdf
from trajoptmpcreference_tpu.ops.integrators import make_integrator
from trajoptmpcreference_tpu.ops.kinematics import Kinematics, make_kinematics
from trajoptmpcreference_tpu.ops.rbd import RBD, make_rbd


@dataclasses.dataclass(frozen=True)
class Plant:
    """A plant: sizes, state derivative, its Jacobian, and integrator fns.

    step(x, u, dt) -> x_{k+1}
    step_gradient(x, u, dt) -> (A, B)   [the reference's
        ``integrator(..., return_gradient=True)``, ref: TrajoptPlant.py:83]
    """

    name: str
    nq: int
    nv: int
    nu: int
    integrator_type: int
    xdot: Callable
    dxdot: Callable
    step: Callable
    step_gradient: Callable
    rbd: Optional[RBD] = None
    kinematics: Optional[Kinematics] = None
    robot: Optional[RobotModel] = None

    @property
    def nx(self) -> int:
        return self.nq + self.nv

    def get_num_pos(self):
        return self.nq

    def get_num_vel(self):
        return self.nv

    def get_num_cntrl(self):
        return self.nu


def _build(name, nq, nv, nu, xdot, dxdot, integrator_type, rbd=None,
           kinematics=None, robot=None) -> Plant:
    step, step_gradient = make_integrator(xdot, dxdot, nq + nv, nu, integrator_type)
    return Plant(
        name=name, nq=nq, nv=nv, nu=nu, integrator_type=integrator_type,
        xdot=xdot, dxdot=dxdot, step=step, step_gradient=step_gradient,
        rbd=rbd, kinematics=kinematics, robot=robot,
    )


# --------------------------------------------------------------------- URDF

def URDFPlant(path: Optional[str] = None,
              robot: Optional[RobotModel] = None,
              integrator_type: int = 0,
              gravity: float = -9.81,
              options: Optional[dict] = None,
              use_lanes: bool = True,
              use_pallas: bool = False,
              use_pallas_fd: bool = False,
              use_pallas_task: bool = False) -> Plant:
    """URDF rigid-body plant: qdd = Minv(q) (u - c(q, qd))
    (ref: TrajoptPlant.py:274-332).

    use_lanes: route fd / fd_grad through the batch-minor lane kernels
    (ops/lanes.py) whose custom_vmap rules fold any vmapped axis into the
    TPU lane dimension — ~10x faster batched; numerically identical."""
    if options:
        path = options.get("path_to_urdf", path)
        gravity = options.get("gravity", gravity)
    if robot is None:
        if path is None:
            raise ValueError("URDFPlant needs a path or a RobotModel")
        robot = parse_urdf(path)
    rbd = make_rbd(robot)
    kin = make_kinematics(robot, use_lanes=use_lanes,
                          use_pallas_task=use_pallas_task)
    n = robot.n

    if use_lanes:
        from trajoptmpcreference_tpu.ops.lanes import make_rbd_lanes
        fd_fn, fd_grad_fn = make_rbd_lanes(robot, gravity,
                                           use_pallas=use_pallas,
                                           use_pallas_fd=use_pallas_fd)
    else:
        fd_fn = lambda q, qd, u: rbd.fd(q, qd, u, gravity)
        fd_grad_fn = lambda q, qd, u: rbd.fd_grad(q, qd, u, gravity)

    def xdot(x, u):
        q, qd = x[:n], x[n:]
        return jnp.concatenate([qd, fd_fn(q, qd, u)])

    def dxdot(x, u):
        q, qd = x[:n], x[n:]
        dqdd = fd_grad_fn(q, qd, u)                  # (n, 3n)
        top = jnp.concatenate(
            [jnp.zeros((n, n), dtype=x.dtype),
             jnp.eye(n, dtype=x.dtype),
             jnp.zeros((n, n), dtype=x.dtype)], axis=1)
        return jnp.concatenate([top, dqdd], axis=0)  # (2n, 3n)

    return _build(robot.name, n, n, n, xdot, dxdot, integrator_type,
                  rbd=rbd, kinematics=kin, robot=robot)


# ------------------------------------------------------- analytic plants

def DoubleIntegratorPlant(mass: float = 1.0, integrator_type: int = 0) -> Plant:
    """1-D double integrator: qdd = u / m (canonical plant restored per the
    upstream API referenced by the snapshot's stale ``__init__.py:1``)."""

    def xdot(x, u):
        return jnp.stack([x[1], u[0] / mass])

    def dxdot(x, u):
        z = jnp.zeros((), dtype=x.dtype)
        one = jnp.ones((), dtype=x.dtype)
        top = jnp.stack([z, one, z])
        bot = jnp.stack([z, z, one / mass])
        return jnp.stack([top, bot])

    return _build("double_integrator", 1, 1, 1, xdot, dxdot, integrator_type)


def PendulumPlant(mass: float = 1.0, length: float = 1.0,
                  damping: float = 0.0, gravity: float = 9.81,
                  integrator_type: int = 0) -> Plant:
    """Point-mass pendulum: ml^2 qdd = u - m g l sin(q) - b qd.
    theta = 0 hanging down; swing-up goal theta = pi
    (ref: examples/pendulum.py:13-16)."""
    ml2 = mass * length * length
    mgl = mass * gravity * length

    def xdot(x, u):
        q, qd = x[0], x[1]
        qdd = (u[0] - mgl * jnp.sin(q) - damping * qd) / ml2
        return jnp.stack([qd, qdd])

    def dxdot(x, u):
        q = x[0]
        z = jnp.zeros((), dtype=x.dtype)
        one = jnp.ones((), dtype=x.dtype)
        top = jnp.stack([z, one, z])
        bot = jnp.stack([-mgl * jnp.cos(q) / ml2,
                         -damping / ml2 * one,
                         one / ml2])
        return jnp.stack([top, bot])

    return _build("pendulum", 1, 1, 1, xdot, dxdot, integrator_type)


def CartPolePlant(cart_mass: float = 1.0, pole_mass: float = 0.1,
                  pole_length: float = 0.5, gravity: float = 9.81,
                  integrator_type: int = 0) -> Plant:
    """Cart-pole with force control on the cart.

    State [p, theta, pd, thetad], theta = 0 pole down.  Standard underactuated
    dynamics; the control acts only on the cart (nu = 1).
    """
    mc, mp, l, g = cart_mass, pole_mass, pole_length, gravity

    def _qdd(x, u):
        th, pd_, thd = x[1], x[2], x[3]
        s, c = jnp.sin(th), jnp.cos(th)
        denom = mc + mp * s * s
        pdd = (u[0] + mp * s * (l * thd * thd + g * c)) / denom
        thdd = (-u[0] * c - mp * l * thd * thd * c * s - (mc + mp) * g * s) / (l * denom)
        return jnp.stack([pdd, thdd])

    def xdot(x, u):
        return jnp.concatenate([x[2:], _qdd(x, u)])

    def dxdot(x, u):
        # exact Jacobian via forward-mode autodiff of the analytic qdd
        import jax
        dq = jax.jacfwd(_qdd, argnums=0)(x, u)   # (2, 4)
        du = jax.jacfwd(_qdd, argnums=1)(x, u)   # (2, 1)
        top = jnp.concatenate(
            [jnp.zeros((2, 2), dtype=x.dtype), jnp.eye(2, dtype=x.dtype),
             jnp.zeros((2, 1), dtype=x.dtype)], axis=1)
        return jnp.concatenate([top, jnp.concatenate([dq, du], axis=1)], axis=0)

    return _build("cartpole", 2, 2, 1, xdot, dxdot, integrator_type)
