"""Rigid-body pose settling — the reference's Blender physics step, on device.

The reference drops its scene objects with BlenderProc physics and adopts the
settled poses (coco_data_generator.py:296-309 ``simulate_physics_and_fix_
final_poses``: min 3 s / max 10 s simulation, then the resting transforms
become the scene poses). This module is the TPU-native equivalent: a jitted
penalty-contact rigid-body integrator over fully static shapes.

Design (idiomatic JAX, no host round-trips inside the sim):

  * every object is a static set of P collision-proxy points in body frame
    (subsampled mesh vertices around the center of mass) plus a bounding
    radius for object-object contact;
  * one ``lax.scan`` of semi-implicit Euler steps applies gravity, ground-
    plane contact (spring-damper normal force at each penetrating proxy with
    Coulomb-style tangential friction -> net force AND torque, which is what
    makes unstable orientations topple), and pairwise sphere separation;
  * quaternion state integrates as q += dt/2 * (0, w) (x) q, renormalized —
    all (N, ...) batched arithmetic, so the whole settle is one device call.

Everything is intentionally simple rigid-body physics: the goal is the
reference capability (objects rest ON the floor in statically plausible,
non-interpenetrating poses instead of hovering at a bbox offset), not a
general-purpose engine. Inertia uses the solid-sphere approximation
I = (2/5) m r^2, which errs toward stability for elongated shapes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..transforms.so3 import (
    quaternion_apply,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_to_matrix,
)


@dataclasses.dataclass(frozen=True)
class SettleConfig:
    """Static integrator parameters (hashable: used as a jit static arg).

    Defaults settle the datagen primitive library (~0.1 m objects) from a
    ~2-radius drop in sim_steps * dt = 3 s of simulated time, mirroring the
    reference's min-3-s physics window."""

    dt: float = 2e-3
    sim_steps: int = 1500
    gravity: float = -9.81
    mass: float = 1.0
    k_contact: float = 4000.0       # ground spring stiffness (per proxy)
    c_contact: float = 40.0         # ground normal damping (per proxy)
    friction: float = 0.6           # Coulomb friction coefficient
    k_pair: float = 4000.0          # sphere-sphere separation stiffness
    c_pair: float = 10.0            # pair normal damping
    lin_damping: float = 0.02       # per-step velocity decay (numeric)
    ang_damping: float = 0.05
    rolling_resistance: float = 0.3  # w-decay torque while touching ground
    z_plane: float = 0.0
    # soft boundary walls (the reference simulates inside a closed 2 m room,
    # :174-288): beyond +-extent in x/y a spring pushes the COM back in.
    # 0 disables.
    extent: float = 0.0
    k_wall: float = 2000.0


def collision_proxies(
    verts: np.ndarray, n_points: int = 32, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Static collision proxies for one object (host-side, once per library
    entry): (P, 3) body-frame points, (3,) center of mass, bounding radius.

    Farthest-point subsampling keeps the extreme vertices (the ones that
    touch the ground first) rather than a density-weighted sample."""
    v = np.asarray(verts, np.float32)
    com = v.mean(axis=0)
    rel = v - com
    n_pick = min(n_points, rel.shape[0])
    rng = np.random.default_rng(seed)
    picked = [int(rng.integers(rel.shape[0]))]
    d = np.linalg.norm(rel - rel[picked[0]], axis=1)
    for _ in range(n_pick - 1):
        nxt = int(np.argmax(d))
        picked.append(nxt)
        d = np.minimum(d, np.linalg.norm(rel - rel[nxt], axis=1))
    pts = rel[np.asarray(picked)]
    if pts.shape[0] < n_points:  # tiny meshes: pad by repeating
        reps = -(-n_points // pts.shape[0])
        pts = np.tile(pts, (reps, 1))[:n_points]
    radius = float(np.linalg.norm(rel, axis=1).max())
    return pts, com, radius


def _step(cfg: SettleConfig, state, _):
    """One semi-implicit Euler step over all N bodies. state: (p, q, v, w)
    with p/v (N, 3), q (N, 4) wxyz, w (N, 3) world-frame angular velocity.
    Closure constants: pts (N, P, 3) body-frame proxies, radii (N,),
    active (N,) 0/1 mask (padding bodies are parked far away AND massless
    here — mask keeps their state frozen so they cannot NaN)."""
    p, q, v, w, pts, radii, active = state
    N = p.shape[0]

    # world-frame proxy points and their velocities
    r = quaternion_apply(q[:, None, :], pts)         # (N, P, 3) lever arms
    x = p[:, None, :] + r                            # world positions
    vel = v[:, None, :] + jnp.cross(w[:, None, :], r)

    # ground contact: spring-damper normal + Coulomb-style friction
    pen = jnp.maximum(cfg.z_plane - x[..., 2], 0.0)  # (N, P)
    touching = pen > 0.0
    fn = jnp.where(
        touching,
        cfg.k_contact * pen - cfg.c_contact * vel[..., 2],
        0.0,
    )
    fn = jnp.maximum(fn, 0.0)                        # ground only pushes
    vt = vel[..., :2]                                # tangential velocity
    vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
    # Coulomb cap with a viscous core below v_eps (avoids the discontinuity
    # at rest that makes penalty methods jitter forever)
    v_eps = 1e-2
    ft_mag = cfg.friction * fn
    ft = -vt * (ft_mag / jnp.maximum(vt_norm[..., 0], v_eps))[..., None]
    f_pts = jnp.concatenate([ft, fn[..., None]], axis=-1)  # (N, P, 3)

    force = jnp.sum(f_pts, axis=1)                   # (N, 3)
    torque = jnp.sum(jnp.cross(r, f_pts), axis=1)

    # rolling resistance: point-contact Coulomb friction cannot stop a
    # rolling sphere (the contact point has zero slip velocity); decay the
    # angular velocity while in ground contact so bodies come to rest
    grounded = jnp.any(touching, axis=1).astype(jnp.float32)  # (N,)
    torque = torque - (cfg.rolling_resistance * grounded)[:, None] * w

    if cfg.extent > 0.0:  # soft room walls
        over = jnp.sign(p[..., :2]) * jnp.maximum(
            jnp.abs(p[..., :2]) - cfg.extent, 0.0
        )
        force = force.at[..., :2].add(-cfg.k_wall * over)

    # pairwise sphere separation (object-object non-interpenetration)
    dp = p[:, None, :] - p[None, :, :]               # (N, N, 3)
    dist = jnp.maximum(
        jnp.linalg.norm(dp + jnp.eye(N)[..., None], axis=-1), 1e-6
    )  # self -> ~sqrt(3), never 0
    overlap = jnp.maximum(radii[:, None] + radii[None, :] - dist, 0.0)
    overlap = overlap * (1.0 - jnp.eye(N))
    pair_mask = active[:, None] * active[None, :]
    n_hat = dp / dist[..., None]
    dv = v[:, None, :] - v[None, :, :]
    vn = jnp.sum(dv * n_hat, axis=-1)
    f_pair_mag = (cfg.k_pair * overlap - cfg.c_pair * vn) * (overlap > 0.0)
    f_pair_mag = jnp.maximum(f_pair_mag, 0.0) * pair_mask
    force = force + jnp.sum(f_pair_mag[..., None] * n_hat, axis=1)

    # gravity + integration (semi-implicit: velocity first)
    force = force + jnp.array([0.0, 0.0, cfg.gravity * cfg.mass])
    inertia = 0.4 * cfg.mass * jnp.maximum(radii, 1e-4) ** 2  # (N,)
    v_new = (v + (cfg.dt / cfg.mass) * force) * (1.0 - cfg.lin_damping)
    w_new = (w + (cfg.dt / inertia[:, None]) * torque) * (1.0 - cfg.ang_damping)
    p_new = p + cfg.dt * v_new
    dq = 0.5 * cfg.dt * quaternion_multiply(
        jnp.concatenate([jnp.zeros((N, 1)), w_new], axis=-1), q
    )
    q_new = quaternion_normalize(q + dq)

    m = active[:, None]
    state = (
        jnp.where(m, p_new, p),
        jnp.where(m, q_new, q),
        jnp.where(m, v_new, v),
        jnp.where(m, w_new, w),
        pts, radii, active,
    )
    return state, None


@functools.partial(jax.jit, static_argnums=(5,))
def settle_poses(
    pts: jax.Array,      # (N, P, 3) body-frame collision proxies (about COM)
    radii: jax.Array,    # (N,) bounding radii
    p0: jax.Array,       # (N, 3) initial COM positions
    q0: jax.Array,       # (N, 4) initial orientations (wxyz)
    active: jax.Array,   # (N,) 1.0 for real bodies, 0.0 for padding
    cfg: SettleConfig = SettleConfig(),
):
    """Run the settle sim; returns (R (N, 3, 3), t (N, 3), residual_speed).

    residual_speed is max over active bodies of |v| + r*|w| at the end — a
    convergence diagnostic (should be ~0 for a settled scene; callers can
    assert or re-run with more steps)."""
    state0 = (
        p0, q0,
        jnp.zeros_like(p0), jnp.zeros_like(p0),
        pts, radii, active,
    )
    (p, q, v, w, *_), _ = jax.lax.scan(
        functools.partial(_step, cfg), state0, None, length=cfg.sim_steps
    )
    speed = jnp.linalg.norm(v, axis=-1) + radii * jnp.linalg.norm(w, axis=-1)
    residual = jnp.max(speed * active)
    return quaternion_to_matrix(q), p, residual


def drop_poses(
    rng: np.random.Generator, n: int, xy: np.ndarray, radii: np.ndarray,
    z_plane: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Initial drop states: random orientation, COM hovering 1.5 radii above
    the plane at the sampled xy (the reference samples poses in a volume and
    lets physics bring them down, :296-309)."""
    p0 = np.concatenate(
        [
            np.asarray(xy, np.float32),
            (z_plane + 1.5 * np.asarray(radii, np.float32))[:, None],
        ],
        axis=1,
    )
    u = rng.normal(size=(n, 4)).astype(np.float32)
    q0 = u / np.linalg.norm(u, axis=1, keepdims=True)
    return p0, q0
